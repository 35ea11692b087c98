package graft

import graft.queries.TextDedup
import org.scalatest.funsuite.AnyFunSuite

/** Semantic edges of the round-6 pipeline operators that the oracle's
  * synthetic corpus doesn't force: d11's cross-doc vs within-doc chunk
  * distinction and t13's top-bigram multiplicity.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("d11: within-doc repeated chunks are NOT duplicates; cross-doc chunks are") {
    import spark.implicits._
    val x = (1 to 32).map("c" + _).mkString(" ") // one full 32-token chunk
    val y = (1 to 32).map("y" + _).mkString(" ")
    val docs = Seq(
      (1L, s"$x $x"), // chunk X twice — within-doc only, unless X leaks
      (2L, x),        // …and it does: doc 2 is exactly X
      (3L, (1 to 32).map("u" + _).mkString(" ")), // unique doc
      (4L, s"$y $y")  // repeated chunk Y appears in NO other doc
    ).toDF("doc_id", "text")
    val got = TextDedup.chunkDedupOf(docs)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // doc 1: both X instances are cross-doc-duplicated (X lives in doc 2
    // too) → 2/2 dup, dropped
    assert(got(1L) == (2L, 2L, 1.0, false), s"doc1=${got(1L)}")
    assert(got(2L) == (1L, 1L, 1.0, false), s"doc2=${got(2L)}")
    assert(got(3L) == (1L, 0L, 0.0, true), s"doc3=${got(3L)}")
    // doc 4: Y repeats within the doc but exists nowhere else — the
    // countDistinct(doc_id) >= 2 rule must NOT flag it
    assert(got(4L) == (2L, 0L, 0.0, true), s"doc4=${got(4L)}")
  }

  test("d11: exactly-half duplication keeps the doc (2·dup ≤ n boundary)") {
    import spark.implicits._
    val shared = (1 to 32).map("s" + _).mkString(" ")
    val docs = Seq(
      (1L, s"$shared ${(1 to 32).map("a" + _).mkString(" ")}"), // 1 of 2 dup
      (2L, shared)
    ).toDF("doc_id", "text")
    val got = TextDedup.chunkDedupOf(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getBoolean(4)))).toMap
    assert(got(1L) == (2L, 1L, true), s"doc1=${got(1L)}") // 2·1 ≤ 2 → keep
    assert(got(2L) == (1L, 1L, false), s"doc2=${got(2L)}") // 2·1 > 1 → drop
  }

  test("t13: top-bigram fraction counts multiplicity of the modal bigram") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),    // bigrams: ab ba ab ba ab → top "a b" ×3 of 5
      (2L, "x y z w"),        // all 3 bigrams distinct → top 1 of 3
      (3L, "q")               // <2 tokens → filtered out
    ).toDF("doc_id", "text")
    val got = TextDedup.topBigramFracOf(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) == (5L, 3L, 0.6), s"doc1=${got(1L)}")
    assert(got(2L) == (3L, 1L, 0.333333), s"doc2=${got(2L)}")
    assert(!got.contains(3L), "single-token docs have no bigrams")
  }

  test("p5: over-represented language downsampled to the 20% cap, minority kept whole") {
    import spark.implicits._
    // lang A: 80/100 docs (rate 0.2·100/80 = 0.25 → bucket < 250);
    // lang B: 20/100 (rate 1.0 → always kept)
    val docs = ((0 until 80).map(i => (i.toLong, s"alpha doc $i unique words", "A"))
      ++ (80 until 100).map(i => (i.toLong, s"beta doc $i other words", "B")))
      .toDF("doc_id", "text", "lang")
    val got = TextDedup.langRebalanceOf(docs)
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val aKept = got.filter(_._2._1 == "A").count(_._2._4)
    val bKept = got.filter(_._2._1 == "B").count(_._2._4)
    assert(bKept == 20, s"minority language must be untouched, kept $bKept/20")
    // the A sample is the exact bucket rule, not a float rate
    val aExpected = got.filter(_._2._1 == "A").count(_._2._2 < 250)
    assert(aKept == aExpected, s"kept $aKept != bucket<250 count $aExpected")
    assert(aKept > 0 && aKept < 80, s"cap must bite: kept $aKept/80")
    // content-hash decision ⇒ bit-identical on a rerun
    val again = TextDedup.langRebalanceOf(docs)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    assert(got.map { case (k, v) => k -> v._4 } == again)
  }

  test("p7: temperature rates are exact per-mille sqrt, rarest language keeps everything") {
    import spark.implicits._
    // lang A: 4 docs, lang B: 1 doc → n_min = 1;
    // rate_A = round(1000·√(1/4)) = 500, rate_B = 1000 (all kept)
    val docs = ((0 until 4).map(i => (i.toLong, s"alpha doc $i some words", "A"))
      ++ Seq((9L, "beta doc nine words", "B"))).toDF("doc_id", "text", "lang")
    val got = TextDedup.tempRebalanceOf(docs)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.values.filter(_._1 == "A").forall(_._4 == 500L),
      s"rate_A must be 500 pm: $got")
    assert(got(9L)._4 == 1000L && got(9L)._5,
      "rarest language keeps rate 1000 pm and every doc")
    // the keep decision IS the integer bucket rule for every row
    got.values.foreach { case (_, bucket, _, rate, keep) =>
      assert(keep == (bucket < rate))
    }
  }

  test("t16: bigram-LM cross-entropy matches an independent in-memory twin on random corpora") {
    import spark.implicits._
    // the twin re-derives EVERYTHING from raw text — normalization,
    // md5 split buckets, bigram counts, Laplace smoothing, micro-nat
    // snap — sharing no Spark code with the implementation under test
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(text: String): String = {
      val norm = text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
      val b = Integer.parseInt(md5hex(norm).take(4), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    def tokens(text: String): Array[String] =
      text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 30).map("w" + _)
    for (trial <- 1 to 3) {
      val docs = (1 to 100).map { i =>
        (i.toLong, (0 until (1 + rnd.nextInt(30)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val bySplit = docs.map { case (id, t) => (id, t, split(t)) }
      val trainDocs = bySplit.filter(_._3 == "train")
      val cb = scala.collection.mutable.Map[(String, String), Long]()
      trainDocs.foreach { case (_, t, _) =>
        tokens(t).sliding(2).filter(_.length == 2)
          .foreach(p => cb((p(0), p(1))) = cb.getOrElse((p(0), p(1)), 0L) + 1)
      }
      val cw = cb.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
      val v = trainDocs.flatMap(d => tokens(d._2)).distinct.size.toLong
      val expected = bySplit.flatMap { case (id, t, sp) =>
        val bgs = tokens(t).sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1))).toSeq
        if (bgs.isEmpty) None
        else {
          // HALF_UP (away from zero), matching SQL round on these
          // negative ln-ratios — math.round would round -x.5 toward zero
          val slnp = bgs.map { b =>
            BigDecimal((math.log(cb.getOrElse(b, 0L) + 1.0)
              - math.log(cw.getOrElse(b._1, 0L) + v.toDouble)) * 1e6)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          }.sum
          val x = BigDecimal(-slnp.toDouble / (bgs.size * 1e6))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some(id -> (sp, bgs.size.toLong, x))
        }
      }.toMap
      val got = TextDedup.bigramLmXentOf(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
      assert(got == expected, s"trial $trial: spark=$got expected=$expected")
    }
  }

  test("t17: n-gram novelty matches an independent twin; train docs are never novel") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(text: String): String = {
      val norm = text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
      val b = Integer.parseInt(md5hex(norm).take(4), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    def bigrams(text: String): Seq[(String, String)] =
      text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 20).map("w" + _)
    for (trial <- 1 to 3) {
      // len 1 forces the zero-bigram guard through the left join
      val docs = (1 to 100).map { i =>
        (i.toLong, (0 until (1 + rnd.nextInt(20)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val bySplit = docs.map { case (id, t) => (id, t, split(t)) }
      val trainVocab = bySplit.filter(_._3 == "train")
        .flatMap(d => bigrams(d._2)).toSet
      val expected = bySplit.map { case (id, t, sp) =>
        val bgs = bigrams(t).distinct
        val novel = bgs.count(b => !trainVocab.contains(b)).toLong
        val novelty = if (bgs.nonEmpty)
          BigDecimal(novel.toDouble / bgs.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
        id -> ((sp, bgs.size.toLong, novel, novelty))
      }.toMap
      val got = TextDedup.ngramNoveltyOf(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(got == expected, s"trial $trial: spark=$got expected=$expected")
      got.values.filter(_._1 == "train").foreach { v =>
        assert(v._3 == 0L && v._4 == 0.0, s"train doc with novelty: $v")
      }
      assert(got.values.exists(v => v._1 != "train" && v._3 > 0),
        "corpus must exercise a genuinely novel bigram")
    }
  }

  test("p10: dataset card matches a local recomputation, zero-admission cell included") {
    import spark.implicits._
    val Stop = Set("the", "a", "of", "and", "is", "to")
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(text: String): String = {
      val norm = text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
      val b = Integer.parseInt(md5hex(norm).take(4), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    // the IngestPropertySpec twin, written from the definition
    def sig(text: String): (Int, Double, Double) = {
      val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").toSeq
      val n = toks.length
      val quality = round6(math.min(n / 50.0, 1.0) * 0.3
        + (toks.distinct.length.toDouble / n) * 0.3
        + (toks.count(Stop).toDouble / n) * 0.2
        + (toks.count(_.length >= 4).toDouble / n) * 0.2)
      val rep = if (n >= 2)
        round6(1.0 - toks.sliding(2).map(_.mkString(" "))
          .toSeq.distinct.length.toDouble / (n - 1))
      else 0.0
      (n, quality, rep)
    }
    val rnd = new scala.util.Random(23)
    val vocab = (1 to 40).map("token" + _)
    // lang Z docs are all two tokens → every Z cell admits nothing
    val docs = (1 to 120).map { i =>
      if (i % 10 == 0) (i.toLong, s"za$i zb$i", "Z")
      else (i.toLong, (0 until (1 + rnd.nextInt(50)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "), "A")
    }
    val expected = docs
      .map { case (id, t, lang) =>
        val (n, q, rep) = sig(t)
        (split(t), lang, n, q, n >= 20 && rep <= 0.10 && q >= 0.55)
      }
      .groupBy(x => (x._1, x._2)).map { case ((sp, lang), rows) =>
        val units = rows.map(r => math.round(r._4 * 1e6)).sum
        val den = rows.size * 1000000L
        val mean = ((units * 1000000L + den / 2) / den) / 1e6
        val nAdm = rows.count(_._5).toLong
        (sp, lang) -> ((rows.size.toLong, rows.map(_._3.toLong).sum, mean,
          nAdm, round6(nAdm.toDouble / rows.size)))
      }
    val got = TextDedup.datasetCardOf(docs.toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got == expected, s"spark=$got expected=$expected")
    val zCells = got.filter(_._1._2 == "Z").values
    assert(zCells.nonEmpty && zCells.forall(v => v._4 == 0L && v._5 == 0.0),
      "the engineered lang-Z cells must admit nothing")
  }

  test("p11: annealing keep is the decile-rate bucket rule, twin-checked over the harness corpus") {
    import org.apache.spark.sql.functions.col
    val Stop = Set("the", "a", "of", "and", "is", "to")
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // independent twin: quality formula, global desc rank, decile, the
    // "ann:"-salted bucket, and the linear rate schedule
    val scored = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").toSeq
      val n = toks.length
      val q = round6(math.min(n / 50.0, 1.0) * 0.3
        + (toks.distinct.length.toDouble / n) * 0.3
        + (toks.count(Stop).toDouble / n) * 0.2
        + (toks.count(_.length >= 4).toDouble / n) * 0.2)
      val norm = text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
      val bucket = Integer.parseInt(md5hex("ann:" + norm).take(4), 16) % 1000
      (id, q, bucket.toLong)
    }
    val nTotal = scored.length.toLong
    val expected = scored.sortBy { case (id, q, _) => (-q, id) }.zipWithIndex
      .map { case ((id, q, bucket), rank0) =>
        val decile = rank0.toLong * 10 / nTotal
        val rate = 1000L - decile * 100L
        id -> ((q, decile, rate, bucket, bucket < rate))
      }.toMap
    val got = TextDedup.p11AnnealMix(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got == expected, s"first diff: ${
      expected.collect { case (k, v) if got.get(k) != Some(v) =>
        (k, got.get(k), v) }.take(3)}")
    // the schedule must bite: the best decile keeps everything, the
    // worst rejects most
    val byDecile = got.values.groupBy(_._2)
    assert(byDecile(0L).forall(_._5), "decile 0 must keep all")
    val worst = byDecile(byDecile.keys.max)
    assert(worst.count(_._5) < worst.size, "the worst decile must reject")
  }

  test("d16: source cells are unordered (least/greatest) and the mean is the exact grid average") {
    import spark.implicits._
    val docs = Seq((1L, "srcB"), (2L, "srcA"), (3L, "srcA"), (4L, "srcC"))
      .toDF("doc_id", "source")
    // pair (1,2) arrives as (B,A) by id order and must land in the (A,B)
    // cell with pair (3,1)'s (A,B); (2,3) is the within-source cell
    val pairs = Seq((1L, 2L, 0.8), (1L, 3L, 0.9), (2L, 3L, 0.811111),
      (2L, 4L, 0.95)).toDF("id_a", "id_b", "jaccard")
    val got = TextDedup.sourceOverlapOf(pairs, docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    def gridMean(js: Seq[Double]): Double = {
      val units = js.map(j => math.round(j * 1e6)).sum
      val den = js.size * 1000000L
      ((units * 1000000L + den / 2) / den) / 1e6
    }
    assert(got == Map(
      ("srcA", "srcB") -> ((2L, gridMean(Seq(0.8, 0.9)))),
      ("srcA", "srcA") -> ((1L, 0.811111)),
      ("srcA", "srcC") -> ((1L, 0.95))), s"got $got")
  }

  test("d15: the leak bit is exactly the train-boundary straddle of the pair's splits") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(text: String): String = {
      val norm = text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
      val b = Integer.parseInt(md5hex(norm).take(4), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val rnd = new scala.util.Random(31)
    // enough docs that train, val and test all appear
    val docs = (1 to 60).map(i =>
      (i.toLong, (0 until 5).map(_ => s"w${rnd.nextInt(9)}").mkString(" ")))
    val splits = docs.map { case (id, t) => id -> split(t) }.toMap
    assert(splits.values.toSet.size == 3, "corpus must hit all three splits")
    // injected pair table: every adjacent doc pair
    val pairs = (1 until 60).map(i => (i.toLong, (i + 1).toLong, 0.9))
    val got = TextDedup.splitLeakageOf(
        pairs.toDF("id_a", "id_b", "jaccard"), docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(3), r.getString(4), r.getBoolean(5)))).toMap
    assert(got.size == pairs.size)
    got.foreach { case ((a, b), (sa, sb, leaks)) =>
      assert(sa == splits(a) && sb == splits(b))
      assert(leaks == ((sa == "train") != (sb == "train")),
        s"pair ($a,$b) splits ($sa,$sb): leaks=$leaks")
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "both leak verdicts must occur")
  }

  test("d17: keeper is the longest text, doc_id breaks ties; singletons keep themselves") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "component")
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L))
      .toDF("doc_id", "n_chars")
    val got = TextDedup.canonicalSelectOf(labels, docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      // ties at 30 chars → smaller doc_id 2 is the keeper of component 1
      1L -> ((1L, 10L, 2L, false)),
      2L -> ((1L, 30L, 2L, true)),
      3L -> ((1L, 30L, 2L, false)),
      4L -> ((4L, 5L, 4L, true))), s"got $got")
  }

  test("p13: savings are the non-keeper token mass, attributed to the dropped doc's source") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 1L))
      .toDF("doc_id", "component")
    val docs = Seq(
      (1L, "srcA", 20L, "a b c d"), // keeper of component 1 (4 tokens)
      (2L, "srcA", 10L, "a b c"),   // dropped (3 tokens)
      (3L, "srcB", 5L, "x y"),      // singleton keeps (2 tokens)
      (4L, "srcB", 8L, "q q q")     // cross-source member of comp 1 → dropped
    ).toDF("doc_id", "source", "n_chars", "text")
    val got = TextDedup.dedupSavingsOf(labels, docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == Map(
      "srcA" -> ((2L, 7L, 1L, 4L, 0.428571)),
      "srcB" -> ((2L, 5L, 1L, 2L, 0.6))), s"got $got")
  }
}
