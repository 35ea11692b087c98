package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Independent-twin checks for the round-9 session operators (d22
  * sliding-window exact-substring dedup, t23 tf-idf keywords, e24 path
  * trigrams, s20 IVF-PQ): each test recomputes the semantics
  * driver-side from the raw parquet — or a crafted corpus with a known
  * answer — sharing no Spark plan with the code under test.
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+", -1)

  /** Driver-side d22: windows, cross-doc dup flags, longest run. */
  private def d22Twin(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] = {
    val wins = docs.flatMap { case (id, text) =>
      val t = toks(text)
      val starts = 0 to math.max(t.length - TextDedupRef.K, 0)
      starts.map { s =>
        (id, s.toLong, md5hex(t.slice(s, s + TextDedupRef.K).mkString(" ")))
      }
    }
    val dupHashes = wins.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    docs.map { case (id, _) =>
      val mine = wins.filter(_._1 == id).sortBy(_._2)
      val flags = mine.map(w => dupHashes.contains(w._3))
      val nDup = flags.count(identity)
      // longest true-run
      var best = 0L; var cur = 0L
      flags.foreach { f =>
        if (f) { cur += 1; best = math.max(best, cur) } else cur = 0
      }
      id -> ((mine.size.toLong, nDup.toLong, best,
        if (best > 0) best + TextDedupRef.K - 1 else 0L))
    }.toMap
  }

  test("d22: crafted corpus — a 20-token copied span yields max_run 5, span 20") {
    val sess = spark
    import sess.implicits._
    val span = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi"),
      (2L, s"one two three four $span five six seven eight nine ten eleven " +
        "twelve thirteen"),
      (3L, "totally unrelated text with no shared window at all " +
        "just filler words going on and on and onward"))
      .toDF("doc_id", "text")
    val got = graft.queries.TextDedup.exactSubstrOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    val exp = d22Twin(Seq(
      (1L, docs.collect()(0).getString(1)),
      (2L, docs.collect()(1).getString(1)),
      (3L, docs.collect()(2).getString(1))))
    assert(got == exp)
    // the 20-token span is 5 consecutive 16-token windows in both docs
    assert(got(1L)._3 == 5 && got(1L)._4 == 20, s"doc1: ${got(1L)}")
    assert(got(2L)._3 == 5 && got(2L)._4 == 20)
    assert(got(3L)._2 == 0 && got(3L)._3 == 0 && got(3L)._4 == 0)
  }

  test("d22: sf0.001 corpus matches the driver-side twin exactly") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val exp = d22Twin(docs)
    val got = graft.queries.TextDedup.d22ExactSubstr(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, g) => assert(g == exp(id), s"doc $id") }
    // the corpus must exercise the signal: some doc has a duplicated run
    assert(exp.values.exists(_._3 >= 2),
      "corpus must contain a multi-window duplicated span")
  }

  test("t23: tf-idf top-3 matches a driver-side twin with micro-snapped idf") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val n = docs.size.toDouble
    val tf = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (id, w, g.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val exp = tf.groupBy(_._1).map { case (id, rows) =>
      val scored = rows.map { case (_, w, f) =>
        val idfMicro = BigDecimal(math.log(n / df(w)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (w, f, df(w), f * idfMicro)
      }.toSeq.sortBy(r => (-r._4, r._1)).take(3)
      id -> scored.zipWithIndex.map { case ((w, f, d, s), i) =>
        (i + 1, w, f, d, s)
      }
    }
    val got = graft.queries.TextDedup.t23TfidfKeywords(spark, dir)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).toSeq.map(r =>
          (r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))
      }
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, g) => assert(g == exp(id), s"doc $id") }
  }

  test("e24: top-20 path trigrams match a driver-side twin") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val exp = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val seq = evs.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(3).filter(_.size == 3).map(t => (t(0), t(1), t(2)))
    }.groupBy(identity).map { case (t, g) => (t._1, t._2, t._3, g.size.toLong) }
      .toSeq.sortBy(r => (-r._4, r._1, r._2, r._3)).take(20)
    val got = graft.queries.Events.e24PathTrigrams(spark, dir)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == exp)
    assert(got.size == 20 && got.head._4 >= got.last._4)
  }

  test("s20: refine cosines are exact; probing restricts to ≤2 cells per query") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray)).toList
    val byId = emb.map(e => e._1 -> e).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.queries.Embeddings.s20IvfPq(spark, dir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length),
        s"query $q ranks must be 1..${rs.length}")
      assert(rs.length <= 3)
      // refine leg: the reported cosine is the exact pairwise cosine
      rs.foreach { r =>
        val (_, _, qv) = byId(q)
        val (_, _, cv) = byId(r.getLong(2))
        val want = round6(dot(qv, cv) / (math.sqrt(dot(qv, qv)) *
          math.sqrt(dot(cv, cv))))
        assert(r.getDouble(4) == want, s"query $q vec ${r.getLong(2)}")
      }
      // coarse leg: results come from at most 2 probed cells
      val labels = rs.map(r => byId(r.getLong(2))._2).distinct
      assert(labels.size <= 2, s"query $q drew from ${labels.size} cells")
      // ADC ordering: descending with vec_id tie-break
      val adcs = rs.sortBy(_.getLong(1)).map(r => (r.getDouble(3), r.getLong(2)))
      assert(adcs.sliding(2).forall {
        case Array((a1, v1), (a2, v2)) => a1 > a2 || (a1 == a2 && v1 < v2)
        case _ => true
      }, s"query $q ADC order")
    }
    // ten query vectors exist at every sf
    assert(byQ.keySet == (0L to 9L).toSet)
  }
  /** Driver-side interval union of a doc's dup-window coverage. */
  private def unionLen(starts: Seq[Long], nTok: Long): Long = {
    var covered = 0L
    var prevEnd = -1L
    starts.sorted.foreach { s =>
      val e = math.min(s + TextDedupRef.K - 1, nTok - 1)
      val from = math.max(prevEnd, s - 1)
      if (e > from) covered += e - from
      prevEnd = math.max(prevEnd, e)
    }
    covered
  }

  test("p19: per-source masked tokens equal a driver-side interval union") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val wins = docs.flatMap { case (id, _, text) =>
      val t = toks(text)
      (0 to math.max(t.length - TextDedupRef.K, 0)).map { s =>
        (id, s.toLong, md5hex(t.slice(s, s + TextDedupRef.K).mkString(" ")))
      }
    }
    val dupHashes = wins.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val nTok = docs.map { case (id, _, t) => id -> toks(t).length.toLong }.toMap
    val maskedByDoc = wins.filter(w => dupHashes.contains(w._3))
      .groupBy(_._1).map { case (id, ws) =>
        id -> unionLen(ws.map(_._2), nTok(id))
      }
    val exp = docs.groupBy(_._2).map { case (src, ds) =>
      val total = ds.map(d => nTok(d._1)).sum
      val masked = ds.map(d => maskedByDoc.getOrElse(d._1, 0L)).sum
      src -> ((ds.size.toLong, total, masked,
        BigDecimal(masked.toDouble / total)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = graft.queries.TextDedup.p19DupMask(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (src, g) => assert(g == exp(src), s"source $src") }
    // overlap must actually be exercised: masked < n_dup_windows * K
    // somewhere, i.e. the union collapsed overlapping windows
    assert(exp.values.exists(_._3 > 0), "some source must have masked tokens")
  }

  test("streaming substrDupAtIngest equals the exact driver-side audit") {
    val sess = spark
    import sess.implicits._
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val standingText = s"opening words $span closing remarks about nothing " +
      "in particular continuing with several more unique filler tokens here"
    val standing = Seq((100L, standingText)).toDF("doc_id", "text")
    val arrivals = Seq(
      // copies the 20-token span → 5 consecutive dup windows
      (1L, s"novel prefix tokens alpha beta $span gamma delta epsilon " +
        "zeta eta theta iota kappa"),
      // entirely novel
      (2L, "completely fresh material sharing no sixteen token window " +
        "with the standing corpus at all whatsoever today tomorrow " +
        "yesterday always never sometimes"),
      // exact copy of the standing document → every window dup
      (3L, standingText))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStreams.substrDupAtIngest(
        mem.toDS().toDF("doc_id", "text"), standing)
      .writeStream.outputMode("append").format("memory")
      .queryName("substr_dup").start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
    } finally q.stop()
    // exact driver-side audit: membership in the standing window set
    val standingWins = {
      val t = toks(standingText)
      (0 to math.max(t.length - TextDedupRef.K, 0))
        .map(s => md5hex(t.slice(s, s + TextDedupRef.K).mkString(" "))).toSet
    }
    val exp = arrivals.map { case (id, text) =>
      val t = toks(text)
      val flags = (0 to math.max(t.length - TextDedupRef.K, 0))
        .map(s => standingWins.contains(
          md5hex(t.slice(s, s + TextDedupRef.K).mkString(" "))))
      var best = 0L; var cur = 0L
      flags.foreach { f =>
        if (f) { cur += 1; best = math.max(best, cur) } else cur = 0
      }
      id -> ((flags.size.toLong, flags.count(identity).toLong, best,
        if (best > 0) best + TextDedupRef.K - 1 else 0L))
    }.toMap
    val got = spark.table("substr_dup").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))).toMap
    assert(got == exp, s"got $got want $exp")
    assert(got(1L)._3 == 5 && got(1L)._4 == 20, "copied span must be found")
    assert(got(2L)._2 == 0, "novel doc must not flag (no false positives here)")
    assert(got(3L)._2 == got(3L)._1, "exact copy flags every window")
  }
}

/** Shared constant for the twin (mirrors TextDedup.DupSpanLen). */
private object TextDedupRef { val K: Int = graft.queries.TextDedup.DupSpanLen }
