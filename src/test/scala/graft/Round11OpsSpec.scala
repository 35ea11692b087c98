package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Independent-twin checks for the round-11 session operators (p21
  * CCNet perplexity buckets, p22 dedup-quality calibration, t26
  * tokenizer fertility, t27 n-gram entropy curve): each test recomputes
  * the semantics driver-side from the raw parquet, sharing no Spark
  * plan with the code under test. The distributed exact-rank + closed-
  * form NTILE machinery p21/p22 ride gets its own direct unit test
  * against the textbook NTILE definition.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+", -1)

  private def halfUpMicro(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Textbook NTILE(k): first n mod k buckets get ⌈n/k⌉ rows. */
  private def refNtile(r: Long, n: Long, k: Int): Long = {
    val q = n / k
    val rem = n % k
    if (r <= rem * (q + 1)) (r + q) / (q + 1)
    else rem + (r - rem * (q + 1) + q - 1) / q
  }

  /** Per-doc unigram xent under the corpus LM — t12's math, recomputed
    * driver-side (shared by the p21 twin).
    */
  private def unigramXentTwin(
      docs: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val tfm = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (tok, g) => (id, tok, g.size.toLong) }
    }
    val vocab = tfm.groupBy(_._2).map { case (tok, g) =>
      (tok, g.map(_._3).sum)
    }
    val lncMicro = vocab.map { case (tok, c) =>
      (tok, halfUpMicro(math.log(c.toDouble)))
    }
    val nTotal = vocab.values.sum
    tfm.groupBy(_._1).map { case (id, g) =>
      val slnc = g.map(r => r._3 * lncMicro(r._2)).sum
      val nTok = g.map(_._3).sum
      (id, (nTok,
        round6(math.log(nTotal.toDouble) - slnc.toDouble / (nTok * 1e6))))
    }
  }

  test("ntileFromRank matches textbook NTILE for every (r, n ≤ 25, k)") {
    import spark.implicits._
    val cases = for {
      n <- 1L to 25L; k <- Seq(3, 10); r <- 1L to n
    } yield (r, n, k)
    // evaluate the closed form through the real Column expression
    for (k <- Seq(3, 10)) {
      val in = cases.filter(_._3 == k).map(c => (c._1, c._2)).toDF("r", "n")
      val got = in.select(col("r"), col("n"),
          graft.queries.TextDedup.ntileFromRank(col("r"), col("n"), k))
        .collect().map(row => ((row.getLong(0), row.getLong(1)), row.getLong(2)))
        .toMap
      cases.filter(_._3 == k).foreach { case (r, n, _) =>
        assert(got((r, n)) == refNtile(r, n, k),
          s"ntile($k) mismatch at r=$r n=$n")
      }
    }
  }

  test("exactRankWithin: ranks are the per-group sort permutation") {
    import spark.implicits._
    val rows = (1 to 97).map(i =>
      (s"g${i % 3}", (i * 37 % 19).toDouble, i.toLong))
    val df = rows.toDF("grp", "score", "id")
    val ranked = graft.queries.TextDedup
      .exactRankWithin(df, "grp", Seq(col("score"), col("id")), 8)
      .select(col("grp"), col("score"), col("id"), col("r"), col("n_grp"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (g, members) =>
      val expect = members.sortBy(m => (m._2, m._3)).zipWithIndex
        .map { case (m, i) => (m._3, i + 1L) }.toMap
      val got = ranked.filter(_._1 == g)
      assert(got.forall(_._5 == members.size), s"n_grp wrong for $g")
      got.foreach { r =>
        assert(r._4 == expect(r._3), s"rank mismatch for id=${r._3} in $g")
      }
    }
  }

  test("p21: perplexity buckets match a driver-side CCNet twin") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val xent = unigramXentTwin(docs.map(d => (d._1, d._3)))
    val exp = docs.groupBy(_._2).toSeq.flatMap { case (lang, members) =>
      val scored = members.map(m => (m._1, xent(m._1)._1, xent(m._1)._2))
        .sortBy(m => (m._3, m._1))
      val n = scored.size.toLong
      scored.zipWithIndex.map { case ((id, nTok, x), i) =>
        val b = refNtile(i + 1L, n, 3)
        (lang, if (b == 1) "head" else if (b == 2) "middle" else "tail",
          id, nTok, x)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((lang, bucket), g) =>
      val sx = g.map(r => halfUpMicro(r._5)).sum
      (lang, bucket, g.size.toLong, g.map(_._4).sum,
        round6(sx.toDouble / g.size / 1e6))
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = graft.queries.TextDedup.p21PerplexityBuckets(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == exp)
    // every language must land exactly three buckets at this SF
    assert(got.groupBy(_._1).values.forall(_.size == 3))
  }

  test("p22: quality-decile dup rates match a driver-side twin") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val quality = docs.map { case (id, t) =>
      val ts = toks(t)
      val n = ts.length
      val q = round6(math.min(n / 50.0, 1.0) * 0.3
        + (ts.distinct.length.toDouble / n) * 0.3
        + (ts.count(Set("the", "a", "of", "and", "is", "to")).toDouble / n) * 0.2
        + (ts.count(_.length >= 4).toDouble / n) * 0.2)
      (id, q)
    }.toMap
    val hashes = docs.map { case (id, t) =>
      (id, md5hex(t.trim.toLowerCase.replaceAll("\\s+", " ")))
    }
    val counts = hashes.groupBy(_._2).map { case (h, g) => (h, g.size) }
    val isDup = hashes.map { case (id, h) => (id, counts(h) > 1) }.toMap
    val sorted = docs.map(_._1).sortBy(id => (-quality(id), id))
    val n = sorted.size.toLong
    val exp = sorted.zipWithIndex
      .map { case (id, i) => (refNtile(i + 1L, n, 10), id) }
      .groupBy(_._1).map { case (dec, g) =>
        val ids = g.map(_._2)
        val dups = ids.count(isDup)
        val sq = ids.map(id => halfUpMicro(quality(id))).sum
        (dec, ids.size.toLong, dups.toLong,
          round6(dups.toDouble / ids.size),
          round6(sq.toDouble / ids.size / 1e6))
      }.toSeq.sortBy(_._1)
    val got = graft.queries.TextDedup.p22QualityDupLift(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == exp)
    assert(got.map(_._2).sum == docs.size.toLong)
  }

  test("p23: DoReMi step matches a driver-side twin over the gated KL") {
    val kl = graft.queries.TextDedup.t25SourceDivergence(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
    val nTotal = kl.map(_._2).sum
    val rows = kl.map { case (src, n, k) =>
      val base = round6(n.toDouble / nTotal)
      val boosted = round6(base * math.exp(1.0 * k))
      (src, n, k, base, boosted, halfUpMicro(boosted))
    }
    val z = rows.map(_._6).sum
    val exp = rows.map(r => (r._1, r._2, r._3, r._4, r._5,
      round6(r._6.toDouble / z.toDouble))).sortBy(_._1)
    val got = graft.queries.TextDedup.p23DoremiStep(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == exp)
    // weights normalize (up to the per-source 6-decimal round) and the
    // most divergent source is boosted ABOVE its base share
    assert(math.abs(got.map(_._6).sum - 1.0) < got.size * 1e-6 + 1e-9)
    val maxKl = got.maxBy(_._3)
    assert(maxKl._6 >= maxKl._4,
      s"most divergent source ${maxKl._1} not up-weighted")
  }

  test("t26: tokenizer fertility matches a driver-side twin") {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val exp = docs.groupBy(_._1).map { case (lang, g) =>
      val nToks = g.map(d => toks(d._2).length.toLong).sum
      val chars = g.map(d => d._2.codePointCount(0, d._2.length).toLong).sum
      val bytes = g.map(d => d._2.getBytes("UTF-8").length.toLong).sum
      (lang, g.size.toLong, nToks, chars, bytes,
        round6(chars.toDouble / nToks), round6(bytes.toDouble / nToks))
    }.toSeq.sortBy(_._1)
    val got = graft.queries.TextDedup.t26TokenFertility(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == exp)
  }

  test("t27: n-gram entropy curve matches a driver-side twin") {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    def grams(t: String, k: Int): Seq[String] = {
      val ts = toks(t).toSeq
      if (ts.length < k) Nil else ts.sliding(k).map(_.mkString(" ")).toSeq
    }
    val exp = (for {
      k <- Seq(1, 2, 3)
      (src, bySrc) <- docs.groupBy(_._1)
    } yield {
      val cnts = bySrc.flatMap(d => grams(d._2, k))
        .groupBy(identity).map { case (_, g) => g.size.toLong }
      val nGrams = cnts.sum
      val vocab = cnts.size.toLong
      val sclnc = cnts.map(c =>
        BigInt(c) * BigInt(halfUpMicro(math.log(c.toDouble)))).sum
      (src, k, nGrams, vocab,
        round6(math.log(nGrams.toDouble)
          - sclnc.toDouble / (nGrams.toDouble * 1e6)))
    }).sortBy(r => (r._1, r._2))
    val got = graft.queries.TextDedup.t27NgramEntropy(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == exp)
    // entropy must be non-decreasing in n for every source (more context
    // = more distinct grams) on this corpus
    got.groupBy(_._1).values.foreach { rows =>
      val h = rows.sortBy(_._2).map(_._5)
      assert(h(0) <= h(1) + 1e-9 && h(1) <= h(2) + 1e-9, rows.toString)
    }
  }
}
