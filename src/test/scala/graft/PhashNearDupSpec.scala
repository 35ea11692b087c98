package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** m11's banded-Hamming near-dup, post-rewrite: the packed-long pipeline
  * (conv pack → shift-and-mask bands → bit_count Hamming → cluster
  * expansion) must reproduce the definitional semantics — doc pairs
  * sharing ≥ 1 verbatim 16-char band whose 64-position Hamming distance
  * is ≤ 10 — and the hot-band cap must bound candidate work the way
  * d6b's df cap does (HotKeyGuardSpec discipline). Plus the streaming
  * ingest twin: banded alerts at ingest ≡ batch m11 restricted to
  * new×standing pairs.
  */
class PhashNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** A 64-char '0'/'1' hash: `base` with the bits at `flips` inverted. */
  private def hash(base: String, flips: Int*): String = {
    val b = base.toCharArray
    flips.foreach(i => b(i) = if (b(i) == '0') '1' else '0')
    new String(b)
  }

  // '1' in the first position on purpose: packs to a NEGATIVE long, so
  // the sign-extension handling of every shiftright is exercised.
  private val base = "10110011" * 8

  test("packed pipeline equals brute-force banded-Hamming semantics") {
    import spark.implicits._
    // clusters: docs 1/2 share h0 exactly; docs 3..6 are near h0 (small
    // flips in various bands); docs 7/8 share a far hash (hamming > 10
    // from h0 but sharing band 0 with it); doc 9 is unrelated (differs
    // in every band, never a candidate of anyone).
    val h0 = base
    val rows = Seq(
      1L -> h0, 2L -> h0,
      3L -> hash(base, 0),             // band 0 flip, hamming 1
      4L -> hash(base, 17, 18),        // band 1 flips, hamming 2
      5L -> hash(base, 33, 40, 47),    // band 2 flips, hamming 3
      6L -> hash(base, 63),            // band 3 flip, hamming 1
      7L -> hash(base, 16 to 27: _*),  // 12 flips: shares band 0/2/3, ham 12
      8L -> hash(base, 16 to 27: _*),
      9L -> hash(base, 0, 17, 33, 63, 1, 18, 34, 62, 2, 19, 35, 61))
    val got = Multimodal.phashNearDupOf(rows.toDF("doc_id", "phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet

    // brute force, straight from the definition on the strings
    val expected = (for {
      (ida, pa) <- rows; (idb, pb) <- rows
      if ida < idb
      if (0 until 4).exists(b =>
        pa.substring(b * 16, b * 16 + 16) == pb.substring(b * 16, b * 16 + 16))
      ham = pa.zip(pb).count { case (x, y) => x != y }
      if ham <= 10
    } yield (ida, idb, ham.toLong, ham == 0)).toSet
    assert(expected.nonEmpty && expected.exists(_._4) &&
      expected.exists(!_._4), "fixture must cover exact and near pairs")
    assert(!expected.exists(t => t._1 == 7L || t._2 == 7L || t._1 == 9L
      || t._2 == 9L) || expected.contains((7L, 8L, 0L, true)),
      "7/8 may only pair with each other")
    assert(got == expected, s"got=$got\nexpected=$expected")
  }

  test("hot-band cap bounds candidates; survivors are the lexicographic prefix") {
    import spark.implicits._
    // 8 distinct hashes identical in bands 0-2, differing only in the
    // last 4 bits (pairwise hamming ≤ 4 — every pair is an alert when
    // uncapped). Bands 0-2 are each a hot bucket of 8.
    val hashes = (0 until 8).map { v =>
      val tail = (0 until 4).map(b => if ((v & (1 << b)) != 0) '1' else '0')
      (100L + v) -> (base.take(60) + new String(tail.toArray))
    }
    val df = hashes.toDF("doc_id", "phash")
    val uncapped = Multimodal.phashNearDupOf(df, bandCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 8 * 7 / 2, s"uncapped=${uncapped.size}")
    val capped = Multimodal.phashNearDupOf(df, bandCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap keeps the 4 lexicographically-smallest phashes per hot bucket;
    // band-3 buckets are singletons, so pairs = C(4,2) among that prefix
    val keptDocs = hashes.sortBy(_._2).take(4).map(_._1).toSet
    assert(capped == (for { a <- keptDocs; b <- keptDocs if a < b }
      yield (a, b)), s"capped=$capped keptDocs=$keptDocs")
  }

  test("cap never drops intra-cluster (exact-duplicate) pairs") {
    import spark.implicits._
    // one hash shared by 6 docs plus 7 distinct near hashes to heat the
    // buckets past a cap of 2: the exact pairs must all survive because
    // they route through the cluster table, not the banded join
    val rows = (1L to 6L).map(_ -> base) ++
      (0 until 7).map(i => (10L + i) -> hash(base, 60 + (i % 4), 56 + ((i / 4) % 4)))
    val out = Multimodal.phashNearDupOf(rows.toDF("doc_id", "phash"),
        bandCap = 2)
      .filter(col("exact")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.intersect((for { a <- 1L to 6L; b <- 1L to 6L if a < b }
      yield (a, b)).toSet).size == 15, s"exact pairs lost: $out")
  }

  test("cluster cap bounds expansion to the lowest doc_ids of each cluster") {
    import spark.implicits._
    // one exact-dup cluster of 10 docs plus a near hash (hamming 1) on
    // 3 docs: with clusterCap=4, intra pairs are C(4,2) among the 4
    // lowest ids, and inter pairs expand only 4 x 3 of the 10 x 3
    val near = hash(base, 63)
    val rows = (1L to 10L).map(_ -> base) ++ (21L to 23L).map(_ -> near)
    val out = Multimodal.phashNearDupOf(rows.toDF("doc_id", "phash"),
        clusterCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val intra = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b, 0L)
    val inter = for { a <- 1L to 4L; b <- 21L to 23L } yield (a, b, 1L)
    val nearIntra = for { a <- 21L to 23L; b <- 21L to 23L if a < b }
      yield (a, b, 0L)
    assert(out == (intra ++ inter ++ nearIntra).toSet, s"out=$out")
  }

  test("streaming banded alerts equal batch m11 on the new x standing split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real rasters: standing has A(9x7,s5) and B(16x12,s123); arrivals
    // have a bit-identical copy of A in another container (hamming 0),
    // a near-variant of nothing (novel), and a GIF (never hashed)
    val standing = Seq(
      Multimodal.MediaRow(1L, "image/png",
        Multimodal.MediaGen.imageBytes("png", 9, 7, 5L)),
      Multimodal.MediaRow(2L, "image/png",
        Multimodal.MediaGen.imageBytes("png", 16, 12, 123L))).toDS()
    val arrivals = Seq(
      Multimodal.MediaRow(10L, "image/bmp",
        Multimodal.MediaGen.imageBytes("bmp", 9, 7, 5L)),
      Multimodal.MediaRow(11L, "image/png",
        Multimodal.MediaGen.imageBytes("png", 40, 30, 77L)),
      Multimodal.MediaRow(12L, "video/gif",
        Multimodal.MediaGen.gifBytes(4, 4, 2, 9L)))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Multimodal.MediaRow]
    val q = graft.streaming.CorpusStreams
      .phashNearDupAlerts(mem.toDS(), standing)
      .writeStream.outputMode("append").format("memory")
      .queryName("phash_alerts").start()
    try {
      mem.addData(arrivals.take(1): _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("phash_alerts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch m11 over the union corpus, restricted to new x standing
    val union = standing.union(arrivals.toDS())
    val newIds = Set(10L, 11L, 12L)
    val batch = Multimodal.phashNearDupOf(
        Multimodal.phashOf(union).toDF("doc_id", "phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(t => newIds.contains(t._1) ^ newIds.contains(t._2))
      .map(t => if (newIds.contains(t._1)) (t._1, t._2, t._3)
        else (t._2, t._1, t._3)).toSet
    assert(batch.nonEmpty, "fixture must produce at least one cross pair")
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }
}
