package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 session operators and scale-valve changes: the d33
  * hot-fingerprint cap, the scale-aware d9b/d6b stop-shingle fraction,
  * and this round's new operators — driver-side twins and the cut
  * semantics the oracle hash can't localize.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("winnowPairsCapped: the cap cuts hot-fingerprint pairs " +
      "deterministically by doc_id rank") {
    import spark.implicits._
    // 5 docs all carrying fingerprints 10 and 20 (a hot bucket), plus
    // docs 1 and 2 sharing the cold fingerprints 30 and 40
    val fp = (for (id <- 1L to 5L; f <- Seq(10L, 20L)) yield (id, f))
      .++(Seq((1L, 30L), (2L, 30L), (1L, 40L), (2L, 40L)))
      .toDF("doc_id", "fp")
    def pairsAt(cap: Int): Set[(Long, Long)] =
      graft.queries.TextDedup.winnowPairsCapped(fp, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped: all C(5,2) hot pairs (each shares fps 10 AND 20)
    val un = pairsAt(Int.MaxValue)
    assert(un == (for (a <- 1L to 5L; b <- a + 1 to 5L) yield (a, b)).toSet)
    // cap 2: per fingerprint only doc_ids {1, 2} survive the rank —
    // hot pairs collapse to (1,2); the cold fps 30/40 also pair (1,2)
    assert(pairsAt(2) == Set((1L, 2L)))
    // cap 3: hot bucket keeps {1,2,3} → pairs among them only
    assert(pairsAt(3) ==
      (for (a <- 1L to 3L; b <- a + 1 to 3L) yield (a, b)).toSet)
    // a dropped pair survives via other uncapped fingerprints: give
    // docs 4 and 5 two private cold fps — the hot-bucket cut no longer
    // removes them from the answer
    val fp2 = fp.unionAll(Seq((4L, 50L), (5L, 50L), (4L, 60L), (5L, 60L))
      .toDF("doc_id", "fp"))
    assert(graft.queries.TextDedup.winnowPairsCapped(fp2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (4L, 5L)))
  }

  test("stopShingleCap: fraction of corpus size, floored at 4") {
    import graft.queries.TextDedup.stopShingleCap
    // tiny corpora: the floor holds (gate scale 500 lands exactly on 4)
    assert(stopShingleCap(0L) == 4L)
    assert(stopShingleCap(100L) == 4L)
    assert(stopShingleCap(500L) == 4L)
    // the valve loosens with corpus size: 0.8% of documents
    assert(stopShingleCap(5000L) == 40L)
    assert(stopShingleCap(50000000L) == 400000L)
    // a df just under the fraction survives, just over is cut — the
    // semantics the oracles mirror with greatest(4, count(*) // 125)
    assert(stopShingleCap(624L) == 4L) // 624/125 = 4 (floor)
    assert(stopShingleCap(625L) == 5L)
  }

  test("scale-aware valve: a fixed-df shingle flips from cut to kept " +
      "as the corpus grows around it") {
    import spark.implicits._
    // 10 docs share one boilerplate 3-shingle line (df 10); two docs
    // are genuine near-dups through their remaining text
    def corpus(nFiller: Int) = {
      val boiler = (1 to 10).map(i =>
        (i.toLong, s"the same header line plus unique$i tail$i word$i"))
      val filler = (101 to 100 + nFiller).map(i =>
        (i.toLong, s"filler$i text$i body$i alpha$i beta$i gamma$i"))
      (boiler ++ filler).toDF("doc_id", "text")
    }
    // kept postings of the 10 boilerplate docs only: each has 6
    // shingles — 3 shared (df 10) + 3 unique (df 1)
    def keptBoilerPostings(nFiller: Int): Long = {
      val docs = corpus(nFiller)
      val idx = graft.queries.TextDedup.shingleIndex(docs)
      graft.queries.TextDedup.capShingleDf(idx,
          graft.queries.TextDedup.stopShingleCap(docs.count()))
        .filter(col("doc_id") <= 10L).count()
    }
    // small corpus (60 docs → cap 4): the df-10 boilerplate shingles
    // are cut (30 kept); big corpus (1500 docs → cap 12): the same
    // shingles are now below 0.8% of documents and survive (60 kept)
    assert(keptBoilerPostings(50) == 30L)
    assert(keptBoilerPostings(1490) == 60L)
    // directly: df=10 > cap(60)=4 but ≤ cap(1500)=12
    assert(graft.queries.TextDedup.stopShingleCap(60L) < 10L)
    assert(graft.queries.TextDedup.stopShingleCap(1500L) >= 10L)
  }

  test("capHotPostings: rank-caps a surviving posting list by doc_id; " +
      "sizes and intersections stay in the shared capped space") {
    import spark.implicits._
    // one shingle held by 5 docs (survives a loose valve), plus a
    // private shingle per doc
    val idx = ((1L to 5L).map(id => (id, "common shingle here")) ++
      (1L to 5L).map(id => (id, s"private shingle $id")))
      .toDF("doc_id", "shingle")
    val capped = graft.queries.TextDedup.capHotPostings(idx, 3L)
    // docs 1-3 keep both postings; docs 4-5 lose the hot one only
    val kept = capped.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    // never binds below the cap: identity on the gate-scale shape
    assert(graft.queries.TextDedup.capHotPostings(idx, 5L).count()
      == idx.count())
    // and d6b/d9b at gate scale are unaffected (max df at sf0.001 is
    // far below HotPostingCap = 256): the capped query equals a run
    // with the rank cap disabled
    val withCap = graft.queries.TextDedup
      .d6bJaccardCapped(spark, dir).collect().toSeq
    val noCap = graft.queries.TextDedup.ngramJaccard(spark, dir,
        maxShingleDf = Some(graft.queries.TextDedup.stopShingleCap(
          Tables.documents(spark, dir).count())),
        hotPostingCap = Long.MaxValue)
      .collect().toSeq
    assert(withCap == noCap)
  }

  test("d36 boiler audit: the (df desc, shingle) top-100 of exactly " +
      "the set capShingleDf cuts") {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val cap = graft.queries.TextDedup.stopShingleCap(n)
    val idx = graft.queries.TextDedup.shingleIndex(docs)
    // driver-side expectation: over-cap dfs ranked on the total order
    val expected = idx.groupBy("shingle").count()
      .filter(col("count") > cap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, df) => (-df, s) }.take(100).toSeq
    val audit = graft.queries.TextDedup.d36BoilerShingles(spark, dir)
      .collect()
    assert(audit.map(r => (r.getString(0), r.getLong(1))).toSeq == expected)
    // every audited shingle is genuinely in the valve's anti-join cut set
    val cutShingles = idx
      .join(graft.queries.TextDedup.capShingleDf(idx, cap),
        Seq("doc_id", "shingle"), "left_anti")
      .select("shingle").distinct()
      .collect().map(_.getString(0)).toSet
    assert(audit.map(_.getString(0)).forall(cutShingles))
    // share and pair-work arithmetic
    audit.foreach { r =>
      val (df, pm, pw) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(df > cap)
      assert(pm == (df * 1000L + n / 2) / n)
      assert(pw == df * (df - 1) / 2)
    }
  }

  test("d9w winnow containment: detects prefix containment on a " +
      "synthetic corpus; rows stay in the [0.9, 1] band, ordered") {
    import spark.implicits._
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val extra = (1 to 40).map(i => s"tail$i").mkString(" ")
    val docs = Seq(
      (1L, body, "en", "s"),                     // contained
      (2L, s"$body $extra", "en", "s"),          // container
      (3L, (1 to 80).map(i => s"other$i").mkString(" "), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("d9w").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextDedup.d9wContainmentWinnow(spark, dir)
      .collect()
    // doc 1's winnow selections nearly all recur in doc 2 (only the
    // suffix-boundary windows can differ), so the directional verdict
    // must surface (1 contained-in 2) and NOT claim 2-in-1 (doc 2 has
    // ~40% more selections than it shares)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing 1-in-2: ${pairs.mkString(",")}")
    assert(!pairs.contains((2L, 1L)))
    assert(pairs.forall { case (a, b) => a != 3L && b != 3L })
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= 0.9 && c <= 1.0)
    }
    val sorted = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(sorted.toSeq == sorted.toSeq.sorted)
  }

  test("winnowPairs asset: matches a from-scratch driver twin in the " +
      "wide 36-bit space; memoized across calls") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    // first 9 hex chars of md5 = top 36 bits:
    // d0 << 28 | d1 << 20 | d2 << 12 | d3 << 4 | d4 >> 4
    def hashesOf(text: String): Array[Long] = {
      val ts = text.trim.toLowerCase.split("\\s+")
      if (ts.length < 3) Array.empty
      else ts.sliding(3).map { sh =>
        md.reset()
        val d = md.digest(sh.mkString(" ").getBytes("UTF-8"))
        ((d(0) & 0xffL) << 28) | ((d(1) & 0xffL) << 20) |
          ((d(2) & 0xffL) << 12) | ((d(3) & 0xffL) << 4) |
          ((d(4) & 0xf0L) >> 4)
      }.toArray
    }
    val w = graft.queries.TextDedup.WinnowW
    val cap = graft.queries.TextDedup.WinnowSweepCap
    val fps = docs.map { case (id, t) =>
      val hs = hashesOf(t)
      id -> (if (hs.length < w) Set.empty[Long]
        else (0 to hs.length - w).map { i =>
          (i until i + w)
            .map(j => hs(j) * 16777216L + (16777215L - j)).min
        }.map(_ / 16777216L).toSet)
    }
    val posting = fps.flatMap { case (id, s) => s.map(f => (f, id)) }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(cap).toSet).toMap
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b
      shared = (fa & fb).count(f =>
        posting(f).contains(a) && posting(f).contains(b))
      if shared >= 2
    } yield (a, b)).toSet
    val got = graft.queries.TextDedup.winnowPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"got ${got.size} pairs, expected ${expected.size}; " +
        s"diff=${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    assert(got.nonEmpty, "the harness corpus has near-dups; the wide " +
      "winnow index must recover some of them")
    // the memo returns the same materialization (one registered path)
    val n1 = graft.RunAssets.registered.count(_.contains("winnowpairs"))
    graft.queries.TextDedup.winnowPairs(spark, dir).count()
    val n2 = graft.RunAssets.registered.count(_.contains("winnowpairs"))
    assert(n1 == n2 && n1 >= 1)
  }

  test("m12b: stride-4 lattice covers every image m12 covers, with " +
      "exact lattice cardinality and in-range means") {
    val full = graft.multimodal.Multimodal.m12ColorStats(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val samp = graft.multimodal.Multimodal
      .m12bColorStatsSampled(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(8)))
    assert(samp.map(_._1).toSet == full.keySet, "doc coverage differs")
    samp.foreach { case (id, w, h, n, mean) =>
      assert((w, h) == full(id), s"dims for $id")
      // x = 0, 4, 8, … < w → ceil(w/4) per axis
      assert(n == ((w + 3) / 4) * ((h + 3) / 4), s"lattice count for $id")
      assert(mean >= 0.0 && mean <= 255.0, s"mean for $id")
    }
    assert(samp.nonEmpty)
  }
}
