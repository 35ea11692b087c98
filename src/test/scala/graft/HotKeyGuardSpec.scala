package graft

import graft.queries.{Embeddings, TextDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The hot-key guards exist for skewed corpora: one hot shingle / one hot
  * IVF cell contributes O(df²) candidate pairs. These specs build exactly
  * that corpus and assert the capped plans generate a fraction of the
  * candidates — the property that keeps the joins sub-quadratic at
  * 100 TB.
  */
class HotKeyGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pairCandidates(idx: DataFrame): Long =
    idx.as("a").join(idx.as("b"),
      col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id")).count()

  test("stop-shingle df cap collapses the hot-shingle candidate blowup") {
    import spark.implicits._
    // every doc shares the shingle "hot hot hot"; everything else unique
    val docs = (0 until 40)
      .map(i => (i.toLong, s"hot hot hot u$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val idx = TextDedup.shingleIndex(docs)
    val uncapped = pairCandidates(idx)
    val capped = pairCandidates(TextDedup.capShingleDf(idx, 4))
    assert(uncapped == 40L * 39 / 2, s"hot shingle should give C(40,2), got $uncapped")
    assert(capped == 0, s"df cap must drop the hot shingle, got $capped")
  }

  test("capped containment collapses hot-shingle candidates and scores in the filtered space") {
    import spark.implicits._
    // Six boilerplate docs make "k1 k2 k3" and "m1 m2 m3" hot (df 7 > 4).
    // Doc 100 is doc 200's content (w1..w42, 40 shared shingles) wrapped
    // in that boilerplate: 2 hot + 4 unique crossing shingles → raw
    // containment 40/46 ≈ 0.870 (hidden below the 0.9 threshold), capped
    // containment 40/44 ≈ 0.909 (hot dropped from numerator AND
    // denominator). The reverse direction (200 ⊂ 100, 40/41 ≈ 0.976)
    // carries no hot shingles and must be identical in both variants.
    val ws = (1 to 42).map("w" + _).mkString(" ")
    val docs = ((0 until 6).map(i => (i.toLong, s"k1 k2 k3 s$i m1 m2 m3")) ++
      Seq((100L, s"k1 k2 k3 m1 m2 m3 $ws"), (200L, s"$ws z1")))
      .toDF("doc_id", "text")
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val raw = rows(TextDedup.containmentOf(docs, None))
    val capped = rows(TextDedup.containmentOf(docs, Some(4)))
    assert(raw == Set((200L, 100L, 0.97561)), s"raw=$raw")
    assert(capped == Set((100L, 200L, 0.909091), (200L, 100L, 0.97561)),
      s"capped=$capped")
    // and the valve still kills the candidate blowup: the six hot docs
    // pair-join only through the hot shingles, gone after the cap
    val idx = TextDedup.shingleIndex(docs)
    val uncapped = pairCandidates(idx)
    val cappedCands = pairCandidates(TextDedup.capShingleDf(idx, 4))
    assert(uncapped > cappedCands,
      s"uncapped=$uncapped cappedCands=$cappedCands")
    assert(cappedCands == 40, "only the 40 shared w-shingles remain")
  }

  test("salted join on a hot key is row-identical to the plain join and spreads the key") {
    import graft.queries.SkewJoin
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 90% of the fact rows hit key 7 — the classic hot-partition shape
    val big = (0 until 2000)
      .map(i => (i.toLong, if (rng.nextInt(10) < 9) 7L else rng.nextInt(20).toLong))
      .toDF("row_id", "k")
    val small = (0L until 20L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("row_id", "k", "name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedEquiJoin(big, small, "k",
        saltBy = col("row_id"), buckets = 8)
      .select("row_id", "k", "name").collect().map(_.toSeq).toSet
    assert(salted == plain, s"salted=${salted.size} plain=${plain.size}")
    // the hot key really does spread over the salt space
    val spread = big.filter(col("k") === 7)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("row_id")),
        org.apache.spark.sql.functions.lit(8)).as("salt"))
      .distinct().count()
    assert(spread == 8, s"expected the hot key in all 8 salt buckets, got $spread")
  }

  test("salted two-phase top-k returns exactly the plain window top-k") {
    import graft.queries.TopK
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    import spark.implicits._
    val rng = new scala.util.Random(17)
    // deliberate score ties so the tiebreak ordering is exercised
    val df = (0 until 500)
      .map(i => (s"g${i % 3}", i.toLong, rng.nextInt(40)))
      .toDF("grp", "id", "score")
    val order = Seq(col("score").desc, col("id"))
    val plain = df.withColumn("rk",
        row_number().over(Window.partitionBy(col("grp")).orderBy(order: _*)))
      .filter(col("rk") <= 7)
      .select("grp", "rk", "id", "score").collect().map(_.toSeq).toSet
    val salted = TopK.saltedTopK(df, Seq(col("grp")), order, k = 7,
        saltBy = col("id"), salts = 8)
      .select("grp", "rk", "id", "score").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 21)
  }

  test("e9's salted-join hatch is pair-identical to plain e9 on a burst corpus") {
    import graft.queries.Events
    import spark.implicits._
    // burst-within-one-gap skew: user 7 fires 120 views and 40 clicks
    // inside a single 30-min window (all land in ~2 (user, bucket)
    // keys — exactly the residual boundary the hatch exists for), plus
    // normal users spread over hours
    val gapUs = 30L * 60 * 1000 * 1000
    val base = 1700000000L * 1000000
    val burst = (0 until 120).map(i =>
        (7L, 1000L + i, "view", base + i * (gapUs / 200))) ++
      (0 until 40).map(i =>
        (7L, 2000L + i, "click", base + gapUs / 3 + i * (gapUs / 100)))
    val normal = (0 until 50).flatMap { i =>
      val u = 100L + i % 5
      Seq((u, 3000L + 2 * i, "view", base + i * gapUs),
        (u, 3001L + 2 * i, "click", base + i * gapUs + gapUs / 2))
    }
    val ev = (burst ++ normal).toDF("user_id", "event_id", "event_type", "us")
    val plain = Events.intervalJoinPairs(ev).collect().map(_.toSeq).toSeq
    val salted = Events.intervalJoinPairs(ev, saltBuckets = Some(8))
      .collect().map(_.toSeq).toSeq
    assert(plain.nonEmpty, "burst corpus must produce pairs")
    assert(salted == plain,
      s"salted hatch diverged: ${salted.size} vs ${plain.size} pairs")

    // the hatch engages ITSELF from the (user, bucket) df probe: user 7's
    // 120-view burst trips a threshold of 100, so auto takes the salted
    // path (synthetic jk equi-key in the plan) — and stays pair-identical
    val auto = Events.intervalJoinPairsAuto(ev, burstThreshold = 100,
      buckets = 8)
    assert(auto.queryExecution.executedPlan.toString.contains("jk"),
      "burst corpus must auto-engage the salted path")
    assert(auto.collect().map(_.toSeq).toSeq == plain)
    // the normal users alone stay under the threshold: auto keeps the
    // plain bucketized equi-join (probe_bucket in the join key, no jk)
    val calm = normal.toDF("user_id", "event_id", "event_type", "us")
    val autoCalm = Events.intervalJoinPairsAuto(calm, burstThreshold = 100,
      buckets = 8)
    val calmPlan = autoCalm.queryExecution.executedPlan.toString
    assert(calmPlan.contains("probe_bucket") && !calmPlan.contains("jk"),
      s"calm corpus must keep the plain path:\n${calmPlan.take(600)}")
    assert(autoCalm.collect().map(_.toSeq).toSeq ==
      Events.intervalJoinPairs(calm).collect().map(_.toSeq).toSeq)
  }

  test("d13b: hot boilerplate in the increment collapses candidates; verdicts survive in the filtered space") {
    import spark.implicits._
    // Standing corpus: 120 docs all carrying the same boilerplate
    // shingles ("k1 k2 k3" / "m1 m2 m3"), plus one real content doc.
    // Increment: a near-copy of the content doc wrapped in that
    // boilerplate, and a unique doc. Raw space: the increment joins all
    // 120 boilerplate docs through the two hot shingles (240 candidate
    // postings) on top of the 40 genuine content matches; capped space:
    // only the content shingles join.
    val ws = (1 to 42).map("w" + _).mkString(" ")
    val standing = (0 until 120)
      .map(i => (i.toLong, s"k1 k2 k3 s$i m1 m2 m3", false)) ++
      Seq((500L, ws, false))
    val increment = Seq(
      (600L, s"k1 k2 k3 $ws m1 m2 m3", true), // near-dup of 500 + boilerplate
      (601L, (1 to 20).map("q" + _).mkString(" "), true))
    val docs = (standing ++ increment).toDF("doc_id", "text", "is_new")

    def candidates(cap: Option[Long]): Long = {
      val raw = graft.queries.TextDedup.shingleIndex(docs)
      val idx = cap.fold(raw)(graft.queries.TextDedup.capShingleDf(raw, _))
        .join(docs.select(col("doc_id"), col("is_new")), Seq("doc_id"))
      idx.filter(col("is_new")).as("a")
        .join(idx.filter(!col("is_new")).as("b"),
          col("a.shingle") === col("b.shingle")).count()
    }
    val rawCands = candidates(None)
    val cappedCands = candidates(Some(4L))
    assert(rawCands > cappedCands * 5,
      s"hot boilerplate must dominate raw candidates: raw=$rawCands capped=$cappedCands")

    // verdicts survive the cut: doc 600 stays 500's near-dup in the
    // FILTERED space (shared 40 content shingles over a 44∪40 union =
    // 0.909 — the two hot shingles leave both numerator and
    // denominator), and the unique doc stays admitted
    def verdicts(cap: Option[Long]) =
      graft.queries.Ingest.incrementalDedupOf(docs, cap)
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), r.getLong(2), r.getBoolean(3))).toMap
    val capped = verdicts(Some(4L))
    assert(capped(600L) == ((false, 500L, false)), s"capped: ${capped(600L)}")
    assert(capped(601L) == ((false, -1L, true)), s"capped: ${capped(601L)}")
  }

  test("IVF cell cap bounds per-cell pair counts on a hot cell") {
    import spark.implicits._
    // one hot label with 100 members
    val emb = (0 until 100).map(i => (i.toLong, 1)).toDF("vec_id", "label")
    def candidates(cap: Option[Int]): Long = {
      val cells = Embeddings.ivfCells(emb, cap)
      cells.as("a").join(cells.as("b"),
        col("a.label") === col("b.label") &&
          col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id")).count()
    }
    val uncapped = candidates(None)
    val capped = candidates(Some(10))
    assert(uncapped == 100L * 99 / 2)
    // 10 sub-cells of 10 members: 10 × C(10,2) = 450 — n·cap, not n²
    assert(capped == 10L * 45, s"expected 450 capped candidates, got $capped")
  }
}
