package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operators: e32 multi-touch comparison, t30 language
  * confusion matrix, p28 quota frontier, s25 IVF cell-occupancy audit.
  * Each spec checks the algebraic invariants the oracle hash can't
  * localize (credit conservation, row-sum identities, frontier
  * monotonicity, pair-work arithmetic).
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("e32: hand-built journeys credit first/last/linear exactly") {
    import spark.implicits._
    // user 1: touches view(t=1), click(t=2), view(t=3) then purchase(t=4)
    //   first=view, last=view, linear: view 2/3, click 1/3
    // user 2: click(t=10) then purchase(t=11); one stale view 25h before
    val us = (s: Long) => java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-02T00:00:00Z").plusSeconds(s))
    val events = Seq(
      (1L, us(1), 1L, "view", 0.0, "{}"),
      (2L, us(2), 1L, "click", 0.0, "{}"),
      (3L, us(3), 1L, "view", 0.0, "{}"),
      (4L, us(4), 1L, "purchase", 5.0, "{}"),
      (5L, us(10), 2L, "click", 0.0, "{}"),
      (6L, us(11), 2L, "purchase", 7.0, "{}"),
      (7L, us(11 - 25 * 3600), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("e32spec")
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // Map keyed by channel name → (n_first, n_last, linear_micro)
    val asMap = graft.queries.Events.e32TouchComparison(spark, tmp.toString)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(asMap("view") == ((1L, 1L, 666667L)), asMap)
    assert(asMap("click") == ((1L, 1L, 1333333L)), asMap)
    // credit conservation: each model distributes exactly one credit
    // per purchase (2 purchases; linear in micro units)
    assert(asMap.values.map(_._1).sum == 2L)
    assert(asMap.values.map(_._2).sum == 2L)
    val linTotal = asMap.values.map(_._3).sum
    assert(math.abs(linTotal - 2000000L) <= asMap.size, linTotal)
  }

  test("t30: confusion rows reconcile with t15 and shares sum to ~1") {
    val conf = graft.queries.TextDedup.t30LangConfusion(spark, dir)
      .collect()
    val audit = graft.queries.TextDedup.t15LabelAudit(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val byLang = conf.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val (nDocs, nMismatch) = audit(lang)
      assert(rows.map(_.getLong(2)).sum == nDocs, s"$lang row sum")
      assert(rows.filter(r => r.getString(1) != lang)
        .map(_.getLong(2)).sum == nMismatch, s"$lang mismatch sum")
      val shareSum = rows.map(_.getLong(3)).sum
      // half-up rounding drift bounded by the number of matrix cells
      assert(math.abs(shareSum - 1000000L) <= rows.length, s"$lang $shareSum")
    }
  }

  test("p28: frontier is monotone in quota and its 500 row matches p15") {
    val f = graft.queries.TextDedup.p28QuotaFrontier(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(f.map(_._1).toSeq == Seq(250L, 500L, 1000L))
    assert(f.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 })
    val p15 = graft.queries.TextDedup.p15SourceQuota(spark, dir)
      .agg(count(lit(1)), sum(col("n_tokens"))).collect().head
    val mid = f.find(_._1 == 500L).get
    assert(mid._2 == p15.getLong(0) && mid._3 == p15.getLong(1),
      s"$mid vs ${p15}")
  }

  test("s25: pair-work arithmetic and cap bounds hold on real cells") {
    val rows = graft.queries.Embeddings.s25CellOccupancy(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pw, cc, cpw) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(pw == n * (n - 1) / 2)
      assert(cc == (n + 31) / 32)
      assert(cpw <= pw, s"capped work must not exceed raw: $r")
      // sub-cells partition the label: their pair work is at least the
      // perfectly-balanced lower bound
      val q = n / cc; val rem = n % cc
      val balanced = rem * (q + 1) * q / 2 + (cc - rem) * q * (q - 1) / 2
      assert(cpw >= balanced, s"below balanced bound: $r")
    }
    val shareSum = rows.map(_.getLong(3)).sum
    assert(math.abs(shareSum - 1000000L) <= rows.length, shareSum)
  }
}
