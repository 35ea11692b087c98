package graft.queries

import graft.Tables
import graft.io.SurvivalClean
import graft.surv.{CIndex, Clinical}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** DataFrame-level exposure of the survival operators so the DuckDB gate
  * covers them too: the concordance index as a typed `Aggregator` (the
  * optional surface SURVEY §2.5 sketches) and the cleaning pipeline as a
  * distributed relational op.
  */
object Survival {

  case class SurvRow(event: Boolean, time: Double, risk: Double)

  /** Harrell's C as a typed Aggregator — the DataFrame-level metric
    * surface SURVEY §2.5 sketches. The buffer collects the group's
    * (event, time, risk) triples (a group = one cohort, the
    * fitness-kernel scale of hundreds of samples); the all-pairs count
    * runs once in `finish`.
    */
  case class CIdxResult(n: Int, cindex: Double)

  /** Counted cohort buffer — the count makes the cap check O(1). */
  case class CBuf(n: Long, rows: List[SurvRow])

  object CIndexAggregator extends Aggregator[SurvRow, CBuf, CIdxResult] {
    /** Hard cohort cap. The exact C-index is a PAIRWISE statistic, so
      * every triple of the group must meet in one buffer; `finish` runs
      * the O(n log n) Fenwick-tree twin of the pairwise loop
      * ([[CIndex.concordanceLogN]] — bit-identical credits), which makes
      * 10⁶-row cohorts compute exactly in seconds. The cap is therefore
      * a MEMORY bound (one serialized buffer per group), not a compute
      * bound; beyond it this aggregator REFUSES loudly instead of
      * OOMing a task — at that scale compute the C-index per stratum
      * (smaller cohorts) or over an upstream sample.
      */
    val MaxCohortRows = 2000000
    private def guard(n: Long): Unit =
      if (n > MaxCohortRows) throw new IllegalStateException(
        s"CIndexAggregator cohort exceeds $MaxCohortRows rows; the exact " +
          "C-index is pairwise — the whole cohort colocates in one " +
          "buffer. Stratify into smaller cohorts or subsample upstream.")
    def zero: CBuf = CBuf(0, Nil)
    def reduce(b: CBuf, a: SurvRow): CBuf = {
      guard(b.n + 1)
      CBuf(b.n + 1, a :: b.rows)
    }
    def merge(a: CBuf, b: CBuf): CBuf = {
      guard(a.n + b.n)
      CBuf(a.n + b.n, a.rows ++ b.rows)
    }
    def finish(b: CBuf): CIdxResult = {
      val arr = b.rows.toArray
      CIdxResult(arr.length, CIndex.concordanceLogN(
        arr.map(r => Clinical(r.event, r.time)), arr.map(_.risk)))
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[CBuf] =
      org.apache.spark.sql.Encoders.kryo[CBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[CIdxResult] =
      org.apache.spark.sql.Encoders.product[CIdxResult]
  }

  /** Per-segment C-index of "account balance as risk" against a synthetic
    * survival target over the first 2000 customers — exercises the
    * concordance Aggregator end-to-end against a pure-SQL pairwise
    * oracle (which stays cheap at this sample size).
    */
  def v1CIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment").as("seg"),
        (col("c_custkey") % 2 === 0).as("event"),
        (col("c_custkey") % 97).cast("double").as("time"),
        col("c_acctbal").as("risk"))
      .as[(String, Boolean, Double, Double)]
    c.groupByKey(_._1)
      .mapValues(r => SurvRow(r._2, r._3, r._4))
      .agg(CIndexAggregator.toColumn.name("res"))
      .toDF("seg", "res")
      .select(col("seg"), col("res.n").as("n"),
        round(col("res.cindex"), 6).as("cindex"))
      .orderBy(col("seg"))
  }

  /** The reference's cleaning pipeline as a distributed op over a wide
    * numeric matrix synthesized from lineitem: inject NaN into one
    * column (→ column dropped) and Inf into some rows (→ rows dropped),
    * then run SurvivalClean.cleanDistributed. The oracle hardcodes the
    * same deterministic injection.
    */
  def v2CleanMatrix(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 4000)
      .select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("row_id"),
        col("l_quantity").as("f_qty"),
        // f_price catches Inf for one partkey residue class → rows drop
        when(col("l_partkey") % 1000 === 7, lit(Double.PositiveInfinity))
          .otherwise(col("l_extendedprice")).as("f_price"),
        // f_disc catches NaN for one suppkey residue → whole column drops
        when(col("l_suppkey") % 500 === 3, lit(Double.NaN))
          .otherwise(col("l_discount")).as("f_disc"),
        col("l_tax").as("f_tax"))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    // order by every output column for a deterministic limit
    SurvivalClean.cleanDistributed(m, Seq("row_id"))
      .orderBy(col("row_id"), col("f_price"), col("f_qty"), col("f_tax"))
      .limit(3000)
  }

  /** Distributed Nelson–Aalen cumulative hazard (v3): the survival-curve
    * estimator as a relational plan — per segment cohort (v1's synthetic
    * survival frame), at each distinct event time t: d (events at t),
    * n (subjects still at risk), the hazard increment d/n, and the
    * running cumulative hazard H(t) = Σ d_i/n_i. The risk set comes from
    * a running count over the time-ordered window — one shuffle on the
    * segment key — and every hazard increment is snapped to integer
    * micro-units with half-up integral division BEFORE accumulation, so
    * the curve is bit-identical at any partitioning and in both engines
    * (a float Σ d/n would drift with addition order). This extends the
    * reference's survival family (which computes per-task curves inside
    * fitness kernels) to the lake-scale cohort the engine's SQL surface
    * serves.
    */
  def v3CumHazard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftfn.GraftExpressions.intDiv
    val s = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 2000)
      .select(col("c_mktsegment").as("seg"),
        (col("c_custkey") % 2 === 0).as("event"),
        (col("c_custkey") % 97).cast("long").as("time"))
    val byTime = s.groupBy(col("seg"), col("time"))
      .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("m"))
    val w = Window.partitionBy(col("seg")).orderBy(col("time"))
    val totals = byTime.groupBy(col("seg")).agg(sum(col("m")).as("n_seg"))
    byTime.join(totals, Seq("seg"))
      .withColumn("n_risk", col("n_seg") - coalesce(
        sum(col("m")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      // half-up integral division in micro-units: exact, associative
      .withColumn("h_micro",
        intDiv(col("d") * 1000000L + intDiv(col("n_risk"), lit(2L)),
          col("n_risk")))
      .withColumn("cum_h_micro",
        sum(col("h_micro")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("d") > 0)
      .select(col("seg"), col("time"), col("d"), col("n_risk"),
        col("h_micro"), col("cum_h_micro"),
        round(col("cum_h_micro").cast("double") / 1e6, 6).as("cum_hazard"))
      .orderBy(col("seg"), col("time"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_cindex" -> (v1CIndex _),
    "v2_clean_matrix" -> (v2CleanMatrix _),
    "v3_cum_hazard" -> (v3CumHazard _),
  )
}
