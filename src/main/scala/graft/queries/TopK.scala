package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe top-k per group when the group count is SMALL.
  *
  * `row_number over (partition by group)` puts every row of a group into
  * one task — fine for q7's thousands of brands, a hotspot for e4's
  * handful of event types or s1's ten query vectors at collection scale.
  * The two-phase form bounds every task: phase 1 takes the top-k within
  * (group, salt) — each salt bucket holds ~1/salts of the group — and
  * phase 2 takes the top-k of the ≤ salts·k survivors. Top-k of
  * per-bucket top-ks is exactly the global top-k (any global winner wins
  * its own bucket), so results are identical, row for row.
  */
object TopK {

  /** @param order   full deterministic order (include a tiebreak key)
    * @param saltBy  high-cardinality column hashing rows across buckets;
    *                must be part of the row (e.g. the per-group entity id)
    * @param rankCol name of the emitted 1-based rank column
    */
  def saltedTopK(df: DataFrame, group: Seq[Column], order: Seq[Column],
      k: Int, saltBy: Column, salts: Int = 32,
      rankCol: String = "rk"): DataFrame = {
    require(k > 0 && salts > 0)
    val salt = pmod(hash(saltBy), lit(salts))
    val phase1 = Window.partitionBy(group :+ salt: _*).orderBy(order: _*)
    val phase2 = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("__rk1", row_number().over(phase1))
      .filter(col("__rk1") <= k)
      .drop("__rk1")
      // long rank: DuckDB row_number() is BIGINT; keeping the emitted
      // rank int32 is the same dtype-drift class that broke q12
      .withColumn(rankCol, row_number().over(phase2).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
