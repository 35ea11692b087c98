package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfn.GraftExpressions.intDiv

/** Exact, order-insensitive aggregate arithmetic shared by the oracle-gated
  * queries.
  *
  * A plain `sum(double)` depends on addition order (partition order is
  * nondeterministic), and `round(x, n)` after a float divide differs
  * between engines on half-ulp boundaries: Spark rounds the exact decimal
  * expansion of the double (BigDecimal HALF_UP) while DuckDB multiplies by
  * 10^n in floating point first — the two can land on opposite sides of
  * .5 (q12_case_agg's round-1 hash flake). Both hazards disappear when the
  * value is snapped to its decimal grid per row and everything after is
  * integer arithmetic.
  */
object GridMath {

  /** Order-insensitive sum of a fixed-decimal expression: per-row integer
    * units (exact in Long) are associative, so the result is identical at
    * 32 cores or 1000 executors. The ACCUMULATION runs in DECIMAL(38,0)
    * — a LongType sum wraps silently (non-ANSI) near 9.2e18 unit-micros,
    * which a 100-TB group can reach; the DuckDB twin promotes to HUGEINT,
    * so decimal is what keeps the engines equal exactly at scale.
    */
  def gridSum(c: Column, decimals: Int): Column = {
    val scale = math.pow(10, decimals).toLong
    sum(round(c * scale).cast("long").cast("decimal(38,0)")) / lit(scale.toDouble)
  }

  /** `round(avg(c), outDecimals)` with no engine-dependent rounding: rows
    * are snapped to their `decimals` grid (long units), summed exactly,
    * and the rounded average is ONE half-up integral division computed in
    * DECIMAL(38,0) — 10^38 headroom, so no overflow at 100-TB group sizes
    * (the all-Long formulation overflows near 10^19 unit-micros). The
    * final `units_micro / 10^outDecimals` is a correctly-rounded double
    * division of identical integers in both engines.
    *
    * Empty groups give null (sum is null; `div` by a zero count is LEGACY
    * null, matching DuckDB `//`). Negative sums round half toward +inf
    * (then truncate) on BOTH sides — the oracle SQL uses the literally
    * identical `(num + den // 2) // den` formula, so agreement is by
    * construction, not by rounding-mode coincidence.
    */
  def gridAvgRound(c: Column, decimals: Int, outDecimals: Int): Column = {
    val scale = math.pow(10, decimals).toLong
    val out = math.pow(10, outDecimals).toLong
    val units = sum(round(c * scale).cast("long").cast("decimal(38,0)"))
    val den = (count(c) * scale).cast("decimal(38,0)")
    intDiv(units * out + intDiv(den, lit(2L)), den).cast("double") / out
  }
}
