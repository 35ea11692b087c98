package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join hashes both sides on the key, so one hot key lands its
  * entire partition on one task. AQE's skew-join split handles the
  * sort-merge case at runtime, but only after the skewed shuffle files
  * exist; pre-salting removes the hot partition at plan time: the big
  * side spreads each key over `buckets` sub-keys (deterministically, by
  * hashing a high-cardinality column), the small side replicates each
  * row `buckets` times, and the join runs on (key, salt). Result is
  * row-identical to the plain join: every (big, small) match still meets
  * exactly once, on the big row's own salt.
  *
  * Cost model: the small side grows ×buckets — use for dimension-sized
  * right sides and genuinely skewed fact keys, and keep `buckets` near
  * the per-key parallelism you want, not the cluster size.
  */
object SkewJoin {

  /** @param saltBy a big-side column with per-row spread (an id, a hash
    *               input…) — salts derive from `hash(saltBy)`, keeping
    *               the plan fully deterministic (no `rand()`:
    *               recomputation under task retries must re-salt rows
    *               identically or matches are lost)
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = big.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
