package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the harness star schema (TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst owns column pruning and
  * predicate pushdown — every downstream query's filters/projections reach
  * the parquet scan (`PushedFilters`/`ReadSchema` in explain output). At
  * 100 TB the same call reads a partitioned parquet lake; nothing here
  * assumes single-file inputs.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) rejects outright. Read it as raw nanos (legacy conf) and
    * truncate to µs with integer division — same truncation DuckDB
    * applies casting TIMESTAMP_NS → TIMESTAMP. Floating-point division
    * would corrupt the low bits (2024 epoch-nanos ≈ 1.7e18 > 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
