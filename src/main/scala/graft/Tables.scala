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
  def events(s: SparkSession, d: String): DataFrame   = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
