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
  /** `events.ts` has shipped under several physical parquet encodings —
    * TIMESTAMP(NANOS) (which Spark's µs TimestampType rejects outright),
    * timestamp[us] with isAdjustedToUTC=false (TIMESTAMP_NTZ to Spark),
    * and plain UTC-adjusted µs. A real lake's writers change physical
    * timestamp types over time, so branch on the *loaded* schema instead
    * of hard-coding one:
    *
    *  - `LongType`: the legacy nanos-as-long read of TIMESTAMP(NANOS);
    *    truncate to µs with integer division — the same truncation DuckDB
    *    applies casting TIMESTAMP_NS → TIMESTAMP. Floating-point division
    *    would corrupt the low bits (2024 epoch-nanos ≈ 1.7e18 > 2^53).
    *  - `TimestampNTZType`: reinterpret the wall clock as a UTC instant.
    *    The repo pins spark.sql.session.timeZone=UTC, so this cast yields
    *    byte-identical µs to the nanos path and to the DuckDB oracle.
    *  - `TimestampType`: already the µs instant the queries expect.
    *
    * The legacy conf stays enabled so NANOS files load at all; it is a
    * no-op for the other encodings.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    normalizeEventTs(raw, raw.schema("ts").dataType)
  }

  /** The ONE ts-normalization branch table, shared with the streaming
    * reader ([[graft.streaming.EventStreams.readEvents]]) so the next
    * physical encoding the lake ships lands in a single place — a copy
    * drifting out of sync is exactly the round-8 class of break, and
    * `TablesSpec` only gates this shared path.
    */
  private[graft] def normalizeEventTs(raw: DataFrame,
      tsType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    tsType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  /** `embeddings.embedding` must reach the engine as array<float> — the
    * codegen'd vector kernels (`graftfn.GraftExpressions.floatVecDot`)
    * and every ANN oracle are written in float space. Normalize here
    * (same discipline as [[events]]: the loader absorbs physical-type
    * drift, the queries never see it) so a lake rewrite to
    * array<double> degrades to a cast instead of 19 analysis failures.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = apply(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(_: NumericType, _) =>
        raw.withColumn("embedding",
          org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
      case other => throw new IllegalStateException(
        s"embeddings.embedding: unsupported physical type $other")
    }
  }
}
