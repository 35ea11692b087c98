package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.events` must load every physical `ts` encoding the lake has
  * shipped — int64 nanos (read as LongType under the legacy conf),
  * timestamp[us] isAdjustedToUTC=false (TIMESTAMP_NTZ), and UTC-adjusted
  * µs (TimestampType) — and yield the same TimestampType frame for all of
  * them. Round 8 died because the loader hard-coded one encoding; this
  * spec writes each encoding to a temp dir and diffs the loaded frames so
  * that class of break cannot recur silently.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def writeEncodings(base: java.nio.file.Path): Unit = {
    import spark.implicits._
    val rows = Seq(
      (1L, 1704067200123456L, 10L, "view", 1.5, "{}"),
      (2L, 1704067201500000L, 11L, "click", 2.5, "{}"),
      (3L, 1704153599999999L, 10L, "buy", 9.0, "{}")
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")

    // (a) int64 epoch-nanos under the column name ts — what the legacy
    // nanosAsLong read of a TIMESTAMP(NANOS) file presents to the loader.
    rows.withColumn("ts", col("us") * lit(1000L))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")

    // (b) timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ on load.
    rows.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")

    // (c) UTC-adjusted µs → TimestampType on load (pass-through branch).
    rows.withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/ltz/events.parquet")
  }

  test("events loader normalizes all physical ts encodings to the same frame") {
    val base = java.nio.file.Files.createTempDirectory("tables-spec")
    writeEncodings(base)
    val frames = Seq("nanos", "ntz", "ltz").map { enc =>
      enc -> Tables.events(spark, s"$base/$enc")
    }
    frames.foreach { case (enc, df) =>
      assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
        s"$enc: ts must normalize to TimestampType")
    }
    val collected = frames.map { case (enc, df) =>
      enc -> df.orderBy("event_id")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    assert(collected("nanos") == collected("ntz"),
      "nanos and ntz encodings must load identically")
    assert(collected("nanos") == collected("ltz"),
      "nanos and ltz encodings must load identically")
    assert(collected("nanos").map(_._2) ==
      Seq(1704067200123456L, 1704067201500000L, 1704153599999999L))
  }

  test("embeddings loader normalizes float and double element encodings") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("tables-emb")
    val rows = Seq((1L, Seq(0.25f, -1.5f, 3.0f), 0), (2L, Seq(1.0f, 2.0f, -0.125f), 1))
      .toDF("vec_id", "embedding", "label")
    rows.write.mode("overwrite").parquet(s"$base/f/embeddings.parquet")
    rows.withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$base/d/embeddings.parquet")
    val frames = Seq("f", "d").map(enc => Tables.embeddings(spark, s"$base/$enc"))
    frames.foreach { df =>
      assert(df.schema("embedding").dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true) ||
        df.schema("embedding").dataType ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false))
    }
    val collected = frames.map(_.orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)
    assert(collected(0) == collected(1),
      "float and double encodings must load identically")
  }

  test("events loader handles the current testdata") {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(df.limit(5).count() > 0)
  }
}
