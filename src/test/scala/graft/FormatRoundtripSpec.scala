package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond the parquet lake and TSV ingest:
  * JSON-lines, CSV-with-header, and ORC roundtrips preserve row counts
  * and values. (Schema nuance is format-specific — JSON/CSV re-infer
  * types, ORC preserves them — so the value comparison casts back.)
  */
class FormatRoundtripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def withTempDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft-fmt")
    try f(d.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private val cols = Seq("doc_id", "lang", "text")

  test("json-lines sink/source roundtrip") {
    withTempDir { tmp =>
      val docs = Tables.documents(spark, dir).select(cols.map(col): _*)
      docs.write.json(s"$tmp/docs_json")
      val back = spark.read.json(s"$tmp/docs_json")
        .select(col("doc_id").cast("long"), col("lang"), col("text"))
      assert(back.count() == docs.count())
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    }
  }

  test("csv sink/source roundtrip (header + quoted text)") {
    withTempDir { tmp =>
      val docs = Tables.documents(spark, dir).select(cols.map(col): _*)
      docs.write.option("header", "true").option("quoteAll", "true")
        .csv(s"$tmp/docs_csv")
      val back = spark.read.option("header", "true").csv(s"$tmp/docs_csv")
        .select(col("doc_id").cast("long"), col("lang"), col("text"))
      assert(back.count() == docs.count())
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    }
  }

  test("orc sink/source roundtrip preserves schema") {
    withTempDir { tmp =>
      val docs = Tables.documents(spark, dir).select(cols.map(col): _*)
      docs.write.orc(s"$tmp/docs_orc")
      val back = spark.read.orc(s"$tmp/docs_orc")
      assert(back.schema == docs.schema)
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    }
  }
}
