package graft

import graft.queries.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style cross-check of the p4 admission signals: a seeded
  * random corpus is scored by an INDEPENDENT plain-Scala implementation
  * (same IEEE association order, same HALF_UP rounding) and must match
  * the Spark column expressions bit for bit. This is the same
  * two-implementations discipline the DuckDB oracles apply, but driven
  * over a much wider input space than the fixed harness corpus —
  * single-token docs, empty-ish docs, extreme repetition, vocab sizes
  * from 1 to 200.
  */
class IngestPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Stop = Set("the", "a", "of", "and", "is", "to")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Plain-Scala twin of Ingest.admissionSignals — written from the
    * definition, not from the Spark expressions.
    */
  private def ref(text: String): (Int, Double, Double) = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
    val n = toks.length
    val quality = round6(
      math.min(n / 50.0, 1.0) * 0.3
        + (toks.distinct.length.toDouble / n) * 0.3
        + (toks.count(Stop).toDouble / n) * 0.2
        + (toks.count(_.length >= 4).toDouble / n) * 0.2)
    val rep =
      if (n >= 2) {
        val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
        round6(1.0 - bigrams.distinct.length.toDouble / (n - 1))
      } else 0.0
    (n, quality, rep)
  }

  test("admission signals match an independent implementation on 300 random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    val docs = (0 until 300).map { i =>
      val vocabSize = 1 + rng.nextInt(200)
      val vocab = Vector.tabulate(vocabSize) { v =>
        // mix of short/long tokens and stopwords
        if (v % 7 == 0) Seq("the", "a", "of", "and", "is", "to")(v % 6)
        else if (v % 3 == 0) s"w$v"
        else s"token$v"
      }
      val len = 1 + rng.nextInt(60)
      (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocabSize))).mkString(" "))
    }
    val got = Ingest.admissionSignals(
        docs.toDF("doc_id", "text").withColumn("lang", lit("xx")))
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("rep_frac"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    docs.foreach { case (id, text) =>
      val expected = ref(text)
      assert(got(id) == expected,
        s"doc $id: spark=${got(id)} ref=$expected text='${text.take(80)}'")
    }
  }
}
