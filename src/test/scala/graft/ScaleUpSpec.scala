package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleUp's explode-based replication (r12 — the union build hit
  * quadratic Catalyst analysis at factor 10⁴): value semantics pinned
  * against a hand-built expectation per table family.
  */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("documents: replica 0 identical, suffixed replicas token-disjoint, " +
      "ids key-shifted") {
    import spark.implicits._
    val src = Seq(
      (1L, "alpha beta gamma", "en", "src1"),
      (2L, "delta epsilon zeta", "de", "src2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = ScaleUp.documents(src, 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.size == 6)
    // replica 0 is the source verbatim
    assert(out(1L) == "alpha beta gamma")
    assert(out(2L) == "delta epsilon zeta")
    // replica r: every token suffixed with ~r, ids shifted r * 10^10
    assert(out(1L + ScaleUp.KeyOffset) == "alpha~1 beta~1 gamma~1")
    assert(out(2L + 2 * ScaleUp.KeyOffset) == "delta~2 epsilon~2 zeta~2")
  }

  test("documents boiler mode: selected base docs share an unsuffixed " +
      "header in every replica; others untouched") {
    import spark.implicits._
    // doc_id 100 → pmod 100 = 0 < 5 (boiler), doc_id 7 → 7 ≥ 5 (clean)
    val src = Seq((100L, "alpha beta", "en", "s"), (7L, "gamma delta", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = ScaleUp.documents(src, 2, boilerPct = 5).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val header = ScaleUp.BoilerHeaders((100 % 3 + 1).toInt - 1)
    assert(out(100L) == s"$header alpha beta")
    // replica 1: header tokens stay UNSUFFIXED (df grows with corpus);
    // the body is suffixed as usual
    assert(out(100L + ScaleUp.KeyOffset) == s"$header alpha~1 beta~1")
    assert(out(7L) == "gamma delta")
    assert(out(7L + ScaleUp.KeyOffset) == "gamma~1 delta~1")
  }

  test("embeddings: replica 0 exact, replicas jittered deterministically " +
      "off the SHIFTED vec_id (the historical lateral-alias semantics)") {
    import spark.implicits._
    val src = Seq((5L, Array(1.0f, 2.0f), "x")).toDF("vec_id", "embedding", "label")
    val out = ScaleUp.embeddings(src, 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    assert(out(5L).toSeq == Seq(1.0f, 2.0f))
    val jit = out(5L + ScaleUp.KeyOffset)
    // jitter formula: ((shiftedId*31 + i*13) mod 101 − 50) * (r * 2e-4)
    val sid = 5L + ScaleUp.KeyOffset
    val exp = Array.tabulate(2)(i =>
      (Seq(1.0f, 2.0f)(i) +
        ((sid * 31 + i * 13) % 101 - 50).toFloat * (1.0f * 2e-4f)))
    assert(jit.toSeq == exp.toSeq)
  }

  test("boiler corpus end-to-end: d36 surfaces the injected headers as " +
      "the valve's cut list; d9b still completes in the capped space") {
    import spark.implicits._
    // 200 base docs x 5 replicas with roughly half the base docs
    // boiler-headed (doc_id mod 100 < 50) → n = 1000, valve cap =
    // max(4, 1000/125) = 8; header tokens stay unsuffixed in every
    // replica so header-shingle df ≈ 500 ≫ 8, while body shingles
    // stay doc-private (df = 1 — body tokens are doc- and
    // replica-unique), and header→body bridge shingles carry the
    // doc-unique body token so they are df-1 too
    val src = (1L to 200L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    ScaleUp.documents(src, 5, boilerPct = 50)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val audit = graft.queries.TextDedup.d36BoilerShingles(spark, dir)
      .collect()
    assert(audit.nonEmpty)
    // every over-cap shingle is header-born: all its tokens come from
    // one of the three fixed headers (headers never take the ~r suffix)
    val headerToks = ScaleUp.BoilerHeaders.flatMap(_.split(" ")).toSet
    audit.foreach { r =>
      val toks = r.getString(0).split(" ")
      assert(toks.forall(headerToks), s"non-header shingle cut: ${r.getString(0)}")
      assert(r.getLong(1) > 8L) // df over the valve cap
    }
    // and the capped containment pipeline runs clean on the same corpus
    assert(graft.queries.TextDedup.d9bContainmentCapped(spark, dir)
      .count() >= 0L)
  }

  test("replicate scales: a 10^4-factor plan analyzes and runs (the " +
      "union build could not)") {
    import spark.implicits._
    val src = Seq((1L, "a b c", "en", "s")).toDF("doc_id", "text", "lang", "source")
    // analysis + execution in bounded time is the assertion; the count
    // proves the generator produced every replica
    assert(ScaleUp.documents(src, 10000).count() == 10000L)
  }
}
