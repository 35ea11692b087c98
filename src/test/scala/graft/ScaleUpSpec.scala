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

  test("replicate scales: a 10^4-factor plan analyzes and runs (the " +
      "union build could not)") {
    import spark.implicits._
    val src = Seq((1L, "a b c", "en", "s")).toDF("doc_id", "text", "lang", "source")
    // analysis + execution in bounded time is the assertion; the count
    // proves the generator produced every replica
    assert(ScaleUp.documents(src, 10000).count() == 10000L)
  }
}
