package graft

import graft.queries.GridMath
import org.scalatest.funsuite.AnyFunSuite

/** GridMath.gridAvgRound against an independent BigInt reference: exact
  * unit sums, half-toward-+inf offset, truncating division — the
  * arithmetic contract shared bit-for-bit with the DuckDB oracles
  * (Oracles.exactAvg).
  */
class GridMathSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("gridAvgRound ≡ BigInt half-up reference on random money groups (incl. negatives)") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val rows = (0 until 2000).map { i =>
      (s"g${i % 37}", math.round(rng.nextGaussian() * 10000) / 100.0)
    }
    val got = rows.toDF("g", "v")
      .groupBy($"g")
      .agg(GridMath.gridAvgRound($"v", 2, 6).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = rows.groupBy(_._1).map { case (g, vs) =>
      val units = vs.map { case (_, v) => BigInt(math.round(v * 100)) }.sum
      val den = BigInt(vs.size) * 100
      // BigInt / truncates toward zero — same as IntegralDivide and //
      g -> ((units * 1000000 + den / 2) / den).toDouble / 1e6
    }
    assert(got.size == ref.size)
    ref.foreach { case (g, v) => assert(got(g) == v, s"group $g: ${got(g)} != $v") }
  }

  test("rollingHash byte-decoder matches the String code-point reference (incl. multibyte)") {
    import org.apache.spark.unsafe.types.UTF8String
    def reference(str: String): Long = {
      var h = 0L; var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        h = (h * graft.functions.TextHash.Base + cp) % graft.functions.TextHash.Mod
        i += Character.charCount(cp)
      }
      h
    }
    val samples = Seq("", "hello world", "héllo wörld", "日本語テキスト",
      "emoji 😀 beyond the BMP", "mixed ascii ünd ünïcode 123")
    samples.foreach { s =>
      assert(graft.functions.TextHash.rollingHash(UTF8String.fromString(s))
        == reference(s), s)
    }
  }

  test("empty-group average is null, not an ANSI division error") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("b", None)).toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(GridMath.gridAvgRound($"v", 2, 6).as("a"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").contains(1.0))
    assert(out("b").isEmpty)
  }
}
