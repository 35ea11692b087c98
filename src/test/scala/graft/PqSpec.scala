package graft

import graft.queries.Embeddings
import org.scalatest.funsuite.AnyFunSuite

/** Semantic edges of the s11 product-quantization pipeline that the
  * harness corpus doesn't isolate: on a corpus where every vector of a
  * label is IDENTICAL, the grid-mean codebook must reproduce each
  * label's vector exactly, so (a) every (vector, subspace) code is the
  * vector's own label — the reconstruction-error argmin has a provable
  * unique answer ((a−b)² > 0 for any other label) — and (b) the ADC
  * score is bit-equal to an independently computed quantized dot, so
  * the ranking is the predictable one.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val LabelVal = Map(0 -> 0.1f, 1 -> 0.5f, 2 -> 0.9f)

  private def corpus = (0 until 30).map { i =>
    val label = i % 3
    (i.toLong, Array.fill(64)(LabelVal(label)), label)
  }

  test("s11: on identical-per-label vectors every PQ code is the own label") {
    import spark.implicits._
    val emb = corpus.toDF("vec_id", "embedding", "label")
    val codes = Embeddings.pqCodesOf(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(codes.size == 30 * 4, s"expected 4 codes per vector: ${codes.size}")
    codes.foreach { case ((vec, sub), code) =>
      assert(code == (vec % 3).toInt,
        s"vec $vec sub $sub coded $code, want ${vec % 3}")
    }
  }

  test("s11: ADC equals the independently quantized dot and ranks predictably") {
    import spark.implicits._
    val emb = corpus.toDF("vec_id", "embedding", "label")
    // independent twin of the lookup-table quantization: per subspace,
    // dot of the query's 16 floats against the (exactly reconstructed)
    // codeword, snapped to micro-units HALF_UP, summed as integers
    def adcExpected(qLabel: Int, cLabel: Int): Double = {
      val c = math.round(LabelVal(cLabel).toDouble * 1e6) / 1e6
      val term = (0 until 16)
        .foldLeft(0.0)((s, _) => s + LabelVal(qLabel).toDouble * c)
      val micro = BigDecimal(term * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      BigDecimal((micro * 4).toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Embeddings.pqAdcOf(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.size == 30, s"10 queries × top-3: ${got.size}")
    (0L until 10L).foreach { q =>
      // all label-2 candidates tie on the (highest) ADC value, so the
      // top-3 are the three smallest label-2 vec_ids excluding q itself
      val expectIds = (0L until 30L)
        .filter(v => v % 3 == 2 && v != q).sorted.take(3)
      (1 to 3).foreach { rk =>
        val (vecId, adc, cos) = got((q, rk.toLong))
        assert(vecId == expectIds(rk - 1),
          s"q=$q rk=$rk got vec $vecId want ${expectIds(rk - 1)}")
        assert(adc == adcExpected((q % 3).toInt, 2),
          s"q=$q rk=$rk adc=$adc want ${adcExpected((q % 3).toInt, 2)}")
        // constant vectors are all parallel — the exact re-rank cosine
        // must come back ≈1 after float-precision rounding
        assert(math.abs(cos - 1.0) <= 1e-6, s"q=$q rk=$rk cos=$cos")
      }
    }
  }
}
