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

  test("s12: drift is 1.0 for split-stable labels and 0.0 for orthogonal eval vectors") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(text: String): String = {
      val b = Integer.parseInt(md5hex(text).take(4), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    // single-token lowercase texts: normalization is the identity, so
    // the JVM twin's hash space equals the operator's exactly
    val docs = (0 until 400).map(i => (i.toLong, s"word$i"))
    val splits = docs.map { case (id, t) => id -> split(t) }.toMap
    val counts = docs.groupBy(d => (d._1 % 2, splits(d._1))).map {
      case (k, rows) => k -> rows.size.toLong
    }
    assert(Seq("train", "val", "test").forall(s =>
      counts.contains((0L, s)) && counts.contains((1L, s))),
      s"need every (label, split) cell populated: $counts")
    // label 0: one direction everywhere → drift cos 1.0;
    // label 1: train on e2, eval splits on e3 → drift cos 0.0
    val emb = docs.map { case (id, t) =>
      val v =
        if (id % 2 == 0) Array(1f, 0f, 0f, 0f)
        else if (splits(id) == "train") Array(0f, 1f, 0f, 0f)
        else Array(0f, 0f, 1f, 0f)
      (id, (id % 2).toInt, v)
    }
    val got = graft.queries.Embeddings.centroidDriftOf(
        docs.toDF("doc_id", "text"),
        emb.toDF("vec_id", "label", "embedding"))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == 4, s"2 labels × (val, test): $got")
    Seq("val", "test").foreach { s =>
      assert(got((0, s)) == ((counts((0L, "train")), counts((0L, s)), 1.0)),
        s"label 0 $s: ${got((0, s))}")
      assert(got((1, s)) == ((counts((1L, "train")), counts((1L, s)), 0.0)),
        s"label 1 $s: ${got((1, s))}")
    }
  }
}
