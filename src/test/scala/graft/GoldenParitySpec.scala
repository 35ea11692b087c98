package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Cross-session parity gate for the flagship survival pipeline: the
  * fixed-seed BBHA clustering run over the COMMITTED fixture TSVs must
  * reproduce the COMMITTED canonical result/metrics bytes. Where
  * ExperimentSpec proves same-seed determinism within one JVM, this pins
  * the search trace across JVMs, Spark upgrades and refactors — any
  * change to the seeded init, tanh update, tie-breaks, CV folds, KMeans
  * iteration order or C-index arithmetic flips a committed byte and
  * fails here, which is exactly the review trigger it exists to be
  * (re-bless consciously via [[GoldenGenMain]]).
  */
class GoldenParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("fixed-seed BBHA run reproduces the committed golden bytes") {
    val dir = GoldenFixture.resourceDir
    // the committed inputs are themselves regenerable: the generator is
    // seeded, so fixture drift is detectable too
    val (mol, clin) = GoldenFixture.tsvContents()
    assert(GoldenFixture.read(dir.resolve("molecules.tsv")) == mol,
      "committed molecules.tsv drifted from its seeded generator")
    assert(GoldenFixture.read(dir.resolve("clinical.tsv")) == clin,
      "committed clinical.tsv drifted from its seeded generator")

    val results = Files.createTempDirectory("golden_parity").toString
    graft.app.Experiment.run(spark, GoldenFixture.config("parity",
      dir.resolve("molecules.tsv").toString,
      dir.resolve("clinical.tsv").toString, results))
    val out = java.nio.file.Paths.get(results, "parity")

    val gotResult = GoldenFixture.canonicalResult(
      GoldenFixture.read(out.resolve("result.json")))
    assert(gotResult == GoldenFixture.read(dir.resolve("result_golden.json")),
      s"result.json diverged from golden:\n$gotResult")

    val gotMetrics = GoldenFixture.canonicalMetrics(
      GoldenFixture.read(out.resolve("metrics.json")))
    assert(gotMetrics == GoldenFixture.read(dir.resolve("metrics_golden.json")),
      s"metrics diverged from golden:\n$gotMetrics")
  }
}
