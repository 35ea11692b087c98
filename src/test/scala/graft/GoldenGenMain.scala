package graft

import java.nio.file.Files

/** One-off blesser for the committed golden-parity artifact
  * (FIXTURES.md §1.3): writes the fixture TSVs and the canonicalized
  * result/metrics goldens under src/test/resources/golden/. Run it ONLY
  * when the pinned config's semantics intentionally change; the diff is
  * the review surface.
  *
  * `sbt "Test/runMain graft.GoldenGenMain"`
  */
object GoldenGenMain {
  def main(args: Array[String]): Unit = {
    val dir = GoldenFixture.resourceDir
    Files.createDirectories(dir)
    val (mol, clin) = GoldenFixture.tsvContents()
    Files.writeString(dir.resolve("molecules.tsv"), mol)
    Files.writeString(dir.resolve("clinical.tsv"), clin)

    val spark = SparkTestSession.spark
    val results = Files.createTempDirectory("golden_bless").toString
    graft.app.Experiment.run(spark, GoldenFixture.config("bless",
      dir.resolve("molecules.tsv").toString,
      dir.resolve("clinical.tsv").toString, results))
    val out = java.nio.file.Paths.get(results, "bless")
    Files.writeString(dir.resolve("result_golden.json"),
      GoldenFixture.canonicalResult(
        GoldenFixture.read(out.resolve("result.json"))))
    Files.writeString(dir.resolve("metrics_golden.json"),
      GoldenFixture.canonicalMetrics(
        GoldenFixture.read(out.resolve("metrics.json"))))
    println(s"blessed goldens in $dir")
    spark.stop()
  }
}
