package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.file.{Files, Path, Paths}

/** The committed golden-parity fixture (FIXTURES.md §1.3): deterministic
  * TSV inputs plus the canonicalized `result.json` / metrics subset a
  * fixed-seed BBHA clustering run must reproduce BYTE-FOR-BYTE across
  * sessions, JVMs and rounds. Shared by [[GoldenParitySpec]] (the gate)
  * and [[GoldenGenMain]] (the one-off blesser that wrote the committed
  * files).
  */
object GoldenFixture {
  val resourceDir: Path = Paths.get("src/test/resources/golden")

  /** ~20 molecules × 40 samples, 3 signal features; identical generator
    * to ExperimentSpec's in-memory fixture but pinned to disk so the
    * committed goldens have committed inputs.
    */
  def tsvContents(): (String, String) = {
    val rng = new scala.util.Random(123)
    val nSamples = 40
    val nMol = 20
    val samples = (1 to nSamples).map(i => f"S$i%02d")
    val group = Array.tabulate(nSamples)(i => i % 2)
    val rows = (0 until nMol).map { m =>
      val vals = (0 until nSamples).map { s =>
        val v = if (m < 3) group(s) * 3.0 + rng.nextGaussian() * 0.3
        else rng.nextGaussian()
        // explicit ROOT locale: f"" uses the default locale, so a
        // comma-decimal JVM would regenerate TSVs that differ from the
        // committed golden bytes
        String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
      }
      s"MOL$m\t${vals.mkString("\t")}"
    }
    val mol = s"molecule\t${samples.mkString("\t")}\n${rows.mkString("\n")}"
    val clin = samples.zipWithIndex.map { case (s, i) =>
      val t = if (group(i) == 0) 100.0 + rng.nextInt(50) else 1000.0 + rng.nextInt(50)
      val e = if (rng.nextDouble() < 0.8) 1 else 0
      s"$s\t$e\t$t"
    }
    val clinTsv = s"sample\tevent\ttime\n${clin.mkString("\n")}"
    (mol, clinTsv)
  }

  /** The pinned run config: BBHA, clustering/k-means/concordance-index,
    * seed 77 everywhere, 5 stars × 3 iterations, 2 workers.
    */
  def config(appName: String, moleculesPath: String, clinicalPath: String,
      resultsPath: String): graft.app.Experiment.Config =
    graft.app.Experiment.Config(
      appName = appName, moleculesPath = moleculesPath,
      clinicalPath = clinicalPath, resultsPath = resultsPath,
      fitness = graft.fitness.FitnessConfig(model = "clustering",
        clusteringAlgorithm = "k_means",
        clusteringScoringMethod = "concordance_index",
        randomState = Some(77L)),
      bbha = graft.bbha.Bbha.Config(nStars = 5, nIterations = 3,
        randomState = Some(77L)),
      numberOfWorkers = 2)

  private def renderSorted(v: JValue): String = {
    def sort(j: JValue): JValue = j match {
      case JObject(fields) =>
        JObject(fields.sortBy(_._1).map { case (k, fv) => k -> sort(fv) })
      case JArray(items) => JArray(items.map(sort))
      case other => other
    }
    JsonMethods.compact(JsonMethods.render(sort(v)))
  }

  /** result.json minus the run-variant fields: `execution_time` → 0,
    * `dataset` (an absolute temp path) → a fixed token. Everything else
    * — metrics, features, model — must be byte-stable.
    */
  def canonicalResult(resultJson: String): String =
    renderSorted(JsonMethods.parse(resultJson)
      .replace(List("execution_time"), JDouble(0.0))
      .replace(List("dataset"), JString("golden/molecules.tsv")))

  /** The scheduling-independent metrics subset: per-evaluation feature
    * counts and fitness values (the search trace), model id, sample
    * count. Host names, wall-times, idle times and partition ids are
    * run-variant by nature and excluded.
    */
  def canonicalMetrics(metricsJson: String): String = {
    val j = JsonMethods.parse(metricsJson)
    renderSorted(JObject(List(
      "model" -> j \ "model",
      "number_of_samples" -> j \ "number_of_samples",
      "number_of_features" -> j \ "number_of_features",
      "fitness" -> j \ "fitness")))
  }

  def read(p: Path): String = Files.readString(p)
}
