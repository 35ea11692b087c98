package graft

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal bench: times a NAMED SUBSET of the registered
  * queries against an arbitrary data directory (usually the
  * [[ScaleUp]]-derived 10× set) with the same measurement discipline
  * as [[Bench]] — untimed warmup, pass-isolated timed passes, error
  * honesty — so sf0.1 → sf1 per-query scaling exponents in SCALE.md
  * are apples-to-apples with the round bench.
  *
  * Args: dataDir namesCsv [timedPasses=3] [outFile].
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleBench dataDir namesCsv [passes] [outFile]")
    val dataDir = args(0)
    val names = args(1).split(",").toSet
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.suppressBoundedWindowWarning()

    val missing = names -- SparkEntry.queries.keySet
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    val out = Bench.runBench(spark, dataDir,
      SparkEntry.queries.view.filterKeys(names).toMap, timedPasses = passes)
    if (args.length > 3)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(args(3)), out.full + "\n")
    println(out.full)
    spark.stop()
    if (out.errors.nonEmpty) sys.exit(1)
  }
}
