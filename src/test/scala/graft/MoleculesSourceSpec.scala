package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 tier: the transposed molecules matrix as a real
  * Spark source with sample-range partitioning and column→line pruning.
  */
class MoleculesSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeMatrix(nMols: Int, nSamples: Int): String = {
    val dir = Files.createTempDirectory("molsrc").toString
    val header = "molecule\t" + (1 to nSamples).map("S" + _).mkString("\t")
    val body = (1 to nMols).map { m =>
      s"MOL$m\t" + (1 to nSamples).map(s => s"$m.$s").mkString("\t")
    }
    Files.writeString(java.nio.file.Paths.get(dir, "molecules.tsv"),
      (header +: body).mkString("\n"))
    s"$dir/molecules.tsv"
  }

  test("full read equals the driver-side transpose; NaN/inf tokens parse identically") {
    val dir = Files.createTempDirectory("molsrc2").toString
    val mol =
      """molecule	TCGA-01	TCGA-02	TCGA-03	TCGA-04
        |BRCA1	2.31	1.07	3.92	0.55
        |TP53	0.12	4.40	2.21	1.90
        |EGFR	NaN	1.33	0.87	2.02
        |MYC	1.75	2.60	inf	0.44""".stripMargin
    val path = java.nio.file.Paths.get(dir, "molecules.tsv")
    Files.writeString(path, mol)
    val df = spark.read.format("molecules_matrix").load(path.toString)
    assert(df.columns.toSeq ==
      Seq("sample_id", "BRCA1", "TP53", "EGFR", "MYC"))
    val rows = df.orderBy(col("sample_id")).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("TCGA-01", "TCGA-02", "TCGA-03", "TCGA-04"))
    val s1 = rows.head
    assert(s1.getDouble(1) == 2.31 && s1.getDouble(2) == 0.12 &&
      s1.getDouble(3).isNaN && s1.getDouble(4) == 1.75)
    val s3 = rows(2)
    assert(s3.getDouble(4) == Double.PositiveInfinity, "inf token must parse")
  }

  test("column pruning reaches the scan: a 2-molecule projection reads 2 lines of 500") {
    val path = writeMatrix(nMols = 500, nSamples = 40)
    val df = spark.read.format("molecules_matrix").load(path)
      .select(col("sample_id"), col("MOL7"), col("MOL444"))
    // plan-level: the scan's readSchema carries ONLY the projection
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("sample_id", "MOL7", "MOL444"),
      scans.head.scan.description())
    // value-level: the pruned read is correct
    val got = df.orderBy(col("sample_id")).collect()
    assert(got.length == 40)
    val s12 = got.find(_.getString(0) == "S12").get
    assert(s12.getDouble(1) == 7.12 && s12.getDouble(2) == 444.12)
  }

  test("sample-range partitions cover the matrix exactly once, in parallel") {
    val path = writeMatrix(nMols = 20, nSamples = 37)
    val df = spark.read.format("molecules_matrix")
      .option("numPartitions", "8").load(path)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 37)
    assert(df.select("sample_id").distinct().count() == 37)
    // spot-check a cell landing in a middle partition
    val r = df.filter(col("sample_id") === "S20")
      .select(col("MOL3")).head()
    assert(r.getDouble(0) == 3.20)
  }

  test("projecting a missing molecule fails loudly, not silently null") {
    val path = writeMatrix(nMols = 5, nSamples = 4)
    val err = intercept[Exception] {
      spark.read.format("molecules_matrix").load(path)
        .select(col("NOPE")).collect()
    }
    assert(err.getMessage.contains("NOPE"))
  }
}
