package graft.io

import graft.surv.Clinical
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The cleaned survival dataset: samples×features expression matrix plus
  * the aligned clinical target.
  */
case class SurvivalDataset(
    sampleIds: Array[String],
    featureNames: Array[String],
    x: Array[Array[Double]], // samples × features, all finite
    y: Array[Clinical])

/** Survival-data ingest (`read_survival_data`,
  * /root/reference/scripts/utils.py:38-63): TSV → transpose → clean →
  * float64, with the clinical TSV as `(event, time)` per sample.
  *
  * Cleaning semantics preserved EXACTLY and in order
  * (utils.py:33-35; FIXTURES.md §1.1):
  *  1. transpose (on-disk layout is feature-major: molecules are rows);
  *  2. drop any feature column containing ≥1 NaN (NaN only — a column
  *     holding Inf but no NaN survives this step);
  *  3. drop any sample row still containing NaN or ±Inf;
  *  4. everything float64.
  *
  * Divergence (improvement, SURVEY §2.8): the reference assumes molecules
  * and clinical rows are pre-aligned positionally; here the association
  * is an explicit inner join on sample id, and samples dropped by
  * cleaning drop their clinical rows too.
  *
  * The matrix is collected dense on the driver because every fitness
  * call consumes the whole matrix via Broadcast regardless
  * (/root/reference/scripts/core.py:166-169) — the distributed ingest
  * path for matrices too wide for one TSV read is
  * [[SurvivalClean.cleanDistributed]] over a parquet/Delta matrix table.
  */
object SurvivalData {

  def parseDouble(s: String): Double =
    if (s == null || s.isEmpty) Double.NaN
    else s.trim.toLowerCase match {
      case "nan" | "na" | "" => Double.NaN
      case "inf" | "+inf" | "infinity" => Double.PositiveInfinity
      case "-inf" | "-infinity" => Double.NegativeInfinity
      case v => try v.toDouble catch { case _: NumberFormatException => Double.NaN }
    }

  /** Reads the feature-major molecules TSV and the clinical TSV, applies
    * the cleaning pipeline, returns the aligned dense dataset.
    */
  def read(spark: SparkSession, moleculesPath: String,
      clinicalPath: String): SurvivalDataset = {
    // molecules: rows = molecules, first column = molecule name,
    // remaining columns = samples
    val mol = spark.read
      .option("sep", "\t").option("header", "true")
      .csv(moleculesPath)
    val header = mol.columns
    val sampleIdsAll = header.drop(1)
    val molRows = mol.collect() // feature-major; transposed below
    val featureNamesAll = molRows.map(_.getString(0))
    // transpose: x(sample)(feature)
    val nS = sampleIdsAll.length
    val nF = featureNamesAll.length
    val xAll = Array.ofDim[Double](nS, nF)
    var f = 0
    while (f < nF) {
      val row = molRows(f)
      var s = 0
      while (s < nS) { xAll(s)(f) = parseDouble(row.getString(s + 1)); s += 1 }
      f += 1
    }
    // step 2: drop feature columns containing any NaN (NaN only)
    val keepF = (0 until nF).filter(j => !(0 until nS).exists(i => xAll(i)(j).isNaN)).toArray
    // step 3: drop sample rows containing NaN/±Inf among kept columns
    val keepS = (0 until nS).filter(i => keepF.forall(j => !xAll(i)(j).isNaN && !xAll(i)(j).isInfinite)).toArray

    // clinical: index, event, time (positional after the index —
    // utils.py:59-61)
    val clin = spark.read
      .option("sep", "\t").option("header", "true")
      .csv(clinicalPath)
    require(clin.columns.length == 3,
      s"clinical TSV must be (index, event, time); got ${clin.columns.mkString(",")}")
    val clinical: Map[String, Clinical] = clin.collect().map { r =>
      val ev = Option(r.getString(1)).getOrElse("")
      val event = ev == "1" || ev.equalsIgnoreCase("true")
      r.getString(0) -> Clinical(event, parseDouble(r.getString(2)))
    }.toMap

    // explicit alignment join (inner) on sample id
    val aligned = keepS.filter(i => clinical.contains(sampleIdsAll(i)))
    SurvivalDataset(
      sampleIds = aligned.map(sampleIdsAll),
      featureNames = keepF.map(featureNamesAll),
      x = aligned.map(i => keepF.map(j => xAll(i)(j))),
      y = aligned.map(i => clinical(sampleIdsAll(i))))
  }
}

/** Distributed twin of the cleaning pipeline for matrices that live as a
  * wide parquet table (samples as rows): the same column-then-row NaN/Inf
  * semantics, planned by Catalyst — the per-column NaN scan is one
  * aggregate pass, the row filter is codegen'd and pushed over the scan.
  */
object SurvivalClean {

  def isBadCol(c: String) = isnan(col(c)) || col(c).isNull

  /** Step 2+3 of the cleaning contract on a DataFrame whose non-id
    * columns are numeric: drop any-NaN columns, then NaN/Inf rows.
    */
  def cleanDistributed(df: DataFrame, idCols: Seq[String]): DataFrame = {
    val valueCols = df.columns.filterNot(idCols.contains)
    // one aggregate pass: does column c contain a NaN?
    val flags = df.agg(
      max(when(isBadCol(valueCols.head), 1).otherwise(0)).as(valueCols.head),
      valueCols.tail.map(c => max(when(isBadCol(c), 1).otherwise(0)).as(c)): _*
    ).collect()(0)
    val keep = valueCols.zipWithIndex.filter { case (_, i) => flags.getInt(i) == 0 }.map(_._1)
    val kept = df.select((idCols ++ keep).map(col): _*)
    val finite = keep.map(c =>
      !(isnan(col(c)) || col(c).isNull ||
        col(c) === Double.PositiveInfinity || col(c) === Double.NegativeInfinity))
    if (finite.isEmpty) kept else kept.filter(finite.reduce(_ && _))
  }
}
