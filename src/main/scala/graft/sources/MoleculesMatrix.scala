package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source serving the reference's feature-major molecules
  * TSV (`/root/reference` survival inputs: rows = molecules, columns =
  * samples) as the TRANSPOSED distributed table the pipeline actually
  * wants: one row per sample, one DOUBLE column per molecule, plus
  * `sample_id`. This is the §2.1 transpose freed from the reference's
  * driver-side dense-matrix constraint: the source is partitioned on
  * SAMPLE ranges (each task materializes only its sample slice) and
  * implements `SupportsPushDownRequiredColumns`, so a fitness mask that
  * projects 20 molecules out of 20,000 parses exactly those 20 lines —
  * Catalyst's column pruning becomes LINE pruning in the file format
  * (the matrix is feature-major on disk, so a pruned column IS a
  * skipped line; non-selected lines cost one prefix comparison, never a
  * full split/parse). Cell parsing reuses `SurvivalData.parseDouble`
  * (NaN/inf token semantics identical to the batch reader).
  *
  * Usage: `spark.read.format("molecules_matrix").load(path)` (service-
  * registered short name) with optional `numPartitions`.
  */
class MoleculesMatrixSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "molecules_matrix"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MoleculesMatrixSource.schemaFor(MoleculesMatrixSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MoleculesMatrixTable(properties.get("path"), schema)
}

object MoleculesMatrixSource {
  val SampleCol = "sample_id"

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "molecules_matrix requires a path")
    p
  }

  /** Header = sample ids; first token of each body line = molecule name.
    * One driver-side skim (names only, values untouched).
    */
  def schemaFor(path: String): StructType = {
    val src = scala.io.Source.fromFile(path)
    try {
      val lines = src.getLines()
      require(lines.hasNext, s"empty molecules file: $path")
      lines.next() // header: molecule-name column + sample ids
      val mols = lines.map(l => l.substring(0, math.max(l.indexOf('\t'), 0)))
        .filter(_.nonEmpty).toArray
      require(mols.distinct.length == mols.length,
        "duplicate molecule names cannot become columns")
      StructType(StructField(SampleCol, StringType, nullable = false) +:
        mols.map(m => StructField(m, DoubleType, nullable = false)))
    } finally src.close()
  }

  def sampleIds(path: String): Array[String] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().next().split('\t').drop(1)
    finally src.close()
  }
}

class MoleculesMatrixTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"molecules_matrix($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MoleculesScanBuilder(path, tableSchema,
      Option(options.get("numPartitions")).map(_.toInt).getOrElse(4))
}

class MoleculesScanBuilder(path: String, fullSchema: StructType,
    numPartitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands the pruned struct; empty projection (count(*))
    // still needs row cardinality → keep zero value columns, emit rows
    required = requiredSchema
  override def build(): Scan = new MoleculesScan(path, required, numPartitions)
}

/** Sample-range split: partition i serves samples [lo, hi). */
case class MoleculesPartition(lo: Int, hi: Int) extends InputPartition

class MoleculesScan(path: String, required: StructType, numPartitions: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MoleculesMatrix $path cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = MoleculesMatrixSource.sampleIds(path).length
    val parts = math.max(1, math.min(numPartitions, n))
    val step = (n + parts - 1) / math.max(parts, 1)
    (0 until n by math.max(step, 1))
      .map(lo => MoleculesPartition(lo, math.min(lo + step, n)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MoleculesReaderFactory(path, required)
}

class MoleculesReaderFactory(path: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MoleculesReader(path, required,
      partition.asInstanceOf[MoleculesPartition])
}

/** Parses the feature-major file for one sample range. Lines whose
  * molecule is not in the projection cost ONE prefix comparison; needed
  * lines parse only the [lo, hi) sample slice. Task memory is
  * |projected molecules| × |sample slice| doubles — bounded by the
  * projection, never the matrix.
  */
class MoleculesReader(path: String, required: StructType,
    part: MoleculesPartition) extends PartitionReader[InternalRow] {
  private val neededMols: Array[String] =
    required.fieldNames.filter(_ != MoleculesMatrixSource.SampleCol)
  // per-output-field source: -1 = sample id, else index into `values`
  private val fieldSource: Array[Int] = required.fieldNames.map(n =>
    if (n == MoleculesMatrixSource.SampleCol) -1 else neededMols.indexOf(n))

  private val (ids, values) = {
    val molIdx = neededMols.zipWithIndex.toMap
    val vals = Array.ofDim[Array[Double]](neededMols.length)
    val src = scala.io.Source.fromFile(path)
    try {
      val lines = src.getLines()
      val header = lines.next().split('\t')
      val sliceIds = header.slice(1 + part.lo, 1 + part.hi)
      var seen = 0
      while (lines.hasNext && seen < neededMols.length) {
        val line = lines.next()
        val tab = line.indexOf('\t')
        val name = if (tab < 0) line else line.substring(0, tab)
        molIdx.get(name) match {
          case Some(i) =>
            val cells = line.split('\t')
            vals(i) = (part.lo until part.hi).map(s =>
              graft.io.SurvivalData.parseDouble(cells(s + 1))).toArray
            seen += 1
          case None => // projection-pruned line: prefix check only
        }
      }
      val missing = neededMols.indices.filter(vals(_) == null)
      require(missing.isEmpty, s"molecules absent from $path: ${
        missing.map(neededMols).mkString(",")}")
      (sliceIds, vals)
    } finally src.close()
  }

  private var cursor = -1
  override def next(): Boolean = { cursor += 1; cursor < ids.length }

  override def get(): InternalRow = {
    val out = new Array[Any](required.length)
    var o = 0
    while (o < fieldSource.length) {
      out(o) =
        if (fieldSource(o) < 0) UTF8String.fromString(ids(cursor))
        else values(fieldSource(o))(cursor)
      o += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = ()
}
