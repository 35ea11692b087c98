package org.apache.spark.sql.graftfn

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Native per-group top-k — the full custom-operator spectrum
  * (LogicalPlan → Strategy → SparkPlan), for the case where the window
  * formulation is structurally wasteful: `row_number over (partition by
  * g order by o) <= k` SORTS every group's full row set, while top-k
  * needs only a bounded heap.
  *
  * Physical shape: a PARTIAL node prunes each input partition to ≤k rows
  * per group (bounded heaps, no sort of the input), the exchange then
  * moves only survivors (≤ k·groups·partitions rows instead of
  * everything), and the FINAL node (clustered on the group) merges heaps
  * and emits ranked rows. Memory per task is O(groups-per-partition · k)
  * — the HashAggregate contract — vs the window's full-partition
  * buffer+sort.
  *
  * The ordering must be total (include a tiebreak key) for deterministic
  * ranks, same as `row_number`.
  */
object TopKPerGroupNative {

  /** Sort key by column name; `desc = true` ranks highest-first. */
  case class Key(name: String, desc: Boolean = false)

  /** Installs the strategy into the session (idempotent; the public
    * `spark.experimental.extraStrategies` hook, usable without rebuilding
    * the session — `GraftSparkExtensions` is the config-file path) and
    * plans the operator.
    *
    * Columns are taken by NAME and built as catalyst
    * `UnresolvedAttribute`s: the Spark-4 Column API wraps expressions in
    * lazily-converted `ColumnNodeExpression` nodes that the analyzer
    * only converts inside built-in operators — inside a custom logical
    * node they survive to execution unresolved.
    */
  def topKPerGroup(df: DataFrame, group: Seq[String], order: Seq[Key],
      k: Int, rankCol: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val sortOrders = order.map { key =>
      SortOrder(UnresolvedAttribute.quoted(key.name),
        if (key.desc) Descending else Ascending)
    }
    // LongType rank: matches SQL row_number()'s BIGINT (DuckDB and the
    // driver hash are dtype-sensitive — see the q12 HUGEINT incident)
    val rank = AttributeReference(rankCol, LongType, nullable = false)()
    val plan = TopKPerGroupPlan(
      group.map(UnresolvedAttribute.quoted(_): Expression),
      sortOrders, k, rank, df.queryExecution.analyzed)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }
}

case class TopKPerGroupPlan(group: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(group, order, k, rank, child) =>
      val partial = TopKPerGroupExec(group, order, k, rank,
        partial = true, planLater(child))
      TopKPerGroupExec(group, order, k, rank, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Per-partition runtime of [[TopKPerGroupExec]] — shared by the
  * interpreted path and generated code (which sees it as a plain class
  * with `insert` / `resultIterator` / metric getters). One instance per
  * task; heaps are bounded at k rows per group by construction.
  */
final class TopKPartitionState(groupExprs: Seq[Expression],
    sortExprs: Seq[SortOrder], childOutput: Seq[Attribute], limit: Int,
    isPartial: Boolean, outAttrs: Seq[Attribute]) {
  private val keyProj = UnsafeProjection.create(groupExprs, childOutput)
  // rank-1-first total order; the heap keeps the k best by evicting
  // the current worst (a max-heap under the reversed ordering)
  private val better = RowOrdering.create(sortExprs, childOutput)
  private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
  private val worstFirst = new java.util.Comparator[InternalRow] {
    def compare(a: InternalRow, b: InternalRow): Int = better.compare(b, a)
  }
  // stored rows are ALWAYS UnsafeRow copies: the codegen produce loop
  // hands partial-node output to the parent pipeline typed as UnsafeRow
  private val toUnsafe = UnsafeProjection.create(childOutput, childOutput)

  def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
      heaps.put(key.copy(), heap)
    }
    def stored: InternalRow = row match {
      case u: UnsafeRow => u.copy()
      case r => toUnsafe(r).copy()
    }
    if (heap.size() < limit) heap.add(stored)
    else if (better.compare(row, heap.peek()) < 0) {
      heap.poll(); heap.add(stored)
    }
  }

  def numGroups: Long = heaps.size().toLong

  def peakHeapRows: Long = {
    var peak = 0L
    val it = heaps.values().iterator()
    while (it.hasNext) peak = math.max(peak, it.next().size())
    peak
  }

  def resultIterator(): Iterator[InternalRow] = {
    val groupsIter = heaps.values().iterator()
    if (isPartial) {
      // emit survivors unranked; the final node re-prunes after the
      // exchange co-locates each group
      new Iterator[InternalRow] {
        private var cur: java.util.Iterator[InternalRow] = _
        def hasNext: Boolean = {
          while ((cur == null || !cur.hasNext) && groupsIter.hasNext)
            cur = groupsIter.next().iterator()
          cur != null && cur.hasNext
        }
        def next(): InternalRow = cur.next()
      }
    } else {
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        def hasNext: Boolean = {
          while (!cur.hasNext && groupsIter.hasNext) {
            val heap = groupsIter.next()
            val arr = new Array[InternalRow](heap.size())
            var i = arr.length - 1
            while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // worst out first
            cur = arr.iterator.zipWithIndex.map { case (r, idx) =>
              rankRow.update(0, (idx + 1).toLong)
              proj(joined(r, rankRow)): InternalRow
            }
          }
          cur.hasNext
        }
        def next(): InternalRow = cur.next()
      }
    }
  }
}

case class TopKPerGroupExec(group: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  // rankAttr is an operator argument, not an input reference — without
  // this the plan prints the missing-input `!` marker
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(group))

  /** numGroups on the final node is the true group count (exchange
    * clusters each group into one partition); on the partial node it is
    * the sum of per-partition group occurrences. maxHeapRows accumulates
    * each task's PEAK heap size, so its merged value is ≤ k · tasks iff
    * every task honored the bounded-memory contract — the assertable
    * form of "no task ever buffered more than k rows per group".
    */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"),
    "maxHeapRows" -> SQLMetrics.createMetric(sparkContext, "sum of per-task peak heap rows"))

  /** Called from generated code (and the interpreted path) once per task. */
  def createPartitionState(): TopKPartitionState =
    new TopKPartitionState(group, order, child.output, k, partial, output)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    val maxHeapRows = longMetric("maxHeapRows")
    child.execute().mapPartitionsInternal { rows =>
      val state = createPartitionState()
      rows.foreach(state.insert)
      numGroups.add(state.numGroups)
      maxHeapRows.add(state.peakHeapRows)
      state.resultIterator().map { r => numOutputRows += 1; r }
    }
  }

  // ---- whole-stage codegen (SortExec-style blocking operator): the
  // child pipeline stays fused — its generated loop calls insert() per
  // row with no iterator boundary — and the pruned output feeds the
  // parent pipeline row by row.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // the final node re-projects every output through one reused UnsafeRow
  // buffer, so in-pipeline parents that buffer rows must copy; the
  // partial node emits the distinct stored heap rows
  override def needCopyResult: Boolean = !partial

  // set in doProduce, read by doConsume (doConsume runs while generating
  // the child's produce inside doProduce — same trick SortExec uses)
  private var stateTerm: String = _

  override def doProduce(ctx: CodegenContext): String = {
    val needInput = ctx.addMutableState("boolean", "topkNeedInput", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("topkPlan", this)
    stateTerm = ctx.addMutableState(classOf[TopKPartitionState].getName, "topkState")
    val outIter = ctx.addMutableState("scala.collection.Iterator", "topkOutput")
    val addInput = ctx.freshName("addInputToTopK")
    val addInputFunc = ctx.addNewFunction(addInput,
      s"""
         |private void $addInput() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin)
    val numOutput = metricTerm(ctx, "numOutputRows")
    val numGroups = metricTerm(ctx, "numGroups")
    val maxHeap = metricTerm(ctx, "maxHeapRows")
    val outputRow = ctx.freshName("topkOutputRow")
    s"""
       |if ($needInput) {
       |  $stateTerm = $thisPlan.createPartitionState();
       |  $addInputFunc();
       |  $numGroups.add($stateTerm.numGroups());
       |  $maxHeap.add($stateTerm.peakHeapRows());
       |  $outIter = $stateTerm.resultIterator();
       |  $needInput = false;
       |}
       |while ($limitNotReachedCond $outIter.hasNext()) {
       |  org.apache.spark.sql.catalyst.expressions.UnsafeRow $outputRow =
       |    (org.apache.spark.sql.catalyst.expressions.UnsafeRow) $outIter.next();
       |  $numOutput.add(1);
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String =
    s"""
       |${row.code}
       |$stateTerm.insert(${row.value});
     """.stripMargin

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
