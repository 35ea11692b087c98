package org.apache.spark.sql.graftfn

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
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

case class TopKPerGroupExec(group: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

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

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortExprs = order
    val childOutput = child.output
    val limit = k
    val isPartial = partial
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    val maxHeapRows = longMetric("maxHeapRows")
    child.execute().mapPartitionsInternal { rows =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // rank-1-first total order; the heap keeps the k best by evicting
      // the current worst (a max-heap under the reversed ordering)
      val better = RowOrdering.create(sortExprs, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val worstFirst = new java.util.Comparator[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = better.compare(b, a)
      }
      rows.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (better.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      numGroups.add(heaps.size())
      var peakHeap = 0L
      val sizeIt = heaps.values().iterator()
      while (sizeIt.hasNext) peakHeap = math.max(peakHeap, sizeIt.next().size())
      maxHeapRows.add(peakHeap) // size-metric max stat across tasks = global peak
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
          def next(): InternalRow = { numOutputRows += 1; cur.next() }
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
          def next(): InternalRow = { numOutputRows += 1; cur.next() }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
