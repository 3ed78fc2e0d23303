package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Per-group top-k as a first-class operator — the case where Spark's
  * built-ins genuinely cannot express the efficient plan:
  *
  *  - `TakeOrderedAndProject` is GLOBAL top-k only;
  *  - the `row_number().over(partitionBy(g).orderBy(o)) <= k` spelling
  *    fully SORTS every group. Spark 3.5+'s WindowGroupLimit pushdown
  *    (SPARK-37099) prunes rows early, but both its partial and final
  *    phases still require SORTED input — SortExec on the full
  *    candidate stream on both sides of the shuffle — and the Window
  *    operator still runs after it. Bounded heaps need no sort at
  *    all: O(n·log k) inserts vs O(n·log n) sorting, and only the k
  *    winners per group are ever ordered.
  *
  * This operator keeps a bounded k-heap per group in two phases, the
  * aggregation shape applied to top-k:
  *
  *  - [[TopKPerGroupPartialExec]] (map side, no distribution
  *    requirement): one pass per input partition, ≤ k rows retained
  *    per (group, partition) — the shuffle then carries at most
  *    k·groups·partitions rows instead of every candidate;
  *  - [[TopKPerGroupFinalExec]] (requires clustering on the group
  *    keys): merges the partials with the same bounded heap and emits
  *    each group's k best with a 1-based rank column appended.
  *
  * Never a full sort: memory is O(groups·k) per task, and only final
  * winners are ever ordered (k·log k per group). Registered via
  * `spark.experimental.extraStrategies` (done lazily by
  * [[graft.ops.TopK.perGroup]]) or `GraftExtensions`.
  *
  * Reference analog: iodf's KnnResults bounded insertion sort
  * (ml/Knn.scala:28-44 keeps only the best k distances while
  * scanning) — the same bounded-heap idea, distributed.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // the rank attribute is PRODUCED here, not consumed — without this,
  // QueryPlan counts the rankAttr constructor field among references
  // and CheckAnalysis reports it "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** shared bounded-heap pass: per partition, ≤ k best rows per group */
private[plans] object BoundedHeaps {
  def topKPerPartition(
      it: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      sortOrder: Seq[SortOrder],
      inputAttrs: Seq[Attribute],
      k: Int): java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(groupExprs, inputAttrs)
    val ord = GenerateOrdering.generate(sortOrder, inputAttrs)
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      var q = heaps.get(key)
      if (q == null) {
        // reversed ordering: the heap head is the WORST retained row
        q = new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)
        heaps.put(key.copy(), q)
      }
      if (q.size < k) q.add(row.copy())
      else if (ord.compare(row, q.peek) < 0) { q.poll(); q.add(row.copy()) }
    }
    heaps
  }
}

case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, s, attrs, kk) = (groupExprs, sortOrder, child.output, k)
    child.execute().mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      BoundedHeaps.topKPerPartition(it, g, s, attrs, kk)
        .values.iterator.asScala.flatMap(_.iterator.asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupPartialExec =
    copy(child = newChild)
}

case class TopKPerGroupFinalExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, s, attrs, kk, out) = (groupExprs, sortOrder, child.output, k, output)
    child.execute().mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val ord = GenerateOrdering.generate(s, attrs)
      // identity projection materializes UnsafeRows (consumers such as
      // collect/exchange require the unsafe format)
      val proj = UnsafeProjection.create(out, out)
      BoundedHeaps.topKPerPartition(it, g, s, attrs, kk)
        .values.iterator.asScala.flatMap { q =>
          val rows = q.toArray(new Array[InternalRow](q.size))
          java.util.Arrays.sort(rows, ord)
          rows.iterator.zipWithIndex.map { case (row, i) =>
            proj(new JoinedRow(row,
              new GenericInternalRow(Array[Any]((i + 1).toLong)))): InternalRow
          }
        }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupFinalExec =
    copy(child = newChild)
}

/** plans the logical node as partial → (exchange inserted by
  * EnsureRequirements) → final
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, s, k, rank, child) =>
      TopKPerGroupFinalExec(g, s, k, rank,
        TopKPerGroupPartialExec(g, s, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
