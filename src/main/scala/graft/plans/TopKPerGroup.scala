package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Per-group top-k as a first-class operator — the case where Spark's
  * built-ins genuinely cannot express the efficient plan:
  *
  *  - `TakeOrderedAndProject` is GLOBAL top-k only;
  *  - the `row_number().over(partitionBy(g).orderBy(o)) <= k` spelling
  *    fully SORTS every input partition. Spark 3.5+'s WindowGroupLimit
  *    pushdown (SPARK-37099) prunes rows early, but both its partial
  *    and final phases still require SORTED input — SortExec on the
  *    full candidate stream on both sides of the shuffle — and the
  *    Window operator still runs after it.
  *
  * Plan shape here:
  *
  *  - [[TopKPerGroupPartialExec]] (map side, no distribution or
  *    ordering requirement): one bounded-heap pass per input
  *    partition, O(n·log k) inserts and NO sort of the input. Memory
  *    is bounded by construction: when the retained-row count (sum of
  *    heap sizes) reaches `budgetRows`, the heaps are FLUSHED
  *    downstream and rebuilt — flushing is always safe in a partial
  *    phase (it only forwards more candidates; the final phase
  *    re-selects), so high group cardinality degrades to extra
  *    shuffle rows, never to an executor OOM. Budget is configurable
  *    via `graft.topk.partialBudgetRows` (default 1M retained rows —
  *    roughly 100 MB at 100 B/row, far below per-task execution
  *    memory at any sane executor sizing).
  *  - [[TopKPerGroupFinalExec]] (requires clustering on the group
  *    keys AND (group, sortOrder) ordering): a streaming scan that
  *    emits the first k rows of each group with a 1-based rank.
  *    Memory is O(1) per task; the ordering requirement plans a
  *    SortExec over the PRUNED partial output (≤ k rows per group per
  *    map partition) — and SortExec spills under memory pressure, so
  *    the 100 TB posture holds for arbitrarily many groups per task.
  *
  * The full input is never sorted: the only sort in the plan is the
  * spillable one over partial winners. Registered via
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

/** bounded-heap partial pass with a hard memory budget */
private[plans] object BoundedHeaps {
  val BudgetConfKey = "graft.topk.partialBudgetRows"
  val DefaultBudgetRows = 1 << 20

  /** One pass over a partition keeping ≤ k best rows per group seen so
    * far; whenever total retained rows reach `budgetRows` the current
    * heaps are emitted and cleared (correct for a PARTIAL phase — the
    * final phase re-selects winners), so task memory is O(budgetRows)
    * regardless of group cardinality.
    */
  def partialTopK(
      it: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      sortOrder: Seq[SortOrder],
      inputAttrs: Seq[Attribute],
      k: Int,
      budgetRows: Int): Iterator[InternalRow] = new Iterator[InternalRow] {
    private val keyProj = UnsafeProjection.create(groupExprs, inputAttrs)
    private val ord = GenerateOrdering.generate(sortOrder, inputAttrs)
    private var heaps =
      new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    private var retained = 0
    private var drain: Iterator[InternalRow] = Iterator.empty

    private def snapshot(): Iterator[InternalRow] = {
      import scala.jdk.CollectionConverters._
      val old = heaps
      heaps = new java.util.HashMap()
      retained = 0
      old.values.iterator.asScala.flatMap(_.iterator.asScala)
    }

    private def fill(): Unit = {
      while (!drain.hasNext && it.hasNext) {
        var flushed = false
        while (it.hasNext && !flushed) {
          val row = it.next()
          val key = keyProj(row)
          var q = heaps.get(key)
          if (q == null) {
            // reversed ordering: the heap head is the WORST retained row
            q = new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)
            heaps.put(key.copy(), q)
          }
          if (q.size < k) { q.add(row.copy()); retained += 1 }
          else if (ord.compare(row, q.peek) < 0) { q.poll(); q.add(row.copy()) }
          if (retained >= budgetRows) { drain = snapshot(); flushed = true }
        }
      }
      if (!drain.hasNext && !it.hasNext && !heaps.isEmpty) drain = snapshot()
    }

    override def hasNext: Boolean = { fill(); drain.hasNext }
    override def next(): InternalRow = {
      fill(); drain.next()
    }
  }
}

case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    budgetRows: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, s, attrs, kk, budget) = (groupExprs, sortOrder, child.output, k, budgetRows)
    child.execute().mapPartitions { it =>
      BoundedHeaps.partialTopK(it, g, s, attrs, kk, budget)
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
  // sorted (group, order) input → the final pass is a streaming scan
  // with O(1) task memory; the sort this requirement plans runs over
  // the PRUNED partial output and spills under pressure (the r3
  // hash-of-heaps final held every group's heap in an unaccounted
  // HashMap — an OOM risk at high group cardinality per task)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (groupExprs.map(e => SortOrder(e, Ascending)) ++ sortOrder) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, attrs, kk, out) = (groupExprs, child.output, k, output)
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(g, attrs)
      // identity projection materializes UnsafeRows (consumers such as
      // collect/exchange require the unsafe format)
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val rank = new GenericInternalRow(1)
      var cur: UnsafeRow = null
      var emitted = 0L
      it.flatMap { row =>
        val key = keyProj(row)
        if (cur == null || key != cur) { cur = key.copy(); emitted = 0L }
        if (emitted < kk) {
          emitted += 1
          rank.update(0, emitted)
          Iterator.single(proj(joined(row, rank)): InternalRow)
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupFinalExec =
    copy(child = newChild)
}

/** plans the logical node as partial → (exchange + spillable sort
  * inserted by EnsureRequirements) → streaming final
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, s, k, rank, child) =>
      val raw = SQLConf.get
        .getConfString(BoundedHeaps.BudgetConfKey,
          BoundedHeaps.DefaultBudgetRows.toString)
      val parsed =
        try raw.trim.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"${BoundedHeaps.BudgetConfKey} must be a positive integer row " +
            s"count, got '$raw'")
        }
      // clamp to at least k: a budget below the heap size would flush
      // per row and silently destroy the partial operator's pruning
      val budget = math.max(k, parsed)
      TopKPerGroupFinalExec(g, s, k, rank,
        TopKPerGroupPartialExec(g, s, k, budget, planLater(child))) :: Nil
    case _ => Nil
  }
}
