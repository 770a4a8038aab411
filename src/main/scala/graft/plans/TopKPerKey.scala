package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key as a WHOLE-OPERATOR physical plan — the deepest
  * extension point of the brief's ladder (custom LogicalPlan +
  * SparkStrategy + SparkPlan pair via SparkSessionExtensions), used
  * where composing built-ins genuinely can't express the execution
  * shape:
  *
  * The built-in formulation (`row_number().over(partitionBy(keys)
  * .orderBy(...)) <= k`) shuffles EVERY row to its key's reducer and
  * SORTS whole partitions — at 100 TB the shuffle carries the corpus.
  * This operator plans as a partial/final pair, the aggregate
  * pattern applied to top-k:
  *
  *  - [[TopKPerKeyPartialExec]] runs bounded per-key heaps inside
  *    each input partition — no distribution requirement, no sort;
  *    at most k rows per (key, partition) survive, so the shuffle
  *    that follows carries ≤ k·partitions rows per key, not the
  *    corpus (ScaleSpec gates the written shuffle records). Heap
  *    memory is HARD-BOUNDED: when held rows reach
  *    [[TopKHeaps.maxHeldRows]] (keys × k), the pass emits its
  *    current heaps downstream and resets — the same emit-and-reset
  *    fallback Spark's partial hash aggregate uses, so a partition
  *    of near-unique keys (e.g. keepBestPerCluster's one-key-per-
  *    document `_cl`) degrades to pass-through instead of OOMing.
  *  - [[TopKPerKeyFinalExec]] declares `ClusteredDistribution(keys)`
  *    PLUS `requiredChildOrdering(keys ++ order)` — EnsureRequirements
  *    inserts the hash exchange and a SPILLABLE SortExec — and then
  *    emits the first k rows of each key group in ONE streaming pass
  *    with O(k) state. No per-key map at the final at all, so key
  *    cardinality per partition is memory-irrelevant (the
  *    SortAggregate shape applied to top-k).
  *
  * The caller supplies a TOTAL order (order column + tiebreaks), so
  * the result is deterministic under any partitioning — the property
  * that lets q_topk_per_key hash-match a window-function oracle.
  */
case class TopKPerKeyNode(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    maxHeldRows: Int = TopKHeaps.maxHeldRows) extends UnaryNode {
  require(k >= 1, s"k must be >= 1: $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyNode = copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child, maxHeldRows) =>
      TopKPerKeyFinalExec(keys, ordering, k,
        TopKPerKeyPartialExec(keys, ordering, k, planLater(child),
          maxHeldRows)) :: Nil
    case _ => Nil
  }
}

/** Partial-pass per-key heaps: one bounded heap per key, rows copied
  * out of the reused input buffer, worst kept row at the heap root
  * for O(log k) eviction. Held rows are capped at [[maxHeldRows]];
  * on overflow the pass drains downstream and resets (correctness is
  * the final pass's job — a drained key simply ships ≤ k rows per
  * flush instead of per partition).
  */
private[graft] object TopKHeaps {
  /** Hard bound on rows retained by one partial pass (≈ a few hundred
    * MB worst-case at typical row widths — the same order as a
    * partial hash aggregate's in-memory table). */
  val maxHeldRows: Int = 1 << 21

  def partialTopK(iter: Iterator[InternalRow], keys: Seq[Expression],
      ordering: Seq[SortOrder], k: Int, input: Seq[Attribute],
      maxHeld: Int): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val keyProj = UnsafeProjection.create(keys, input)
      private val ord = RowOrdering.create(
        ordering.map(BindReferences.bindReference(_, input)), Nil)
      // PriorityQueue dequeues its MAX; with the sort order's
      // comparator (a ranks before b ⇔ compare < 0) the max IS the
      // worst kept row
      private val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
      private val maxKeys = math.max(1, maxHeld / k)
      private var heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      private var out: Iterator[InternalRow] = Iterator.empty

      private def drain(): Iterator[InternalRow] = {
        val full = heaps
        heaps = new java.util.HashMap()
        import scala.jdk.CollectionConverters._
        full.values().asScala.iterator.flatMap(_.iterator)
      }
      private def advance(): Unit = {
        while (!out.hasNext && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty(heapOrd)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < k) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
          if (heaps.size >= maxKeys) out = drain()
        }
        if (!out.hasNext && !iter.hasNext && !heaps.isEmpty) out = drain()
      }
      override def hasNext: Boolean = { advance(); out.hasNext }
      override def next(): InternalRow = { advance(); out.next() }
    }

  /** Final pass over (keys ++ ordering)-SORTED input: emit the first
    * k rows of each key group. O(k) state — one counter and one
    * copied group key. */
  def firstKPerSortedGroup(iter: Iterator[InternalRow],
      keys: Seq[Expression], k: Int,
      input: Seq[Attribute]): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val keyProj = UnsafeProjection.create(keys, input)
      private var current: UnsafeRow = null
      private var emitted = 0
      private var nextRow: InternalRow = null
      private def advance(): Unit = {
        while (nextRow == null && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          if (current == null || key != current) {
            current = key.copy(); emitted = 0
          }
          if (emitted < k) { emitted += 1; nextRow = row }
        }
      }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): InternalRow = {
        advance()
        val r = nextRow; nextRow = null; r
      }
    }
}

case class TopKPerKeyPartialExec(keys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, child: SparkPlan,
    maxHeldRows: Int = TopKHeaps.maxHeldRows)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(iter =>
      TopKHeaps.partialTopK(iter, keys, ordering, k, child.output,
        maxHeldRows))
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyPartialExec = copy(child = newChild)
}

case class TopKPerKeyFinalExec(keys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  private def groupOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ ordering
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = groupOrdering
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    groupOrdering :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(iter =>
      TopKHeaps.firstKPerSortedGroup(iter, keys, k, child.output))
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyFinalExec = copy(child = newChild)
}
