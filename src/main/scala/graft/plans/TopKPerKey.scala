package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
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
  *    corpus (ScaleSpec gates the written shuffle records);
  *  - [[TopKPerKeyFinalExec]] declares `ClusteredDistribution(keys)`
  *    (EnsureRequirements inserts the hash exchange) and merges the
  *    partials with the same heaps, emitting each key's exact top-k
  *    in sort order.
  *
  * The caller supplies a TOTAL order (order column + tiebreaks), so
  * the result is deterministic under any partitioning — the property
  * that lets q_topk_per_key hash-match a window-function oracle.
  */
case class TopKPerKeyNode(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1: $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyNode = copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child) =>
      TopKPerKeyFinalExec(keys, ordering, k,
        TopKPerKeyPartialExec(keys, ordering, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared per-partition heap pass: one bounded heap per key, rows
  * copied out of the reused input buffer, worst kept row at the heap
  * root for O(log k) eviction.
  */
private[plans] object TopKHeaps {
  def topKWithinPartition(iter: Iterator[InternalRow],
      keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
      input: Seq[Attribute], emitSorted: Boolean): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, input)
    val ord = RowOrdering.create(
      ordering.map(BindReferences.bindReference(_, input)), Nil)
    // PriorityQueue dequeues its MAX; with the sort order's comparator
    // (a ranks before b ⇔ compare < 0) the max IS the worst kept row
    val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
    val heaps = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.PriorityQueue[InternalRow]]()
    iter.foreach { row =>
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
    }
    import scala.jdk.CollectionConverters._
    heaps.values().asScala.iterator.flatMap { h =>
      if (emitSorted) h.dequeueAll.reverseIterator else h.iterator
    }
  }
}

case class TopKPerKeyPartialExec(keys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(iter =>
      TopKHeaps.topKWithinPartition(iter, keys, ordering, k, child.output,
        emitSorted = false))
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyPartialExec = copy(child = newChild)
}

case class TopKPerKeyFinalExec(keys: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(iter =>
      TopKHeaps.topKWithinPartition(iter, keys, ordering, k, child.output,
        emitSorted = true))
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyFinalExec = copy(child = newChild)
}
