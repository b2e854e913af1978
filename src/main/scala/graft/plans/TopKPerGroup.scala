// Lives under org.apache.spark.sql to reach private[sql] surfaces
// (Dataset.ofRows, classic session) — the standard pattern for
// out-of-tree physical operators. Source location: graft/plans/.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY §7.2 tier c): per-group top-k as a
  * first-class physical operator.
  *
  * The DataFrame idiom — `row_number().over(partitionBy(g).orderBy(v
  * desc)) <= k` — must SORT every partition: O(n log n) time and O(n)
  * memory per partition, because WindowExec needs groups contiguous and
  * ordered before it can number rows. But top-k doesn't need a sort:
  * a bounded min-heap per group keeps the best k in O(n log k) time and
  * O(groups·k) memory. At 100 TB with k=3 that is the difference between
  * spilling a full sort of every partition to disk and streaming the
  * input once through fixed-size heaps.
  *
  * Pieces: [[TopKPerGroup]] (logical node) → [[TopKPerGroupOp.Strategy]]
  * (SparkStrategy) → [[TopKPerGroupExec]] (physical). The exec declares
  * `ClusteredDistribution(group)`, so EnsureRequirements inserts exactly
  * the hash Exchange the window form also needs — minus its sort.
  * Install via `TopKPerGroupOp.install` (SparkSessionExtensions) or the
  * self-registering [[TopKPerGroupOp.topKPerGroup]] entry point.
  *
  * Semantics: largest-k by `order`, NULL order values excluded (the
  * window idiom's `orderBy(desc)` ranks NULLs last, so for k < group
  * size the two agree whenever non-null rows ≥ k). Ties at the k
  * boundary keep an arbitrary valid choice — pass a unique tiebreak
  * column (e.g. a struct of value + id) for full determinism.
  */
case class TopKPerGroup(group: Seq[Expression], order: Expression, k: Int,
                        child: LogicalPlan) extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(group: Seq[Expression], order: Expression, k: Int,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(group) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (grp, ord, kk, schema) = (group, order, k, child.output)
    child.execute().mapPartitionsInternal { iter =>
      val groupProj = UnsafeProjection.create(grp, schema)
      val ordExpr = BindReferences.bindReference(ord, schema)
      val ordering = TypeUtils.getInterpretedOrdering(ord.dataType)
      val cmp = new java.util.Comparator[(Any, InternalRow)] {
        override def compare(a: (Any, InternalRow), b: (Any, InternalRow)): Int =
          ordering.compare(a._1, b._1) // min-heap: current k-th best at head
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(Any, InternalRow)]]()
      while (iter.hasNext) {
        val row = iter.next()
        val v = ordExpr.eval(row)
        if (v != null) {
          val key = groupProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[(Any, InternalRow)](kk, cmp)
            heaps.put(key.copy(), heap)
          }
          // Buffer-backed order values (UTF8String, arrays, …) returned by
          // eval(row) point into the iterator's REUSED row buffer — they
          // go stale on iter.next(). Re-evaluate against the stable copied
          // row before storing; the transient `v` is only safe for the
          // immediate comparison above/below.
          if (heap.size < kk) {
            val stable = row.copy()
            heap.add((ordExpr.eval(stable), stable)); ()
          } else if (ordering.compare(v, heap.peek()._1) > 0) {
            heap.poll()
            val stable = row.copy()
            heap.add((ordExpr.eval(stable), stable)); ()
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { h =>
        val arr = h.toArray(Array.empty[(Any, InternalRow)])
        java.util.Arrays.sort(arr, cmp.reversed()) // emit best-first
        arr.iterator.map(_._2)
      }
    }
  }
}

object TopKPerGroupOp {
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroup(g, o, k, child) =>
        TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  /** SparkSessionExtensions installer (spark.sql.extensions path). */
  def install(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => Strategy)

  /** Largest-k rows per group by `orderCol`. Self-registers the strategy
    * in the session's experimental strategies if not yet present. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${lp.output.map(_.name)}"))
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerGroup(groupCols.map(attr), attr(orderCol), k, lp))
  }
}
