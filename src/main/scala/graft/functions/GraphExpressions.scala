// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions — private[sql] expression API. Source: graft/functions/.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Fixed-point PageRank over a BOUNDED-domain edge list, evaluated in one
  * expression call (guide §8: decide with small rows — here the "small
  * rows" are the aggregated edge table itself).
  *
  * [[graft.operators.Graph.pageRankInt]] runs each synchronous sweep as a
  * distributed join + aggregation: the right shape when |V| is
  * corpus-scale, but pure per-sweep fixed overhead when the vertex domain
  * is schema-bounded (event TYPES, status codes, categories — dozens of
  * values at ANY corpus size). For that case the whole iteration fits in
  * one row: `collect_list` the ≤|T|² aggregated edges, run every sweep
  * in-task with this expression, explode the result. The corpus-sized
  * edge ROLLUP stays fully distributed; only the bounded aggregate enters
  * the loop — no driver collect, no per-sweep jobs.
  *
  * Arithmetic is copied op-for-op from [[graft.operators.Graph.pageRankInt]]
  * (same Long fixed-point, same `DIV` truncation on nonnegative values,
  * same dangling-mass redistribution), so the two forms are bit-identical
  * — GraphSpec asserts equality on shared inputs.
  */
object GraphExpressions {

  /** `pagerank_sweeps(edges)`: edges is array<struct<src, dst, w:long>>
    * (src/dst any orderable key type — evaluated generically); returns
    * array<struct<node, r:long>> with one entry per distinct node.
    * Empty/null edge array → empty result (the distributed form throws;
    * callers gate on nonempty edge tables).
    */
  case class PageRankSweeps(
      child: Expression,
      iters: Int,
      scale: Long,
      dampNum: Long,
      dampDen: Long)
    extends UnaryExpression with CodegenFallback {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)

    private lazy val edgeStruct: StructType =
      child.dataType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[StructType]
    private lazy val nodeType: DataType = edgeStruct.fields(0).dataType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(st: StructType, _)
          if st.length == 3 && st.fields(2).dataType == LongType &&
            st.fields(0).dataType == st.fields(1).dataType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"pagerank_sweeps expects array<struct<k, k, long>>, got $other")
      }

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("node", nodeType, nullable = false),
        StructField("r", LongType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false
    override def prettyName: String = "pagerank_sweeps"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericArrayData(Array.empty[Any])
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val srcs = new Array[Any](m)
      val dsts = new Array[Any](m)
      val ws = new Array[Long](m)
      // defensive copy of string keys: values read out of an unsafe input
      // buffer must not outlive the eval call by reference
      def owned(v: Any): Any = v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
        case x => x
      }
      var i = 0
      while (i < m) {
        val row = arr.getStruct(i, 3)
        srcs(i) = owned(row.get(0, nodeType))
        dsts(i) = owned(row.get(1, nodeType))
        ws(i) = row.getLong(2)
        i += 1
      }
      // node index: distinct srcs ∪ dsts (iteration order irrelevant —
      // every op below is order-independent integer arithmetic)
      val idx = new java.util.LinkedHashMap[Any, Integer]()
      def intern(k: Any): Int = {
        val got = idx.get(k)
        if (got != null) got.intValue()
        else { val id = idx.size(); idx.put(k, id); id }
      }
      val es = new Array[Int](m); val ed = new Array[Int](m)
      i = 0
      while (i < m) { es(i) = intern(srcs(i)); ed(i) = intern(dsts(i)); i += 1 }
      val n = idx.size()
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      val hasOut = new Array[Boolean](n)
      val wout = new Array[Long](n)
      i = 0
      while (i < m) { hasOut(es(i)) = true; wout(es(i)) += ws(i); i += 1 }
      // mirror pageRankInt exactly: all quantities nonnegative, so Long./
      // matches Spark's DIV on every step
      val teleport = (scale * (dampDen - dampNum) / dampDen) / n
      var r = Array.fill(n)(scale / n)
      var it = 0
      while (it < iters) {
        var dangling = 0L
        var j = 0
        while (j < n) { if (!hasOut(j)) dangling += r(j); j += 1 }
        val share = dangling / n
        val c = new Array[Long](n)
        i = 0
        while (i < m) {
          c(ed(i)) += (r(es(i)) * ws(i)) / wout(es(i))
          i += 1
        }
        val next = new Array[Long](n)
        j = 0
        while (j < n) {
          next(j) = (dampNum * (c(j) + share)) / dampDen + teleport
          j += 1
        }
        r = next
        it += 1
      }
      val out = new Array[Any](n)
      val keys = idx.keySet().iterator()
      var j = 0
      while (keys.hasNext) {
        out(j) = InternalRow(keys.next(), r(j))
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): PageRankSweeps =
      copy(child = newChild)
  }

  def pagerank_sweeps(edges: Column, iters: Int, scale: Long,
                      dampNum: Long, dampDen: Long): Column =
    ExpressionUtils.column(PageRankSweeps(
      ExpressionUtils.expression(edges), iters, scale, dampNum, dampDen))

  /** `cc_inline(edges)`: exact connected components over an in-row edge
    * list — edges is array<struct<k, k>>, result array<struct<id: k,
    * component: k>> with one entry per distinct endpoint and
    * component = MINIMUM member id (the [[graft.operators.DedupClusters]]
    * labeling convention). Union-find with path compression + union by
    * size, then a min-resolution pass — O(E α(E)). Self-loops are ignored
    * (their endpoints still appear, self-labeled); empty/null input →
    * empty result.
    *
    * This is the small-graph arm of
    * [[graft.operators.DedupClusters.connectedComponents]]'s size-adaptive
    * dispatch: near-dup pair lists are usually tiny relative to the
    * corpus, and the distributed star loop pays several shuffle rounds of
    * fixed overhead regardless of size. One task holding ≤ limit edges
    * (~16 B each) replaces the whole loop; the loop remains the arm for
    * pair lists above the limit.
    */
  case class ConnectedComponentsInline(child: Expression)
    extends UnaryExpression with CodegenFallback {

    private lazy val edgeStruct: StructType =
      child.dataType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[StructType]
    private lazy val nodeType: DataType = edgeStruct.fields(0).dataType
    private lazy val ordering: Ordering[Any] =
      org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(nodeType).asInstanceOf[Ordering[Any]]

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(st: StructType, _)
          if st.length == 2 && st.fields(0).dataType == st.fields(1).dataType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"cc_inline expects array<struct<k, k>>, got $other")
      }

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("id", nodeType, nullable = false),
        StructField("component", nodeType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false
    override def prettyName: String = "cc_inline"

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) return new GenericArrayData(Array.empty[Any])
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      def owned(x: Any): Any = x match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
        case o => o
      }
      val idx = new java.util.LinkedHashMap[Any, Integer]()
      def intern(k: Any): Int = {
        val got = idx.get(k)
        if (got != null) got.intValue()
        else { val id = idx.size(); idx.put(k, id); id }
      }
      val ea = new Array[Int](m); val eb = new Array[Int](m)
      var i = 0
      while (i < m) {
        val row = arr.getStruct(i, 2)
        ea(i) = intern(owned(row.get(0, nodeType)))
        eb(i) = intern(owned(row.get(1, nodeType)))
        i += 1
      }
      val n = idx.size()
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      val parent = Array.tabulate(n)(identity)
      val sz = Array.fill(n)(1)
      def find(x0: Int): Int = {
        var x = x0
        while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
        x
      }
      i = 0
      while (i < m) {
        val ra = find(ea(i)); val rb = find(eb(i))
        if (ra != rb) {
          if (sz(ra) >= sz(rb)) { parent(rb) = ra; sz(ra) += sz(rb) }
          else { parent(ra) = rb; sz(rb) += sz(ra) }
        }
        i += 1
      }
      // component label = minimum member id, resolved per root
      val keys = new Array[Any](n)
      val it = idx.keySet().iterator()
      var j = 0
      while (it.hasNext) { keys(j) = it.next(); j += 1 }
      val minOf = new Array[Any](n)
      j = 0
      while (j < n) {
        val r = find(j)
        if (minOf(r) == null || ordering.lt(keys(j), minOf(r))) minOf(r) = keys(j)
        j += 1
      }
      val out = new Array[Any](n)
      j = 0
      while (j < n) {
        out(j) = InternalRow(keys(j), minOf(find(j)))
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): ConnectedComponentsInline =
      copy(child = newChild)
  }

  def cc_inline(edges: Column): Column =
    ExpressionUtils.column(ConnectedComponentsInline(
      ExpressionUtils.expression(edges)))
}
