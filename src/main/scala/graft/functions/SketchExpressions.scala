// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions — private[sql] expression API. Source: graft/functions/.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch: fixed-size frequency summaries for heavy-hitter
  * queries over unbounded key cardinality.
  *
  * At 100 TB an exact `groupBy(term).count()` shuffles one row per
  * distinct term — fine until the key space explodes (URLs, n-grams,
  * user agents). The CMS aggregate keeps a depth×width counter matrix
  * (e.g. 4×4096 = 128 KiB) per GROUP, updates are O(depth) per row, the
  * merge is element-wise addition — so map-side partial aggregation does
  * almost all the work and the shuffle carries one small array per group
  * regardless of cardinality. Estimates are one-sided: est ≥ true count
  * always; est ≤ true + ε·N with prob 1-δ for ε = e/width, δ = e^-depth
  * (Cormode & Muthukrishnan 2005).
  *
  * The sketch is DETERMINISTIC for a given (depth, width) — same rows in
  * any order/partitioning give bit-identical counters (addition commutes)
  * — so sketch-based results remain reproducible, replayable, and (when
  * the config is collision-free for the data's cardinality) even
  * oracle-checkable against exact SQL counts.
  *
  * Row hashing reuses [[TextHashExpressions.tokenHash]] (xxh64 over raw
  * UTF-8 bytes) with per-depth splitmix64 derivation — one real hash per
  * row, `depth` cheap mixes.
  */
object SketchExpressions {

  /** Bucket of `base` hash in depth-row `d`. */
  def bucket(base: Long, d: Int, width: Int): Int =
    java.lang.Math.floorMod(TextHashExpressions.mix64(base ^ TextHashExpressions.mix64(d.toLong)), width.toLong).toInt

  /** Probe: min over depth rows of the counter the item hashes to. */
  def estimate(sketch: ArrayData, item: UTF8String, depth: Int, width: Int): Long = {
    val base = TextHashExpressions.tokenHash(item)
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch.getLong(d * width + bucket(base, d, width))
      if (c < min) min = c
      d += 1
    }
    min
  }

  /** `cms_sketch(stringCol)`: aggregate to a flattened depth×width
    * counter matrix (array<long>, row-major). NULLs are skipped; an
    * all-NULL / empty group yields the zero sketch.
    */
  case class CountMinAgg(
      child: Expression,
      depth: Int = 4,
      width: Int = 4096,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    require(depth > 0 && width > 0)

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "cms_sketch"

    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val base = TextHashExpressions.tokenHash(v.asInstanceOf[UTF8String])
        var d = 0
        while (d < depth) { buf(d * width + bucket(base, d, width)) += 1; d += 1 }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any =
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CountMinAgg =
      copy(child = c)
  }

  /** `cms_estimate(sketch, item)`: upper-bound frequency of `item` in the
    * multiset the sketch summarizes. Codegen'd (static call, no UDF).
    */
  case class CmsEstimate(left: Expression, right: Expression,
                         depth: Int = 4, width: Int = 4096)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), StringType)
    override def prettyName: String = "cms_estimate"

    override def nullSafeEval(sketch: Any, item: Any): Any =
      SketchExpressions.estimate(sketch.asInstanceOf[ArrayData],
        item.asInstanceOf[UTF8String], depth, width)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (s, it) => {
        val G = "org.apache.spark.sql.graft.SketchExpressions"
        s"${ev.value} = $G.estimate($s, $it, $depth, $width);"
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
      copy(left = l, right = r)
  }

  def cms_sketch(c: Column, depth: Int = 4, width: Int = 4096): Column =
    ExpressionUtils.column(
      CountMinAgg(ExpressionUtils.expression(c), depth, width).toAggregateExpression())

  def cms_estimate(sketch: Column, item: Column, depth: Int = 4, width: Int = 4096): Column =
    ExpressionUtils.column(CmsEstimate(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(item), depth, width))

  /** SQL registration: cms_sketch(col) / cms_estimate(sketch, item) with
    * the default 4×4096 geometry. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cms_sketch", es => CountMinAgg(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cms_estimate",
      es => CmsEstimate(es(0), es(1)), "scala_udf")
  }
}
