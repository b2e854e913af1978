// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions — private[sql] expression API. Source: graft/functions/.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Custom aggregate functions the built-in surface lacks.
  *
  * [[ElementwiseMinAgg]] is the MinHash-union primitive: the element-wise
  * minimum of per-row long arrays. min-over-rows of a MinHash signature IS
  * the signature of the UNION of the underlying sets, so aggregating doc
  * signatures per cluster/group yields group-level signatures in one
  * shuffle — the building block of hierarchical dedup. Implemented as a
  * TypedImperativeAggregate: the buffer is a primitive long[], updates and
  * merges are tight array loops, and partial aggregation (map-side
  * combine) applies as with any Spark aggregate.
  */
object AggExpressions {

  /** Element-wise minimum of `array<long>` values across rows. Arrays of
    * different lengths combine over their common prefix; empty arrays and
    * NULLs are ignored; an all-NULL group yields NULL.
    */
  case class ElementwiseMinAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "elementwise_min"

    override def createAggregationBuffer(): Array[Long] = null

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) buf
      else {
        val arr = v.asInstanceOf[ArrayData].toLongArray()
        if (arr.isEmpty) buf
        else if (buf == null) arr // toLongArray returns a fresh array — safe to own
        else combine(buf, arr)
      }
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      if (b1 == null) b2 else if (b2 == null) b1 else combine(b1, b2)

    private def combine(into: Array[Long], from: Array[Long]): Array[Long] = {
      if (from.length < into.length) {
        // common-prefix semantics: result length = min length
        var i = 0
        while (i < from.length) { if (into(i) < from(i)) from(i) = into(i); i += 1 }
        from
      } else {
        var i = 0
        while (i < into.length) { if (from(i) < into(i)) into(i) = from(i); i += 1 }
        into
      }
    }

    override def eval(buf: Array[Long]): Any =
      if (buf == null) null else new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] =
      if (buf == null) Array.emptyByteArray
      else {
        val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
        buf.foreach(bb.putLong)
        bb.array()
      }

    override def deserialize(bytes: Array[Byte]): Array[Long] =
      if (bytes.isEmpty) null
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        Array.fill(bytes.length / 8)(bb.getLong)
      }

    override def withNewMutableAggBufferOffset(o: Int): ElementwiseMinAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ElementwiseMinAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): ElementwiseMinAgg =
      copy(child = c)
  }

  def elementwise_min(c: Column): Column =
    ExpressionUtils.column(
      ElementwiseMinAgg(ExpressionUtils.expression(c)).toAggregateExpression())

  /** SQL registration: `elementwise_min(array_col)`. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "elementwise_min", es => ElementwiseMinAgg(es.head), "scala_udf")
}
