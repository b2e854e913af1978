// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions — out-of-tree Catalyst extension surface.
// Source location: graft/functions/.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Morton (Z-order) curve encoding for multi-dimensional data clustering.
  *
  * Sorting a table by one column gives perfect file-level min/max skipping
  * on that column and none on any other; interleaving the bits of two
  * columns' ranks gives GOOD skipping on both at once — each output file
  * covers a small rectangle of the (a, b) space, so a predicate on either
  * dimension prunes most files from the scan. This is the layout move
  * behind Delta/Iceberg OPTIMIZE ZORDER, expressed here as a plain
  * codegen'd expression + repartitionByRange, no table format required.
  */
object ZOrderExpressions {

  /** Bit-twiddling core, shared by interpreted eval and generated code
    * (the object's static forwarder is directly callable from codegen). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Even bits from `a`, odd bits from `b` — both taken modulo 2^32.
    * Callers rank/scale inputs into [0, 2^32) first; the helper in
    * [[graft.operators.ScaleJoins.writeZOrdered]] does a min/max scale. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** z_order2(a, b): 64-bit Morton code of two long columns. Pure
    * per-row arithmetic — codegen'd, no UDF, shuffle-friendly. */
  case class ZOrder2(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
    override def nullSafeEval(a: Any, b: Any): Any =
      interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => s"""
        ${ev.value} = org.apache.spark.sql.graft.ZOrderExpressions.interleave($x, $y);
        """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def z_order2(a: Column, b: Column): Column =
    ExpressionUtils.column(ZOrder2(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** SQL registration: z_order2(a, b). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_order2", es => ZOrder2(es(0), es(1)), "scala_udf")
}
