// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions — private[sql] expression API. Source: graft/functions/.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The curation quality gate's three raw signals in ONE byte pass
  * (optimization guide §1.2 step 2 / §4.1: replace repeated regex-engine
  * passes in the hot path with a single codegen'd scan).
  *
  * `quality_signals(text)` = struct(
  *   n_tokens = size(split(text, "\\s+")),
  *   n_punct  = length(text) - length(regexp_replace(text, "[.,!?;:]", "")),
  *   n_the    = regexp_count(text, "\\bthe\\b"))
  *
  * Bit-equivalence argument (QualityExprSpec proves it generatively,
  * unicode and whitespace corners included):
  *
  *  - Java's `\s` is ASCII-only ([ \t\n\x0B\f\r]); each is a single UTF-8
  *    byte, and bytes of a multi-byte sequence are ≥ 0x80, so a byte scan
  *    sees exactly the regex's separator positions. `split(s, re, -1)`
  *    yields (#maximal separator runs) + 1 fields (leading/trailing runs
  *    produce leading/trailing empty fields, which the -1 limit keeps —
  *    Spark's two-arg `split` uses limit -1), so n_tokens is that count.
  *  - The punctuation class is six ASCII bytes; `length` counts code
  *    points and each removed char is one code point, so the difference
  *    is the byte-occurrence count.
  *  - `\b` around the literal `the`: Java's `\b` is UNICODE-aware even
  *    though its `\w` is ASCII — the boundary predicate is
  *    `ch == '_' || Character.isLetterOrDigit(ch)` over full code points
  *    (OpenJDK Pattern.isWord), so `éthe` has NO boundary before the `t`.
  *    The scan decodes the single adjacent code point (backward for the
  *    preceding one, forward for the following) only when it is
  *    non-ASCII. Qualifying matches can never overlap (a second `the`
  *    starting inside the first would need its preceding char to be a
  *    word char), so counting every qualifying byte position equals the
  *    regex's non-overlapping match count.
  */
object QualityExpressions {

  private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Decode the UTF-8 code point whose lead byte is at `p`. */
  private def cpAt(base: Object, off: Long, p: Int): Int = {
    val b0 = Platform.getByte(base, off + p) & 0xFF
    if (b0 < 0x80) b0
    else if (b0 < 0xE0)
      ((b0 & 0x1F) << 6) | (Platform.getByte(base, off + p + 1) & 0x3F)
    else if (b0 < 0xF0)
      ((b0 & 0x0F) << 12) |
        ((Platform.getByte(base, off + p + 1) & 0x3F) << 6) |
        (Platform.getByte(base, off + p + 2) & 0x3F)
    else
      ((b0 & 0x07) << 18) |
        ((Platform.getByte(base, off + p + 1) & 0x3F) << 12) |
        ((Platform.getByte(base, off + p + 2) & 0x3F) << 6) |
        (Platform.getByte(base, off + p + 3) & 0x3F)
  }

  /** Is the code point ENDING at byte `e − 1` a `\b` word char? (walks
    * back over continuation bytes to the lead byte, ASCII fast path) */
  private def isWordCpEndingAt(base: Object, off: Long, e: Int): Boolean = {
    val last = Platform.getByte(base, off + e - 1)
    if (last >= 0) isWordCp(last)
    else {
      var s = e - 1
      while (s > 0 && (Platform.getByte(base, off + s) & 0xC0) == 0x80) s -= 1
      isWordCp(cpAt(base, off, s))
    }
  }

  def qualitySignals(s: UTF8String): InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var sepRuns = 0
    var inSep = false
    var punct = 0
    var the = 0
    var p = 0
    while (p < len) {
      val b = Platform.getByte(base, off + p)
      if (b == 0x20 || (b >= 0x09 && b <= 0x0D)) {
        if (!inSep) sepRuns += 1
        inSep = true
      } else inSep = false
      if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':')
        punct += 1
      if (b == 't' && p + 2 < len &&
          Platform.getByte(base, off + p + 1) == 'h' &&
          Platform.getByte(base, off + p + 2) == 'e' &&
          (p == 0 || !isWordCpEndingAt(base, off, p)) &&
          (p + 3 == len || !isWordCp(cpAt(base, off, p + 3))))
        the += 1
      p += 1
    }
    new GenericInternalRow(Array[Any](sepRuns + 1, punct, the))
  }

  val signalsSchema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_the", IntegerType, nullable = false)))

  case class QualitySignals(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = signalsSchema
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def nullSafeEval(a: Any): Any =
      qualitySignals(a.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val G = "org.apache.spark.sql.graft.QualityExpressions"
        s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $G.qualitySignals($a);"
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def quality_signals(text: Column): Column =
    ExpressionUtils.column(QualitySignals(ExpressionUtils.expression(text)))
}
