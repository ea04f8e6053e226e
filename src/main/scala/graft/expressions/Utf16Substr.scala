package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF-16-unit substring as a native codegen'd Catalyst expression —
  * the offset bridge the ExactSubstr span family needs (see
  * [[graft.llm.Dedup.rollingHashWindows]], which produces positions by
  * indexing `java.lang.String` chars, i.e. UTF-16 units).
  *
  * Spark's builtin `substr` counts CODE POINTS; `String.substring`
  * counts UTF-16 units. The two agree only on BMP text, so an operator
  * that produces offsets on the JVM side and consumes them with the
  * builtin silently mis-slices any document containing a surrogate
  * pair (emoji — routine in a scraped training corpus). This
  * expression consumes 1-based UTF-16 positions directly, walking the
  * UTF-8 bytes without decoding: a 4-byte UTF-8 sequence is exactly
  * one supplementary code point, i.e. two UTF-16 units; every shorter
  * sequence is one unit. Extraction is a byte-range copy
  * (`copyUTF8String`), no String round-trip.
  *
  * Returns NULL when the requested window is not representable:
  * `pos < 1`, the window overruns the end of the string, or either
  * boundary would SPLIT a surrogate pair (the byte walk cannot land
  * inside a code point). The producer side applies the same skip rule,
  * so for producer-emitted positions this never fires; the null is the
  * loud channel for foreign offsets rather than a silent mis-slice —
  * and it doubles as the validity filter for span re-splitting, where
  * interior positions of a merged span can legitimately fall on the
  * low half of a pair.
  */
object Utf16SubstrKernel {
  /** Extract `len` UTF-16 units starting at 1-based UTF-16 unit
    * position `pos1`; null if out of range or pair-splitting. */
  def utf16Substr(s: UTF8String, pos1: Long, len: Int): UTF8String = {
    val target = pos1 - 1L
    if (target < 0 || len < 0) return null
    val nb = s.numBytes()
    var bi = 0
    var u = 0L
    while (u < target && bi < nb) {
      val w = UTF8String.numBytesForFirstByte(s.getByte(bi))
      u += (if (w == 4) 2 else 1)
      bi += w
    }
    // u > target ⇔ the requested start is the LOW half of a surrogate
    // pair; u < target ⇔ the start is past the end of the string.
    if (u != target) return null
    val startB = bi
    var rem = len
    while (rem > 0 && bi < nb) {
      val w = UTF8String.numBytesForFirstByte(s.getByte(bi))
      rem -= (if (w == 4) 2 else 1)
      bi += w
    }
    // rem < 0 ⇔ the window end splits a pair; rem > 0 ⇔ string too short.
    if (rem != 0) return null
    if (startB == bi) UTF8String.EMPTY_UTF8
    else s.copyUTF8String(startB, bi - 1) // inclusive byte range
  }

  /** UTF-16 length of a UTF8String without decoding. */
  def utf16Length(s: UTF8String): Long = {
    val nb = s.numBytes()
    var bi = 0
    var u = 0L
    while (bi < nb) {
      val w = UTF8String.numBytesForFirstByte(s.getByte(bi))
      u += (if (w == 4) 2 else 1)
      bi += w
    }
    u
  }
}

/** `utf16_substr(str, pos, len)` — pos 1-based in UTF-16 units, len in
  * UTF-16 units; NULL on out-of-range or pair-splitting boundaries.
  * All three children nullable-propagating; stays inside whole-stage
  * codegen via one static kernel call.
  */
case class Utf16Substr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  // the kernel itself returns null for unrepresentable windows
  override def nullable: Boolean = true
  override def prettyName: String = "utf16_substr"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
        Seq(IntegerType, LongType).contains(second.dataType) &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (string, int/long, int), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  private def posAsLong(p: Any): Long = p match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
  }

  override def nullSafeEval(str: Any, pos: Any, len: Any): Any =
    Utf16SubstrKernel.utf16Substr(str.asInstanceOf[UTF8String],
      posAsLong(pos), len.asInstanceOf[java.lang.Integer].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, l) => {
      s"""
         |${ev.value} = graft.expressions.Utf16SubstrKernel.utf16Substr(
         |  $s, (long) $p, (int) $l);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Utf16Substr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Utf16Substr {
  /** DataFrame-side handle: `utf16Substr(col, posCol, lenCol)`. */
  def apply(str: Column, pos: Column, len: Column): Column =
    GraftFunctionRegistry.column(Utf16Substr(
      GraftFunctionRegistry.expression(str),
      GraftFunctionRegistry.expression(pos),
      GraftFunctionRegistry.expression(len)))
}
