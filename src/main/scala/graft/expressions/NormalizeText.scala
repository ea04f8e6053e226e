package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as native Catalyst expressions WITH code
  * generation — the canonicalization pass every scraped corpus needs
  * before hashing/dedup/tokenization (the same text arrives composed
  * from one site and decomposed from another; fingerprints and exact
  * dedup must not treat those as different documents).
  *
  * Two composable primitives, mirroring the public ICU/utf8proc
  * surface:
  *   - [[UnicodeNormalize]](s, form): NFC/NFD/NFKC/NFKD via
  *     `java.text.Normalizer` (the JDK's implementation of the public
  *     Unicode standard annex #15).
  *   - [[StripAccents]](s): NFD decomposition, then drop combining
  *     marks (category Mn) — "Crème brûlée" → "Creme brulee".
  *
  * Lower-casing and whitespace collapse stay with the built-in
  * `lower`/`regexp_replace`; these expressions add only what Spark
  * lacks. Both codegen to one static helper call, so they stay inside
  * the whole-stage-codegen span next to the scan (no UDF serialization
  * boundary, no iterator break). The ASCII fast path returns the input
  * UTF8String UNTOUCHED (no copy, no String round-trip) — at 100 TB
  * most bytes are ASCII and the normalization pass must cost near zero
  * for them.
  */
object NormalizeTextKernel {
  /** True iff every byte is ASCII — such strings are fixed points of
    * all four normalization forms AND of accent stripping. */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    if (isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(formName)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType &&
        Seq("NFC", "NFD", "NFKC", "NFKD").contains(formName))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument and a form in NFC/NFD/NFKC/NFKD, " +
        s"got ${child.dataType.simpleString}, '$formName'")

  override def nullSafeEval(input: Any): Any =
    NormalizeTextKernel.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NormalizeTextKernel.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    NormalizeTextKernel.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NormalizeTextKernel.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object NormalizeText {
  /** DataFrame-side handles (no SQL registration needed). */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    GraftFunctionRegistry.column(
      UnicodeNormalize(GraftFunctionRegistry.expression(c), form))

  def stripAccents(c: Column): Column =
    GraftFunctionRegistry.column(
      StripAccents(GraftFunctionRegistry.expression(c)))

  /** Register `unicode_normalize(s, 'NFC')` / `strip_accents(s)` for
    * SQL on a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftFunctionRegistry.registerTemp(spark, "unicode_normalize",
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "unicode_normalize takes exactly 2 arguments (str, form)")
        val form = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        }
        UnicodeNormalize(children.head, form)
      })
    GraftFunctionRegistry.registerTemp(spark, "strip_accents",
      (children: Seq[Expression]) => {
        require(children.size == 1, "strip_accents takes exactly 1 argument")
        StripAccents(children.head)
      })
  }
}
