package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native codegen'd Catalyst
  * expression.
  *
  * Why the engine needs it: web corpora mix composed (U+00E9 é) and
  * decomposed (e + U+0301) encodings of the same visible text, so every
  * content-keyed operator — exact dedup, MinHash shingles, SimHash,
  * fingerprints, group-bys on extracted terms — silently fractures unless
  * keys are canonicalized first. NFC is the canonical-composition form the
  * dedup family wants; NFKC additionally folds compatibility characters
  * (ﬁ → fi, ² → 2, ﾊ → ハ) and is the common choice before tokenizer
  * training.
  *
  * Spark ships no normalization builtin, and a Scala UDF would break
  * whole-stage codegen in exactly the hot paths (corpus-wide key
  * canonicalization) where it matters. This expression stays inside
  * codegen via a reference-object call.
  *
  * Scale fast path: on real corpora the overwhelming majority of text is
  * pure ASCII, which is normalized under every form by construction. ASCII
  * is detected on the raw UTF-8 bytes (numBytes == numChars ⇔ every code
  * point is one byte) and returns the input buffer untouched — no String
  * materialization, no Normalizer call. Non-ASCII strings take
  * `Normalizer.isNormalized` (the UAX #15 quick-check, allocation-free for
  * the common already-NFC case) before paying for a rewrite.
  *
  * Oracle contract: DuckDB's `nfc_normalize` (utf8proc) and
  * `java.text.Normalizer` both implement the UAX #15 algorithm, so NFC
  * output is byte-identical across the engines — q133 hash-verifies this
  * including canonical reordering of multi-mark sequences. The other three
  * forms have no DuckDB twin and are spec-verified against the JDK
  * reference directly.
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  @transient private lazy val form: Normalizer.Form =
    Normalizer.Form.valueOf(formName)

  override def prettyName: String = s"unicode_normalize_${formName.toLowerCase}"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${dt.simpleString}")
  }

  /** Hot-path entry, shared by interpreted eval and generated code. */
  def normalize(u: UTF8String): UTF8String = {
    // All-ASCII ⇔ one byte per code point: normalized under every form.
    if (u.numBytes == u.numChars) return u
    val s = u.toString
    if (Normalizer.isNormalized(s, form)) u
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("unicodeNormExpr", this, classOf[UnicodeNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$self.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API and SQL-registry front doors for the text expressions. */
object TextFunctions {
  import org.apache.spark.sql.graft.SqlShim.{column, expression}

  def nfc(c: Column): Column = column(UnicodeNormalize(expression(c), "NFC"))
  def nfd(c: Column): Column = column(UnicodeNormalize(expression(c), "NFD"))
  def nfkc(c: Column): Column = column(UnicodeNormalize(expression(c), "NFKC"))
  def nfkd(c: Column): Column = column(UnicodeNormalize(expression(c), "NFKD"))

  /** SQL names mirror DuckDB's `nfc_normalize`; the compatibility forms get
    * the same suffix convention. Runtime + idempotent, like
    * `VectorFunctions.register`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.graft.SqlShim.functionRegistry(spark)
    reg.createOrReplaceTempFunction(
      "nfc_normalize", exprs => UnicodeNormalize(exprs.head, "NFC"), "internal")
    reg.createOrReplaceTempFunction(
      "nfkc_normalize", exprs => UnicodeNormalize(exprs.head, "NFKC"), "internal")
  }
}
