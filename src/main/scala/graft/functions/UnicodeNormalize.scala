package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: Unicode normalization (NFC / NFD / NFKC /
 * NFKD) of a string column. The canonical first pass of any text-dedup
 * or fingerprint pipeline — `"é"` composed (U+00E9) and decomposed
 * (`e` + U+0301) are the SAME text to a reader but different bytes to
 * md5/MinHash/SimHash, so unnormalized corpora leak duplicate pairs
 * through every hash-based screen. The reference stages raw text fields
 * verbatim (`/root/reference/sree-etl-tdk-lambda.py:62-78`); this is
 * the normalization its cleansed layer would need before any
 * content-hash operator ([[graft.ext.Dedup]], [[SimHash48]],
 * [[MinHashSignature]]) can be trusted on non-ASCII corpora.
 *
 * Why a custom Expression (the SURVEY.md §4 case): Spark has no
 * normalization built-in, a Scala UDF would be an opaque
 * serialization-boxed black box, and the JDK's `java.text.Normalizer`
 * is the canonical public implementation — so the right shape is a
 * codegen'd unary expression around it. Two allocation-free fast paths
 * keep the 100-TB cost honest: pure-ASCII input (byte scan, the
 * overwhelming majority of web text) and already-normalized input
 * (`Normalizer.isNormalized`, no output allocation) both return the
 * input UTF8String unchanged; only strings that actually change pay the
 * String round-trip.
 *
 * The `form` argument is a construction-time literal — the resolved
 * enum rides into generated code as a reference object, so the hot loop
 * never re-parses it.
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val resolvedForm: Normalizer.Form =
    Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got '$form'")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_normalize requires a string column, got $t")
    }
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalize.compute(s.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", resolvedForm,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} =
       |  graft.functions.UnicodeNormalize$$.MODULE$$.compute($c, $formRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Seq[String] = Seq("NFC", "NFD", "NFKC", "NFKD")

  /** Normalize one string; called from generated code. Returns the INPUT
    * object (no allocation) when normalization cannot change it: pure
    * ASCII (every byte < 0x80 — ASCII is invariant under all four
    * forms), or already in normal form. */
  def compute(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
