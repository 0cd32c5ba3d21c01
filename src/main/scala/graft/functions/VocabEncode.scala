package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Broadcast-carrier vocabulary encode: map an `array<string>` token
 * sequence to its dense-id `array<long>` (out-of-vocabulary and NULL
 * tokens → 0, the UNK convention of [[graft.ext.TextOps.buildVocab]])
 * with the whole vocabulary living in ONE `Broadcast[Map]` instead of a
 * plan-resident `typedLit` map.
 *
 * Why (the r15 verdict's plan-literal ceiling, the [[IvfNearestCellsBc]]
 * precedent verbatim): the literal map rides inside EVERY serialized
 * task plan and driver plan copy — harmless at the few-hundred-token
 * vocabularies the engine queries use, but `vocabFromTf`'s k is
 * caller-chosen and a real tokenizer vocabulary is 10⁵–10⁶ entries,
 * megabytes of plan shipped per task. The broadcast ships once per
 * executor via the torrent protocol, is fetched in the generated
 * class's init (not per row), and is shared by every task and plan.
 * [[graft.ext.TextOps.encodeWithVocab]] dispatches on vocabulary size:
 * the literal path below its ceiling (self-contained plans, stable plan
 * fingerprints), this carrier above it; TextOpsSpec pins the two
 * bit-equal.
 *
 * Semantics twin the literal form element for element:
 * `coalesce(element_at(map, t), 0L)` — a NULL token element encodes as
 * 0 (element_at(map, NULL) is NULL → coalesce), a NULL token ARRAY
 * returns NULL (UnaryExpression's default null propagation, as
 * `transform` over NULL is NULL).
 */
case class VocabEncodeBc(
    child: Expression, bc: Broadcast[Map[String, Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vocab_encode_bc requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vocab_encode_bc"

  override def nullSafeEval(a: Any): Any =
    VocabEncodeBc.compute(a.asInstanceOf[ArrayData], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("vocabBc", bc,
      classOf[Broadcast[_]].getName)
    // fetch the broadcast value ONCE, in the generated class's init —
    // the per-row code touches only the resolved map
    val dict = ctx.addMutableState("scala.collection.immutable.Map",
      "vocabDict", v => s"$v = (scala.collection.immutable.Map) $bcRef.value();")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VocabEncodeBc$$.MODULE$$.compute($a, $dict)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncodeBc =
    copy(child = newChild)
}

object VocabEncodeBc {

  /** One tight lookup loop; called from generated code. */
  def compute(arr: ArrayData, dict: Map[String, Long]): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      out(i) = if (t == null) 0L else dict.getOrElse(t.toString, 0L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
