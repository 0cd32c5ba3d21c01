package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: occurrence count of the most frequent
 * ADJACENT token pair in an `array<string>` — the repeated-phrase signal
 * behind `q38_repetition` (TextOps.topBigramCount).
 *
 * Why a custom Expression (same §4 case as [[FloatDotProduct]]): the HOF
 * formulation (`arrays_zip` → `transform` → `filter` → `array_sort` →
 * `aggregate` run-scan) evaluates five interpreted lambda trees per row
 * and allocates three intermediate arrays; none of it participates in
 * whole-stage codegen. This expression is one hash-count pass — O(n) per
 * row instead of O(n log n), no intermediate arrays, one static call from
 * the generated code so the surrounding stage stays fused.
 *
 * Semantics (must match the HOF twin, which the spec asserts): pairs with
 * a null side are skipped; fewer than two non-null-adjacent tokens → 0;
 * null array → NULL.
 */
case class TopBigramCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_top_bigram requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_bigram"

  override def nullSafeEval(a: Any): Any =
    TopBigramCount.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TopBigramCount$$.MODULE$$.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): TopBigramCount =
    copy(child = newChild)
}

object TopBigramCount {
  /** One hash-count pass over adjacent pairs; called from generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val counts = new java.util.HashMap[String, Long]()
    var best = 0L
    var i = 1
    while (i < n) {
      if (!arr.isNullAt(i - 1) && !arr.isNullAt(i)) {
        val key = arr.getUTF8String(i - 1).toString + " " + arr.getUTF8String(i)
        val c = counts.merge(key, 1L, (x, y) => x + y)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}
