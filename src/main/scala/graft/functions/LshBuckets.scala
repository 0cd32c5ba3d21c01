package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: all `numTables` sign-random-projection LSH
 * bucket keys of an `array<float>` vector in one pass — element t packs
 * the sign bits of the vector's dot products against hyperplanes
 * `[t*bitsPerTable, (t+1)*bitsPerTable)` MSB-first into a long.
 *
 * Why a custom Expression (same SURVEY.md §4 case as [[FloatDotProduct]]):
 * the signature needs `numTables × bitsPerTable` plane dots per row
 * (128 at the q21 defaults). As interpreted HOF folds that is 128
 * CodegenFallback trees per row; unrolled as 128 separate `graft_dot`
 * calls the generated projection grows past Janino/JIT comfort and
 * measured SLOWER than the HOF form (4.1 s vs 2.2 s on q21). One
 * expression with a tight planes-matrix loop keeps the stage fused and
 * the math in two JIT'd loops.
 *
 * Determinism: planes are ±1 Rademacher vectors from a seeded 64-bit LCG
 * (Knuth MMIX constants), generated from (dim, bits, tables, seed) alone —
 * no driver-side randomness, identical across runs and executors; the
 * matrix is metadata-sized and rides into the generated code as one
 * reference object. Dot products accumulate in double, ascending index —
 * the same fold as `graft_dot`, so signs are bit-identical to the
 * per-plane formulation. Null semantics: null vector → NULL; a null
 * element or a vector shorter/longer than `dim` makes every affected dot
 * indeterminate → that bit is 0, matching the `when(dot > 0, bit)
 * .otherwise(0)` of the unrolled form.
 */
case class LshBuckets(
    child: Expression, bitsPerTable: Int, numTables: Int, dim: Int, seed: Long)
    extends UnaryExpression {
  require(bitsPerTable > 0 && bitsPerTable < 63, s"bad bitsPerTable=$bitsPerTable")
  require(numTables > 0, s"bad numTables=$numTables")
  require(dim > 0, s"bad dim=$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val planes: Array[Float] =
    LshBuckets.planeRows(bitsPerTable * numTables, dim, seed)

  override def nullSafeEval(a: Any): Any =
    LshBuckets.compute(a.asInstanceOf[ArrayData], planes, bitsPerTable, numTables, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "float[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.LshBuckets$$.MODULE$$.compute(" +
        s"$a, $ref, $bitsPerTable, $numTables, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** Deterministic ±1 hyperplane matrix, row-major `(numPlanes × dim)`,
    * from a seeded 64-bit LCG (Knuth MMIX constants). ±1 is exact in
    * float, so float storage loses nothing. */
  def planeRows(numPlanes: Int, dim: Int, seed: Long): Array[Float] = {
    val out = new Array[Float](numPlanes * dim)
    var state = seed
    var i = 0
    while (i < out.length) {
      state = state * 6364136223846793005L + 1442695040888963407L
      out(i) = if (state >= 0) 1.0f else -1.0f
      i += 1
    }
    out
  }

  /** All bucket keys in one pass; called from generated code. */
  def compute(
      arr: ArrayData, planes: Array[Float],
      bits: Int, tables: Int, dim: Int): ArrayData = {
    val n = arr.numElements()
    val ok = n == dim
    val buckets = new Array[Long](tables)
    var p = 0 // plane index = t * bits + h
    var t = 0
    while (t < tables) {
      var key = 0L
      var h = 0
      while (h < bits) {
        var s = 0.0
        var indet = !ok
        if (ok) {
          val off = p * dim
          var i = 0
          while (i < dim && !indet) {
            if (arr.isNullAt(i)) indet = true
            else s += arr.getFloat(i).toDouble * planes(off + i).toDouble
            i += 1
          }
        }
        if (!indet && s > 0d) key |= 1L << (bits - 1 - h)
        h += 1
        p += 1
      }
      buckets(t) = key
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }
}
