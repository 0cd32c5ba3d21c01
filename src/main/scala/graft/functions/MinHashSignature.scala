package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: the `numHashes`-element MinHash signature of
 * an `array<string>` shingle set — element i is `min over shingles s of
 * xxhash64(s, i)`, exactly the value of the built-in formulation
 * `transform(sequence(0, k-1), i -> array_min(transform(sh, s ->
 * xxhash64(s, i))))` (the spec asserts bit equality), so swapping it into
 * [[graft.ext.Dedup]] changes no signature, bucket, or pair anywhere.
 *
 * Why a custom Expression (same SURVEY.md §4 case as [[FloatDotProduct]]):
 * the HOF formulation is the single hottest tree in the near-dup pipeline
 * (q20/q37 and the streaming rep store) and it is doubly bad — nested
 * interpreted lambdas (k × |shingles| virtual-call evaluations, k
 * intermediate arrays per row) AND k redundant string hashes per shingle:
 * `xxhash64(s, i)` seeds with 42, hashes the string, then folds in `i`, so
 * the expensive variable-length string pass is byte-identical across all k
 * and only the final 4-byte fold differs. This expression hashes each
 * shingle string ONCE and derives the k lanes with k cheap int folds,
 * tracking the k running minima in one primitive array — O(|shingles| ×
 * (|s| + k)) work instead of O(|shingles| × k × |s|), zero allocation
 * beyond the output, one static call from the generated code so the
 * surrounding stage stays fused.
 *
 * Semantics twin notes (matched exactly for non-null input,
 * spec-asserted): a null shingle element contributes `xxhash64(null, i)` =
 * the seed-42 fold of `i` alone; an EMPTY array yields k NULL elements
 * (`array_min([])` is NULL). One deliberate divergence: a NULL array
 * yields NULL (the standard null-intolerant convention), where the HOF
 * tree yields k NULLs — an artifact of its outer `transform` ranging over
 * the never-null `sequence`. No caller computes signatures of nullable
 * shingle columns ([[graft.ext.Dedup]] filters `size(sh) > 0` first).
 */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, s"graft_minhash needs numHashes > 0, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    MinHashSignature.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.MinHashSignature$$.MODULE$$.compute($a, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** xxhash64's fixed default seed (`XxHash64.seed` when called with one
    * argument list, as the HOF twin does). */
  private final val Seed = 42L

  /** One pass over the shingles; called from generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // k NULLs
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // xxhash64 skips null children, so a null shingle leaves the running
      // hash at the seed and the lane fold below sees base = Seed
      val base =
        if (arr.isNullAt(j)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
