package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, sum}

/**
 * Fail-fast contract guards for operators whose cost is super-linear in
 * their input (global ntile ranks, all-pairs self-joins). The scaladoc
 * contracts ("run on the eval sample, not the raw corpus"; "aggregate
 * to buckets first") are real, but a doc-comment cannot stop a caller
 * from handing a raw 100-TB event frame to a series² operator — these
 * runtime checks can, turning a cluster-melting plan into an immediate
 * `IllegalArgumentException` at plan-build time.
 *
 * The probe is a `limit(cap + 1).count()` — a single narrow job that
 * scans only until the limit is satisfied, so the guard's cost is
 * bounded by the cap itself, never by the input's true size. Callers
 * that KNOW their frame is in-contract can pass `maxRows = 0` to skip
 * the probe entirely (documented opt-out, not a default).
 */
object Guards {

  /**
   * Require `df` to have at most `maxRows` rows, else throw with a
   * message naming the violated contract. `maxRows <= 0` disables the
   * check (explicit caller opt-out). Caps above `Int.MaxValue - 1`
   * cannot be probed by `limit` and are treated as disabled.
   */
  def requireRowsAtMost(df: DataFrame, maxRows: Long, contract: String): Unit =
    if (maxRows > 0 && maxRows < Int.MaxValue - 1L) {
      // a LocalRelation's size is a plan-time fact — in-contract local
      // frames (tests, hand-built series) skip the probe job entirely
      val knownSmall = df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          lr.data.sizeIs <= maxRows.min(Int.MaxValue).toInt
        case _ => false
      }
      if (!knownSmall) {
        val n = df.limit(maxRows.toInt + 1).count()
        require(n <= maxRows,
          s"$contract: input exceeds the $maxRows-row cap (found > $maxRows). " +
            "This operator is super-linear in its input — aggregate/sample " +
            "first, or raise the cap explicitly if the scale is intended.")
      }
    }

  /**
   * Require the within-block pair count `Σ c·(c−1)/2` over `blockCol`'s
   * group sizes to be at most `maxPairs`, else throw naming the violated
   * contract — the exact number of pairs a blocked self-join on
   * `blockCol` will emit, so this is the Σ|block|² scale law probed
   * directly rather than proxied by row count (a 10-value block column
   * over 10⁹ rows passes any row cap and still melts the join).
   * `maxPairs <= 0` disables the check (explicit caller opt-out).
   *
   * Probe cost: one hash aggregation over the block column only — linear
   * in the input with a columnar scan of a single column, which is the
   * right price for refusing a quadratic job (the guarded join itself
   * scans every column of the same input). Computed in doubles: a guard
   * compares magnitudes, and c·(c−1)/2 overflows Long near c ≈ 4.3e9.
   */
  def requireBlockPairsAtMost(df: DataFrame, blockCol: String,
      maxPairs: Long, contract: String): Unit =
    if (maxPairs > 0) {
      val pairs = df.groupBy(col(blockCol))
        .agg(count(lit(1)).cast("double").as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).as("p"))
        .head().getAs[Any]("p") match {
          case null      => 0.0
          case d: Double => d
        }
      require(pairs <= maxPairs.toDouble,
        f"$contract: the blocked self-join would emit ~$pairs%.3g " +
          s"within-block pairs, over the $maxPairs-pair cap. Σ|block|² is " +
          "the scale law of exact blocked similarity — use a finer block " +
          "key (LSH buckets: AnnLsh.annTopK / lshBuckets, the q21 path; " +
          "or ANN-edge dedup: SemDedup.semDedup with AnnIvf cells, the " +
          "q84 path), or raise/disable the cap explicitly if this scale " +
          "is intended.")
    }
}
