package graft

import org.apache.spark.sql.DataFrame

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
      val n = df.limit(maxRows.toInt + 1).count()
      require(n <= maxRows,
        s"$contract: input exceeds the $maxRows-row cap (found > $maxRows). " +
          "This operator is super-linear in its input — aggregate/sample " +
          "first, or raise the cap explicitly if the scale is intended.")
    }
}
