package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval) join — match each point row to every range row whose
 * half-open interval `[lo, hi)` contains the point (size-class banding,
 * IP-block lookup, time-bucket tariffs). Spark plans a bare
 * `p >= lo AND p < hi` join condition as BroadcastNestedLoopJoin (or a
 * cartesian product when neither side broadcasts): every point compared
 * against every range, O(|points| × |ranges|) — the classic plan that
 * works in a demo and dies at 100 TB.
 *
 * This operator makes the join an EQUI join: pick a bucket width, key each
 * point by `floor(p / w)`, explode each range to the buckets its interval
 * overlaps, join on the bucket id, and re-check the exact bounds as a
 * post-join residual filter. Each point is compared only against ranges
 * overlapping its own bucket, the join hash-partitions and broadcasts like
 * any equi-join (a small range side broadcasts; two large sides
 * shuffle-join on the bucket id), and the residual filter restores exact
 * semantics — q54 shares a plain BETWEEN-join oracle. Cost moves from
 * |points|×|ranges| to Σ per-range ceil(span/w): wide ranges replicate to
 * more buckets (pick `w` near the typical range span), points never
 * replicate.
 *
 * Null semantics match SQL: a null point or a null bound satisfies no
 * comparison, so those rows drop out (inner join).
 */
object RangeJoin {

  /**
   * Inner-join `points` to `ranges` on `lo <= point < hi`, bucketized at
   * `bucketWidth`. All of `points`' columns pass through, followed by all
   * of `ranges`' columns. A range whose `hi` falls exactly on a bucket
   * boundary contributes one bucket row that can never pass the residual
   * filter (the interval is half-open) — harmless, filtered, not emitted.
   *
   * `keys` adds equality predicates (pointKeyCol, rangeKeyCol) for the
   * per-entity interval case — events into the same user's sessions, IPs
   * into the same tenant's blocks. The keys join as ordinary equi-columns
   * alongside the bucket id, so they ride the same hash partitioning and
   * sharpen it: only same-key, same-bucket rows ever pair.
   */
  def pointInRange(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")

    val w = lit(bucketWidth)
    val p = points.withColumn("_pb", floor(col(pointCol) / w))
    val r = ranges
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) < col(hiCol))
      .withColumn("_rb",
        explode(sequence(floor(col(loCol) / w), floor(col(hiCol) / w))))

    // every cross-side reference frame-qualified: a column name shared by
    // both inputs (a ranges-side "v", a points-side "lo") must not make
    // the residual ambiguous
    val cond = keys.foldLeft(p("_pb") === r("_rb") &&
        p(pointCol) >= r(loCol) && p(pointCol) < r(hiCol)) {
      case (c, (pk, rk)) => c && p(pk) === r(rk)
    }
    p.join(r, cond).drop("_pb", "_rb")
  }
}
