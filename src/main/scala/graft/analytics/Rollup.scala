package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental maintenance of an additive daily rollup — the
 * materialized-view pattern that makes dashboard aggregates viable at
 * 100 TB: the standing rollup table is (time × type)-dimension-sized,
 * and each maintenance cycle touches ONLY the new batch plus that tiny
 * table, never the event history. The reference recomputes its
 * aggregates from the full staged table every run
 * (`sree-etl-tdk-glue-job.py:51-63`); this is the amortized form of the
 * same aggregates, the q75/q77 standing-index idea applied to rollups.
 *
 * Only ALGEBRAIC aggregates live here (count/min/max — mergeable by
 * sum/min/max over partials). Distinct counts are deliberately
 * excluded: they don't merge exactly; the mergeable-sketch path for
 * them is the q69 HLL fold family.
 */
object Rollup {

  /**
   * Per-(day, event_type) partial aggregate of one event slice:
   * `(day, event_type, n, min_v, max_v)`. Rows with a NULL timestamp
   * are excluded (no day to land in); NULL values are ignored by
   * min/max per SQL semantics (an all-NULL cell reports NULL bounds,
   * not a sentinel).
   */
  def dailyRollup(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"), col(typeCol))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /**
   * Merge a persisted rollup with a new batch's partial rollup:
   * re-aggregate the union additively (sum counts, min mins, max
   * maxes). Exactly equals [[dailyRollup]] over the concatenated
   * events — the invariant RollupSpec pins — because every aggregate
   * here is algebraic. A batch that overlaps days already in the
   * rollup (late events) merges into the existing cells rather than
   * duplicating them, so maintenance never needs a "was this day
   * already loaded" dance. The merge shuffles only rollup-sized rows.
   */
  def merge(
      rollup: DataFrame,
      batchRollup: DataFrame,
      typeCol: String = "event_type"): DataFrame =
    rollup.unionByName(batchRollup)
      .groupBy(col("day"), col(typeCol))
      .agg(sum(col("n")).as("n"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
}
