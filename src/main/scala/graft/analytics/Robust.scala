package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Robust per-group statistics — winsorized means with rank-exact
 * (percentile_disc-style) clip bounds. The outlier-tolerant reporting a
 * pipeline runs over heavy-tailed telemetry (latencies, document
 * lengths, per-user spend) where a plain mean is one hot row away from
 * meaningless.
 *
 * Reference scope: the reference engine's per-user counts
 * (`/root/reference/sree-etl-tdk-glue-job.py:54-60`) extended with
 * distribution-aware aggregation.
 *
 * The clip bounds are ACTUAL data values picked by rank — the value at
 * sorted position `max(ceil(p·n), 1)` — not interpolated quantiles:
 * engines implement interpolation with different float formulas, but a
 * rank-picked value is bit-exact everywhere, so the bounds (and
 * everything derived from them) agree across engines by construction.
 * Interpolated quantiles stay available through the engine's own
 * `percentile`/GK-sketch surface (q49/q110's precedent).
 */
object Robust {

  private val dec = DecimalType(38, 12)

  /**
   * Per-group winsorized mean at `[pLo, pHi]`: rows below the rank-exact
   * lower bound clip up, above the upper bound clip down, then the mean
   * folds exact DECIMAL(38,12) terms (order-independent over any
   * partitioning; 6-dp output). NULL group/value rows drop; ranking ties
   * break by `idCol`, which only affects WHICH equal value is picked —
   * i.e. nothing.
   *
   * Shape at scale: one group-partitioned rank window + one hash
   * aggregate for the bounds (group-sized output), then a group-keyed
   * join back and the final aggregate — both shuffles key on the SAME
   * group column, so AQE plans them into one co-partitioned exchange
   * chain; no global window anywhere.
   *
   * Returns `(groupCol, n, lo, hi, n_clipped_lo, n_clipped_hi,
   * winsorized_mean)`.
   */
  def winsorizedMean(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val ranked = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("_v"),
        row_number().over(w).cast("long").as("_rn"),
        count(lit(1)).over(Window.partitionBy(col(groupCol)))
          .as("_n"))
    def pos(p: Double): Column =
      greatest(ceil(lit(p) * col("_n").cast("double")).cast("long"), lit(1L))
    val bounds = ranked.groupBy(groupCol).agg(
      max(col("_n")).as("n"),
      max(when(col("_rn") === pos(pLo), col("_v"))).as("lo"),
      max(when(col("_rn") === pos(pHi), col("_v"))).as("hi"))
    val clipped = ranked.select(col(groupCol), col("_v"))
      .join(bounds, Seq(groupCol))
      .select(col(groupCol), col("n"), col("lo"), col("hi"),
        least(greatest(col("_v"), col("lo")), col("hi")).as("_c"),
        (col("_v") < col("lo")).cast("long").as("_blo"),
        (col("_v") > col("hi")).cast("long").as("_bhi"))
    clipped.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"),
        sum(col("_blo")).as("n_clipped_lo"),
        sum(col("_bhi")).as("n_clipped_hi"),
        round(sum(round(col("_c"), 12).cast(dec)).cast("double") /
          max(col("n")).cast("double"), 6).as("winsorized_mean"))
  }

  /** The rank-exact "value at sorted position ⌈p·n⌉" column used by both
    * robust operators (percentile_disc semantics — an actual data value,
    * bit-exact across engines). Expects `_v`, `_rn`, `_n` from a
    * `(value, idCol)`-ordered rank window. */
  /**
   * Exact mid-rank quantile normalization of a numeric column — map
   * every value to its empirical quantile `(C + c/2) / n` (C = rows
   * strictly below, c = the value's tie count), the rank transform that
   * makes heterogeneous quality scores mixable ("top 10% by THIS
   * scorer" means the same thing for every scorer). Returns the
   * value→quantile MAPPING `(value, c, q)` — value-cardinality-sized;
   * join it back on `valueCol` to tag rows (kept separate so callers
   * normalizing several frames against one reference distribution pay
   * the mapping once).
   *
   * Scale shape — the reason this isn't one global window: a continuous
   * score column has data-sized value cardinality, so a single
   * `ORDER BY value` cumulative window would funnel the corpus through
   * one partition. Instead the cumulative count runs TWO-LEVEL (the
   * [[graft.ext.Sampling.stratifiedTake]] bucket trick, exact by
   * construction): per-value counts shuffle on the well-spread value
   * key; coarse `bucketWidth` range buckets get cumulative OFFSETS
   * through a bucket-count-sized window (bounded, q179 contract); and
   * within-bucket cumulatives run partitioned BY bucket at full
   * parallelism. `C = bucket offset + within-bucket cumulative` —
   * identical to the one-window form (spec-pinned), data-sized nowhere.
   *
   * Quantiles are exact rationals until one double division (round 6);
   * NULL values drop (no rank position).
   */
  def quantileNormalize(
      df: DataFrame, valueCol: Column,
      bucketWidth: Double = 1.0): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val counts = df.select(valueCol.cast("double").as("value"))
      .filter(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("c"))
      .withColumn("_bkt", floor(col("value") / lit(bucketWidth)))
    val bucketW = Window.orderBy(col("_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.groupBy("_bkt")
      .agg(sum(col("c")).as("_bc"))
      .withColumn("_off",
        coalesce(sum(col("_bc")).over(bucketW), lit(0L)))
      .drop("_bc")
    val inBucket = Window.partitionBy(col("_bkt"))
      .orderBy(col("value").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = counts.agg(sum(col("c")).as("_n"))
    counts
      .withColumn("_cum", coalesce(sum(col("c")).over(inBucket), lit(0L)))
      .join(broadcast(offsets), "_bkt")
      .crossJoin(broadcast(total))
      .select(col("value"), col("c"),
        round((col("_off") + col("_cum") + col("c").cast("double") / 2)
          / col("_n"), 6).as("q"))
  }

  private def rankPick(p: Double): Column =
    max(when(col("_rn") ===
      greatest(ceil(lit(p) * col("_n").cast("double")).cast("long"),
        lit(1L)), col("_v")))

  /**
   * Robust per-group outlier profile via the median/MAD modified
   * z-score (Iglewicz & Hoaglin 1993): a row is an outlier when
   * `0.6745·|v − median| / MAD > cutoff` (cutoff 3.5 is the standard
   * recommendation). Median and MAD are RANK-EXACT picks (the value at
   * `⌈n/2⌉`), so both statistics are actual data values and the flag
   * threshold `cutoff·MAD/0.6745` is one reproducible float expression.
   * A zero-MAD group (> half the values identical) flags every value
   * not equal to the median — the documented degenerate reading.
   *
   * Shape at scale: two group-partitioned rank windows (values, then
   * absolute deviations) + group-keyed joins, all on the SAME group
   * key — the [[winsorizedMean]] exchange-chain argument twice over.
   *
   * Returns `(groupCol, n, median, mad, n_outliers)`.
   */
  def madOutliers(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      cutoff: Double = 3.5): DataFrame = {
    require(cutoff > 0.0, s"cutoff must be positive, got $cutoff")
    def ranked(in: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col("_v"), col("_id"))
      in.select(col(groupCol), col("_v"), col("_id"),
        row_number().over(w).cast("long").as("_rn"),
        count(lit(1)).over(Window.partitionBy(col(groupCol))).as("_n"))
    }
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("_v"),
        col(idCol).as("_id"))
    val med = ranked(base).groupBy(groupCol)
      .agg(max(col("_n")).as("n"), rankPick(0.5).as("median"))
    val dev = base.join(med, Seq(groupCol))
      .select(col(groupCol), abs(col("_v") - col("median")).as("_v"),
        col("_id"))
    val mad = ranked(dev).groupBy(groupCol)
      .agg(rankPick(0.5).as("mad"))
    base.join(med, Seq(groupCol)).join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), max(col("median")).as("median"),
        max(col("mad")).as("mad"),
        sum((lit(0.6745) * abs(col("_v") - col("median")) >
          lit(cutoff) * col("mad")).cast("long")).as("n_outliers"))
  }

  /**
   * Theil–Sen slope over an aggregated series — the robust companion
   * to [[Trend.trend]]'s OLS line: the LOWER MEDIAN of all pairwise
   * slopes `(v_j − v_i)/(x_j − x_i)` (up to 29% contaminated points
   * leave it standing, where one hot day drags OLS arbitrarily far),
   * plus the matching intercept as the lower median of
   * `v_i − slope·x_i`. Lower median = the rank-exact value at sorted
   * position `⌈n/2⌉` ([[winsorizedMean]]'s percentile_disc rule: an
   * ACTUAL computed slope, never an interpolation, so engines agree
   * bit-for-bit). Each slope is ONE double division of exact inputs.
   *
   * SERIES CONTRACT (the [[Changepoint.cusum]] rule): the input is an
   * already-aggregated series — days, hours, buckets — so the pairs
   * frame is series²-sized and its one ranking window is bounded by
   * construction; a caller passing raw events pays quadratic rows.
   *
   * Returns one row `(n_points, n_pairs, slope, intercept)`, 6-dp —
   * EMPTY when fewer than 2 distinct x positions exist (no pair, no
   * median to pick). Equal-x pairs are excluded (vertical slopes), the
   * standard Theil–Sen treatment.
   */
  def theilSen(
      series: DataFrame, xCol: Column, valueCol: Column): DataFrame = {
    val base = series
      .select(xCol.cast("double").as("_x"),
        valueCol.cast("double").as("_v"))
      .filter(col("_x").isNotNull && col("_v").isNotNull)
    val lo = base.select(col("_x").as("_xi"), col("_v").as("_vi"))
    val hi = base.select(col("_x").as("_xj"), col("_v").as("_vj"))
    val slopes = lo.join(hi, col("_xi") < col("_xj"))
      .select(((col("_vj") - col("_vi")) / (col("_xj") - col("_xi")))
        .as("_s"))
    val nP = slopes.agg(count(lit(1)).as("n_pairs"))
    val wS = Window.orderBy(col("_s").asc)
    val slope = slopes
      .withColumn("_r", row_number().over(wS).cast("long"))
      .crossJoin(broadcast(nP))
      .filter(col("_r") ===
        ceil(col("n_pairs").cast("double") / 2.0).cast("long"))
      .select(col("n_pairs"), col("_s").as("_slope"))
    val nB = base.agg(count(lit(1)).as("n_points"))
    val wI = Window.orderBy(col("_i").asc)
    base.crossJoin(broadcast(slope))
      .select(col("n_pairs"), col("_slope"),
        (col("_v") - col("_slope") * col("_x")).as("_i"))
      .withColumn("_r", row_number().over(wI).cast("long"))
      .crossJoin(broadcast(nB))
      .filter(col("_r") ===
        ceil(col("n_points").cast("double") / 2.0).cast("long"))
      .select(col("n_points"), col("n_pairs"),
        round(col("_slope"), 6).as("slope"),
        round(col("_i"), 6).as("intercept"))
  }
}
