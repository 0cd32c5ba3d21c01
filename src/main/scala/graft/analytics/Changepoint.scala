package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * CUSUM change-point screening over a bucketed series — "did the level
 * of this telemetry shift somewhere in the window, and when?". The
 * pipeline monitor a source owner runs when a drift screen
 * ([[graft.ext.CorpusCompare]]) says SOMETHING moved and the next
 * question is WHERE in time.
 *
 * Reference scope: the reference engine's static grouped counts
 * (`/root/reference/sree-etl-tdk-glue-job.py:51-68`) summarize a whole
 * window; the CUSUM curve localizes a level shift inside it.
 *
 * Determinism contract (the [[Trend]] rule): the series values fold as
 * 9-dp DECIMAL terms, the cumulative sum runs over the EXACT decimals
 * (so the curve is integer-exact for count series, and
 * partitioning-invariant always), and floats enter only in the final
 * per-row scalar `D_i / (n·σ)` — one IEEE chain both engines replay.
 */
object Changepoint {

  private val dec = DecimalType(38, 12)

  private def term(v: Column): Column = round(v, 9).cast(dec)

  /**
   * Standardized CUSUM curve of a series frame (one row per bucket,
   * e.g. a day's event count): with mean μ and population σ over the
   * n buckets,
   *
   *   S_i = Σ_{j≤i} (v_j − μ) / σ  =  D_i / (n·σ),
   *   D_i = n·Σ_{j≤i} v_j − i·Σv   (exact decimal arithmetic)
   *
   * — the running excursion from the window mean; a level shift bends
   * the curve and the |S| extremum marks the most likely change point
   * (argmax of |D_i| — one double product chain from exact decimal
   * cumulatives, bit-identical in both engines; first-bucket
   * tiebreak). A constant series (σ = 0) yields NULL cusum and no
   * flag.
   *
   * SCALE CONTRACT: the one ordered window (the cumulative) runs over
   * the SERIES — bucket cardinality (days/hours), never data rows;
   * aggregate first. The whole-series moments (n, Σv, Σv²) and the
   * |D| argmax are 1-row aggregates broadcast-cross-joined back (the
   * [[seasonalIndex]] shape), so a caller passing an over-sized frame
   * serializes only the cumulative, not five windows. NULL order or
   * value rows drop.
   *
   * Returns the series + `(cusum, is_changepoint)`, cusum 6-dp.
   */
  def cusum(series: DataFrame, orderCol: String, valueCol: String)
      : DataFrame = {
    val wOrd = Window.orderBy(col(orderCol))
    val wCum = wOrd
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = series
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(orderCol), col(valueCol), term(col(valueCol)).as("_v"),
        term(col(valueCol) * col(valueCol)).as("_v2"))
    val tot = base.agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s1"),
      sum(col("_v2")).as("_s2"))
    val nD = col("_n").cast("double")
    // population σ from exact decimal moments; D_i = n·cum_i − i·Σv is
    // computed in doubles FROM the exact decimal cumulatives — one IEEE
    // product chain per row, identical in both engines (decimal×long
    // multiply rules differ cross-engine; double multiply does not)
    val sigma = sqrt(
      (col("_s2").cast("double") -
        col("_s1").cast("double") * col("_s1").cast("double") / nD) / nD)
    val di = nD * col("_c").cast("double") -
      col("_i").cast("double") * col("_s1").cast("double")
    val curve = base
      .withColumn("_i", row_number().over(wOrd).cast("long"))
      .withColumn("_c", sum(col("_v")).over(wCum))
      .crossJoin(broadcast(tot))
      .withColumn("_d", di)
    // argmax of |D| with first-bucket tiebreak, as ONE 1-row aggregate:
    // lexicographic max of (|D|, −i) picks the largest excursion and,
    // within ties, the smallest index
    val pick = curve.agg(
      max(struct(abs(col("_d")).as("_ad"), (-col("_i")).as("_ni")))
        .as("_m"))
      .select((-col("_m._ni")).as("_imax"))
    curve.crossJoin(broadcast(pick))
      .select(col(orderCol), col(valueCol),
        round(col("_d").cast("double") /
          nullif(nD * sigma, lit(0.0)), 6).as("cusum"),
        (sigma > 0.0 && col("_i") === col("_imax"))
          .as("is_changepoint"))
  }

  /**
   * Segmented (two-piece) trend at the [[cusum]] change point — the
   * quantify step after the localize step: once the |CUSUM| extremum
   * marks the most likely shift, fit [[Trend]]'s OLS line to each side
   * and report both, so "something changed around the 12th" becomes
   * "the slope went from +0.8/day to −2.1/day". The x axis is the
   * series ROW INDEX (1-based over `orderCol` — uniform spacing, the
   * CUSUM view's own clock); moments fold as [[Trend.momentPartials]]
   * 12-dp decimals.
   *
   * Same series contract as [[cusum]] (aggregate first; windows are
   * series-sized). Returns the [[Trend.trendFromMoments]] columns with
   * `segment` ∈ {pre, post} (pre includes the flagged bucket), ordered
   * pre-then-post — EMPTY for a constant series (σ = 0 flags nothing,
   * so there is no breakpoint to segment at).
   */
  def segmentedTrend(
      series: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val bp = cusum(series, orderCol, valueCol)
      .filter(col("is_changepoint"))
      .select(col(orderCol).as("_bp"))
    val wOrd = Window.orderBy(col(orderCol))
    val indexed = series
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("_i", row_number().over(wOrd).cast("long"))
      .crossJoin(broadcast(bp))
      .withColumn("segment",
        when(col(orderCol) <= col("_bp"), "pre").otherwise("post"))
    Trend.trend(indexed, "segment",
        col("_i").cast("double"), col(valueCol).cast("double"))
      .orderBy(col("segment").desc)
  }

  /**
   * Shewhart c-chart over a bucketed count series — the CONTROL-limit
   * monitor next to [[cusum]]'s change-point localizer: under a
   * stable Poisson process the count chart has center c̄ and 3σ limits
   * `c̄ ± 3√c̄` (σ = √mean for counts); a bucket outside them is a
   * special-cause signal worth an incident, BEFORE any trend or
   * change-point modeling. The floor clamps at 0 (counts cannot go
   * negative). Mean from exact decimal sums; limits are one double
   * chain shared by every row; flags exact. Returns the series +
   * `(center, ucl, lcl, out_of_control)` ordered by bucket, 6-dp.
   *
   * Same series contract as [[cusum]]; this one needs no window at
   * all — one 1-row aggregate fanned back.
   */
  def cChart(series: DataFrame, orderCol: String, valueCol: String)
      : DataFrame = {
    val base = series
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(orderCol), col(valueCol),
        col(valueCol).cast("double").as("_v"))
    val tot = base.agg(count(lit(1)).as("_n"),
      sum(term(col("_v"))).as("_s1"))
    val cbar = col("_s1").cast("double") / col("_n").cast("double")
    val ucl = cbar + lit(3.0) * sqrt(cbar)
    val lcl = greatest(cbar - lit(3.0) * sqrt(cbar), lit(0.0))
    base.crossJoin(broadcast(tot))
      .select(col(orderCol), col(valueCol),
        round(cbar, 6).as("center"),
        round(ucl, 6).as("ucl"),
        round(lcl, 6).as("lcl"),
        (col("_v") > ucl || col("_v") < lcl).as("out_of_control"))
      .orderBy(col(orderCol).asc)
  }

  /**
   * Seasonally-adjusted daily series — the PUBLISHED face of the
   * decomposition: each day's value minus its weekday's mean
   * detrended residual (the additive adjustment; trend stays in, the
   * weekly rhythm comes out), which is what a reviewer should eyeball
   * and what [[cusum]]/[[cChart]] should monitor when weekly rhythm
   * would otherwise drown real shifts. Same OLS-then-weekday-means
   * machinery as [[varianceDecomposition]] (decimal moments, exact
   * weekday means); the adjustment is one subtraction per day, 6-dp.
   * Returns `(day, value, seasonal, adjusted)` ordered by day — the
   * day key rendered as a string (date-safe).
   *
   * Same series contract as [[cusum]].
   */
  def seasonallyAdjusted(
      series: DataFrame, dateCol: String, valueCol: String): DataFrame = {
    val d9 = DecimalType(38, 9)
    val base = series
      .filter(col(dateCol).isNotNull && col(valueCol).isNotNull)
      .select(col(dateCol).as("_d"), col(valueCol).cast("double").as("_v"))
      .withColumn("_i", row_number().over(Window.orderBy(col("_d")))
        .cast("long").cast("double"))
    val fit = base.agg(count(lit(1)).as("_n"),
      sum(term(col("_i"))).as("_sx"),
      sum(term(col("_v"))).as("_sy"),
      sum(term(col("_i") * col("_i"))).as("_sxx"),
      sum(term(col("_i") * col("_v"))).as("_sxy"))
    val nD = col("_n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val slope = (nD * col("_sxy").cast("double") - sx * sy) /
      nullif(nD * col("_sxx").cast("double") - sx * sx, lit(0.0))
    val icept = (sy - slope * sx) / nD
    val withR = base.crossJoin(broadcast(fit))
      .select(col("_d"), col("_v"),
        (col("_v") - (icept + slope * col("_i"))).as("_r"))
    val dow = withR
      .groupBy(dayofweek(col("_d")).cast("int").as("_dow"))
      .agg((sum(round(col("_r"), 9).cast(d9)).cast("double") /
        count(lit(1)).cast("double")).as("_sdow"))
    withR
      .join(broadcast(dow),
        dayofweek(col("_d")).cast("int") === col("_dow"))
      .select(col("_d").cast("string").as("day"), col("_v").as("value"),
        round(col("_sdow"), 6).as("seasonal"),
        round(col("_v") - col("_sdow"), 6).as("adjusted"))
      .orderBy(col("day").asc)
  }

  /**
   * Structural variance decomposition of a daily series — "how much
   * of this telemetry is TREND, how much WEEKLY RHYTHM, how much
   * noise?": fit [[graft.analytics.Trend]]'s OLS line on the day
   * index, remove it, remove the weekday means of the detrended
   * residual ([[seasonalIndex]]'s additive cousin), and report the
   * sum-of-squares ledger
   *
   *   SS_total = SS_trend + SS_seasonal + SS_residual   (by stages)
   *
   * with `structure_r2 = 1 − SS_residual/SS_total` — the one number
   * that says whether a forecaster has anything to model. Each stage
   * centers on its OWN exact decimal mean; squared terms round 12-dp
   * and fold DECIMAL(38,12). Stage subtraction can make a share
   * slightly negative when a component is pure noise — that IS the
   * reading (the stage fit cost more than it explained). Returns one
   * row `(n_days, ss_total, ss_trend, ss_seasonal, ss_residual,
   * structure_r2)`, 6-dp.
   *
   * Same series contract as [[cusum]]: one row_number window over the
   * day frame, all moments as 1-row/7-row aggregates fanned back.
   */
  def varianceDecomposition(
      series: DataFrame, dateCol: String, valueCol: String): DataFrame = {
    val d9 = DecimalType(38, 9)
    val base = series
      .filter(col(dateCol).isNotNull && col(valueCol).isNotNull)
      .select(col(dateCol).as("_d"), col(valueCol).cast("double").as("_v"))
      .withColumn("_i", row_number().over(Window.orderBy(col("_d")))
        .cast("long").cast("double"))
    val fit = base.agg(count(lit(1)).as("_n"),
      sum(term(col("_i"))).as("_sx"),
      sum(term(col("_v"))).as("_sy"),
      sum(term(col("_i") * col("_i"))).as("_sxx"),
      sum(term(col("_i") * col("_v"))).as("_sxy"))
    val nD = col("_n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val slope = (nD * col("_sxy").cast("double") - sx * sy) /
      nullif(nD * col("_sxx").cast("double") - sx * sx, lit(0.0))
    val icept = (sy - slope * sx) / nD
    val withR = base.crossJoin(broadcast(fit))
      .select(col("_d"), col("_v"), col("_n"),
        (col("_v") - (icept + slope * col("_i"))).as("_r"))
    val dow = withR
      .groupBy(dayofweek(col("_d")).cast("int").as("_dow"))
      .agg(count(lit(1)).as("_nd"),
        sum(round(col("_r"), 9).cast(d9)).as("_sr"))
      .select(col("_dow"),
        (col("_sr").cast("double") / col("_nd").cast("double"))
          .as("_sdow"))
    val withE = withR
      .join(broadcast(dow), dayofweek(col("_d")).cast("int") === col("_dow"))
      .select(col("_v"), col("_r"), (col("_r") - col("_sdow")).as("_e"))
    def ss(c: Column, mean: Column): Column =
      sum(round((c - mean) * (c - mean), 12).cast(dec))
    val means = withE.agg(count(lit(1)).as("n_days"),
      sum(round(col("_v"), 9).cast(d9)).as("_mv"),
      sum(round(col("_r"), 9).cast(d9)).as("_mr"),
      sum(round(col("_e"), 9).cast(d9)).as("_me"))
    val ledger = withE.crossJoin(broadcast(means))
      .groupBy(col("n_days"))
      .agg(
        ss(col("_v"), col("_mv").cast("double") /
          col("n_days").cast("double")).as("_sstot"),
        ss(col("_r"), col("_mr").cast("double") /
          col("n_days").cast("double")).as("_ssr"),
        ss(col("_e"), col("_me").cast("double") /
          col("n_days").cast("double")).as("_sse"))
    val tot = col("_sstot").cast("double")
    val ssr = col("_ssr").cast("double")
    val sse = col("_sse").cast("double")
    ledger.select(col("n_days"),
      round(tot, 6).as("ss_total"),
      round(tot - ssr, 6).as("ss_trend"),
      round(ssr - sse, 6).as("ss_seasonal"),
      round(sse, 6).as("ss_residual"),
      when(tot > 0.0, round(lit(1.0) - sse / tot, 6))
        .as("structure_r2"))
  }

  /**
   * Individuals/moving-range control chart over a continuous series —
   * [[cChart]]'s sibling for metrics that are NOT Poisson counts
   * (daily mean value, latency): the process spread is estimated from
   * the mean moving range `MR̄ = mean|vₜ − vₜ₋₁|` (robust to slow
   * drift, unlike a global σ), and the individuals limits are
   * `x̄ ± 2.66·MR̄` (the standard d₂-derived constant for n = 2
   * subgroups — the literal below). Flags mark special-cause points.
   * Means from exact decimal sums; limits are one shared double
   * chain; first point has no MR. Returns the series +
   * `(center, ucl, lcl, moving_range, out_of_control)` ordered by
   * bucket, 6-dp.
   *
   * Same series contract as [[cusum]]: one ordered lag window over
   * the bucket frame, moments as 1-row aggregates fanned back.
   */
  def imrChart(series: DataFrame, orderCol: String, valueCol: String)
      : DataFrame = {
    val wOrd = Window.orderBy(col(orderCol))
    val base = series
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(orderCol), col(valueCol),
        col(valueCol).cast("double").as("_v"))
      .withColumn("_mr", abs(col("_v") - lag(col("_v"), 1).over(wOrd)))
    val tot = base.agg(count(lit(1)).as("_n"),
      sum(term(col("_v"))).as("_s1"),
      count(col("_mr")).as("_nmr"),
      sum(term(col("_mr"))).as("_smr"))
    val xbar = col("_s1").cast("double") / col("_n").cast("double")
    val mrbar = col("_smr").cast("double") / col("_nmr").cast("double")
    val ucl = xbar + lit(2.66) * mrbar
    val lcl = xbar - lit(2.66) * mrbar
    base.crossJoin(broadcast(tot))
      .select(col(orderCol), col(valueCol),
        round(xbar, 6).as("center"),
        when(col("_nmr") > 0, round(ucl, 6)).as("ucl"),
        when(col("_nmr") > 0, round(lcl, 6)).as("lcl"),
        round(col("_mr"), 6).as("moving_range"),
        coalesce(col("_nmr") > 0 &&
          (col("_v") > ucl || col("_v") < lcl), lit(false))
          .as("out_of_control"))
      .orderBy(col(orderCol).asc)
  }

  /**
   * Day-of-week seasonal profile of a daily count series: per weekday,
   * the mean daily value and its ratio to the overall daily mean (the
   * multiplicative seasonal index a forecaster divides out before
   * trend-fitting). Exact decimal sums; the two means divide as one
   * double op each. Returns `(dow, n_days, mean_value, seasonal_index)`
   * — 7 rows, 6-dp.
   */
  def seasonalIndex(series: DataFrame, dateCol: String, valueCol: String)
      : DataFrame = {
    val cells = series
      .filter(col(dateCol).isNotNull && col(valueCol).isNotNull)
      .select(dayofweek(col(dateCol)).cast("int").as("dow"),
        term(col(valueCol)).as("_v"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum(col("_v")).as("_s"))
    val tot = cells.agg(sum(col("n_days")).as("_tn"),
      sum(col("_s")).as("_ts"))
    val mg = col("_ts").cast("double") / col("_tn").cast("double")
    val md = col("_s").cast("double") / col("n_days").cast("double")
    cells.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"),
        round(md, 6).as("mean_value"),
        round(md / nullif(mg, lit(0.0)), 6).as("seasonal_index"))
  }
}
