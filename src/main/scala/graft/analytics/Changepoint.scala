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
