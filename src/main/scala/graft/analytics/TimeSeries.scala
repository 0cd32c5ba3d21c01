package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization over the event log: fixed-interval
 * resampling with last-observation-carried-forward (LOCF) gap fill —
 * the step every metrics/feature pipeline runs before joining an
 * irregular event stream against a fixed-cadence model input ("what
 * was each user's latest value at every 6-hour tick?").
 *
 * Reference scope: the reference engine aggregates the raw log as-is
 * (`sree-etl-tdk-glue-job.py:51-63`); resampling is part of the
 * extension surface a training-data pipeline needs on top.
 */
object TimeSeries {

  /**
   * Resample each user's `(ts, value)` series onto a fixed
   * `intervalSec` grid, carrying the last observed value forward
   * across empty buckets. Each user's grid spans their OWN first to
   * last observed bucket (no global range — a user active for one day
   * contributes one day of rows). Within a bucket the deterministic
   * "last" observation wins: the row with the greatest `(ts, idCol)` —
   * the id tiebreak makes equal-timestamp batches reproducible. A NULL
   * observed value is carried over like a gap (LOCF looks through it to
   * the previous non-null), matching the "sensor sent garbage" reading.
   *
   * Returns `(userCol, bucket_start string, value)` — the bucket
   * rendered as a UTC wall-clock string, the engine-portable output
   * form (q100's precedent).
   *
   * Shape at scale: one shuffle keyed `(user, bucket)` for the
   * per-bucket last-value aggregate, then user-keyed range agg + grid
   * explode + LOCF window. The grid is `sequence(lo, hi)` per user —
   * TIME-dimension-sized (span/interval rows per user, independent of
   * event volume), so the explode is bounded metadata fan-out, never a
   * data×data blow-up. The LOCF window partitions by user — state is
   * one running value per user, no global-partition window anywhere.
   */
  def resampleLocf(
      df: DataFrame,
      intervalSec: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(intervalSec > 0, s"intervalSec must be positive, got $intervalSec")
    val bucket: Column =
      floor(col(tsCol).cast("long") / intervalSec).cast("long")
    // deterministic per-bucket last: greatest (ts, id) observation
    val lastPerBucket = df
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .groupBy(col(userCol), bucket.as("_b"))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("_v"))
    val range = lastPerBucket.groupBy(col(userCol))
      .agg(min(col("_b")).as("_lo"), max(col("_b")).as("_hi"))
    val grid = range.select(
      col(userCol), explode(sequence(col("_lo"), col("_hi"))).as("_b"))
    grid.join(lastPerBucket, Seq(userCol, "_b"), "left")
      .withColumn("_f", last(col("_v"), ignoreNulls = true)
        .over(Window.partitionBy(col(userCol)).orderBy(col("_b"))))
      .select(col(userCol),
        date_format(timestamp_seconds(col("_b") * intervalSec),
          "yyyy-MM-dd HH:mm:ss").as("bucket_start"),
        col("_f").as(valueCol))
  }

  /**
   * Exact rolling `windowDays`-day distinct actors: for each day with
   * ANY activity, how many distinct users were active in the trailing
   * window ending that day. Sliding distinct is not associative, so the
   * scalable exact shape is CONTRIBUTION FAN-OUT: dedup to `(user,
   * day)` pairs (one hash aggregate — the big shrink), explode each
   * pair into the ≤ `windowDays` window-end days it serves, and count
   * distinct users per end day — one shuffle keyed by day, fan-out
   * bounded by the window length, never a self-join of the raw events.
   * Days with no activity of their own don't report (no row, rather
   * than a carried count — the grid-fill composition is [[resampleLocf]]
   * if a caller wants it). At whole-corpus scale swap the exact distinct
   * for the mergeable-HLL rollup (q69's family) — same fan-out, sketch
   * union instead of exact count.
   *
   * Returns `(day string, n_active)` ordered by day.
   */
  def rollingDistinctUsers(
      df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame =
    rollingFromUserDays(userDays(df, userCol, tsCol), windowDays)

  /**
   * Distinct (user, active-day) pairs — the MERGEABLE sufficient
   * statistic behind [[rollingDistinctUsers]] and [[stickiness]] (the
   * [[graft.analytics.LogAnalytics.userWeeks]] pattern one bucket
   * finer): the state folds by [[mergeUserDays]] — distinct union,
   * idempotent, replay-mark-free — and every active-user view derives
   * from it without rescanning events. One data-sized shuffle on the
   * well-spread user key.
   */
  def userDays(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = floor(col(tsCol).cast("long") / lit(86400L)).cast("long")
    df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), day.as("_d"))
      .distinct()
  }

  /** Exact merge law: distinct union — associative, commutative,
    * IDEMPOTENT (the [[LogAnalytics.mergeWeeks]] argument). */
  def mergeUserDays(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /**
   * Day-over-day active-set Jaccard — how much does TODAY's audience
   * overlap yesterday's? (1 = the same people every day, → 0 = a
   * fully rotating crowd — the population-turnover dial behind the
   * [[stickiness]] ratio). From the [[userDays]] store: a user-keyed
   * self-join on adjacent days gives the intersections, day sizes the
   * unions; only days whose PREVIOUS day was active emit a row.
   * Exact longs, one division, 6-dp. Returns
   * `(day, n_prev, n_cur, n_both, jaccard)`.
   *
   * Shape: the self-join keys on the well-spread user; everything
   * after is day-frame-sized.
   */
  def activeSetOverlap(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val pairs = userDays(df, userCol, tsCol)
    val sizes = pairs.groupBy(col("_d")).agg(count(lit(1)).as("_n"))
    val both = pairs
      .join(pairs.select(col("_u"), (col("_d") + 1L).as("_d")),
        Seq("_u", "_d"))
      .groupBy(col("_d")).agg(count(lit(1)).as("n_both"))
    sizes.select(col("_d"), col("_n").as("n_cur"))
      .join(sizes.select((col("_d") + 1L).as("_d"),
        col("_n").as("n_prev")), Seq("_d"))
      .join(both, Seq("_d"), "left")
      .withColumn("n_both", coalesce(col("n_both"), lit(0L)))
      .select(
        date_format(timestamp_seconds(col("_d") * 86400L), "yyyy-MM-dd")
          .as("day"),
        col("n_prev"), col("n_cur"), col("n_both"),
        round(col("n_both").cast("double") /
          (col("n_prev") + col("n_cur") - col("n_both")).cast("double"),
          6).as("jaccard"))
      .orderBy(col("day").asc)
  }

  /** [[rollingDistinctUsers]] from a precomputed [[userDays]] frame. */
  def rollingFromUserDays(
      pairs: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val activeDays = pairs.select(col("_d")).distinct()
      .withColumnRenamed("_d", "_end")
    pairs
      .select(col("_u"),
        explode(sequence(col("_d"),
          col("_d") + lit((windowDays - 1).toLong))).as("_end"))
      .join(activeDays, Seq("_end")) // only days with their own activity
      .groupBy(col("_end"))
      .agg(countDistinct(col("_u")).as("n_active"))
      .select(
        date_format(timestamp_seconds(col("_end") * 86400L), "yyyy-MM-dd")
          .as("day"),
        col("n_active"))
      .orderBy(col("day").asc_nulls_last)
  }

  /**
   * [[rollingDistinctUsers]] through MERGEABLE HLL sketches — the
   * whole-corpus-scale swap that method's scaladoc promises: the exact
   * form fans out USER-DAY pairs (each contributing to ≤ `windowDays`
   * window ends — row volume `windowDays`·|user-days|), this form
   * reduces each day to ONE sketch first and fans out the DAY-sized
   * sketch frame instead, so the shuffle carries
   * `windowDays`·|days| sketch rows regardless of user cardinality.
   * Same output contract `(day, n_active)`, window ends restricted to
   * days with their own activity.
   *
   * Estimates: DataSketches HLL stays in EXACT mode well past any
   * harness cardinality at `lgK` 14 (list/set promotion happens at
   * ~¾·2^lgK items), so the q168 exact oracle is shared verbatim; at
   * true corpus scale the estimate takes the standard ~1.6%/√2^lgK
   * relative error — the documented trade for a user-cardinality-free
   * shuffle.
   */
  /**
   * DAU/MAU stickiness — "of the users active in the trailing month,
   * what share came back TODAY?", the engagement ratio that separates
   * habit products from occasional ones. Pure composition: daily
   * distinct actives joined to [[rollingDistinctUsers]]' trailing
   * 30-day distinct on the shared active-day universe, one division.
   * Returns `(day, dau, mau, stickiness)` — dau/mau exact longs,
   * the ratio 6-dp.
   */
  def stickiness(
      df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 30): DataFrame = {
    val day = floor(col(tsCol).cast("long") / lit(86400L)).cast("long")
    val dau = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), day.as("_d"))
      .distinct()
      .groupBy(col("_d"))
      .agg(count(lit(1)).as("dau"))
      .select(
        date_format(timestamp_seconds(col("_d") * 86400L), "yyyy-MM-dd")
          .as("day"), col("dau"))
    dau.join(
        rollingDistinctUsers(df, userCol, tsCol, windowDays)
          .withColumnRenamed("n_active", "mau"),
        Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau").cast("double"), 6)
          .as("stickiness"))
      .orderBy(col("day").asc)
  }

  def rollingDistinctUsersHll(
      df: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7, lgK: Int = 14): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val day = floor(col(tsCol).cast("long") / lit(86400L)).cast("long")
    val daySk = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), day.as("_d"))
      .groupBy(col("_d"))
      .agg(hll_sketch_agg(col("_u"), lit(lgK)).as("_sk"))
    val activeDays = daySk.select(col("_d").as("_end"))
    daySk
      .select(col("_sk"),
        explode(sequence(col("_d"),
          col("_d") + lit((windowDays - 1).toLong))).as("_end"))
      .join(activeDays, Seq("_end")) // only days with their own activity
      .groupBy(col("_end"))
      .agg(hll_sketch_estimate(hll_union_agg(col("_sk"))).as("n_active"))
      .select(
        date_format(timestamp_seconds(col("_end") * 86400L), "yyyy-MM-dd")
          .as("day"),
        col("n_active"))
      .orderBy(col("day").asc_nulls_last)
  }

  /**
   * Week-over-week mix-shift decomposition of the mean event value —
   * the "WHY did the metric move" operator: with per-type shares sₜ
   * and per-type means mₜ, the weekly mean is Σₜ sₜ·mₜ, and its change
   * splits exactly into
   *
   *   rate component  Σₜ s₀·(m₁ − m₀)   (types got better/worse)
   *   mix  component  Σₜ (s₁ − s₀)·m₁   (traffic moved between types)
   *
   * (types absent on one side enter with share 0/mean 0 — the
   * identity `Δmean = rate + mix` still holds term-by-term). The
   * decomposition that separates "purchases got bigger" from "more
   * purchases in the mix" before anyone celebrates the wrong thing.
   * Cell sums fold as 9-dp decimals; per-type components are one
   * double chain rounded 12-dp and folded DECIMAL(38,12); only weeks
   * with BOTH sides present report. Returns
   * `(week_start, mean_prev, mean_cur, delta, rate_component,
   * mix_component)` ordered by week — type-frame joins keyed on
   * (week, type), week-frame output.
   */
  def mixShiftDecomposition(
      df: DataFrame, tsCol: String, typeCol: String,
      valueCol: String): DataFrame = {
    val d9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val d12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val wk = floor(col(tsCol).cast("long") / lit(604800L)).cast("long")
    val cells = df
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(wk.as("_w"), col(typeCol).as("_t"))
      .agg(count(lit(1)).as("_n"),
        sum(round(col(valueCol).cast("double"), 9).cast(d9)).as("_s"))
    val tots = cells.groupBy(col("_w"))
      .agg(sum(col("_n")).as("_nn"), sum(col("_s")).as("_ss"))
    val pair = cells
      .select(col("_w"), col("_t"), col("_n").as("_n1"),
        col("_s").as("_s1"))
      .join(cells.select((col("_w") + 1L).as("_w"), col("_t"),
        col("_n").as("_n0"), col("_s").as("_s0")),
        Seq("_w", "_t"), "full_outer")
      .join(tots.select(col("_w"), col("_nn").as("_nn1"),
        col("_ss").as("_ss1")), Seq("_w"))
      .join(tots.select((col("_w") + 1L).as("_w"),
        col("_nn").as("_nn0"), col("_ss").as("_ss0")), Seq("_w"))
    val sh0 = coalesce(col("_n0").cast("double"), lit(0.0)) /
      col("_nn0").cast("double")
    val sh1 = coalesce(col("_n1").cast("double"), lit(0.0)) /
      col("_nn1").cast("double")
    val m0 = when(col("_n0").isNotNull,
      col("_s0").cast("double") / col("_n0").cast("double"))
      .otherwise(lit(0.0))
    val m1 = when(col("_n1").isNotNull,
      col("_s1").cast("double") / col("_n1").cast("double"))
      .otherwise(lit(0.0))
    pair
      .groupBy(col("_w"), col("_nn0"), col("_ss0"), col("_nn1"),
        col("_ss1"))
      .agg(
        sum(round(sh0 * (m1 - m0), 12).cast(d12)).as("_rate"),
        sum(round((sh1 - sh0) * m1, 12).cast(d12)).as("_mix"))
      .select(
        date_format(timestamp_seconds(col("_w") * 604800L), "yyyy-MM-dd")
          .as("week_start"),
        round(col("_ss0").cast("double") / col("_nn0").cast("double"),
          6).as("mean_prev"),
        round(col("_ss1").cast("double") / col("_nn1").cast("double"),
          6).as("mean_cur"),
        round(col("_ss1").cast("double") / col("_nn1").cast("double") -
          col("_ss0").cast("double") / col("_nn0").cast("double"), 6)
          .as("delta"),
        round(col("_rate").cast("double"), 6).as("rate_component"),
        round(col("_mix").cast("double"), 6).as("mix_component"))
      .orderBy(col("week_start").asc)
  }

  /**
   * Weekly growth accounting — the canonical user-base decomposition
   * (new / retained / resurrected / churned) behind every "are we
   * growing or churning?" review: per epoch-week, actives split into
   * first-ever-seen (new), active-last-week (retained) and
   * returning-after-a-gap (resurrected); churned counts last week's
   * actives who did not return — so the trailing week after the last
   * activity gets its churn row. The identity
   * `active = new + retained + resurrected` holds exactly
   * (spec-pinned). Distinct user-weeks fold once; the first-week frame
   * and the one-week self-shift join all key on the user — one
   * exchange family. Week-frame output:
   * `(week_start, n_active, n_new, n_retained, n_resurrected,
   * n_churned)`.
   */
  def growthAccounting(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wk = floor(col(tsCol).cast("long") / lit(604800L)).cast("long")
    val uw = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), wk.as("_w"))
      .distinct()
    val first = uw.groupBy(col("_u")).agg(min(col("_w")).as("_fw"))
    val j = uw.select(col("_u"), col("_w"), lit(1L).as("_c"))
      .join(uw.select(col("_u"), (col("_w") + 1L).as("_w"),
        lit(1L).as("_p")), Seq("_u", "_w"), "full_outer")
      .join(first, Seq("_u"))
    j.groupBy(col("_w"))
      .agg(
        coalesce(sum(col("_c")), lit(0L)).as("n_active"),
        coalesce(sum(when(col("_c").isNotNull &&
          col("_w") === col("_fw"), 1L)), lit(0L)).as("n_new"),
        coalesce(sum(when(col("_c").isNotNull && col("_p").isNotNull,
          1L)), lit(0L)).as("n_retained"),
        coalesce(sum(when(col("_c").isNotNull && col("_p").isNull &&
          col("_w") > col("_fw"), 1L)), lit(0L)).as("n_resurrected"),
        coalesce(sum(when(col("_p").isNotNull && col("_c").isNull,
          1L)), lit(0L)).as("n_churned"))
      .select(
        date_format(timestamp_seconds(col("_w") * 604800L), "yyyy-MM-dd")
          .as("week_start"),
        col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"))
      .orderBy(col("week_start").asc)
  }

  /**
   * Goh–Barabási burstiness histogram over per-user inter-event gaps
   * — WHO clumps, where [[graft.analytics.StatsTests.expGapFit]] asks
   * whether the POOL does: per user with ≥ `minGaps` gaps, the
   * burstiness parameter `B = (σ−μ)/(σ+μ)` (−1 = metronome, 0 =
   * Poisson, →1 = extreme bursts; Goh & Barabási 2008), summarized
   * as a 0.1-wide histogram over the user population. The behavioral
   * fingerprint that separates bots (B near −1 or clustered) from
   * humans (B ≈ 0.2–0.6 typically). Per-user moments fold as 9-dp
   * decimals (population σ); B is one double chain; the bucket is
   * `floor(10·B)`. Returns `(bucket, bucket_lo, n_users)` ordered by
   * bucket — at most 21 rows.
   *
   * Shape: one user-partitioned lag window (the [[graft.analytics
   * .Trend.autocorr]] contract) + user-keyed then bucket-keyed hash
   * aggregates. No global windows.
   */
  def burstinessHistogram(
      df: DataFrame, userCol: String, tsCol: String, idCol: String,
      minGaps: Int = 5): DataFrame = {
    require(minGaps >= 2, s"minGaps must be >= 2, got $minGaps")
    val d9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_u")).orderBy(col("_t").asc, col("_id").asc)
    val gaps = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(tsCol).cast("long").as("_t"),
        col(idCol).as("_id"))
      .withColumn("_g",
        (col("_t") - lag(col("_t"), 1).over(w)).cast("double"))
      .filter(col("_g").isNotNull)
    val perUser = gaps.groupBy(col("_u"))
      .agg(count(lit(1)).as("_n"),
        sum(round(col("_g"), 9).cast(d9)).as("_s1"),
        sum(round(col("_g") * col("_g"), 9).cast(d9)).as("_s2"))
    val nD = col("_n").cast("double")
    val mu = col("_s1").cast("double") / nD
    val sigma = sqrt(col("_s2").cast("double") / nD - mu * mu)
    val b = (sigma - mu) / (sigma + mu)
    perUser
      // σ+μ = 0 (all gaps zero) has no defined burstiness — drop, the
      // division would produce NaN, not NULL
      .filter(col("_n") >= minGaps && sigma + mu > 0.0)
      .select(b.as("_b"))
      .groupBy(floor(col("_b") * 10.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("bucket"),
        (col("bucket").cast("double") / 10.0).as("bucket_lo"),
        col("n_users"))
      .orderBy(col("bucket").asc)
  }

  /**
   * Weekly event-mix entropy series — "is the SHAPE of activity
   * changing week to week?", the within-stream drift monitor next to
   * the two-corpus divergences ([[graft.ext.CorpusCompare]]): per
   * epoch-week, the Shannon entropy (bits) of the event-type
   * distribution. A falling series says behavior is concentrating
   * into fewer actions; a jump marks a mix shift worth a χ²
   * follow-up. Counts exact; each `p·ln p` term is one double chain
   * rounded 12-dp and folded DECIMAL(38,12); the nats→bits division
   * by the ln 2 literal happens once per week. Returns
   * `(week_start, n_events, n_types, entropy)` ordered by week —
   * week-frame-sized, aggregates only, no windows.
   */
  def mixEntropy(
      df: DataFrame, tsCol: String, typeCol: String): DataFrame =
    mixEntropyFromCells(mixCells(df, tsCol, typeCol))

  /** The (week, type, count) cell partials behind [[mixEntropy]] —
    * ADDITIVE under disjoint batches ([[mergeMixCells]]), so the drift
    * series is a standing state: per-batch cells append and fold at
    * read, full-history re-reads never rescan events. */
  def mixCells(
      df: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val wk = floor(col(tsCol).cast("long") / lit(604800L)).cast("long")
    df.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(wk.as("_w"), col(typeCol).as("_t"))
      .agg(count(lit(1)).as("_c"))
  }

  /** Column-wise fold of [[mixCells]] partials from disjoint batches
    * (counts sum — the [[graft.ext.Privacy.mergeClasses]] shape). */
  def mergeMixCells(partials: DataFrame): DataFrame =
    partials.groupBy(col("_w"), col("_t")).agg(sum(col("_c")).as("_c"))

  /** [[mixEntropy]] evaluated over an already-built cell frame. */
  def mixEntropyFromCells(cells: DataFrame): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val tot = cells.groupBy(col("_w"))
      .agg(sum(col("_c")).as("n_events"),
        count(lit(1)).as("n_types"))
    val p = col("_c").cast("double") / col("n_events").cast("double")
    cells.join(tot, Seq("_w"))
      .select(col("_w"), col("n_events"), col("n_types"),
        round(p * log(p), 12).cast(dec12).as("_term"))
      .groupBy(col("_w"), col("n_events"), col("n_types"))
      .agg(round(-(sum(col("_term")).cast("double")) /
        lit(0.6931471805599453), 6).as("entropy"))
      .select(
        date_format(timestamp_seconds(col("_w") * 604800L), "yyyy-MM-dd")
          .as("week_start"),
        col("n_events"), col("n_types"), col("entropy"))
      .orderBy(col("week_start").asc)
  }

  /**
   * Seasonal-strength score via forecast skill — "does a weekly
   * pattern actually help predict this series?", answered the way a
   * forecaster would: compare the mean absolute error of the
   * lag-7 seasonal-naive forecast against the lag-1 naive over the
   * same series (the MASE construction, Hyndman & Koehler 2006).
   * `ratio < 1` means last week beats yesterday — real weekly
   * seasonality worth modeling ([[graft.analytics.Changepoint
   * .seasonalIndex]] then says WHICH weekdays); `ratio ≈ 1` says the
   * q230 profile would be noise. The series clock is ROW ORDER over
   * the bucket key (calendar gaps collapse — the CUSUM-family
   * convention). Errors fold as 9-dp decimals; the two MAEs and the
   * ratio are one double chain, 6-dp. Returns one row
   * `(n_days, mae_1, mae_7, ratio)` — NULL ratio when either error
   * frame is empty or MAE₁ = 0.
   *
   * Same series contract as [[graft.analytics.Changepoint.cusum]]:
   * the two lag windows run over the bucket frame.
   */
  def seasonalStrength(
      series: DataFrame, orderCol: String, valueCol: String,
      seasonLag: Int = 7): DataFrame = {
    require(seasonLag >= 2, s"seasonLag must be >= 2, got $seasonLag")
    val d9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_o"))
    val errs = series
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(orderCol).as("_o"), col(valueCol).cast("double").as("_v"))
      .select(
        abs(col("_v") - lag(col("_v"), 1).over(w)).as("_e1"),
        abs(col("_v") - lag(col("_v"), seasonLag).over(w)).as("_e7"))
    val agg = errs.agg(
      count(col("_e1")).as("_n1"),
      sum(round(col("_e1"), 9).cast(d9)).as("_s1"),
      count(col("_e7")).as("_n7"),
      sum(round(col("_e7"), 9).cast(d9)).as("_s7"),
      count(lit(1)).as("n_days"))
    val mae1 = col("_s1").cast("double") / col("_n1").cast("double")
    val mae7 = col("_s7").cast("double") / col("_n7").cast("double")
    agg.select(col("n_days"),
      when(col("_n1") > 0, round(mae1, 6)).as("mae_1"),
      when(col("_n7") > 0, round(mae7, 6)).as("mae_7"),
      when(col("_n1") > 0 && col("_n7") > 0 && mae1 > 0.0,
        round(mae7 / mae1, 6)).as("ratio"))
  }

  /**
   * [[activeSetOverlap]] through HLL sketches — the whole-corpus-scale
   * swap for the adjacent-day audience Jaccard: the exact variant
   * self-joins the distinct user-day store on the user key (state =
   * distinct user-days); this keeps ONE sketch per day and reads the
   * overlap by inclusion–exclusion,
   *
   *   n_both = est(A) + est(B) − est(A ∪ B)
   *
   * so state is days × 2^lgK regardless of audience size and the
   * user-keyed shuffle disappears (day-keyed only). DataSketches HLL
   * is EXACT below its promotion threshold (~¾·2^lgK distincts per
   * union), so the q265 exact oracle is shared verbatim at harness
   * scale; past the threshold the estimate degrades gracefully to the
   * documented ~1.6%/√2^lgK HLL error band while the exact variant's
   * join cost keeps growing with the audience. Same output shape as
   * [[activeSetOverlap]]: `(day, n_prev, n_cur, n_both, jaccard)`.
   */
  def activeSetOverlapHll(
      df: DataFrame, userCol: String, tsCol: String,
      lgK: Int = 14): DataFrame = {
    val day = floor(col(tsCol).cast("long") / lit(86400L)).cast("long")
    val daySk = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), day.as("_d"))
      .groupBy(col("_d"))
      .agg(hll_sketch_agg(col("_u"), lit(lgK)).as("_sk"))
    val joined = daySk.select(col("_d"), col("_sk").as("_cur"))
      .join(daySk.select((col("_d") + 1L).as("_d"),
        col("_sk").as("_prev")), Seq("_d"))
      .select(col("_d"),
        hll_sketch_estimate(col("_prev")).as("n_prev"),
        hll_sketch_estimate(col("_cur")).as("n_cur"),
        hll_sketch_estimate(hll_union(col("_prev"), col("_cur")))
          .as("_union"))
    joined
      .select(
        date_format(timestamp_seconds(col("_d") * 86400L), "yyyy-MM-dd")
          .as("day"),
        col("n_prev"), col("n_cur"),
        (col("n_prev") + col("n_cur") - col("_union")).as("n_both"))
      .select(col("day"), col("n_prev"), col("n_cur"), col("n_both"),
        round(col("n_both").cast("double") /
          (col("n_prev") + col("n_cur") - col("n_both")).cast("double"),
          6).as("jaccard"))
      .orderBy(col("day").asc)
  }
}
