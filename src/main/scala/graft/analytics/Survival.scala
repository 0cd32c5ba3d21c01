package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Kaplan–Meier survival estimation over user lifetimes — "after t days
 * of activity, what fraction of users are still around?". The retention
 * complement to [[LogAnalytics]]'s rolling-active counts: rolling
 * actives measure the population, the KM curve measures an individual
 * cohort's hazard, and it is the standard churn instrument because it
 * handles CENSORING — users still active at the edge of the observation
 * window contribute their lifetime-so-far without being miscounted as
 * churned.
 *
 * Reference scope: extends the reference's per-user grouped counting
 * (`/root/reference/sree-etl-tdk-glue-job.py:51-60`) with the survival
 * view of the same per-user spans.
 *
 * Determinism: lifetimes are integer bucket epochs (truncating div —
 * the q34/q57 precedent); at-risk counts are exact longs; the
 * product-limit
 * fold runs as ln-terms rounded to 12 dp folded as DECIMAL(38,12) (the
 * [[graft.ext.CorpusCompare]] precedent), exp'd and rounded to 6 dp at
 * the end, so the curve is partitioning-invariant and oracle-exact.
 */
object Survival {

  private val dec = DecimalType(38, 12)

  /**
   * The product-limit (Kaplan–Meier) churn curve. Each user's lifetime
   * is `last − first` in integer `bucketSeconds` epochs over `tsCol`
   * (86400 = day lifetimes, 3600 = hour lifetimes — pick the scale of
   * the corpus's churn dynamics); a user whose last event is
   * `horizonBuckets` or more before the corpus's global last bucket has
   * OBSERVABLY churned, anyone more recent is censored (their lifetime
   * is a lower bound). At each lifetime `t` with `d` observed churns
   * among `n` users still at risk the curve multiplies by `(n−d)/n`;
   * censored users leave the risk set without a factor. Rows are the
   * churn steps only (`n_churn > 0`), columns
   * `(t_life, n_risk, n_churn, n_censored, survival)`.
   *
   * Shape: one data-sized shuffle (the per-user span aggregate, a
   * well-spread key), then everything runs in LIFETIME space — the
   * bucket-range of the corpus, dimension-sized — including the global
   * windows (the q179 ascending-rank contract: a bounded single
   * partition, never data-sized). The global-max-bucket frame is one
   * row, broadcast.
   *
   * Once the risk set churns to zero (`d = n`) the curve is exactly 0
   * from that step on — flagged positionally rather than through
   * `ln(0)`.
   */
  def kaplanMeier(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      bucketSeconds: Long = 86400L,
      horizonBuckets: Int = 7): DataFrame =
    kaplanMeierFromSpans(
      userSpans(events, userCol, tsCol, bucketSeconds), horizonBuckets)

  /**
   * Per-user activity spans in integer bucket epochs —
   * `(user, first_b, last_b)`, the MERGEABLE sufficient statistic
   * behind [[kaplanMeier]] (the [[graft.ext.TextOps.docBucketStats]] /
   * [[Trend]] merge-law pattern): the curve needs nothing about a user
   * beyond their first and last active bucket, and those fold by
   * min/max. One data-sized shuffle on the well-spread user key.
   */
  def userSpans(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be > 0, got $bucketSeconds")
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"),
        expr(s"unix_timestamp($tsCol) div ${bucketSeconds}L").as("_b"))
      .groupBy("user")
      .agg(min(col("_b")).as("first_b"), max(col("_b")).as("last_b"))
  }

  /**
   * Exact merge law: the spans of `A ∪ B` are the per-user
   * `(min first_b, max last_b)` of the two span frames. Associative,
   * commutative, and IDEMPOTENT — re-merging rows already in the store
   * changes nothing (min/max absorb), so unlike additive aggregates
   * ([[Rollup.merge]]'s replay mark) streaming maintenance of spans
   * needs no batch-id high-water mark to be at-least-once safe.
   */
  def mergeSpans(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("user")
      .agg(min(col("first_b")).as("first_b"),
        max(col("last_b")).as("last_b"))

  /** The product-limit curve from a precomputed [[userSpans]] frame —
    * the lifetime-space tail of [[kaplanMeier]]. */
  def kaplanMeierFromSpans(
      spans: DataFrame, horizonBuckets: Int): DataFrame = {
    require(horizonBuckets >= 0,
      s"horizonBuckets must be >= 0, got $horizonBuckets")
    val horizonEnd = spans.agg(max(col("last_b")).as("_maxd"))
    val perLife = spans.crossJoin(broadcast(horizonEnd))
      .select((col("last_b") - col("first_b")).as("t_life"),
        when(col("last_b") <= col("_maxd") - lit(horizonBuckets.toLong), 1L)
          .otherwise(0L).as("_ch"))
      .groupBy("t_life")
      .agg(count(lit(1)).as("_ends"), sum(col("_ch")).as("n_churn"))
    val asc = Window.orderBy(col("t_life").asc)
    val riskW = asc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cumW = asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLife
      .withColumn("n_risk", sum(col("_ends")).over(riskW))
      .withColumn("_term",
        when(col("n_churn") < col("n_risk"),
          round(log((col("n_risk") - col("n_churn")).cast("double") /
            col("n_risk").cast("double")), 12).cast(dec))
          .otherwise(lit(0).cast(dec)))
      .withColumn("_dead",
        max(when(col("n_churn") === col("n_risk"), 1).otherwise(0))
          .over(cumW))
      .withColumn("survival",
        when(col("_dead") === 1, lit(0.0).cast("double"))
          .otherwise(round(exp(sum(col("_term")).over(cumW).cast("double")),
            6)))
      .filter(col("n_churn") > 0)
      .select(col("t_life"), col("n_risk"), col("n_churn"),
        (col("_ends") - col("n_churn")).as("n_censored"), col("survival"))
      .orderBy(col("t_life").asc)
  }

  /**
   * Nelson–Aalen cumulative hazard from a [[kaplanMeier]] curve — the
   * hazard-space reading of the same censored data: the per-lifetime
   * hazard `h(t) = d_t/n_t` and its running sum `H(t) = Σ_{s≤t} d/n`
   * (the canonical cumulative-hazard estimator; where the KM curve
   * says "how many survive", H(t) says "how much churn PRESSURE has
   * accumulated", and a straightening/steepening H is the standard
   * aging diagnostic). Each hazard term is one division rounded
   * 12-dp and folded DECIMAL(38,12) over the ordered lifetime frame
   * (bounded by construction — the [[kaplanMeierFromSpans]] window
   * contract). Returns the curve's
   * `(t_life, n_risk, n_churn, hazard, cum_hazard)`, 6-dp.
   */
  def nelsonAalen(curve: DataFrame): DataFrame = {
    val d12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val h = col("n_churn").cast("double") / col("n_risk").cast("double")
    val wCum = Window.orderBy(col("t_life").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve
      .withColumn("_h", round(h, 12).cast(d12))
      .select(col("t_life"), col("n_risk"), col("n_churn"),
        round(h, 6).as("hazard"),
        round(sum(col("_h")).over(wCum).cast("double"), 6)
          .as("cum_hazard"))
      .orderBy(col("t_life").asc)
  }

  /**
   * Median survival from a [[kaplanMeier]] curve — the one number a
   * stakeholder asks of the whole curve: the smallest lifetime at
   * which estimated survival drops to 50% or below (the standard KM
   * median convention). NULL when the curve never reaches 0.5 — more
   * than half the population outlives the observation window, itself
   * a finding. One filter + two 1-row aggregates over the
   * already-bounded curve frame. Returns one row
   * `(n_users, median_lifetime, survival_at_median)`.
   */
  def kmMedian(curve: DataFrame): DataFrame = {
    val tot = curve.agg(max(col("n_risk")).as("n_users"))
    val hit = curve.filter(col("survival") <= 0.5)
      .agg(min(struct(col("t_life"), col("survival"))).as("_m"))
    tot.crossJoin(broadcast(hit))
      .select(col("n_users"),
        col("_m.t_life").as("median_lifetime"),
        col("_m.survival").as("survival_at_median"))
  }

  /**
   * Log-rank (Mantel–Cox) test between two span cohorts: do groups A
   * and B churn on the SAME hazard, or does one systematically outlive
   * the other? The significance companion to [[kaplanMeier]] — two KM
   * curves that LOOK different need this test before the difference is
   * believed, exactly as [[StatsTests.twoProportionZ]] guards a rate
   * gap. Censoring (the shared `horizonBuckets` rule) is handled the
   * KM way: censored users leave the risk set without contributing an
   * event.
   *
   * At each lifetime `t` with combined churns `d_t` of `n_t` at risk
   * (`n1_t` in A): `E1 += d_t·n1_t/n_t`,
   * `V += d_t·(n1_t/n_t)·(n2_t/n_t)·(n_t−d_t)/(n_t−1)` (the
   * hypergeometric variance, tie-exact), and the statistic is
   * `χ² = (O1−E1)²/V` with the signed `z = (O1−E1)/√V` p-valued via
   * [[StatsTests.normalTwoSidedP]]. Per-time terms are one double
   * chain over exact longs, rounded 12 dp and folded as
   * DECIMAL(38,12) (order-independent — the [[kaplanMeierFromSpans]]
   * ln-term rule); O1 stays integer. χ²/p are NULL when V = 0 (no
   * comparable events — e.g. a degenerate risk set).
   *
   * Shape: the span frames are already user-aggregated; everything
   * here runs in LIFETIME space under the [[kaplanMeierFromSpans]]
   * bounded-window contract. Returns one row
   * `(n_a, n_b, o1, e1, chi2, p)`.
   */
  def logRank(
      spansA: DataFrame, spansB: DataFrame,
      horizonBuckets: Int): DataFrame = {
    require(horizonBuckets >= 0,
      s"horizonBuckets must be >= 0, got $horizonBuckets")
    val all = spansA.withColumn("_g", lit(1))
      .unionByName(spansB.withColumn("_g", lit(2)))
    val horizonEnd = all.agg(max(col("last_b")).as("_maxd"))
    val perLife = all.crossJoin(broadcast(horizonEnd))
      .select(col("_g"),
        (col("last_b") - col("first_b")).as("t"),
        when(col("last_b") <= col("_maxd") - lit(horizonBuckets.toLong),
          1L).otherwise(0L).as("_ch"))
      .groupBy(col("t"))
      .agg(
        coalesce(sum(when(col("_g") === 1, 1L).otherwise(0L)), lit(0L))
          .as("_ends1"),
        coalesce(sum(when(col("_g") === 2, 1L).otherwise(0L)), lit(0L))
          .as("_ends2"),
        coalesce(sum(when(col("_g") === 1, col("_ch")).otherwise(0L)),
          lit(0L)).as("_d1"),
        coalesce(sum(when(col("_g") === 2, col("_ch")).otherwise(0L)),
          lit(0L)).as("_d2"))
    val riskW = Window.orderBy(col("t").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val n1 = sum(col("_ends1")).over(riskW)
    val n2 = sum(col("_ends2")).over(riskW)
    val terms = perLife
      .select(col("_d1"), (col("_d1") + col("_d2")).as("_d"),
        n1.as("_n1"), n2.as("_n2"))
      .filter(col("_d") > 0)
      .select(col("_d1"),
        round(col("_d").cast("double") * col("_n1").cast("double")
          / (col("_n1") + col("_n2")).cast("double"), 12).cast(dec)
          .as("_e1"),
        when(col("_n1") + col("_n2") > 1,
          round(col("_d").cast("double")
            * (col("_n1").cast("double")
              / (col("_n1") + col("_n2")).cast("double"))
            * (col("_n2").cast("double")
              / (col("_n1") + col("_n2")).cast("double"))
            * (col("_n1") + col("_n2") - col("_d")).cast("double")
            / (col("_n1") + col("_n2") - 1).cast("double"), 12))
          .otherwise(lit(0.0)).cast(dec).as("_v"))
    val na = spansA.agg(count(lit(1)).as("n_a"))
    val nb = spansB.agg(count(lit(1)).as("n_b"))
    val gap = col("_o1").cast("double") - col("_e1").cast("double")
    terms
      .agg(coalesce(sum(col("_d1")), lit(0L)).as("_o1"),
        coalesce(sum(col("_e1")), lit(0).cast(dec)).as("_e1"),
        coalesce(sum(col("_v")), lit(0).cast(dec)).as("_v"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_a"), col("n_b"),
        col("_o1").as("o1"),
        round(col("_e1").cast("double"), 6).as("e1"),
        when(col("_v") > 0,
          round(gap * gap / col("_v").cast("double"), 6))
          .as("chi2"),
        when(col("_v") > 0,
          StatsTests.normalTwoSidedP(
            gap / sqrt(col("_v").cast("double"))))
          .as("p"))
  }
}
