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
}
