package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Probabilistic record linkage — Fellegi–Sunter (1969) match scoring
 * over BLOCKED candidate pairs: each compared field contributes
 * `ln(m/u)` when it agrees and `ln((1−m)/(1−u))` when it disagrees
 * (`m` = P(agree | same entity), `u` = P(agree | different entities)),
 * and the summed log-likelihood ratio ranks candidates. The entity-
 * resolution step a training-data pipeline runs when the same person /
 * document / site arrives from two sources with no shared key — the
 * probabilistic upgrade of [[FuzzyJoin]]'s edit-distance screen.
 *
 * Reference scope: the reference engine joins on exact keys only
 * (`/root/reference/sree-etl-tdk-glue-job.py:51-63`); linkage extends
 * the join family to keyless sources.
 *
 * Determinism: the field weights are plan-time DOUBLE literals
 * ([[agreementWeights]] — computed once driver-side, embeddable in an
 * oracle verbatim), the score folds them in declaration order, and the
 * best-match rank is total (`score desc, bId asc`). NEVER feed this an
 * unblocked cross join: candidates must come from a blocking key
 * (exact attribute, [[FuzzyJoin]] prefix blocks, [[AnnLsh]] buckets) —
 * the scale contract of every candidate generator in this engine.
 */
object RecordLinkage {

  /** `(agreement, disagreement)` log-likelihood weights for one field.
    * Requires `0 < u < m < 1`: a field whose agreement is LIKELIER on
    * non-matches than matches has its semantics inverted. */
  def agreementWeights(m: Double, u: Double): (Double, Double) = {
    require(u > 0.0 && m < 1.0 && u < m,
      s"need 0 < u < m < 1, got (m=$m, u=$u)")
    (math.log(m / u), math.log((1.0 - m) / (1.0 - u)))
  }

  /** The summed Fellegi–Sunter score of agreement predicates: each
    * `(agrees, m, u)` contributes its [[agreementWeights]] side; a NULL
    * agreement (an unobservable field — NULL on either record) counts
    * as neither — weight 0, the standard missing-data treatment. Folds
    * in declaration order, rounds to 6 dp. */
  def score(fields: Seq[(Column, Double, Double)]): Column = {
    require(fields.nonEmpty, "at least one compared field")
    round(fields.map { case (agrees, m, u) =>
      val (wa, wd) = agreementWeights(m, u)
      when(agrees.isNull, lit(0.0))
        .when(agrees, lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _), 6)
  }

  /**
   * Score blocked candidate pairs and keep each left record's BEST match
   * at or above `threshold`: rank within `aId` by `(score desc, bId
   * asc)` — total, so the pick is deterministic — and keep rank 1.
   * Returns `(aId, bId, score)`.
   *
   * Shape at scale: one `aId`-partitioned ranking window over the
   * candidate frame (candidate-sized, which blocking already bounded) —
   * no join, no global window.
   */
  def bestLinks(
      cands: DataFrame, aId: String, bId: String,
      fields: Seq[(Column, Double, Double)],
      threshold: Double): DataFrame = {
    val w = Window.partitionBy(col(aId))
      .orderBy(col("score").desc, col(bId).asc)
    cands
      .withColumn("score", score(fields))
      .filter(col("score") >= threshold)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col(aId), col(bId), col("score"))
  }
}
