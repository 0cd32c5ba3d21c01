package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Filter-style feature screening — "which engineered features carry
 * label signal AT ALL?", the cheap univariate gate run before a model
 * ([[Probe.ridgeWeights]]) spends a fit on them, and the decision-tree
 * community's split criterion read as a ranking: each feature
 * binarizes at its own median and is scored by the information gain
 * (mutual information) of that split against the label.
 *
 * Reference scope: the reference engine reports raw per-user counts
 * (`/root/reference/sree-etl-tdk-glue-job.py:54-68`); this ranks which
 * of those counts would PREDICT an outcome — the first question a
 * modeler asks of the reference's own output table.
 *
 * Determinism: the split is each feature's rank-exact LOWER median
 * over `(value, id)` ([[graft.analytics.Robust]]'s percentile_disc
 * rule — an actual value, engine-exact); all cell counts are exact
 * longs; each MI term is one double chain rounded 12 dp and folded as
 * DECIMAL(38,12) (partitioning-invariant); the nats→bits conversion
 * divides by the ln 2 literal once at the end.
 */
object FeatureScreen {

  private val d12 = DecimalType(38, 12)
  private val LN2 = 0.6931471805599453

  /**
   * Per-feature information gain of the median split: explodes the
   * feature vector to `(feature, value)` rows, binarizes each feature
   * at its own lower median, and scores the split by mutual
   * information with the label in bits:
   *
   *   IG_f = Σ_{b,y} (n_by/N) · log₂( n_by·N / (n_b·n_y) )
   *
   * (the `H(Y) − H(Y|split)` identity in its symmetric form — every
   * joint cell has n_by ≥ 1 by construction, so no 0·log 0 edge). A
   * constant feature (every value ≤ its median) has one branch and
   * IG = 0 exactly; a feature whose split reproduces the label scores
   * H(Y). Returns `(feature, split_value, ig)` ordered by feature
   * index (0-based).
   *
   * Shape at scale: one Generate (the dim-× explode), one
   * feature-partitioned rank window (dim × rows — the
   * [[graft.analytics.Robust.winsorizedMean]] group-window contract
   * with `feature` as the group), then hash aggregates on the
   * (feature, branch, label) cell frame (≤ 4·dim rows). No global
   * windows; output dim-sized.
   */
  def infoGain(
      df: DataFrame, features: Column, label: Column,
      id: Column): DataFrame = {
    val ex = df.select(label.as("_y"), id.as("_id"), posexplode(features))
      .select(col("pos").cast("long").as("feature"),
        col("col").cast("double").as("_v"), col("_y"), col("_id"))
      .filter(col("_v").isNotNull && col("_y").isNotNull)
    val w = Window.partitionBy(col("feature"))
      .orderBy(col("_v").asc, col("_id").asc)
    val med = ex
      .select(col("feature"), col("_v"),
        row_number().over(w).cast("long").as("_rn"),
        count(lit(1)).over(Window.partitionBy(col("feature"))).as("_n"))
      .groupBy(col("feature"))
      .agg(max(when(col("_rn") ===
        greatest(ceil(lit(0.5) * col("_n").cast("double")).cast("long"),
          lit(1L)), col("_v"))).as("split_value"))
    val joint = ex.join(med, Seq("feature"))
      .select(col("feature"), col("split_value"),
        (col("_v") > col("split_value")).cast("long").as("_b"),
        col("_y"))
      .groupBy(col("feature"), col("split_value"), col("_b"), col("_y"))
      .agg(count(lit(1)).as("_nby"))
    val margB = joint.groupBy(col("feature"), col("_b"))
      .agg(sum(col("_nby")).as("_nb"))
    val margY = joint.groupBy(col("feature"), col("_y"))
      .agg(sum(col("_nby")).as("_ny"))
    val tot = joint.groupBy(col("feature")).agg(sum(col("_nby")).as("_nn"))
    val nby = col("_nby").cast("double"); val nn = col("_nn").cast("double")
    val nb = col("_nb").cast("double"); val ny = col("_ny").cast("double")
    joint
      .join(margB, Seq("feature", "_b"))
      .join(margY, Seq("feature", "_y"))
      .join(tot, Seq("feature"))
      .select(col("feature"), col("split_value"),
        round((nby / nn) * log((nby * nn) / (nb * ny)), 12).cast(d12)
          .as("_t"))
      .groupBy(col("feature"), col("split_value"))
      .agg(round(sum(col("_t")).cast("double") / lit(LN2), 6).as("ig"))
      .orderBy(col("feature").asc)
  }
}
