package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Contrastive-pair mining over an ANN neighbor frame — the training-data
 * op that turns a labeled embedding corpus into (anchor, positive) and
 * (anchor, hard-negative) pairs for metric-learning / InfoNCE-style
 * objectives (hard negatives — the most similar items with a DIFFERENT
 * label — are the pairs that carry gradient; random negatives are
 * trivially separable). Standard practice in the retrieval literature
 * (DPR's in-batch + hard negatives, Sentence-BERT mining).
 *
 * Input is a precomputed neighbor frame (`(q_id, nn_id, sim, rank)` —
 * [[AnnIvf.knnJoin]] / [[AnnIvf.knnJoinIndexed]], self-pairs already
 * excluded), so mining cost is label joins + one query-partitioned
 * re-rank, never a similarity scan of its own: at corpus scale the ANN
 * frame is the bounded cell equi-join, and this composes downstream of
 * it exactly like [[Eval.knnClassifyAnn]] (same frame can feed both).
 *
 * Mine with the neighbor frame's `kNeighbors` well above `kPos + kNeg`:
 * pairs are taken from WITHIN the frame's top-k, so a frame that is all
 * positives for some anchor yields fewer than `kNeg` negatives for it —
 * that is the honest answer at mining depth k, not a gap to backfill
 * with worse candidates. Anchors or neighbors without labels drop
 * (mining is defined on labeled data).
 */
object Mining {

  /**
   * Label each in-frame neighbor `pos` (same label as the anchor) or
   * `neg` (different), re-rank within `(q_id, kind)` by the frame's
   * similarity rank, and keep the top `kPos` / `kNeg` of each kind.
   * Returns `(q_id, nn_id, kind, pair_rank)` — deterministic: the
   * underlying frame's rank is already total (sim desc, nn_id asc).
   */
  def contrastivePairs(
      neighbors: DataFrame, labels: DataFrame,
      idCol: String = "vec_id", labelCol: String = "label",
      kPos: Int = 2, kNeg: Int = 3): DataFrame = {
    require(kPos >= 0 && kNeg >= 0 && kPos + kNeg > 0,
      s"need kPos >= 0, kNeg >= 0, kPos + kNeg > 0; got ($kPos, $kNeg)")
    val lab = labels.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol))
    val byKind = Window.partitionBy(col("q_id"), col("kind"))
      .orderBy(col("rank").asc)
    neighbors
      .join(lab.select(col(idCol).as("nn_id"),
        col(labelCol).as("_nn_label")), "nn_id")
      .join(lab.select(col(idCol).as("q_id"),
        col(labelCol).as("_q_label")), "q_id")
      .withColumn("kind",
        when(col("_q_label") === col("_nn_label"), lit("pos"))
          .otherwise(lit("neg")))
      .withColumn("pair_rank", row_number().over(byKind).cast("long"))
      .filter(
        (col("kind") === "pos" && col("pair_rank") <= kPos) ||
        (col("kind") === "neg" && col("pair_rank") <= kNeg))
      .select(col("q_id"), col("nn_id"), col("kind"), col("pair_rank"))
  }
}
