package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding-quality evaluation: does the vector space agree with the
 * labels? Leave-one-out kNN classification is the standard probe — if
 * a vector's nearest neighbors mostly carry its own label, the space
 * separates the classes (kNN-recall/probe accuracy in the embedding
 * literature). This is an EVAL-family operator: it runs on a labeled
 * sample, not the corpus — sample-sized all-pairs is the honest exact
 * baseline (the q19 contract), and a corpus-scale variant plugs an ANN
 * neighbor frame ([[AnnIvf.knnJoin]]) into the same vote.
 */
object Eval {

  /**
   * Leave-one-out kNN label agreement: for each labeled vector, its
   * `k` nearest OTHER vectors by cosine vote on a predicted label
   * (majority; vote ties break to the smallest label — deterministic,
   * no hash-map order anywhere). Sims are rounded to 6 dp BEFORE
   * ranking (the q89 determinism rule: an unrounded 1-ulp fold
   * difference must not flip a rank), ranks tie-break by neighbor id.
   * Returns `(idCol, labelCol, pred, correct)` one row per vector —
   * `avg(correct)` is the probe accuracy.
   *
   * Shape: the query side broadcasts (sample-sized by the eval
   * contract); the corpus side never shuffles until the per-query
   * top-k window. Zero-norm vectors get NULL sims and rank last (the
   * [[Similarity]] convention).
   */
  def knnClassify(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label",
      k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = emb.filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
    val q = broadcast(base.select(
      col(idCol).as("q_id"), col(vecCol).as("q_emb"),
      Similarity.norm(col(vecCol)).as("q_n"), col(labelCol).as("q_label")))
    val c = base.select(
      col(idCol).as("nn_id"), col(vecCol).as("nn_emb"),
      Similarity.norm(col(vecCol)).as("nn_n"), col(labelCol).as("nn_label"))
    val byRank = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("nn_id").asc)
    val neighbors = c.join(q)
      .filter(col("nn_id") =!= col("q_id"))
      .withColumn("sim", round(
        Similarity.nativeDot(col("q_emb"), col("nn_emb"))
          / nullif(col("q_n") * col("nn_n"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(byRank))
      .filter(col("rank") <= k)
    val byVotes = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("nn_label").asc)
    neighbors
      .groupBy(col("q_id"), col("q_label"), col("nn_label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("_vr", row_number().over(byVotes))
      .filter(col("_vr") === 1)
      .select(col("q_id").as(idCol), col("q_label").as(labelCol),
        col("nn_label").as("pred"),
        (col("q_label") === col("nn_label")).cast("long").as("correct"))
  }
}
