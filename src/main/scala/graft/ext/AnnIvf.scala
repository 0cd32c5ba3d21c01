package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * IVF (inverted-file) approximate nearest neighbors — the data-adaptive
 * complement to [[AnnLsh]]'s data-oblivious hyperplanes: a small set of
 * coarse centroids partitions the corpus into cells; a query probes only
 * its `nprobe` nearest cells and scores candidates exactly.
 *
 * Scale design (100 TB): centroids are k rows — always broadcast. Cell
 * assignment is one broadcast pass over the corpus (no shuffle of the
 * corpus beyond the final per-cell grouping); Lloyd refinement iterations
 * are each one pass + one tiny per-(cell, dim) aggregate. Query-time work
 * is |queries| × nprobe cells joined against the cell-keyed corpus — an
 * equi-join on `cell`, never a nested loop. Like every ANN method, pruning
 * on near-uniform random vectors (the synthetic test data) requires
 * probing most cells for high recall; on real clustered embeddings cells
 * match the cluster structure and nprobe ≪ k holds recall.
 *
 * Determinism: centroid init picks the k corpus vectors with the smallest
 * seeded hash, refinement is fixed-iteration (no convergence test), and
 * ties break on cell id — identical output across runs.
 */
object AnnIvf {

  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** Cosine distance (1 - cos) between a float vector and a double
    * centroid, computed with the codegen'd dot product. */
  private def cosDist(vec: Column, vecNorm: Column, centroid: Column, cNorm: Column): Column =
    lit(1.0) - Similarity.nativeDot(vec, centroid) / (vecNorm * cNorm)

  /**
   * Train `k` coarse centroids with `iters` Lloyd iterations.
   * Returns (cell BIGINT, centroid ARRAY<FLOAT>, c_norm DOUBLE), materialized.
   * Cell ids are the seed vectors' `vec_id`s — distinct and deterministic
   * is all the downstream equi-joins need; using them directly avoids a
   * global ranking window over the seed rows (k rows, but WindowExec still
   * warns about the single-partition move on every run).
   */
  def trainCentroids(
      corpus: DataFrame, k: Int, iters: Int = 3, seed: Long = 42L): DataFrame = {
    val base = Materialize.cut(
      corpus.select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("v_norm")))

    // deterministic init: the k vectors with the smallest seeded hash
    var centroids = Materialize.cut(
      base
        .orderBy(xxhash64(col("vec_id"), lit(seed)).asc, col("vec_id").asc)
        .limit(k)
        .select(
          col("vec_id").cast("long").as("cell"),
          col("embedding").as("centroid"),
          col("v_norm").as("c_norm")))

    (1 to iters).foreach { _ =>
      val assigned = assignCells(base, centroids)
      // new centroid = per-(cell, dim) mean, reassembled in dim order
      centroids = Materialize.cut(
        assigned
          .join(base, "vec_id")
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("cell", "pos")
          .agg(avg(col("v").cast("double")).as("m"))
          .groupBy("cell")
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("cell"),
            transform(col("pm"), x => x.getField("m").cast("float")).as("centroid"))
          .withColumn("c_norm", Similarity.norm(col("centroid"))))
    }
    centroids
  }

  /** Nearest-centroid cell per corpus vector: one broadcast pass, argmin
    * via a struct-min aggregate (ties → lowest cell id). */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus
      .select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("v_norm"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct(
          cosDist(col("embedding"), col("v_norm"), col("centroid"), col("c_norm"))
            .as("dist"),
          col("cell")).as("dc"))
      .groupBy("vec_id")
      .agg(min(col("dc")).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"))

  /**
   * ANN top-k: probe each query's `nprobe` nearest cells, equi-join on
   * `cell` against the cell-keyed corpus, score candidates exactly.
   * `excludeSelf` drops the query's own corpus row before ranking — for
   * self-join uses where rank 1 would otherwise always be the vector
   * itself.
   */
  def annTopK(
      queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      kNeighbors: Int, nprobe: Int, excludeSelf: Boolean = false): DataFrame = {
    val cells = Materialize.cut(assignCells(corpus, centroids))
    val corpusCells = corpus
      .select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"),
        Similarity.norm(col("embedding")).as("nn_n"))
      .join(cells.withColumnRenamed("vec_id", "nn_id"), "nn_id")

    val probeW = Window.partitionBy(col("q_id")).orderBy(col("dist").asc, col("cell").asc)
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        Similarity.norm(col("embedding")).as("q_n"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist",
        cosDist(col("q_emb"), col("q_n"), col("centroid"), col("c_norm")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_n"), col("cell"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("nn_id").asc)
    val scored = probes.join(corpusCells, "cell")
    val candidates =
      if (excludeSelf) scored.filter(col("q_id") =!= col("nn_id")) else scored
    candidates
      .withColumn("sim",
        Similarity.nativeDot(col("q_emb"), col("nn_emb")) / (col("q_n") * col("nn_n")))
      .select(col("q_id"), col("nn_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kNeighbors)
      .orderBy(col("q_id").asc_nulls_last, col("rank").asc_nulls_last)
  }

  /**
   * Corpus-wide kNN SELF-join — the embedding-side primitive behind
   * semantic dedup and density clustering: every vector's `kNeighbors`
   * nearest neighbors among its `nprobe` nearest IVF cells, scored exactly
   * (cosine, ties → lowest id). This is [[annTopK]] with the corpus as its
   * own query set and self-pairs excluded: candidate generation is the
   * cell equi-join (nprobe × the per-cell block, never all-pairs), so the
   * quadratic term is bounded per cell and tuned by the k/nprobe knobs —
   * the standard IVF answer to "give every one of 10^9 vectors its
   * neighbors" where the all-pairs join is 10^18.
   */
  def knnJoin(
      corpus: DataFrame, centroids: DataFrame,
      kNeighbors: Int, nprobe: Int = 4): DataFrame =
    annTopK(corpus, corpus, centroids, kNeighbors, nprobe, excludeSelf = true)
}
