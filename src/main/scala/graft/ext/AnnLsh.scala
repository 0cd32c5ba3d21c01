package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Bucketed approximate nearest neighbors via sign-random-projection LSH
 * (random-hyperplane hashing for cosine similarity) — the scale path that
 * replaces [[Similarity.bruteForceTopK]]'s corpus×queries nested loop when
 * the query side is NOT small, and the bucketed alternative to any
 * corpus×corpus cross join.
 *
 * Scale design (100 TB): each vector maps to `numTables` (table, bucket)
 * keys — bucket = the packed sign bits of `bitsPerTable` fixed random
 * hyperplanes. Candidate generation is an equi-join on (table, bucket):
 * vectors co-locate by bucket in one linear shuffle, and only within-bucket
 * pairs are scored exactly. P(two vectors at angle θ share a bucket in one
 * table) = (1-θ/π)^bitsPerTable; `numTables` independent tables drive
 * recall to 1-(1-p)^L. Hyperplanes are ±1 Rademacher vectors derived from a
 * seeded LCG, so signatures are deterministic, need no driver-side
 * randomness, and cost one multiply-add pass per plane (codegen'd
 * higher-order functions — no UDF, no shuffle).
 *
 * Note: on near-uniform random vectors (the synthetic test embeddings,
 * top-1 neighbor cosine ≈ 0.37) LSH must be tuned loose (few bits, many
 * tables) to hold recall, which erodes pruning — that is a property of
 * uniform data, where no sublinear ANN is possible; on real clustered
 * embeddings the same machinery prunes aggressively at tighter settings.
 */
object AnnLsh {

  /** Deterministic ±1 hyperplane matrix (numPlanes × dim) — the
    * [[graft.functions.LshBuckets]] LCG matrix reshaped for inspection. */
  private[ext] def planeMatrix(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] =
    graft.functions.LshBuckets.planeRows(numPlanes, dim, seed)
      .map(_.toDouble).toSeq.grouped(dim).toSeq

  /**
   * One `(id, table, bucket)` row per hash table; bucket packs the table's
   * `bitsPerTable` sign bits into a long.
   *
   * All `numTables × bitsPerTable` plane dots happen in ONE codegen'd
   * expression per row ([[graft.functions.LshBuckets]] — the planes
   * matrix loop is two JIT'd loops behind a single call), posexploded
   * into `(table, bucket)` rows. The per-plane formulations both lose:
   * interpreted HOF folds cost numPlanes CodegenFallback trees per row
   * (plus a lineage cut to stop projection collapse inlining them
   * numTables×), and numPlanes separate `graft_dot` calls bloat the
   * generated projection past JIT comfort (measured 4.1 s vs 2.2 s on
   * q21). Here the generator input is one fused call, evaluated once per
   * row — nothing to protect, nothing to shuffle before the
   * (table, bucket) candidate join.
   */
  def buckets(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bitsPerTable: Int, numTables: Int, seed: Long = 42L): DataFrame =
    df.select(col(idCol),
        posexplode(call_function("graft_lsh_buckets", col(vecCol),
          lit(bitsPerTable), lit(numTables), lit(dim), lit(seed)))
          .as(Seq("table", "bucket")))

  /**
   * ANN top-k: bucket queries and corpus, equi-join on (table, bucket) for
   * candidates, score candidates exactly, rank per query. Both sides
   * shuffle once by bucket key — no nested loop over the corpus.
   */
  def annTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      bitsPerTable: Int = 4, numTables: Int = 32, seed: Long = 42L): DataFrame = {
    val qb = buckets(queries.select(col("vec_id").as("q_id"), col("embedding")),
      "q_id", "embedding", dim, bitsPerTable, numTables, seed)
    val cb = buckets(corpus.select(col("vec_id").as("nn_id"), col("embedding")),
      "nn_id", "embedding", dim, bitsPerTable, numTables, seed)
    val cand = qb.join(cb, Seq("table", "bucket"))
      .select(col("q_id"), col("nn_id")).distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("nn_id").asc)
    // norms once per ROW in the join projections — inline norm() in the
    // sim expression would re-fold both norms once per CANDIDATE (the
    // exact per-pair recompute nearDupPairsBlocked's comment warns
    // against); NULL sim on zero norms, see Similarity doc
    cand
      .join(corpus.select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"),
        Similarity.norm(col("embedding")).as("nn_n")), "nn_id")
      .join(broadcast(
        queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          Similarity.norm(col("embedding")).as("q_n"))), "q_id")
      .withColumn("sim",
        Similarity.nativeDot(col("q_emb"), col("nn_emb"))
          / nullif(col("q_n") * col("nn_n"), lit(0.0)))
      .select(col("q_id"), col("nn_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id").asc_nulls_last, col("rank").asc_nulls_last)
  }
}
