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

  /** Deterministic ±1 hyperplane matrix (numPlanes × dim) from a seeded
    * 64-bit LCG (Knuth MMIX constants). */
  private[ext] def planeMatrix(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      if (state >= 0) 1.0 else -1.0
    }
    Seq.fill(numPlanes)(Seq.fill(dim)(next()))
  }

  /** Signature bits: element h = 1 if vec · plane_h > 0 else 0. */
  private def signatureBits(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val planesLit = typedLit(planes)
    transform(sequence(lit(0), lit(planes.length - 1)), h =>
      when(
        aggregate(
          zip_with(vec, element_at(planesLit, h + 1),
            (x, p) => x.cast("double") * p),
          lit(0.0), (acc, x) => acc + x) > 0d,
        1L).otherwise(0L))
  }

  /**
   * One `(id, table, bucket)` row per hash table; bucket packs the table's
   * `bitsPerTable` sign bits into a long.
   */
  def buckets(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bitsPerTable: Int, numTables: Int, seed: Long = 42L): DataFrame = {
    val planes = planeMatrix(bitsPerTable * numTables, dim, seed)
    // materialize the sign bits before the per-table explode — projection
    // collapse would otherwise inline the bits×dim dot-product expression
    // into every table entry (numTables× recompute)
    Materialize.cut(
      df.select(col(idCol), signatureBits(col(vecCol), planes).as("sig")))
      .select(
        col(idCol),
        explode(transform(sequence(lit(0), lit(numTables - 1)), t =>
          struct(
            t.as("table"),
            aggregate(
              slice(col("sig"), t * bitsPerTable + 1, lit(bitsPerTable)),
              lit(0L), (acc, b) => acc * 2 + b).as("bucket")))).as("tb"))
      .select(col(idCol), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

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
    cand
      .join(corpus.select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb")), "nn_id")
      .join(broadcast(
        queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))), "q_id")
      .withColumn("sim",
        Similarity.nativeDot(col("q_emb"), col("nn_emb"))
          / (Similarity.norm(col("q_emb")) * Similarity.norm(col("nn_emb"))))
      .select(col("q_id"), col("nn_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id").asc_nulls_last, col("rank").asc_nulls_last)
  }
}
