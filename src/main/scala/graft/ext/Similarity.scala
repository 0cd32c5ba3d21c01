package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Embedding similarity search over `array<float>` columns, built from
 * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs.
 *
 * Scale design (100 TB): the query set is the small side and is broadcast;
 * the corpus is scanned once, partition-parallel, with the per-query top-k
 * reduced through a ranking window on (query, -sim). No corpus shuffle
 * beyond the final top-k exchange, whose size is |queries| × k, not |corpus|.
 * For corpus×corpus all-pairs use the LSH/IVF bucketed variant ([[Dedup]] /
 * [[AnnLsh]]) so candidates co-locate by bucket instead of cross-joining.
 */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision (order-independent per element, exact
    * w.r.t. evaluation order only in the array fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact brute-force cosine top-k: every query vector against the whole
   * corpus. Queries are broadcast (small side); corpus partitions stream.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("nn_id").asc)
    c.join(q) // broadcast nested-loop: corpus stays partitioned, no shuffle
      .withColumn("sim", cosine(col("q_emb"), col("nn_emb")))
      .select(col("q_id"), col("nn_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }
}
