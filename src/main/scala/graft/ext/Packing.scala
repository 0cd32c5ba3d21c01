package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing: assign each document a position in the concatenated
 * token stream and the fixed-size context window ("bin") its start falls
 * into — the concat-and-chunk packing LLM pretraining uses to fill
 * `contextLen`-token windows without padding.
 *
 * Scale design: global concatenation is inherently serial, so the
 * distributed idiom packs per SHARD — documents are hash-sharded, each
 * shard concatenates independently (one running-sum window per shard),
 * and shard count sets both parallelism and the number of independent
 * token streams. One shuffle (by shard), integer arithmetic only, state
 * O(1) per row.
 *
 * The reference has no packing surface (it never concatenates rows; its
 * writes are per-day partitions, `/root/reference/sree-etl-tdk-lambda.py:
 * 112-122`); SURVEY.md §2.11 extension.
 */
object Packing {

  /**
   * Per-shard concat-and-chunk: appends `shard, n_tokens, tok_offset,
   * bin` to the input rows, where `tok_offset` is the document's
   * first-token position in its shard's stream (docs ordered by `idCol`)
   * and `bin = tok_offset / contextLen`. Input columns pass through, so a
   * pipeline never needs a re-attach self-join. Deterministic: every
   * added column is integer arithmetic over the stable (shard, id) order.
   */
  def pack(
      df: DataFrame, idCol: String, nTokens: Column,
      contextLen: Long, shards: Int): DataFrame =
    packOrdered(df, idCol, col(idCol).asc, nTokens, contextLen, shards)

  /**
   * [[pack]] with an explicit within-shard stream order — the EPOCH
   * form: order by a salted shuffle key ([[Sampling.shuffleKey]]) and
   * each shard's stream is a reproducible random permutation, so packed
   * windows mix documents instead of replaying id order (the
   * curriculum-vs-shuffle knob). Sharding still comes from `idCol`
   * (numeric → value mod, else hash), so the shard layout is stable
   * across epochs — only the order inside each stream changes with the
   * salt. Callers must make `order` total (tie-break on `idCol`) when
   * the order column can collide.
   */
  /** Shard assignment shared by every batching shape: numeric ids shard
    * by value (cheap, oracle-replayable); any other id type shards by
    * hash — a blind pmod would CAST a string id to null (every row in
    * one null shard = one serial window task) or throw under ANSI mode. */
  private def shardOf(df: DataFrame, idCol: String, shards: Int): Column =
    df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        pmod(col(idCol), lit(shards.toLong))
      case _ => pmod(xxhash64(col(idCol)), lit(shards.toLong))
    }

  def packOrdered(
      df: DataFrame, idCol: String, order: Column, nTokens: Column,
      contextLen: Long, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(order, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shardOf(df, idCol, shards))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("tok_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integral division, NOT `/`: Divide casts longs through double, and
      // beyond 2^53 the truncated quotient can be off by one
      .withColumn("bin", expr(s"tok_offset div ${contextLen}L"))
  }

  /**
   * Length-bucketed PADDED batching — the inference/SFT sibling of
   * [[pack]]: where pack concatenates documents into fixed token
   * streams, serving and finetuning pad every sequence in a batch to
   * the batch's longest member, so batch cost is `batch_size × max_len`
   * and the padding bill is set by how length-homogeneous each batch
   * is. The standard answer is to SORT by length within a shard and cut
   * consecutive `batchSize` runs, putting like-length docs together
   * (the bucketed-batching trick every serving stack uses).
   *
   * Appends `shard, n_tokens, batch, pad` to the input rows: `batch` is
   * the document's padded-batch id within its shard (consecutive
   * `(n_tokens, idCol)`-ordered runs of `batchSize`), and `pad` is the
   * document's OWN padding bill in that batch (`batch max_len −
   * n_tokens` — sum it for the batch's waste, compare against an
   * unsorted baseline for the win). Same scale shape as [[pack]]: one
   * shuffle by shard, one per-shard window, integer arithmetic; the
   * max-per-batch is a second window on the (shard, batch) key the
   * first one defined — still shard-local, no extra shuffle.
   */
  def padBatches(
      df: DataFrame, idCol: String, nTokens: Column,
      batchSize: Int, shards: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val byLen = Window.partitionBy(col("shard"))
      .orderBy(col("n_tokens").asc, col(idCol).asc)
    df.withColumn("shard", shardOf(df, idCol, shards))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("_rn", row_number().over(byLen).cast("long"))
      .withColumn("batch", expr(s"(_rn - 1) div ${batchSize}L"))
      .drop("_rn")
      .withColumn("pad",
        max(col("n_tokens")).over(
          Window.partitionBy(col("shard"), col("batch"))) - col("n_tokens"))
  }
}
