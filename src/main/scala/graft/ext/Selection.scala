package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Data selection via importance resampling — DSIR (Xie et al., NeurIPS
 * 2023, "Data Selection for Language Models via Importance Resampling"):
 * fit two bag-of-n-grams distributions — one over a small TARGET corpus
 * (the domain you want more of), one over the RAW pool — and score every
 * raw document by its log importance weight
 * `log p_target(doc) / p_raw(doc) = Σ_tokens log(p_t[b]/p_r[b])`,
 * then keep the top-k. The paper hashes n-grams into fixed buckets purely
 * to bound the feature dimension; here the bucket space is the top-`k`
 * RAW vocabulary (one extra additive pass, [[TextOps.termFrequencies]])
 * plus one OOV bucket — same model family, and exactly reproducible by
 * an independent engine without sharing a hash function.
 *
 * Reference scope: the reference has no selection surface (its analytics
 * are full-table grouped counts, `sree-etl-tdk-glue-job.py:51-68`);
 * SURVEY.md §2.11 extension — the data-SELECTION member of the LLM-prep
 * family, next to [[Sampling.temperatureRates]] (mix by source) and
 * [[DataPrep.screen]] (filter by rule).
 *
 * Determinism: both distributions are Laplace-smoothed over the SAME
 * `V + 1` bucket domain (`p[b] = (c[b]+1)/(N+V+1)`), each bucket's
 * log-ratio rounds to 12 dp and is carried as DECIMAL(38,12), and a
 * document's weight is the exact decimal sum of its tokens' ratios — so
 * weights are order-, partitioning- and engine-invariant (the
 * [[CorpusCompare]] log-term convention).
 *
 * Shape at scale: the vocabulary and the ratio table are metadata-sized
 * (`V + 1` rows, corpus-size-independent), so they ride every join as a
 * broadcast; the corpus is touched by narrow explode → broadcast-join
 * stages and exactly ONE shuffle (the per-document weight aggregation,
 * map-side partial). Bucket counts are ADDITIVE — a persisted ratio
 * table maintains by re-deriving from merged term frequencies
 * ([[TextOps.mergeTermFrequencies]]) instead of re-tokenizing history,
 * and an already-built table scores any new batch with zero passes over
 * the old pool (the q75/q124 standing-index pattern; see the
 * `dsir_indexed` query).
 */
object Selection {

  private val dec = DecimalType(38, 12)

  /**
   * The out-of-vocabulary bucket key: the empty string can never
   * collide with a real bucket because [[TextOps.tokens]] drops empty
   * tokens, so no vocabulary entry is ever `""` (the defensive filter
   * in [[ngramLogRatios]] pins that invariant anyway).
   */
  val OovBucket = ""

  /**
   * The fitted model: one row per bucket — the top-`vocabK` raw-corpus
   * tokens (minus any that equal [[OovBucket]]) plus the OOV row —
   * with both corpora's smoothed counts and the 12-dp decimal
   * log-ratio `ln p_target[b] − ln p_raw[b]`.
   *
   * Output: `(bucket, raw_cnt, target_cnt, log_ratio)`.
   */
  def ngramLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      vocabK: Int = 4096): DataFrame =
    ngramLogRatiosFromTf(
      TextOps.termFrequencies(raw, textCol),
      TextOps.termFrequencies(target, textCol), vocabK)

  /**
   * [[ngramLogRatios]] from ALREADY-AGGREGATED term frequencies — the
   * merge-law form: `(token, freq)` frames are additive
   * ([[TextOps.mergeTermFrequencies]]), so a standing pair of tf tables
   * maintains per batch and the model refits from vocabulary-sized
   * inputs without re-tokenizing history. `fromTf(merge(a,b), …) ≡
   * from-scratch on the concatenated corpora` (sums associate;
   * spec-pinned).
   */
  def ngramLogRatiosFromTf(
      rawTf: DataFrame,
      targetTf: DataFrame,
      vocabK: Int = 4096): DataFrame = {
    require(vocabK > 0, s"vocabK must be positive, got $vocabK")
    val vocab = TextOps.vocabFromTf(rawTf, vocabK)
      .filter(col("token") =!= lit(OovBucket))
      .select(col("token").as("bucket"))
    val domain = vocab.unionByName(
      vocab.sparkSession.range(1).select(lit(OovBucket).as("bucket")))

    def counts(tf: DataFrame, cntCol: String): DataFrame =
      tf.join(broadcast(vocab), tf("token") === vocab("bucket"), "left")
        .select(coalesce(col("bucket"), lit(OovBucket)).as("bucket"),
          col("freq"))
        .groupBy(col("bucket")).agg(sum(col("freq")).as(cntCol))

    val rawC = counts(rawTf, "raw_cnt")
    val tgtC = counts(targetTf, "target_cnt")

    // V and the two corpus totals are scalars: one-row aggregates
    // attached by broadcast (the established scalar-carry pattern).
    val v = domain.agg((count(lit(1)) - 1).as("v"))
    val joined = domain
      .join(broadcast(rawC), Seq("bucket"), "left")
      .join(broadcast(tgtC), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("raw_cnt"), lit(0L)).as("raw_cnt"),
        coalesce(col("target_cnt"), lit(0L)).as("target_cnt"))
    val totals = joined.agg(
      sum(col("raw_cnt")).as("n_raw"), sum(col("target_cnt")).as("n_tgt"))

    joined
      .crossJoin(broadcast(v))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("raw_cnt"), col("target_cnt"),
        round(
          log((col("target_cnt") + 1).cast("double") /
              (col("n_tgt") + col("v") + 1).cast("double")) -
          log((col("raw_cnt") + 1).cast("double") /
              (col("n_raw") + col("v") + 1).cast("double")), 12)
          .cast(dec).as("log_ratio"))
  }

  /** Exploded corpus tokens mapped to their bucket — the token itself
    * when the (broadcast, metadata-sized) vocabulary contains it, OOV
    * otherwise. Narrow: explode + broadcast left join, no shuffle. */
  private def bucketize(
      docs: DataFrame, textCol: String, vocab: DataFrame): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(docs.columns.map(col) :+
        explode(TextOps.tokens(col(textCol))).as("__tok"): _*)
      .join(broadcast(vocab.withColumn("__in_v", lit(true))),
        col("__tok") === col("bucket"), "left")
      .drop("bucket")
      .withColumn("bucket",
        when(col("__in_v"), col("__tok")).otherwise(lit(OovBucket)))
      .drop("__tok", "__in_v")

  /**
   * Per-document log importance weights under a fitted ratio table:
   * `(idCol, n_tokens, weight)` where `weight = Σ_token log_ratio[bucket
   * (token)]` as exact DECIMAL(38,12). Documents with NULL/empty text
   * keep weight 0 (an empty document is equally likely under both
   * models). ONE shuffle: the per-document aggregation of the
   * broadcast-joined token stream.
   */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ratios: DataFrame): DataFrame = {
    val vocab = ratios
      .filter(col("bucket") =!= lit(OovBucket)).select("bucket")
    val scored = bucketize(docs.select(col(idCol), col(textCol)),
        textCol, vocab)
      .join(broadcast(ratios.select(col("bucket"), col("log_ratio"))),
        Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("log_ratio")).as("w"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("w"), lit(0).cast(dec)).as("weight"))
  }

  /**
   * The selection step: top-`k` documents by `(weight DESC, id ASC)`
   * with their dense rank — deterministic, so the same pool and target
   * always select the same training subset. TakeOrdered bounds the
   * global sort to `k`; the rank window runs over the k survivors only
   * (the q103 bounded-window precedent).
   */
  def select(
      weights: DataFrame,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    weights
      .orderBy(col("weight").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("weight").desc, col(idCol).asc)).cast("long"))
  }
}
