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

  /**
   * Soft deduplication — down-WEIGHT duplicated content instead of
   * dropping it (SoftDeDup, He et al. 2024): every document keeps its
   * row, but its training sampling weight becomes `1 / cluster_size`
   * under the caller-chosen duplication key, so a cluster of n copies
   * contributes ONE document's worth of gradient in expectation while
   * each copy's unique context still appears. The key column is the
   * composition seam: md5 of the text for exact clusters
   * ([[graft.ext.Dedup]]'s `ghash` convention), a shingle-prefix
   * fingerprint for prefix clusters, or [[Dedup.components]]' cluster
   * labels for near-dup clusters — the operator itself never re-derives
   * candidates.
   *
   * Determinism: weights are `round(1/n, 12)` carried as
   * DECIMAL(38,12); NULL keys form one cluster (both SQL engines'
   * window-partition convention — route genuinely-unknown content to
   * distinct sentinel keys upstream if that is not wanted).
   *
   * Shape at scale: ONE shuffle — the window partition on the key (same
   * exchange a groupBy would pay, with no join back); output rows =
   * input rows, so downstream samplers stream over it unchanged.
   */
  def softDedupWeights(
      docs: DataFrame,
      idCol: String,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .select(col(idCol),
        col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 12).cast(dec).as("weight"))
  }

  /**
   * The standing-state form of [[softDedupWeights]]: a persisted
   * `(key, cluster_size)` count table. Counts are additive under
   * disjoint-batch union, so the index maintains by
   * [[mergeSoftDedupIndex]] without re-reading history text — only the
   * key column ever moves.
   */
  def buildSoftDedupIndex(docs: DataFrame, keyCol: String): DataFrame =
    docs.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cluster_size"))

  /** Additive fold of [[buildSoftDedupIndex]] partials from DISJOINT
    * batches — `merge(index(a), index(b)) ≡ index(a ∪ b)` (counts sum;
    * spec-pinned). */
  def mergeSoftDedupIndex(partials: DataFrame): DataFrame =
    partials.groupBy(col("key"))
      .agg(sum(col("cluster_size")).as("cluster_size"))

  /**
   * Weigh a NEW batch against a standing corpus: each batch document's
   * cluster size counts the history index PLUS the batch itself (the
   * batch is part of the corpus it joins), so
   * `weightsIndexed(batch, index(history)) ≡
   * softDedupWeights(history ∪ batch) restricted to batch ids` —
   * history text is never re-read; the join key side is the
   * metadata-shaped count table. Note the asymmetry soft dedup shares
   * with every standing-weight scheme: HISTORY documents' weights
   * dilute as new duplicates arrive — re-derive history weights from
   * the merged index (one join, no text) when re-sampling old shards.
   */
  def softDedupWeightsIndexed(
      batch: DataFrame,
      index: DataFrame,
      idCol: String,
      keyCol: String): DataFrame = {
    val total = mergeSoftDedupIndex(
      index.unionByName(buildSoftDedupIndex(batch, keyCol)))
    val b = batch.select(col(idCol), col(keyCol).as("__bkey"))
    // null-SAFE key equality: the index holds NULL keys as one row
    // (GROUP BY semantics), so the lookup must match them too — a plain
    // equi-join would silently drop every NULL-keyed batch doc
    b.join(total, b("__bkey") <=> total("key"), "left")
      .select(col(idCol),
        col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 12).cast(dec).as("weight"))
  }

  /**
   * CCNet-style perplexity buckets (Wenzek et al. 2020, "CCNet:
   * Extracting High Quality Monolingual Datasets from Web Crawl Data"
   * §4.4): within each group (language, in the paper), documents split
   * into equal-count head / middle / tail terciles by their
   * reference-LM score — head = most-fluent third, the slice CCNet
   * ships by default. Scores come from any per-document quality model;
   * [[graft.ext.LmScore.score]]'s `nll` is the faithful choice (lower =
   * more like the reference corpus = head).
   *
   * Determinism: standard-SQL NTILE over `(scoreCol ASC, idCol ASC)` —
   * the id tiebreak pins equal scores, and both engines implement the
   * same NTILE bucket-size rule (first `n mod k` buckets get the extra
   * row), so assignments are engine-invariant given engine-invariant
   * scores (round the score upstream, the q80 6-dp convention).
   *
   * Shape at scale: ONE shuffle — the window partition on the group
   * column. The window ORDERS within group, so a pathological
   * single-group corpus serializes; group = language gives natural
   * parallelism, and per-group row counts are the corpus's language
   * mix, not a skew amplifier.
   */
  def perplexityBuckets(
      scored: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // asc_nulls_last, not plain asc: Spark's default ASC is NULLS FIRST
    // while standard-SQL engines (the DuckDB oracle included) default
    // NULLS LAST — a NULL score must not land in the head tercile, and
    // nulls-last matches where bucketsIndexed routes the same NULL
    // scores (its CASE falls through to tail)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc_nulls_last, col(idCol).asc)
    scored
      .withColumn("__tile", ntile(3).over(w))
      .withColumn("ppl_bucket",
        when(col("__tile") === 1, lit("head"))
          .when(col("__tile") === 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__tile")
  }

  /**
   * The standing-thresholds form of [[perplexityBuckets]]: persist each
   * group's tercile CUT SCORES — `(groupCol, head_max, middle_max)`,
   * the highest score inside tiles 1 and 2 — and bucket any future
   * document by comparing its score against the cuts with ZERO passes
   * over the corpus ([[bucketsIndexed]]). CCNet's production shape:
   * thresholds fit once per (language, snapshot); every crawl shard
   * then buckets independently. The frame is group-cardinality-sized
   * metadata, so it rides every lookup as a broadcast.
   */
  def buildBucketThresholds(
      scored: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: String): DataFrame =
    perplexityBuckets(scored, idCol, groupCol, scoreCol)
      .groupBy(col(groupCol))
      .agg(
        max(when(col("ppl_bucket") === "head", col(scoreCol)))
          .as("head_max"),
        max(when(col("ppl_bucket") === "middle", col(scoreCol)))
          .as("middle_max"))

  /**
   * Bucket a batch against [[buildBucketThresholds]] cuts: head if
   * `score ≤ head_max`, middle if `≤ middle_max`, tail otherwise.
   * Contract difference from the self-contained form, by design: the
   * index assigns by SCORE alone (a batch doc tying a cut lands in the
   * lower bucket), while ntile splits ties by id to force exact
   * tercile counts — an index cannot know the corpus's tie ids. A
   * group absent from the thresholds (or one too small to have filled
   * its tiles) buckets to tail — the conservative unseen-group default.
   * One broadcast join, no window, no shuffle beyond the input's.
   */
  def bucketsIndexed(
      batch: DataFrame,
      thresholds: DataFrame,
      groupCol: String,
      scoreCol: String): DataFrame =
    batch
      .join(broadcast(thresholds), Seq(groupCol), "left")
      .withColumn("ppl_bucket",
        when(col(scoreCol) <= col("head_max"), lit("head"))
          .when(col(scoreCol) <= col("middle_max"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("head_max", "middle_max")

  /**
   * Domain reweighting by excess loss — ONE multiplicative-weights step
   * of the DoReMi scheme (Xie et al. 2023, "Doremi: Optimizing Data
   * Mixtures Speeds Up Language Model Pretraining"), linearized for
   * exactness: starting from the uniform mixture, each domain's weight
   * scales by `max(0, 1 + η · excess_d)` where
   * `excess_d = loss_d − mean_over_domains(loss)` (the paper's
   * per-domain excess of proxy over reference loss; the unweighted
   * domain mean stands in for the reference when no second model
   * exists), then renormalizes. The paper's exponential tilt
   * `exp(η·excess)` is `1 + η·excess + O(η²)` — at one step and small η
   * the linear form ranks identically, and unlike `exp` it is exactly
   * reproducible across engines (the repo-wide no-transcendental-in-
   * the-hash rule; ln is the one exception both engines bit-match).
   *
   * Determinism: excess and the scale factor round to 12 dp and ride as
   * DECIMAL(38,12); the final normalization is the only division,
   * rounded to 6 dp. Output: `(domain, loss, excess, weight)`.
   *
   * Shape at scale: the input is already domain-sized (one row per
   * domain — metadata, not data); the mean and the normalizer attach as
   * broadcast one-row aggregates, so the whole step is a few narrow
   * stages over a tiny frame. The expensive part of DoReMi is computing
   * `loss_d` — that is the caller's per-domain aggregation (one
   * map-side-partial shuffle over the corpus, e.g. LmScore → groupBy).
   */
  def domainReweight(
      losses: DataFrame,
      domainCol: String,
      lossCol: String,
      eta: Double = 0.5): DataFrame = {
    require(eta > 0, s"eta must be positive, got $eta")
    // mean via exact decimal sum then ONE double division — an avg of
    // doubles is summation-order-dependent, this is not (the q336
    // decimal-sum convention; losses arrive pre-rounded from the caller)
    val mean = losses.agg(
      round(sum(round(col(lossCol), 12).cast(dec)).cast("double") /
        count(lit(1)), 12).as("__mean"))
    val withFactor = losses
      .crossJoin(broadcast(mean))
      .select(col(domainCol), col(lossCol),
        round(col(lossCol) - col("__mean"), 12).cast(dec).as("excess"))
      .withColumn("__factor",
        greatest(lit(0).cast(dec),
          round(lit(1.0) + lit(eta) * col("excess"), 12).cast(dec)))
    val total = withFactor.agg(sum(col("__factor")).as("__total"))
    withFactor
      .crossJoin(broadcast(total))
      .select(col(domainCol), col(lossCol), col("excess"),
        round(col("__factor").cast("double") /
          col("__total").cast("double"), 6).as("weight"))
  }

  /**
   * Prototypicality-based data pruning (Sorscher et al., NeurIPS 2022,
   * "Beyond neural scaling laws: beating power law scaling via data
   * pruning"): rank every embedding by cosine similarity to its
   * cluster's centroid and PRUNE the most prototypical fraction — the
   * paper's central result is that when data is ABUNDANT the easy
   * (prototypical) examples are the redundant ones, and dropping them
   * beats random subsampling; `pruneFrac` of each cluster's
   * highest-similarity rows are flagged `kept = false`.
   *
   * The cluster structure here is the caller's `labelCol` (a k-means
   * assignment from [[AnnIvf]], an LSH bucket, or a supervised label —
   * the paper uses k-means over the embedding space); the centroid is
   * the per-label coordinate-wise mean with each component rounded to
   * 6 dp (the q30 centroid definition — rounding absorbs cross-
   * partition float-sum order, and AFTER it both engines hold the
   * identical doubles, so the cosine below is exact-double
   * reproducible). Cosine is the ordered `Σ vᵢ·cᵢ` list fold (the q352
   * oracle idiom); ranks break ties on `idCol` (repo convention), and
   * the per-label cut is `rank ≤ ⌊pruneFrac·n_label⌋` in exact
   * arithmetic on identical doubles.
   *
   * Output: `(label, id, proto_sim, rank, kept)` — the audit frame; a
   * caller prunes with `filter(col("kept"))` and keeps the frame as
   * the release's provenance.
   *
   * Shape at scale: the centroid aggregate is one posexplode +
   * map-side-combined hash aggregate to a |labels|×d frame that
   * BROADCASTS back (labels are few by construction); the only data
   * shuffle is the per-label ranking window. With very-low-cardinality
   * labels at extreme scale that window concentrates per-label — the
   * amortized path is the [[buildBucketThresholds]] pattern: persist
   * per-label sim thresholds from history, cut new batches with a pure
   * projection (the q351 shape).
   */
  def prototypicalityPrune(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      pruneFrac: Double): DataFrame = {
    require(pruneFrac >= 0 && pruneFrac < 1,
      s"pruneFrac must be in [0, 1), got $pruneFrac")
    import org.apache.spark.sql.expressions.Window
    val cent = emb
      .select(col(labelCol).as("__label"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("__label"), col("pos"))
      .agg(round(avg(col("v").cast("double")), 6).as("c"))
      .groupBy(col("__label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("centroid"))
    def dotD(a: Column, b: Column) = Similarity.dot(a, b)
    val sim = dotD(col(vecCol), col("centroid")) /
      nullif(sqrt(dotD(col(vecCol), col(vecCol))) *
        sqrt(dotD(col("centroid"), col("centroid"))), lit(0.0))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("__sim").desc_nulls_last, col("id").asc)
    val wAll = Window.partitionBy(col("label"))
    emb.join(broadcast(cent), col(labelCol) === col("__label"))
      .withColumn("__sim", sim)
      .select(col(labelCol).as("label"), col(idCol).as("id"), col("__sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .select(col("label"), col("id"),
        round(col("__sim"), 6).as("proto_sim"), col("rank"),
        (col("rank") > floor(lit(pruneFrac) *
          col("__n").cast("double")).cast("long")).as("kept"))
  }
}
