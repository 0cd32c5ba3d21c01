package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end training-data preparation: the composition a 100 TB corpus
 * actually runs, built entirely from this package's oracled operators —
 *
 *  0. optional PII scrub ([[Scrub.maskEmails]] — per-row, first, so every
 *     downstream stat and the shipped corpus see only masked text);
 *  1. quality filtering ([[TextOps.qualityScore]] floor plus repetition
 *     ceilings on [[TextOps.dupWordFrac]] / [[TextOps.topBigramCount]] —
 *     all per-row codegen'd expressions, a pure filter);
 *  2. near-duplicate removal ([[Dedup.dedupTransitive]] — exact-collapse
 *     skew guard, banded LSH, exact-Jaccard verify, connected components);
 *  3. benchmark decontamination ([[Contamination.contamination]] — drop
 *     docs whose shingle overlap with the eval corpus exceeds the cap;
 *     docs too short to shingle pass, matching the screen's domain);
 *  4. optional deterministic per-language quota
 *     ([[Sampling.stratifiedTake]] — reproducible across engines and
 *     reruns);
 *  5. sequence packing ([[Packing.pack]] — shard/bin/offset columns for
 *     fixed-size context windows, input columns passing through).
 *
 * Stage order is the cost order: the near-free per-row filters run FIRST
 * so the spam and boilerplate they remove never inflate the dedup
 * stage's LSH shuffles — and so a quality-failing doc can never be the
 * least-id canonical survivor that silently takes its whole near-dup
 * group down with it. The filtered corpus is lineage-cut before fanning
 * out into the decontamination screen and its anti-join (the repo-wide
 * cut-before-fan-out rule); call
 * [[Materialize.release]] after fully consuming the result, as Bench and
 * Verify do per unit of work. The quota stage only exists when a quota
 * is configured — an unbounded "quota" would still pay a
 * per-stratum window whose parallelism is the stratum count.
 */
object DataPrep {

  /** Tuning knobs; defaults are the operators' own defaults. A `None`
    * quota skips the stratum stage entirely (no `rk` column);
    * `maskEmails` turns on the stage-0 PII scrub. */
  final case class Config(
      maskEmails: Boolean = false,
      dedupThreshold: Double = 0.8,
      minQuality: Double = 0.2,
      maxDupWordFrac: Double = 0.9,
      maxTopBigram: Long = 50L,
      contaminationCap: Double = 0.5,
      contaminationNgram: Int = 5,
      perStratumQuota: Option[Int] = None,
      contextLen: Long = 2048L,
      shards: Int = 256)

  /**
   * Stages 0+1 as a standalone screen: the optional PII scrub
   * ([[Scrub.maskEmails]] — first, so every downstream stat and the
   * shipped corpus see only masked text; masking after the fact would
   * leak PII through statistics computed on the raw form) and the
   * quality + repetition filters. Every operation is a stateless per-row
   * codegen'd expression — no shuffle, no watermark, no aggregation — so
   * the SAME call works on a batch DataFrame, on a streaming DataFrame,
   * or inside a `foreachBatch` ahead of
   * [[graft.streaming.StreamingDedup.processBatch]] (the streaming
   * corpus-prep composition; StreamingPrepSpec drives it end-to-end).
   */
  def screen(docs: DataFrame, textCol: String, config: Config = Config()): DataFrame = {
    val text: Column = col(textCol)
    val scrubbed =
      if (config.maskEmails) docs.withColumn(textCol, Scrub.maskEmails(text))
      else docs
    scrubbed
      .filter(TextOps.qualityScore(text) >= config.minQuality)
      .filter(TextOps.dupWordFrac(text) <= config.maxDupWordFrac)
      .filter(TextOps.topBigramCount(text) <= config.maxTopBigram)
  }

  /**
   * Prepare `docs` (idCol, textCol, stratumCol) against an eval `bench`:
   * returns the packed survivor set — original columns plus `shard`,
   * `n_tokens`, `tok_offset`, `bin` (and `rk` when a quota is set).
   */
  def prepare(
      docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      stratumCol: String = "lang",
      config: Config = Config()): DataFrame = {
    val text: Column = col(textCol)

    // 0.+1.: the stream-safe screen (see [[screen]])
    val screened = screen(docs, textCol, config)

    // 2. near-dup removal (transitive: one survivor per duplicate chain),
    // cut before the two-branch fan-out below
    val deduped = Materialize.cut(
      Dedup.dedupTransitive(screened, idCol, textCol,
        threshold = config.dedupThreshold))

    // 3. decontamination: drop docs over the overlap cap (shingle-less
    // docs are absent from the screen's output and pass through)
    val contaminated = Contamination
      .contamination(deduped, bench, idCol, textCol, config.contaminationNgram)
      .filter(col("contamination") > config.contaminationCap)
      .select(col(idCol))
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")

    // 4. optional deterministic per-stratum quota, then 5. packing
    val sampled = config.perStratumQuota match {
      case Some(k) => Sampling.stratifiedTake(clean, stratumCol, text, idCol, k)
      case None    => clean
    }
    Packing.pack(sampled, idCol, size(TextOps.tokens(text)),
      config.contextLen, config.shards)
  }
}
