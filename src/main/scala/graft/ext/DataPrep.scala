package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end training-data preparation: the composition a 100 TB corpus
 * actually runs, built entirely from this package's oracled operators —
 *
 *  1. near-duplicate removal ([[Dedup.dedupTransitive]] — exact-collapse
 *     skew guard, banded LSH, exact-Jaccard verify, connected components);
 *  2. quality filtering ([[TextOps.qualityScore]] floor plus repetition
 *     ceilings on [[TextOps.dupWordFrac]] / [[TextOps.topBigramCount]] —
 *     all per-row codegen'd expressions, a pure filter);
 *  3. benchmark decontamination ([[Contamination.contamination]] — drop
 *     docs whose shingle overlap with the eval corpus exceeds the cap;
 *     docs too short to shingle pass, matching the screen's domain);
 *  4. deterministic per-language quota ([[Sampling.stratifiedTake]] —
 *     reproducible across engines and reruns);
 *  5. sequence packing ([[Packing.pack]] — shard/bin/offset assignment
 *     for fixed-size context windows).
 *
 * Stage order is the cost order: dedup first (its LSH work shrinks every
 * later stage), cheap filters next, the quota before packing (pack ids
 * must be final). Every stage is a narrow filter or an already-audited
 * operator plan, so the composition adds no new shuffle beyond its
 * parts.
 */
object DataPrep {

  /** Tuning knobs; defaults are the operators' own defaults. */
  final case class Config(
      dedupThreshold: Double = 0.8,
      minQuality: Double = 0.2,
      maxDupWordFrac: Double = 0.9,
      maxTopBigram: Long = 50L,
      contaminationCap: Double = 0.5,
      contaminationNgram: Int = 5,
      perStratumQuota: Int = Int.MaxValue,
      contextLen: Long = 2048L,
      shards: Int = 256)

  /**
   * Prepare `docs` (idCol, textCol, stratumCol) against an eval `bench`:
   * returns the packed survivor set — original columns plus `rk` (quota
   * rank), `shard`, `n_tokens`, `tok_offset`, `bin`.
   */
  def prepare(
      docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      stratumCol: String = "lang",
      config: Config = Config()): DataFrame = {
    val text: Column = col(textCol)

    // 1. near-dup removal (transitive: one survivor per duplicate chain)
    val deduped = Dedup.dedupTransitive(docs, idCol, textCol,
      threshold = config.dedupThreshold)

    // 2. quality + repetition filters (pure per-row projection)
    val filtered = deduped
      .filter(TextOps.qualityScore(text) >= config.minQuality)
      .filter(TextOps.dupWordFrac(text) <= config.maxDupWordFrac)
      .filter(TextOps.topBigramCount(text) <= config.maxTopBigram)

    // 3. decontamination: drop docs over the overlap cap (shingle-less
    // docs are absent from the screen's output and pass through)
    val contaminated = Contamination
      .contamination(filtered, bench, idCol, textCol, config.contaminationNgram)
      .filter(col("contamination") > config.contaminationCap)
      .select(col(idCol))
    val clean = filtered.join(contaminated, Seq(idCol), "left_anti")

    // 4. deterministic per-stratum quota, then 5. packing
    val sampled = Sampling.stratifiedTake(
      clean, stratumCol, text, idCol, config.perStratumQuota)
    sampled.join(
      Packing.pack(sampled, idCol, size(TextOps.tokens(text)),
        config.contextLen, config.shards),
      Seq(idCol))
  }
}
