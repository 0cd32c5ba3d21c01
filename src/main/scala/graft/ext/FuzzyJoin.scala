package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance record linkage over document heads: find pairs of
 * documents whose normalized first `headLen` characters are within
 * `maxDist` Levenshtein edits — the "same doc, small typo/boilerplate
 * drift" matcher that complements the token-set (MinHash/Jaccard) and
 * bit-sketch (SimHash) near-dup families with a character-level one
 * (token-set methods are blind to intra-word edits; this isn't).
 *
 * Reference scope: dedup is extension surface beyond the reference's
 * aggregate queries (`sree-etl-tdk-glue-job.py:51-63`); this completes
 * the near-dup family's third distance class.
 *
 * Scale shape: never all-pairs. Candidates come from MULTI-PASS prefix
 * blocking — pass 1 joins on the head's first `blockLen` chars, pass 2
 * on the next `blockLen` — so a pair survives as long as ONE of the two
 * regions is edit-free. This is the classic blocking recall bound made
 * explicit: a pair with every edit confined to one region is always
 * caught by the other block; only pairs edited in BOTH regions can be
 * missed (at maxDist ≤ blockLen that requires the edits to split across
 * the regions). Each pass is a bucket equi-join whose fan-out is
 * per-block quadratic — the standard blocking contract that block keys
 * are selective; a hot block (shared boilerplate prefix) is the q51
 * salting case and should be cut by lengthening `blockLen`. Pass 2
 * only blocks heads long enough to fill both regions — without the
 * length guard every short document would share the empty-suffix block,
 * which IS the hot-block pathology.
 */
object FuzzyJoin {

  /**
   * Pairs `(idCol, dup_id, dist)` with `dist = levenshtein(head_a,
   * head_b) ≤ maxDist`, `idCol < dup_id` (each unordered pair once),
   * over `head = lower(substring(textCol, 1, headLen))`. Inputs are
   * ASCII-normalized only by lowercasing — both engines compare the
   * same codepoints.
   */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      headLen: Int = 64,
      blockLen: Int = 16,
      maxDist: Int = 10): DataFrame =
    matchBlocks(
      blockRows(docs, idCol, textCol, headLen, blockLen),
      blockRows(docs, idCol, textCol, headLen, blockLen),
      idCol, maxDist)

  /**
   * One `(id, _blk, _head)` row per (pass, document): pass 1 keys on
   * head chars `[1, blockLen]`, pass 2 on `[blockLen+1, 2·blockLen]`
   * (length-guarded; the pass tag is folded into the key so the two
   * block spaces never collide). This is THE block derivation — both
   * the self-contained pairs and the indexed screen go through it, so
   * they cannot drift — and its persisted form is [[buildFuzzyIndex]].
   */
  private[graft] def blockRows(
      docs: DataFrame, idCol: String, textCol: String,
      headLen: Int, blockLen: Int): DataFrame = {
    require(headLen >= 2 * blockLen,
      s"headLen=$headLen must cover both $blockLen-char block regions")
    val heads = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        lower(substring(col(textCol), 1, headLen)).as("_head"))
    def pass(tag: String, blockKey: Column, guard: Column): DataFrame =
      heads.filter(guard).select(col(idCol),
        concat(lit(tag), blockKey).as("_blk"), col("_head"))
    pass("1:", substring(col("_head"), 1, blockLen), lit(true))
      .unionByName(pass("2:",
        substring(col("_head"), blockLen + 1, blockLen),
        length(col("_head")) >= 2 * blockLen))
  }

  /** The shared probe/score core: bucket equi-join two block-row
    * frames, normalize each unordered pair to `(min id, max id)` (so
    * the screen direction doesn't depend on which side holds the
    * smaller id), dedup pairs blocked by both passes, then the exact
    * Levenshtein filter. */
  private def matchBlocks(
      a: DataFrame, b: DataFrame, idCol: String, maxDist: Int): DataFrame =
    a.select(col(idCol).as("_id_a"), col("_blk"), col("_head").as("_ha"))
      .join(b.select(col(idCol).as("_id_b"), col("_blk"),
        col("_head").as("_hb")), Seq("_blk"))
      .filter(col("_id_a") =!= col("_id_b"))
      .select(
        least(col("_id_a"), col("_id_b")).as("_id_a"),
        greatest(col("_id_a"), col("_id_b")).as("_id_b"),
        when(col("_id_a") < col("_id_b"), col("_ha")).otherwise(col("_hb"))
          .as("_ha"),
        when(col("_id_a") < col("_id_b"), col("_hb")).otherwise(col("_ha"))
          .as("_hb"))
      .distinct() // a pair blocked by both passes scores once
      .withColumn("dist", levenshtein(col("_ha"), col("_hb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("_id_a").as(idCol), col("_id_b").as("dup_id"), col("dist"))

  /**
   * Persist the block rows as a standing fuzzy index — the q75/q77
   * amortization applied to edit-distance matching: a daily batch
   * screens against years of corpus without re-lowering or re-blocking
   * a single historical head. `index ∪ buildFuzzyIndex(newBatch)` ≡ a
   * from-scratch rebuild (block rows are per-doc-local projections —
   * spec-pinned), so maintenance is parquet append.
   */
  def buildFuzzyIndex(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      headLen: Int = 64,
      blockLen: Int = 16): DataFrame =
    blockRows(docs, idCol, textCol, headLen, blockLen)

  /** [[editDistancePairs]] against a persisted [[buildFuzzyIndex]]:
    * only the probe side derives blocks; with probe = the index's own
    * documents this reproduces the self-contained pairs exactly (the
    * shared-core guarantee). */
  def editDistancePairsIndexed(
      docs: DataFrame,
      index: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      headLen: Int = 64,
      blockLen: Int = 16,
      maxDist: Int = 10): DataFrame =
    matchBlocks(
      blockRows(docs, idCol, textCol, headLen, blockLen),
      index, idCol, maxDist)

  /**
   * [[editDistancePairs]]'s similarity twin: the SAME two-pass prefix
   * blocks, scored with the native `graft_jaro_winkler` expression
   * instead of Levenshtein — the linkage-literature scorer for short
   * heads, where a transposed word costs far less than its edit
   * distance. Pairs keep when the 6-dp-ROUNDED similarity reaches
   * `minSim` (the filter runs on the rounded value so a last-ulp float
   * divergence between engines can't flip a boundary pair). Returns
   * `(idCol, dup_id, jw)` with `idCol < dup_id`, one row per unordered
   * pair. Same never-all-pairs scale shape as the edit-distance form.
   */
  def jaroWinklerPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      headLen: Int = 64,
      blockLen: Int = 16,
      minSim: Double = 0.85): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0,
      s"minSim must be in (0,1], got $minSim")
    // drop empty heads BEFORE the self-join: they all share the '1:'
    // block (quadratic fan-out) yet can only pair with each other, and
    // jw('','') = 0 < minSim discards every such pair anyway — so this
    // filter is result-preserving and removes the one hot-block
    // pathology the prefix scheme admits ([[editDistancePairs]] keeps
    // them: empty-empty has edit distance 0 and IS a legitimate match
    // there)
    val rows = blockRows(docs, idCol, textCol, headLen, blockLen)
      .filter(length(col("_head")) > 0)
    rows.select(col(idCol).as("_id_a"), col("_blk"), col("_head").as("_ha"))
      .join(rows.select(col(idCol).as("_id_b"), col("_blk"),
        col("_head").as("_hb")), Seq("_blk"))
      .filter(col("_id_a") < col("_id_b"))
      .select(col("_id_a"), col("_id_b"), col("_ha"), col("_hb"))
      .distinct() // a pair blocked by both passes scores once
      .withColumn("jw", round(call_function("graft_jaro_winkler",
        col("_ha"), col("_hb")), 6))
      .filter(col("jw") >= minSim)
      .select(col("_id_a").as(idCol), col("_id_b").as("dup_id"), col("jw"))
  }
}
