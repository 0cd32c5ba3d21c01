package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Probabilistic record linkage — Fellegi–Sunter (1969) match scoring
 * over BLOCKED candidate pairs: each compared field contributes
 * `ln(m/u)` when it agrees and `ln((1−m)/(1−u))` when it disagrees
 * (`m` = P(agree | same entity), `u` = P(agree | different entities)),
 * and the summed log-likelihood ratio ranks candidates. The entity-
 * resolution step a training-data pipeline runs when the same person /
 * document / site arrives from two sources with no shared key — the
 * probabilistic upgrade of [[FuzzyJoin]]'s edit-distance screen.
 *
 * Reference scope: the reference engine joins on exact keys only
 * (`/root/reference/sree-etl-tdk-glue-job.py:51-63`); linkage extends
 * the join family to keyless sources.
 *
 * Determinism: the field weights are plan-time DOUBLE literals
 * ([[agreementWeights]] — computed once driver-side, embeddable in an
 * oracle verbatim), the score folds them in declaration order, and the
 * best-match rank is total (`score desc, bId asc`). NEVER feed this an
 * unblocked cross join: candidates must come from a blocking key
 * (exact attribute, [[FuzzyJoin]] prefix blocks, [[AnnLsh]] buckets) —
 * the scale contract of every candidate generator in this engine.
 */
object RecordLinkage {

  /** `(agreement, disagreement)` log-likelihood weights for one field.
    * Requires `0 < u < m < 1`: a field whose agreement is LIKELIER on
    * non-matches than matches has its semantics inverted. */
  def agreementWeights(m: Double, u: Double): (Double, Double) = {
    require(u > 0.0 && m < 1.0 && u < m,
      s"need 0 < u < m < 1, got (m=$m, u=$u)")
    (math.log(m / u), math.log((1.0 - m) / (1.0 - u)))
  }

  /** The summed Fellegi–Sunter score of agreement predicates: each
    * `(agrees, m, u)` contributes its [[agreementWeights]] side; a NULL
    * agreement (an unobservable field — NULL on either record) counts
    * as neither — weight 0, the standard missing-data treatment. Folds
    * in declaration order, rounds to 6 dp. */
  def score(fields: Seq[(Column, Double, Double)]): Column = {
    require(fields.nonEmpty, "at least one compared field")
    round(fields.map { case (agrees, m, u) =>
      val (wa, wd) = agreementWeights(m, u)
      when(agrees.isNull, lit(0.0))
        .when(agrees, lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _), 6)
  }

  /**
   * Score blocked candidate pairs and keep each left record's BEST match
   * at or above `threshold`: rank within `aId` by `(score desc, bId
   * asc)` — total, so the pick is deterministic — and keep rank 1.
   * Returns `(aId, bId, score)`.
   *
   * Shape at scale: one `aId`-partitioned ranking window over the
   * candidate frame (candidate-sized, which blocking already bounded) —
   * no join, no global window.
   */
  def bestLinks(
      cands: DataFrame, aId: String, bId: String,
      fields: Seq[(Column, Double, Double)],
      threshold: Double): DataFrame = {
    val w = Window.partitionBy(col(aId))
      .orderBy(col("score").desc, col(bId).asc)
    cands
      .withColumn("score", score(fields))
      .filter(col("score") >= threshold)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col(aId), col(bId), col("score"))
  }

  private val soundexAlpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  // A0 B1 C2 D3 E0 F1 G2 H7 I0 J2 K2 L4 M5 N5 O0 P1 Q2 R6 S2 T3 U0
  // V1 W7 X2 Y0 Z2 — vowels+Y code 0 (separators), H/W code 7
  // (transparent), consonant classes 1-6 per the NARA standard.
  private val soundexCodes = "01230127022455012623017202"

  /**
   * American Soundex (the NARA standard) as a pure narrow projection —
   * the PHONETIC blocking key for [[bestLinks]]/[[FuzzyJoin]]: names
   * that sound alike land in one block even when edit distance is
   * large ("Tymczak"/"Tymcak" but also "Pfister"/"Fister" via the
   * first-letter collapse). Composition of builtin string ops only
   * (translate + regexp collapse — every step codegen'd, zero shuffle,
   * an oracle can mirror it verbatim):
   *
   *  1. strip non-letters, uppercase; empty → NULL
   *  2. translate letters to class digits (H/W → the transparent '7')
   *  3. delete '7's, collapse adjacent equal digits (H/W-separated
   *     codes merge — the Ashcraft rule; vowel-separated don't)
   *  4. drop the first letter's own (possibly merged) leading code —
   *     unless that letter IS H/W, which step 3 already deleted
   *  5. delete the vowel '0's, keep 3 digits, right-pad with '0'
   *  6. prepend the first letter
   */
  def soundex(name: Column): Column = {
    val u = upper(regexp_replace(name, "[^A-Za-z]", ""))
    val m = translate(u, soundexAlpha, soundexCodes)
    // per-digit run collapse (no regex backreference — the oracle's RE2
    // dialect has none, so both engines chain the same 7 plain replaces)
    val collapsed = (0 to 6).foldLeft(regexp_replace(m, "7", "")) {
      (acc, dg) => regexp_replace(acc, s"$dg$dg+", s"$dg")
    }
    val firstCode = translate(substring(u, 1, 1), soundexAlpha, soundexCodes)
    val rest = when(firstCode === "7", collapsed)
      .otherwise(substring(collapsed, 2, Int.MaxValue))
    when(length(u) > 0,
      concat(substring(u, 1, 1),
        rpad(substring(regexp_replace(rest, "0", ""), 1, 3), 3, "0")))
  }

  /**
   * Phonetic block census over a name column — the blocking-quality
   * audit run BEFORE linking ("are my blocks small and discriminative,
   * or did one code swallow the corpus?"): per Soundex code, the row
   * count and distinct surface forms. One narrow projection + one hash
   * aggregate; code-space-sized output (≤ 26·7³). NULL / letterless
   * names drop. Returns `(block, n_rows, n_distinct_names)`.
   */
  def phoneticBlocks(df: DataFrame, nameCol: Column): DataFrame =
    df.select(soundex(nameCol).as("block"), nameCol.as("_n"))
      .filter(col("block").isNotNull)
      .groupBy("block")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("_n")).as("n_distinct_names"))
}
