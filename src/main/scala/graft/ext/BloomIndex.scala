package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bloom-filter STANDING INDEX for incremental exact-dedup screening
 * (Bloom 1970; the Broder & Mitzenmacher 2004 survey's network-cache
 * pattern applied to corpus ingestion): a fixed-size bit array that
 * answers "was this content key EVER seen in history?" with no false
 * negatives and a tunable false-positive rate
 * `(1 − e^(−k·n/m))^k` (k hashes, n inserted keys, m bits).
 *
 * Why this exists next to the exact standing indexes (q62/q75's hash
 * index, q340's paragraph index): those are O(n) state — at 100 TB an
 * exact key index is itself terabytes, and every batch screen shuffles
 * against it. The Bloom filter is the memory-bounded front door the
 * real pipeline puts IN FRONT of them: a few GB of bits summarize any
 * history, "definitely new" documents (the overwhelming majority of a
 * growing corpus) skip the exact index entirely, and only the
 * `maybe_dup` sliver pays the exact lookup. False positives cost one
 * wasted exact probe; false negatives are impossible, so no duplicate
 * is ever admitted by the screen alone.
 *
 * Representation: a sparse `(word: long, bits: long)` frame — bit `b`
 * of the filter lives at bit `b mod 63` of word `b div 63`. 63 (not
 * 64) bits per word because the oracle engine raises on
 * `1::BIGINT << 63` (sign-bit overflow); the engine-portable subset is
 * bits 0..62, and the 1/64 density loss is noise against the m-sizing
 * error bars. Absent words are implicitly zero, so:
 *
 *  - **build** is one explode (k rows per key) + one hash aggregate
 *    (`bit_or`, map-side combined);
 *  - **merge** of per-batch partials is the SAME `bit_or` fold —
 *    `merge(build(A), build(B)) ≡ build(A ∪ B)` exactly, because OR is
 *    associative/commutative/idempotent (the [[Privacy.mergeClasses]]
 *    merge-law shape, q362 certifies it);
 *  - **screen** joins k probe rows per batch key against the word
 *    frame — at most `words` rows ≈ m/63, a few MB even for a
 *    multi-billion-key filter, so the join BROADCASTS and the screen
 *    is one batch-side pass with zero shuffle of the batch. When m
 *    outgrows a broadcast (hundreds of GB of bits) the same frame
 *    shuffle-shards on `word` with no code change — that is why the
 *    filter is a DataFrame and not a driver-side bitset.
 *
 * Determinism: bucket `j` of a key is the first 12 md5 nibbles of
 * `salt:j:key` mod m — the repo's seeded-hash idiom, bit-replayable in
 * the oracle; NULL keys take a sentinel so they hash (and collide)
 * identically in both engines.
 */
object BloomIndex {

  private def mBits(words: Int): Long = words.toLong * 63L

  /**
   * Size a filter for `nKeys` distinct keys at `targetFpp` — the
   * operating point IS the value of a Bloom front door, and an
   * undersized filter silently degrades to "everything maybe_dup"
   * (every probe pays the exact index, the screen saves nothing).
   * The textbook optimum (Broder & Mitzenmacher 2004, §2):
   *
   *   m = ⌈−n·ln p / (ln 2)²⌉  bits,   k = max(1, round((m/n)·ln 2))
   *
   * returned as `(words, k)` with `words = ⌈m/63⌉` (the engine-portable
   * 63-bit word layout) and k computed from the ACTUAL m = words·63 the
   * filter will have. ~9.6 bits/key at 1%, ~14.4 at 0.1%; k is the
   * [[AnnIvf.suggestedCells]]-style default — callers with a measured
   * probe mix can still pass explicit geometry.
   */
  def suggestedShape(nKeys: Long, targetFpp: Double): (Int, Int) = {
    require(nKeys > 0, s"nKeys must be positive, got $nKeys")
    require(targetFpp > 0 && targetFpp < 1,
      s"targetFpp must be in (0, 1), got $targetFpp")
    val ln2 = math.log(2.0)
    val mRaw = -nKeys.toDouble * math.log(targetFpp) / (ln2 * ln2)
    val words = math.ceil(mRaw / 63.0).toLong
    require(words <= Int.MaxValue,
      s"suggested filter needs $words words — beyond the broadcast " +
        "frame; shard the corpus or raise targetFpp")
    val k = math.max(1L,
      math.round(words.toDouble * 63.0 / nKeys.toDouble * ln2))
    (words.toInt, k.toInt)
  }

  /**
   * One-row health report of a standing filter — the telemetry that
   * tells an operator whether the filter still honors its operating
   * point as history grows: `(m_bits, k_hashes, set_bits, fill_ratio,
   * predicted_fpp)` where `predicted_fpp = fill_ratio^k` (the exact
   * false-positive rate GIVEN the realized bit fill — each of the k
   * probe bits of a never-inserted key hits a set bit independently
   * with probability ρ), computed as `exp(k·ln ρ)` so the expression
   * tree is engine-shared (q372 hash-certifies it against a measured
   * rate on provably-novel probes). Filter-sized input (≤ words rows),
   * 1-row output.
   */
  def fppTelemetry(bloom: DataFrame): DataFrame = {
    val (words, k, _) = geometryOf(bloom)
    val m = mBits(words)
    val rho = col("set_bits").cast("double") / lit(m.toDouble)
    bloom
      .agg(coalesce(sum(expr("bit_count(bits)")).cast("long"), lit(0L))
        .as("set_bits"))
      .select(lit(m).as("m_bits"), lit(k.toLong).as("k_hashes"),
        col("set_bits"),
        round(rho, 6).as("fill_ratio"),
        round(exp(lit(k.toDouble) * log(rho)), 6).as("predicted_fpp"))
  }

  private def checkShape(words: Int, k: Int): Unit = {
    require(words > 0, s"words must be positive, got $words")
    require(k > 0, s"k (hash count) must be positive, got $k")
  }

  /** The filter's geometry, carried as metadata ON the `bits` column by
    * [[bloomBuild]]/[[bloomMerge]] (it survives select/union and a
    * parquet round-trip — Spark stores field metadata in the footer's
    * schema). A probe hashed under different (words, k, salt) lands in
    * different buckets, which silently voids the zero-false-negative
    * guarantee — the ONE property routing depends on — so the geometry
    * must travel with the filter, not with the caller. */
  private def geomMeta(words: Int, k: Int, salt: String)
      : org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("bloom.words", words.toLong)
      .putLong("bloom.k", k.toLong)
      .putString("bloom.salt", salt)
      .build()

  /** Read the geometry off a filter frame; a frame without it was not
    * built by [[bloomBuild]]/[[bloomMerge]] and cannot be screened
    * safely. */
  private def geometryOf(filter: DataFrame)
      : (Int, Int, String) = {
    val field = filter.schema.fields.find(_.name == "bits").getOrElse(
      throw new IllegalArgumentException(
        "filter frame has no 'bits' column — not a Bloom filter frame"))
    val m = field.metadata
    require(m.contains("bloom.words") && m.contains("bloom.k") &&
        m.contains("bloom.salt"),
      "filter frame carries no geometry metadata — build it with " +
        "bloomBuild/bloomMerge (a hand-assembled frame can silently " +
        "void the zero-false-negative guarantee)")
    (m.getLong("bloom.words").toInt, m.getLong("bloom.k").toInt,
      m.getString("bloom.salt"))
  }

  /** Probe rows for one key column: k rows `(word, mask)` per input
    * row, the shared fan-out of build and screen. */
  private def probes(
      df: DataFrame, keep: Seq[Column], key: Column,
      words: Int, k: Int, salt: String): DataFrame = {
    val bucket = conv(substring(
        md5(concat_ws(":", lit(salt), col("__j"), col("__key"))
          .cast("binary")),
        1, 12), 16, 10).cast("long") % lit(mBits(words))
    df.select((keep :+
        coalesce(key.cast("string"), lit("\u0000")).as("__key")) :+
        explode(
          array((0 until k).map(j => lit(j.toLong)): _*)).as("__j"): _*)
      .withColumn("__bucket", bucket)
      .withColumn("word", expr("__bucket div 63"))
      .withColumn("mask",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__bucket % 63 AS INT))"))
  }

  /**
   * Build the filter over `df`'s key column: the sparse non-zero words
   * of an m = words·63 bit Bloom filter with k seeded hashes. One
   * explode + one `bit_or` hash aggregate (map-side combined; duplicate
   * keys set the same bits, so pre-distincting the key is unnecessary
   * work). Size m for the TOTAL history you intend the filter to
   * absorb: `m ≈ −k·n / ln(1 − fp^(1/k))`, or the rule of thumb
   * ~10 bits/key for ~1% at k = 3.
   */
  def bloomBuild(
      df: DataFrame, key: Column, words: Int, k: Int,
      salt: String): DataFrame = {
    checkShape(words, k)
    probes(df, Seq.empty, key, words, k, salt)
      .groupBy(col("word"))
      .agg(bit_or(col("mask")).as("bits", geomMeta(words, k, salt)))
  }

  /** Fold per-batch filter partials (SAME words/k/salt generation) into
    * one filter: `bit_or` per word. Exactly equals a from-scratch build
    * over the unioned batches — OR is associative, commutative and
    * idempotent, so partials may arrive in any order, any grouping,
    * even overlapping. The partials' geometry metadata (validated
    * present) propagates to the merged filter. */
  def bloomMerge(partials: DataFrame): DataFrame = {
    val (words, k, salt) = geometryOf(partials)
    partials.groupBy(col("word"))
      .agg(bit_or(col("bits")).as("bits", geomMeta(words, k, salt)))
  }

  /**
   * Screen a batch against a standing filter: one row per batch row,
   * `(idCol, maybe_dup)` where `maybe_dup = true` iff ALL k probe bits
   * are set. `false` is a PROOF the key was never inserted (route
   * straight to ingestion); `true` routes to the exact index for the
   * authoritative verdict. The filter side joins on `word` — bounded
   * by words ≈ m/63 rows, broadcast here — so the batch never
   * shuffles; absent words read as zero via the left join's coalesce.
   */
  def bloomScreen(
      batch: DataFrame, idCol: String, key: Column, bloom: DataFrame,
      words: Int, k: Int, salt: String): DataFrame = {
    checkShape(words, k)
    val (bw, bk, bsalt) = geometryOf(bloom)
    require(bw == words && bk == k && bsalt == salt,
      s"probe geometry (words=$words, k=$k, salt=$salt) does not match " +
        s"the filter's build geometry (words=$bw, k=$bk, salt=$bsalt) — " +
        "mismatched probes hash to different buckets and void the " +
        "zero-false-negative guarantee")
    probes(batch, Seq(col(idCol)), key, words, k, salt)
      .join(broadcast(bloom), Seq("word"), "left")
      .withColumn("__hit",
        when((coalesce(col("bits"), lit(0L))
          .bitwiseAND(col("mask"))) === col("mask"), 1).otherwise(0))
      .groupBy(col(idCol))
      .agg((min(col("__hit")) === lit(1)).as("maybe_dup"))
  }
}
