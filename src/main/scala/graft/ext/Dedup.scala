package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection at training-data scale: MinHash signatures over
 * word-shingle sets, LSH banding to co-locate candidates, exact Jaccard
 * verification of candidates only. Built entirely from codegen'd built-in
 * expressions (`transform`/`sequence`/`xxhash64`/`array_*`) — no UDFs.
 *
 * Scale design (100 TB): the only shuffles are (1) the band-bucket
 * repartition of `(doc, band, bucket)` rows — linear in corpus size × number
 * of bands — and (2) the id-keyed joins that fetch shingle sets for the
 * candidate pairs, linear in candidates. There is NO all-pairs comparison
 * anywhere: docs meet only if some band of their MinHash signatures
 * collides, which for b bands of r rows happens with probability
 * 1-(1-s^r)^b for Jaccard s — the standard LSH S-curve. Skew note: a
 * cluster of m identical docs produces m(m-1)/2 candidate pairs in one
 * bucket; run exact dedup (`dropDuplicates` on a content hash, see
 * `q14_dedup`/`q22_binary_dedup`) FIRST so only genuine near-dups remain.
 *
 * The reference has no near-dup operator (its dedup surface is exact,
 * `/root/reference/sree-etl-tdk-glue-job.py:51-52` distinct) — this is the
 * north-star LLM-pipeline extension (SURVEY.md §2.11).
 */
object Dedup {

  /** Distinct word n-gram shingles of lowercased whitespace-split text.
    *
    * Built by zipping the token array with its n-1 shifted copies and
    * concatenating each tuple — NOT by indexing into the token array from
    * inside a `transform` lambda: any expression referenced inside a
    * higher-order-function lambda is re-evaluated per element, so the
    * indexed formulation re-ran the regex `split` once per shingle
    * (~300× per row, measured 7.5s vs <1s at sf0.1). Here the token
    * expression is evaluated n times per ROW (once per zip argument).
    * Tail tuples padded with null by `arrays_zip` are filtered out, so a
    * text with fewer than n tokens yields an empty set. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(lower(text), "\\s+")
    val shifted = (0 until n).map { k =>
      if (k == 0) toks
      else slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0)))
    }
    val z = arrays_zip(shifted: _*)
    array_distinct(filter(
      transform(z, x =>
        when((0 until n).map(k => x.getField(k.toString).isNotNull).reduce(_ && _),
          concat_ws(" ", (0 until n).map(k => x.getField(k.toString)): _*))),
      s => s.isNotNull))
  }

  /**
   * MinHash signature: element i = min over shingles of `xxhash64(shingle, i)`.
   * `numHashes` independent hash functions via the seed column — one array
   * expression, no shuffle, O(|shingles| × numHashes) per row.
   */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shingleCol, s => xxhash64(s, i))))

  /**
   * LSH banding: one `(id, band, bucket)` row per band, where `bucket`
   * hashes the band's slice of the signature. Docs sharing any
   * (band, bucket) become candidates.
   */
  def bandBuckets(
      df: DataFrame, idCol: String, sigCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    df.select(
        col(idCol),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(
            b.as("band"),
            xxhash64(b, slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))
              .as("bucket")))).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /**
   * Candidate pairs (a_id < b_id) from a bucket-equi self-join — the
   * co-located alternative to an all-pairs cross join. `distinct` collapses
   * pairs that collide in several bands.
   */
  def candidatePairs(
      df: DataFrame, idCol: String, shingleCol: String,
      bands: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    // Materialize the signatures and CUT the lineage BEFORE the band
    // explode: projection collapse otherwise inlines the full
    // |shingles|×|hashes| signature expression into the per-band transform
    // and the self-join recomputes it once per band per side (measured
    // 200s+ instead of ~1s at sf0.1). The signature table is one array of
    // `bands×rowsPerBand` longs per doc — tiny relative to the corpus, the
    // textbook recompute-vs-store win.
    val sig = df
      .filter(size(col(shingleCol)) > 0)
      .select(col(idCol),
        minhashSignature(col(shingleCol), bands * rowsPerBand).as("sig"))
      .localCheckpoint()
    pairsFromSig(sig, idCol, bands, rowsPerBand)
  }

  /** Bucket-join candidate pairs from an already-materialized signature
    * table (the explode and self-join only touch attributes, so no further
    * checkpointing is needed). */
  private def pairsFromSig(
      sig: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bb = bandBuckets(sig, idCol, "sig", bands, rowsPerBand).localCheckpoint()
    val a  = bb.select(col(idCol).as("a_id"), col("band"), col("bucket"))
    val b  = bb.select(col(idCol).as("b_id"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  /**
   * Near-duplicate pairs with EXACT Jaccard ≥ `threshold`, found via LSH
   * candidates and verified precisely: output is deterministic (LSH affects
   * only recall, and the band parameters put recall at ~1 for any
   * `threshold` ≥ 0.5: miss probability (1-s^2)^16 < 1e-3 at s=0.6,
   * < 1e-9 at s=0.85).
   *
   * Columns: a_id, b_id, n_common, n_union, jaccard.
   */
  def nearDuplicatePairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    // TWO materialization stages, deliberately: shingles first, signature
    // second FROM the materialized shingles. Fusing them into one
    // projection lets projection collapse inline the shingle expression
    // into the 32-hash signature transform (32× shingle recompute —
    // measured 9s vs 5s at sf0.1). The shingle table also feeds both
    // sides of the verify join below.
    val sh = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    val sig = sh
      .select(col("id").as(idCol),
        minhashSignature(col("sh"), bands * rowsPerBand).as("sig"))
      .localCheckpoint()
    val cands = pairsFromSig(sig, idCol, bands, rowsPerBand)
    cands
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), "b_id")
      .select(
        col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("long").as("n_common"),
        size(array_union(col("a_sh"), col("b_sh"))).cast("long").as("n_union"))
      .filter(col("n_union") > 0)
      .withColumn("jaccard",
        col("n_common").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Near-dup dedup: drop every doc that has a verified near-duplicate with
   * a smaller id (canonical survivor = least id of each duplicate group).
   * One-hop semantics, not transitive closure — A~B and B~C with A≁C keeps
   * A and C; at a ≥0.8 threshold chains are rare and this avoids an
   * iterative connected-components pass.
   */
  def dedup(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val dupIds = nearDuplicatePairs(df, idCol, textCol, threshold, n, bands, rowsPerBand)
      .select(col("b_id").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }
}
