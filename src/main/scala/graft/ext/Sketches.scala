package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-min sketch as a plain relational frame: the fixed-size,
 * element-wise-ADDITIVE frequency summary for the 100-TB regime where
 * even a heavy-hitters sketch per partition is re-derived too often —
 * a CMS is persisted once per day/partition and folded at query time,
 * and unlike the DataSketches frequent-items path (q58/q59) its state
 * is an inspectable `(r, bucket, cnt)` table with REPLAYABLE hashing:
 * every bucket index is plain `((a·(k mod p) + b) mod p) mod w`
 * integer arithmetic (Carter–Wegman universal family, p = 2³¹−1), so
 * an external engine can reproduce the sketch bit-for-bit — which is
 * exactly how the oracle checks it, rather than trusting opaque
 * sketch bytes.
 *
 * Guarantees carried by construction: estimates NEVER undercount
 * (each of the `depth` counters holds the key's true count plus
 * non-negative collision mass; the readout takes their min), and
 * merge = element-wise sum loses nothing (counter arrays are linear
 * in the input multiset).
 *
 * Shape at scale: the build is one map-side-combinable hash aggregate
 * to a ≤ `depth`·`width`-row frame (the corpus is touched once, the
 * shuffle carries only sketch cells); estimate broadcasts the
 * dimension-sized sketch against the query keys; merge is a
 * dimension-sized re-aggregate.
 */
object Sketches {

  /** Carter–Wegman modulus: the Mersenne prime 2³¹ − 1. Keys are
    * reduced mod p before multiplying, so `a · (k mod p) + b < 2⁶²`
    * never overflows a long. */
  val P: Long = 2147483647L

  /** Pinned per-row hash coefficients `(a, b)` — classic LCG multiplier
    * constants, fixed so sketches built in different sessions (or
    * engines) are comparable cell-by-cell. */
  val hashRows: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (1664525L, 1013904223L),
    (22695477L, 1L),
    (1588635695L, 1203L))

  /** The `depth` exploded `(r, a, b)` hash-row structs as a literal
    * array column. */
  private def hashArray(depth: Int): Column = {
    require(depth >= 1 && depth <= hashRows.size,
      s"depth must be in [1, ${hashRows.size}], got $depth")
    array(hashRows.take(depth).zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"), lit(a).as("a"), lit(b).as("b"))
    }: _*)
  }

  /** Bucket index of long key `k` under hash row `(a, b)`:
    * `((a·(k mod p) + b) mod p) mod width`. `pmod` keeps negative keys
    * well-defined; for the non-negative ids of the harness it equals
    * plain `%` (what the oracle replays). */
  private def bucket(k: Column, a: Column, b: Column, width: Int): Column =
    pmod(pmod(a * pmod(k, lit(P)) + b, lit(P)), lit(width.toLong))

  /**
   * Build the sketch over `key`: one row `(r, bucket, cnt)` per
   * OCCUPIED cell (absent cell ≡ 0 — the sparse reading that keeps a
   * lightly-loaded sketch small). The `depth`-way explode happens
   * before the aggregate, so the shuffle carries at most
   * `depth · width` cells regardless of corpus size.
   */
  def cmsBuild(
      df: DataFrame, key: Column,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.filter(key.isNotNull)
      .select(key.cast("long").as("_k"))
      .select(col("_k"), explode(hashArray(depth)).as("h"))
      .select(col("h.r").as("r"),
        bucket(col("_k"), col("h.a"), col("h.b"), width).as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Point estimates for `keys` (a frame with long-castable `keyCol`):
   * `est_n = min over rows of cnt[r][bucket_r(k)]`, absent cells read
   * as 0. The sketch side broadcasts (≤ `depth`·`width` rows by
   * construction); the keys side never shuffles.
   */
  def cmsEstimate(
      sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame =
    keys.select(col(keyCol).cast("long").as("_k"))
      .select(col("_k"), explode(hashArray(depth)).as("h"))
      .select(col("_k"), col("h.r").as("r"),
        bucket(col("_k"), col("h.a"), col("h.b"), width).as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col("_k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
      .withColumnRenamed("_k", keyCol)

  /** [[cmsBuild]] keyed by a partition column: one sub-sketch per
    * `part` value, the shape a pipeline persists per day/source and
    * later folds with [[cmsMerge]]. Output
    * `(part, r, bucket, cnt)`, ≤ `depth`·`width` cells per partition. */
  def cmsBuildPartitioned(
      df: DataFrame, part: Column, key: Column,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.filter(key.isNotNull)
      .select(part.as("part"), key.cast("long").as("_k"))
      .select(col("part"), col("_k"), explode(hashArray(depth)).as("h"))
      .select(col("part"), col("h.r").as("r"),
        bucket(col("_k"), col("h.a"), col("h.b"), width).as("bucket"))
      .groupBy(col("part"), col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold sub-sketches (the union of any partitioning of the corpus)
    * into one: element-wise sum — the linearity that makes CMS the
    * persist-per-partition summary. */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /**
   * Equi-join SIZE estimate from two sketches over the same key
   * domain: `est = min_r Σ_b a[r][b]·b[r][b]` — the count-min inner
   * product (Cormode & Muthukrishnan 2005). Each row's inner product
   * equals the true join size `Σ_k c_A(k)·c_B(k)` plus non-negative
   * collision cross-terms, so the estimate NEVER undercounts — the
   * cardinality-planning primitive a 100-TB optimizer consults before
   * committing to a join order, at `depth·width` cells per relation
   * instead of a key-domain-sized frequency table.
   *
   * Both sketches must share `depth`/`width`/the pinned hash rows
   * (they do by construction here). A hash row with NO co-occupied
   * buckets has inner product 0 — it vanishes from the sparse join,
   * so the fold treats fewer-than-`depth` surviving rows as estimate
   * 0 (the sparse-cell ≡ 0 reading). Dimension-sized equi-join + one
   * `depth`-row fold. Returns one row `(est_join_size)`.
   */
  def cmsJoinSize(a: DataFrame, b: DataFrame, depth: Int = 4): DataFrame =
    a.select(col("r"), col("bucket"), col("cnt").as("_ca"))
      .join(b.select(col("r"), col("bucket"), col("cnt").as("_cb")),
        Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("_ca") * col("_cb")).as("_ip"))
      .agg(min(col("_ip")).as("_m"), count(lit(1)).as("_nr"))
      .select(when(col("_nr") >= depth, col("_m")).otherwise(lit(0L))
        .as("est_join_size"))
}
