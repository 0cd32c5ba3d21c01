package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data mixes. `rand()`-based sampling
 * is unstable under retry/re-partitioning and irreproducible across
 * engines; these operators key every decision on a content hash, so the
 * same corpus always yields the same sample — on this engine, on a rerun
 * after an executor loss, and on the DuckDB oracle.
 *
 * The reference has no sampling surface (its analytics are full-table
 * grouped counts, `/root/reference/sree-etl-tdk-glue-job.py:51-68`);
 * SURVEY.md §2.11 extension.
 */
object Sampling {

  /**
   * Content-hash Bernoulli sample: keep rows whose lowercase md5 hex of
   * `key` sorts below `hexCeil` (e.g. "2a" keeps ≈ 42/256 of rows).
   * Pure filter — no shuffle, no state, trivially pushdown-friendly; the
   * sharding-safe replacement for `sample()` when the sample must be
   * stable across reruns and engines.
   */
  def hashSample(df: DataFrame, key: Column, hexCeil: String): DataFrame =
    df.filter(md5(key.cast("binary")) < lit(hexCeil))

  /**
   * Stratified quota by stable hash order: the `k` rows of each stratum
   * whose content hash sorts first (ties broken by `idCol`), with the rank
   * in column `rk` — "give me exactly k docs per language, reproducibly".
   *
   * Scale note: the window shuffles by stratum, so parallelism equals the
   * stratum count. Fine for strata-rich keys (domain, date); for a
   * low-cardinality stratum over a huge corpus, pre-thin with
   * [[hashSample]] (its keep-fraction only has to stay comfortably above
   * k / stratum-size) so the window sees a candidate set, not the corpus.
   */
  def stratifiedTake(
      df: DataFrame, stratumCol: String, key: Column, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(key.cast("binary")).asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
