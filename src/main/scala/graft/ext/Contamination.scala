package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark-contamination detection: for every corpus document, the
 * fraction of its word n-gram shingles that also occur anywhere in a
 * benchmark corpus — the standard eval-leakage screen an LLM training
 * pipeline runs before a dataset ships (n-gram overlap as in GPT-3's
 * 13-gram and PaLM's 8-gram decontamination).
 *
 * Scale design (100 TB corpus, small benchmark): eval suites are thousands
 * of documents while the corpus is unbounded, so the benchmark's distinct
 * shingle set is BROADCAST and probed from inside the corpus's exploded
 * shingle stream — the benchmark is never shuffled, and the corpus
 * shuffles exactly once (by doc id, partial+final count aggregation).
 * There is no corpus×benchmark join fan-out: each corpus shingle meets the
 * broadcast hash table, not benchmark rows.
 *
 * The reference has no contamination surface (its analytics are grouped
 * counts, `/root/reference/sree-etl-tdk-glue-job.py:51-68`); this extends
 * the SURVEY.md §2.11 training-data set.
 */
object Contamination {

  /**
   * Per-document overlap with `bench`: `(idCol, n_shingles, n_contaminated,
   * contamination)` where `contamination = n_contaminated / n_shingles`
   * over the document's DISTINCT n-gram shingles. Documents with fewer
   * than `n` tokens have no shingles and are absent from the output
   * (contamination of a shingle-less doc is undefined).
   */
  def contamination(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val benchShingles = broadcast(
      bench.select(explode(Dedup.shingles(col(textCol), n)).as("s"))
        .distinct()
        .withColumn("hit", lit(1L)))
    corpus
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("s"))
      .join(benchShingles, Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }
}
