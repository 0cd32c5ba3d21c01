package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.{DataPrep, Materialize}

/**
 * Streaming filter-funnel monitor: each micro-batch appends its OWN
 * rules-sized census ([[graft.ext.DataPrep.filterFunnel]] — the
 * additive state q349 proves mergeable), and "what is the fleet-wide
 * funnel so far?" is answered at read time by folding the committed
 * partials with [[graft.ext.DataPrep.mergeFunnels]] — no batch is ever
 * re-screened, and the fold is rules-sized (a handful of rows per
 * batch, regardless of corpus size).
 *
 * This is the [[StreamingDrift]] append-only pattern applied to the
 * screening family: the funnel's rules are stateless per-row
 * expressions (the [[DataPrep.screen]] streaming-safety argument), so
 * the census runs INSIDE the micro-batch with no watermark or state
 * store; at-least-once replay skips on the `batch=<id>` marker
 * (additive marginals would double-count without it); and
 * [[compactIndex]] bounds fold-at-load under the marker-preserving
 * [[StateSwap]] rename. The rule list must stay FIXED across batches —
 * same names, same order — or the fold is comparing different funnels
 * (the q349 disjoint-shard contract).
 */
object StreamingFunnel {

  private val partialSchema = StructType(Seq(
    StructField("rule_idx", LongType),
    StructField("rule", StringType),
    StructField("n_failed_here", LongType),
    StructField("n_remaining", LongType)))

  /** Commit one micro-batch's funnel census at `indexPath`. Returns
    * false (no-op) for an already-committed `batchId` — the replay
    * guard. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      rules: Seq[(String, Column)]): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => DataPrep.filterFunnel(batch, rules)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingFunnel.sink(path, rules))`. */
  def sink(indexPath: String, rules: Seq[(String, Column)])
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, rules); () }

  /** The fleet-wide funnel up to the last committed batch — exactly
    * [[graft.ext.DataPrep.filterFunnel]] over everything streamed
    * (the q349 merge law). Empty/missing index reads as an empty
    * frame. */
  def loadFunnel(spark: SparkSession, indexPath: String): DataFrame =
    DataPrep.mergeFunnels(
      StreamingAnn.loadCommitted(spark, indexPath, partialSchema))

  /** Rewrite the accumulated per-batch partials as ONE folded partition
    * in `batch=<max committed id>` — marker preservation keeps the
    * replay skip alive across the rewrite ([[StreamingDrift
    * .compactIndex]]'s argument). Returns the folded row count (=
    * the rule count). */
  def compactIndex(spark: SparkSession, indexPath: String): Long = {
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recoverHybrid(fs, indexPath)
    val root = new Path(indexPath)
    val maxId =
      if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(_.getPath.getName.stripPrefix("batch=").toLong)
        .sorted.lastOption
    if (maxId.isEmpty) return 0L
    Materialize.scoped(spark) {
      val folded = Materialize.cut(
        loadFunnel(spark, indexPath).withColumn("batch", lit(maxId.get)))
      val n = folded.count()
      StateSwap.advance(fs, indexPath,
        folded.repartition(1).sortWithinPartitions(col("rule_idx")),
        partitionCols = Seq("batch"))
      n
    }
  }
}
