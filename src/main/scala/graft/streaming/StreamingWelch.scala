package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analytics.StatsTests
import graft.ext.Materialize

/**
 * Streaming group-screen monitor: each micro-batch appends its OWN
 * per-group Welch moments ([[graft.analytics.StatsTests.welchPartials]]
 * — the additive `(n, Σv, Σv²)` state q200 proves mergeable against
 * q189's batch oracle), and "which sources are drifting long/short?"
 * is answered at read time by folding the committed partials
 * ([[StatsTests.mergeWelchMoments]]) and running the closed-form tail
 * ([[StatsTests.welchFromMoments]]) — no batch is ever re-scanned, and
 * the fold is group-cardinality-sized.
 *
 * This is the [[StreamingDrift]] append-only pattern applied to the
 * location-test family: at-least-once replay skips on the
 * `batch=<id>` marker (additive moments would double-count without
 * it), and [[compactIndex]] bounds fold-at-load under the
 * marker-preserving [[StateSwap]] rename.
 */
object StreamingWelch {

  /** [[StatsTests.welchPartials]] with the group key cast to string —
    * the persisted-partial schema must be generation-stable, exactly
    * like [[StreamingDrift]]'s term counts. */
  private val partialSchema = StructType(Seq(
    StructField("g", StringType),
    StructField("n", LongType),
    StructField("_s1", DecimalType(38, 12)),
    StructField("_s2", DecimalType(38, 12))))

  /** Commit one micro-batch's per-group moments at `indexPath`.
    * Returns false (no-op) for an already-committed `batchId` — the
    * replay guard. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      groupCol: Column, valueCol: Column): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => StatsTests.welchPartials(
          batch, groupCol.cast("string"), valueCol)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingWelch.sink(path, ...))`. */
  def sink(indexPath: String, groupCol: Column, valueCol: Column)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, groupCol, valueCol); () }

  /** The streamed corpus's per-group moments up to the last committed
    * batch — exactly [[StatsTests.welchPartials]] over everything
    * streamed (the merge law). Empty/missing index reads as an empty
    * frame. */
  def loadMoments(spark: SparkSession, indexPath: String): DataFrame =
    StatsTests.mergeWelchMoments(
      StreamingAnn.loadCommitted(spark, indexPath, partialSchema))

  /** The group-vs-rest Welch z screen over everything streamed so far
    * — byte-for-byte [[StatsTests.groupWelchZ]] of the union of all
    * committed batches, recomputed from group-sized moments only. */
  def screen(spark: SparkSession, indexPath: String): DataFrame =
    StatsTests.welchFromMoments(loadMoments(spark, indexPath))

  /** Rewrite the accumulated per-batch partials as ONE folded partition
    * in `batch=<max committed id>` — marker preservation keeps the
    * replay skip alive across the rewrite ([[StreamingDrift
    * .compactIndex]]'s argument verbatim). Returns the folded group
    * count. */
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
        loadMoments(spark, indexPath).withColumn("batch", lit(maxId.get)))
      val n = folded.count()
      StateSwap.advance(fs, indexPath,
        folded.repartition(1).sortWithinPartitions(col("g")),
        partitionCols = Seq("batch"))
      n
    }
  }
}
