package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.{Materialize, Probe}

/**
 * Streaming vector-moment index: each micro-batch appends its OWN
 * normal-equation partials ([[graft.ext.Probe.momentPartials]] — the
 * additive `(i, j, s)` scaled-decimal state q207 proves mergeable
 * against q184's oracle), and "fit the linear probe over everything
 * streamed so far" is answered at read time by folding the committed
 * partials and solving driver-side
 * ([[Probe.fitRidgeFromMoments]]) — no batch is ever re-scanned, the
 * fold is (d+1)²-cell-sized, and the heavy corpus pass happened once
 * per batch at ingest.
 *
 * This is the [[StreamingWelch]] append-only pattern applied to the
 * vector-moment family: at-least-once replay skips on the
 * `batch=<id>` marker (additive sums would double-count without it),
 * and [[compactIndex]] bounds fold-at-load under the marker-preserving
 * [[StateSwap]] rename.
 */
object StreamingMoments {

  private val partialSchema = StructType(Seq(
    StructField("i", IntegerType),
    StructField("j", IntegerType),
    StructField("s", DecimalType(38, 0))))

  /** Commit one micro-batch's moment partials at `indexPath`. Returns
    * false (no-op) for an already-committed `batchId` — the replay
    * guard. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      vecCol: String, y: Column, dim: Int): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => Probe.momentPartials(batch, vecCol, y, dim)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter. */
  def sink(indexPath: String, vecCol: String, y: Column, dim: Int)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, vecCol, y, dim); () }

  /** The streamed corpus's folded moment frame up to the last committed
    * batch — exactly [[Probe.momentPartials]] over everything streamed
    * (the merge law). Empty/missing index reads as an empty frame. */
  def loadMoments(spark: SparkSession, indexPath: String): DataFrame =
    Probe.mergeMoments(
      StreamingAnn.loadCommitted(spark, indexPath, partialSchema))

  /** Ridge weights over everything streamed so far — byte-for-byte
    * [[Probe.fitRidge]] of the union of all committed batches,
    * recomputed from cell-sized moments only. */
  def fit(spark: SparkSession, indexPath: String, dim: Int,
      lambda: Double = 1e-3): Array[Double] =
    Probe.fitRidgeFromMoments(loadMoments(spark, indexPath), dim, lambda)

  /** Rewrite the accumulated per-batch partials as ONE folded partition
    * in `batch=<max committed id>` — marker preservation keeps the
    * replay skip alive across the rewrite ([[StreamingWelch
    * .compactIndex]]'s argument verbatim). Returns the folded cell
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
        folded.repartition(1).sortWithinPartitions(col("i"), col("j")),
        partitionCols = Seq("batch"))
      n
    }
  }
}
