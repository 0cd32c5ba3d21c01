package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.{CorpusCompare, Materialize}

/**
 * Streaming corpus-drift monitor: each micro-batch appends its OWN term
 * counts ([[graft.ext.CorpusCompare.termCounts]] — the additive state
 * q161 proves mergeable), and "how far has the stream drifted from the
 * reference?" is answered at read time by folding the committed
 * partials and handing both count frames to
 * [[graft.ext.CorpusCompare.jsDivergenceFromCounts]] — no batch is
 * ever re-tokenized, the reference corpus is tokenized ONCE (persist
 * its counts and reuse), and the fold is vocabulary-sized.
 *
 * This is the [[StreamingTrend]] append-only pattern applied to the
 * divergence family: at-least-once replay skips on the `batch=<id>`
 * marker (additive counts would double-count without it), and
 * [[compactIndex]] bounds fold-at-load under the marker-preserving
 * [[StateSwap]] rename.
 */
object StreamingDrift {

  private val partialSchema = StructType(Seq(
    StructField("term", StringType),
    StructField("n", LongType)))

  /** Commit one micro-batch's term counts at `indexPath`. Returns false
    * (no-op) for an already-committed `batchId` — the replay guard. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      textCol: String = "text"): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => CorpusCompare.termCounts(batch, textCol)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingDrift.sink(path))`. */
  def sink(indexPath: String, textCol: String = "text")
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, textCol); () }

  /** The streamed corpus's term counts up to the last committed batch —
    * exactly [[graft.ext.CorpusCompare.termCounts]] over everything
    * streamed. Empty/missing index reads as an empty frame. */
  def loadCounts(spark: SparkSession, indexPath: String): DataFrame =
    CorpusCompare.mergeCounts(
      StreamingAnn.loadCommitted(spark, indexPath, partialSchema))

  /** JS divergence of the streamed corpus against a reference count
    * frame ([[graft.ext.CorpusCompare.termCounts]] of the reference —
    * compute once, persist, reuse): reference is the P side, stream the
    * Q side. */
  def driftAgainst(
      spark: SparkSession, indexPath: String, referenceCounts: DataFrame,
      alpha: Double = 0.5): DataFrame =
    CorpusCompare.jsDivergenceFromCounts(
      referenceCounts, loadCounts(spark, indexPath), alpha)

  /** χ² homogeneity of the streamed corpus against the reference counts
    * — [[driftAgainst]]'s significance-scaled companion (JS says how
    * far, χ² whether the gap outruns sampling noise at these sizes). */
  def driftChi2(
      spark: SparkSession, indexPath: String,
      referenceCounts: DataFrame): DataFrame =
    CorpusCompare.chiSquaredFromCounts(
      referenceCounts, loadCounts(spark, indexPath))

  /** Rewrite the accumulated per-batch partials as ONE folded partition
    * in `batch=<max committed id>` — marker preservation keeps the
    * replay skip alive across the rewrite ([[StreamingTrend
    * .compactIndex]]'s argument). Returns the folded term count. */
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
        loadCounts(spark, indexPath).withColumn("batch", lit(maxId.get)))
      val n = folded.count()
      StateSwap.advance(fs, indexPath,
        folded.repartition(1).sortWithinPartitions(col("term")),
        partitionCols = Seq("batch"))
      n
    }
  }
}
