package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.{Materialize, TextOps}

/**
 * Streaming maintenance of the Heaps-growth standing state
 * ([[graft.ext.TextOps.vocabGrowth]]'s two mergeable pieces): each
 * micro-batch appends its OWN partials — per-bucket doc/token counts and
 * per-term min first-occurrence ids — and the fold to the corpus-true
 * state happens at LOAD, exploiting the same associativity q141 proves
 * for the batch path (sum for the stats, min for the first occurrences).
 * History is never re-tokenized and never rewritten per batch: this is
 * the [[StreamingLex]] append-only commit applied to an ALGEBRAIC state
 * (the q104 rollup argument), where [[StreamingLex]]'s stripes happened
 * to need no fold at all.
 *
 * Both pieces ride ONE commit (a unified tagged schema under a single
 * `batch=<id>` rename), so a crash can never land stats without their
 * first occurrences; at-least-once replay skips on the existing marker.
 *
 * Fold-at-load costs one vocabulary-sized aggregation per read and grows
 * with the committed batch count — [[compactIndex]] rewrites the
 * accumulated partials into one folded `batch=0` under a crash-safe
 * [[StateSwap]] (the fold is idempotent, so compaction commutes with
 * every later append).
 */
object StreamingGrowth {

  /** Unified partial schema: `kind` is 'fo' (token, first_id) or 'stat'
    * (bucket, n_docs, n_tokens); the off-kind columns are NULL. */
  private val partialSchema = StructType(Seq(
    StructField("kind", StringType),
    StructField("token", StringType),
    StructField("first_id", LongType),
    StructField("bucket", LongType),
    StructField("n_docs", LongType),
    StructField("n_tokens", LongType)))

  private def partials(
      batch: DataFrame, bucketWidth: Long,
      idCol: String, textCol: String): DataFrame = {
    val fo = TextOps.firstOccurrences(batch, idCol, textCol)
      .select(lit("fo").as("kind"), col("token"), col("first_id"),
        lit(null).cast("long").as("bucket"),
        lit(null).cast("long").as("n_docs"),
        lit(null).cast("long").as("n_tokens"))
    val stats = TextOps.docBucketStats(batch, idCol, textCol, bucketWidth)
      .select(lit("stat").as("kind"),
        lit(null).cast("string").as("token"),
        lit(null).cast("long").as("first_id"),
        col("bucket"), col("n_docs"), col("n_tokens"))
    fo.unionByName(stats)
  }

  /** Commit one micro-batch's growth partials at `indexPath`. Returns
    * false (no-op) for an already-committed `batchId`. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      bucketWidth: Long, idCol: String = "doc_id",
      textCol: String = "text"): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => partials(batch, bucketWidth, idCol, textCol)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingGrowth.sink(path, 100L))`. */
  def sink(indexPath: String, bucketWidth: Long,
      idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, bucketWidth, idCol, textCol); () }

  /** The committed partials folded to the corpus-true standing state:
    * `(docBucketStats, firstOccurrences)` exactly as the batch builders
    * produce them — pass straight to
    * [[graft.ext.TextOps.vocabGrowthFrom]]. An empty/missing index reads
    * as two empty frames, not a schema-inference error. */
  def loadPieces(
      spark: SparkSession, indexPath: String): (DataFrame, DataFrame) = {
    val all = StreamingAnn.loadCommitted(spark, indexPath, partialSchema)
    val stats = all.filter(col("kind") === "stat")
      .groupBy(col("bucket"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
    val fo = all.filter(col("kind") === "fo")
      .groupBy(col("token")).agg(min(col("first_id")).as("first_id"))
    (stats, fo)
  }

  /** The streamed corpus's growth curve up to the last committed batch. */
  def curve(
      spark: SparkSession, indexPath: String,
      bucketWidth: Long): DataFrame = {
    val (stats, fo) = loadPieces(spark, indexPath)
    TextOps.vocabGrowthFrom(stats, fo, bucketWidth)
  }

  /** Rewrite the accumulated per-batch partials as ONE folded partition
    * — bounds the fold-at-load cost after many commits. The fold lands
    * in `batch=<max committed id>`, which is what makes compaction safe
    * against at-least-once replay: Structured Streaming re-delivers only
    * the most recent batch after a crash, and that batch's commit marker
    * is exactly the directory the fold preserves — the replay still
    * skips, so the additive stats can never double-count. (The fo piece
    * is min-idempotent and would tolerate a replay regardless; the stats
    * would not — marker preservation carries them.) The folded rows are
    * materialized (lineage cut) before [[StateSwap]] replaces the
    * directory they were read from; crash half-states recover on the
    * next call. Returns the folded partial-row count (0 = empty index,
    * no-op). */
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
      val (stats, fo) = loadPieces(spark, indexPath)
      val folded = Materialize.cut(
        fo.select(lit("fo").as("kind"), col("token"), col("first_id"),
            lit(null).cast("long").as("bucket"),
            lit(null).cast("long").as("n_docs"),
            lit(null).cast("long").as("n_tokens"))
          .unionByName(stats.select(lit("stat").as("kind"),
            lit(null).cast("string").as("token"),
            lit(null).cast("long").as("first_id"),
            col("bucket"), col("n_docs"), col("n_tokens")))
          .withColumn("batch", lit(maxId.get)))
      val n = folded.count()
      StateSwap.advance(fs, indexPath,
        folded.repartition(1).sortWithinPartitions(col("kind"), col("token"),
          col("bucket")),
        partitionCols = Seq("batch"))
      n
    }
  }
}
