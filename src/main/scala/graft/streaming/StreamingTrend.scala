package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analytics.Trend
import graft.ext.Materialize

/**
 * Streaming maintenance of the per-group trend standing state
 * ([[graft.analytics.Trend.momentPartials]]'s six mergeable sums): each
 * micro-batch appends its OWN moment partials, and the fold to the
 * corpus-true moments happens at LOAD by the same associativity the
 * batch law proves (exact decimal column sums — order never matters).
 * History is never rescanned and never rewritten per batch: this is the
 * [[StreamingGrowth]] append-only pattern applied to regression state,
 * so a drift monitor can re-fit "slope so far" after every micro-batch
 * at fold cost, not corpus cost.
 *
 * At-least-once replay skips on the existing `batch=<id>` marker (the
 * additive moments would double-count without it — same argument as the
 * growth stats). [[compactIndex]] bounds fold-at-load after many
 * commits by rewriting the accumulated partials into one folded
 * partition under the marker-preserving [[StateSwap]] rename.
 */
object StreamingTrend {

  /** Partial schema: one row per group per batch, the [[Trend]] moment
    * columns (exact decimals) plus the long count. */
  private val partialSchema = StructType(Seq(
    StructField("g", StringType),
    StructField("n", LongType),
    StructField("sx", DecimalType(38, 12)),
    StructField("sy", DecimalType(38, 12)),
    StructField("sxx", DecimalType(38, 12)),
    StructField("syy", DecimalType(38, 12)),
    StructField("sxy", DecimalType(38, 12))))

  private def partials(
      batch: DataFrame, groupCol: String, x: Column, y: Column): DataFrame =
    Trend.momentPartials(batch, groupCol, x, y)
      .select(col(groupCol).cast("string").as("g"), col("n"),
        col("sx").cast(DecimalType(38, 12)),
        col("sy").cast(DecimalType(38, 12)),
        col("sxx").cast(DecimalType(38, 12)),
        col("syy").cast(DecimalType(38, 12)),
        col("sxy").cast(DecimalType(38, 12)))

  /** Commit one micro-batch's moment partials at `indexPath`. Returns
    * false (no-op) for an already-committed `batchId` — the replay
    * guard the additive moments depend on. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      groupCol: String, x: Column, y: Column): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => partials(batch, groupCol, x, y)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter: fix the group/x/y extraction once,
    * `stream.writeStream.foreachBatch(StreamingTrend.sink(path, "g", x, y))`. */
  def sink(indexPath: String, groupCol: String, x: Column, y: Column)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, groupCol, x, y); () }

  /** The committed partials folded to the corpus-true moments frame —
    * the exact state [[graft.analytics.Trend.momentPartials]] would
    * build over everything streamed so far. Empty/missing index reads
    * as an empty frame, not a schema-inference error. */
  def loadMoments(spark: SparkSession, indexPath: String): DataFrame =
    Trend.mergeMoments(
      StreamingAnn.loadCommitted(spark, indexPath, partialSchema), "g")

  /** The streamed corpus's per-group OLS fit up to the last committed
    * batch: fold + closed forms, never a rescan. */
  def fit(spark: SparkSession, indexPath: String): DataFrame =
    Trend.trendFromMoments(loadMoments(spark, indexPath), "g")

  /** Rewrite the accumulated per-batch partials as ONE folded partition
    * in `batch=<max committed id>` — marker preservation keeps the
    * at-least-once replay skip alive across the rewrite, so the additive
    * moments can never double-count (the [[StreamingGrowth.compactIndex]]
    * argument, verbatim). Returns the folded group count (0 = empty
    * index, no-op). */
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
        loadMoments(spark, indexPath)
          .select(col("g"), col("n"),
            col("sx").cast(DecimalType(38, 12)),
            col("sy").cast(DecimalType(38, 12)),
            col("sxx").cast(DecimalType(38, 12)),
            col("syy").cast(DecimalType(38, 12)),
            col("sxy").cast(DecimalType(38, 12)))
          .withColumn("batch", lit(maxId.get)))
      val n = folded.count()
      StateSwap.advance(fs, indexPath,
        folded.repartition(1).sortWithinPartitions(col("g")),
        partitionCols = Seq("batch"))
      n
    }
  }
}
