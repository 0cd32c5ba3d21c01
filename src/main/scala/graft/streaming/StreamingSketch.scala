package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.{Materialize, Sketches}

/**
 * Streaming count-min index: each micro-batch appends its OWN
 * sub-sketch ([[graft.ext.Sketches.cmsBuild]] — the `(r, bucket, cnt)`
 * cell frame q222 proves mergeable against q221's oracle), and "the
 * frequency estimate over everything streamed so far" is answered at
 * read time by [[Sketches.cmsMerge]] over the committed cells — no
 * batch is ever re-scanned, the fold is ≤ depth·width-cell-sized, and
 * the corpus pass happened once per batch at ingest.
 *
 * This is the [[StreamingMoments]] append-only pattern applied to the
 * frequency family: at-least-once replay skips on the `batch=<id>`
 * marker (additive cells would double-count without it), and
 * [[compactIndex]] bounds fold-at-load under the marker-preserving
 * [[StateSwap]] rename.
 */
object StreamingSketch {

  private val cellSchema = StructType(Seq(
    StructField("r", IntegerType),
    StructField("bucket", LongType),
    StructField("cnt", LongType)))

  /** Commit one micro-batch's sub-sketch at `indexPath`. Returns false
    * (no-op) for an already-committed `batchId` — the replay guard. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      keyCol: String, depth: Int = 4, width: Int = 64): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => Sketches.cmsBuild(batch, col(keyCol), depth, width)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter. */
  def sink(indexPath: String, keyCol: String,
      depth: Int = 4, width: Int = 64): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, keyCol, depth, width); () }

  /** The streamed corpus's folded sketch up to the last committed
    * batch — exactly [[Sketches.cmsBuild]] over everything streamed
    * (the q222 merge law). Empty/missing index reads as an empty
    * frame (every estimate then 0). */
  def loadSketch(spark: SparkSession, indexPath: String): DataFrame =
    Sketches.cmsMerge(
      StreamingAnn.loadCommitted(spark, indexPath, cellSchema)
        .select(col("r"), col("bucket"), col("cnt")))

  /** Point estimates over everything streamed so far — byte-for-byte
    * [[Sketches.cmsEstimate]] against the folded sketch. */
  def estimate(
      spark: SparkSession, indexPath: String, keys: DataFrame,
      keyCol: String, depth: Int = 4, width: Int = 64): DataFrame =
    Sketches.cmsEstimate(loadSketch(spark, indexPath), keys, keyCol,
      depth, width)

  /** Rewrite the accumulated per-batch cells as ONE folded partition in
    * `batch=<max committed id>` — marker preservation keeps the replay
    * skip alive across the rewrite ([[StreamingMoments.compactIndex]]'s
    * argument verbatim). Returns the folded cell count. */
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
        loadSketch(spark, indexPath).withColumn("batch", lit(maxId.get)))
      val n = folded.count()
      StateSwap.advance(fs, indexPath,
        folded.repartition(1).sortWithinPartitions(col("r"), col("bucket")),
        partitionCols = Seq("batch"))
      n
    }
  }
}
