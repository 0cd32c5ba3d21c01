package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.ext.AnnIvf

/**
 * Streaming maintenance of a persisted IVF inverted-file index — the ANN
 * side of the [[StreamingDedup]] lifecycle story: new vectors flow into
 * the [[graft.ext.AnnIvf.buildIvfIndex]] layout continuously, so batch
 * probes ([[graft.ext.AnnIvf.annTopKIndexed]] / `knnJoinIndexed`) always
 * see the corpus up to the last committed micro-batch without any batch
 * job re-deriving cells.
 *
 * Crash-safety mechanics differ from [[StateSwap]] BY DESIGN: the dedup
 * rep store is horizon-bounded mutable state (rows join and leave), so it
 * advances by whole-store swap; an IVF index is APPEND-ONLY (history
 * never changes under a fixed centroid generation), so each micro-batch
 * commits as its own immutable partition — write to a dot-prefixed temp
 * dir, then one atomic rename to `batch=<batchId>/`. At-least-once
 * `foreachBatch` replay is absorbed by the rename commit: a replayed
 * batch finds its directory already present and skips (the reason the
 * layout keys on Spark's monotone batchId), a crash before the rename
 * leaves only a hidden temp dir that readers ignore and the retry
 * deletes, and readers never observe a partial batch. No absence window
 * at all — the full-swap's one weakness doesn't apply to append-only
 * state.
 *
 * The index stays tied to its centroid generation (cell ids across
 * generations are incomparable — [[graft.ext.AnnIvf.buildIvfIndex]]
 * contract): retraining means a fresh `indexPath`. Small-file hygiene:
 * each batch adds one `batch=` partition, so after many micro-batches run
 * [[graft.stage.Staging.compact]] with `partitionCol = "batch"` (per-
 * partition consolidation, same swap contract), or fold the stream's
 * index into the flat batch layout with [[graft.ext.AnnIvf
 * .maintainIvfIndex]] during a retrain rebuild.
 */
object StreamingAnn {

  /** The [[graft.ext.AnnIvf.buildIvfIndex]] schema — used to give an
    * empty (not-yet-started) index a readable frame. */
  private val indexSchema = StructType(Seq(
    StructField("cell", LongType),
    StructField("nn_id", LongType),
    StructField("nn_emb", ArrayType(FloatType)),
    StructField("nn_n", DoubleType)))

  /** The [[graft.ext.AnnPq.buildPqIndex]] schema. */
  private val pqIndexSchema = StructType(Seq(
    StructField("nn_id", LongType),
    StructField("codes", ArrayType(LongType)),
    StructField("nn_n", DoubleType)))

  /** The append-only commit shared by every streamed index flavor:
    * write the batch's rows to a dot-prefixed temp dir, one atomic
    * rename to `batch=<batchId>/`. Returns false (nothing done) when the
    * batch is already committed — the at-least-once replay path. Empty
    * batches still commit their marker partition, so a replayed empty
    * delivery is also a no-op. */
  private[streaming] def commitBatch(
      spark: SparkSession, indexPath: String, batchId: Long,
      writeRows: String => Unit): Boolean = {
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = new Path(indexPath, s"batch=$batchId")
    if (fs.exists(committed)) return false
    val tmp = new Path(indexPath, s".batch=$batchId.tmp")
    fs.delete(tmp, true) // a crash before rename left at most this orphan
    writeRows(tmp.toString)
    require(fs.rename(tmp, committed),
      s"StreamingAnn: could not commit $tmp -> $committed")
    true
  }

  private[streaming] def loadCommitted(
      spark: SparkSession, indexPath: String,
      schema: StructType): DataFrame = {
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(root) && fs.listStatus(root)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasBatch)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(indexPath)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
  }

  /**
   * Commit one micro-batch of `(vec_id, embedding)` rows into the IVF
   * index at `indexPath` under the FIXED `centroids` generation.
   */
  def appendBatch(
      batch: DataFrame, indexPath: String,
      centroids: DataFrame, batchId: Long): Boolean =
    commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => AnnIvf.buildIvfIndex(batch, centroids)
        .write.mode("overwrite").parquet(tmp))

  /** The PQ twin: commit one micro-batch's [[graft.ext.AnnPq
    * .buildPqIndex]] rows under the FIXED codebook generation (codes
    * across generations are incomparable — retraining means a fresh
    * `indexPath`, the IVF contract verbatim). */
  def appendPqBatch(
      batch: DataFrame, indexPath: String,
      cb: graft.ext.AnnPq.Codebooks, batchId: Long): Boolean =
    commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => graft.ext.AnnPq.buildPqIndex(batch, cb)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingAnn.sink(path, centroids))`. */
  def sink(indexPath: String, centroids: DataFrame): (DataFrame, Long) => Unit =
    (batch, batchId) => { appendBatch(batch, indexPath, centroids, batchId); () }

  /** `foreachBatch` adapter for the PQ index. */
  def pqSink(indexPath: String, cb: graft.ext.AnnPq.Codebooks): (DataFrame, Long) => Unit =
    (batch, batchId) => { appendPqBatch(batch, indexPath, cb, batchId); () }

  /**
   * The committed index as one frame in the [[graft.ext.AnnIvf
   * .buildIvfIndex]] shape — pass straight to `annTopKIndexed` /
   * `knnJoinIndexed`. Partition discovery surfaces the `batch` commit
   * key as a column; it is metadata, not index content, and is dropped
   * here. A path with no committed batch yet reads as an empty index
   * (probes return no candidates) rather than a schema-inference error —
   * the same degrade-to-empty contract as the rest of the IVF surface.
   */
  def loadIndex(spark: SparkSession, indexPath: String): DataFrame =
    loadCommitted(spark, indexPath, indexSchema)

  /** The committed PQ code table in the [[graft.ext.AnnPq.buildPqIndex]]
    * shape — pass straight to `topKIndexed`. Same degrade-to-empty
    * contract. */
  def loadPqIndex(spark: SparkSession, indexPath: String): DataFrame =
    loadCommitted(spark, indexPath, pqIndexSchema)
}
