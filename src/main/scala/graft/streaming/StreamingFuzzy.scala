package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.ext.FuzzyJoin

/**
 * Streaming maintenance of the persisted fuzzy block index
 * ([[graft.ext.FuzzyJoin.buildFuzzyIndex]]) — the edit-distance member
 * of the streaming index family ([[StreamingAnn]] vectors,
 * [[StreamingLex]] terms, [[StreamingRollup]] aggregates): new
 * documents' block rows land continuously, so a batch screen
 * ([[graft.ext.FuzzyJoin.editDistancePairsIndexed]]) always sees the
 * corpus up to the last committed micro-batch without re-lowering or
 * re-blocking a single historical head.
 *
 * Reuses [[StreamingAnn]]'s append-only commit verbatim (dot-prefixed
 * temp dir → one atomic rename to `batch=<batchId>/`; at-least-once
 * replay skips on the existing marker): block rows are per-doc-local
 * projections, so `committed batches ∪ next batch` ≡ a from-scratch
 * build — the index-append law FuzzyJoinSpec pins for the batch side.
 */
object StreamingFuzzy {

  /** The [[graft.ext.FuzzyJoin.buildFuzzyIndex]] schema, for
    * degrade-to-empty reads of a not-yet-started index. The id column's
    * type follows the corpus (`buildFuzzyIndex` is id-type-generic), so
    * the caller must say what it is — a wrong type here would make the
    * empty-index frame disagree with committed batches and fail (or
    * silently coerce) in `editDistancePairsIndexed`'s comparisons. */
  private def indexSchema(idCol: String, idType: DataType) = StructType(Seq(
    StructField(idCol, idType),
    StructField("_blk", StringType),
    StructField("_head", StringType)))

  /** Commit one micro-batch of documents into the block index at
    * `indexPath`. Returns false (no-op) for an already-committed
    * `batchId` — the at-least-once replay path. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text",
      headLen: Int = 64, blockLen: Int = 16): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => FuzzyJoin.buildFuzzyIndex(batch, idCol, textCol,
        headLen, blockLen).write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingFuzzy.sink(path))`. */
  def sink(indexPath: String, idCol: String = "doc_id",
      textCol: String = "text", headLen: Int = 64, blockLen: Int = 16)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      appendBatch(batch, indexPath, batchId, idCol, textCol,
        headLen, blockLen); ()
    }

  /** The committed index as one frame in the
    * [[graft.ext.FuzzyJoin.buildFuzzyIndex]] shape — pass straight to
    * `editDistancePairsIndexed`. The `batch` partition column is commit
    * metadata, not index content, and is dropped; a path with no
    * committed batch reads as an empty index of the declared `idType`
    * (which must match the corpus id — a string-keyed corpus passes
    * `StringType` so the degrade-to-empty frame coerces nothing). */
  def loadIndex(spark: SparkSession, indexPath: String,
      idCol: String = "doc_id", idType: DataType = LongType): DataFrame =
    StreamingAnn.loadCommitted(spark, indexPath, indexSchema(idCol, idType))
}
