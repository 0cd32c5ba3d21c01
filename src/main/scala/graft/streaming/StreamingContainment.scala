package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.ext.Dedup

/**
 * Streaming maintenance of the persisted containment posting index
 * ([[graft.ext.Dedup.buildContainmentIndex]]) — the quote/subset
 * member of the streaming index family ([[StreamingFuzzy]] edit
 * distance, [[StreamingAnn]] vectors, [[StreamingLex]] terms): new
 * documents' posting rows land continuously, so a batch screen
 * ([[graft.ext.Dedup.containmentScreenIndexed]]) always sees the
 * corpus up to the last committed micro-batch — with CORPUS-WIDE
 * document frequencies, because the screen recomputes df over
 * index ∪ batch at read time (a shingle that turns hot as the corpus
 * grows correctly drops out of the discriminative universe).
 *
 * Reuses [[StreamingAnn]]'s append-only commit verbatim: posting rows
 * are per-doc-local projections, so `committed batches ∪ next batch`
 * ≡ a from-scratch build — the index-append law DedupSpec pins for
 * the batch side.
 */
object StreamingContainment {

  /** The [[graft.ext.Dedup.buildContainmentIndex]] schema; id type
    * follows the corpus (the [[StreamingFuzzy.loadIndex]] argument). */
  private def indexSchema(idType: DataType) = StructType(Seq(
    StructField("id", idType),
    StructField("_s", StringType)))

  /** Commit one micro-batch of documents into the posting index at
    * `indexPath`. Returns false (no-op) for an already-committed
    * `batchId` — the at-least-once replay path. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => Dedup.buildContainmentIndex(batch, idCol, textCol, n)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter. */
  def sink(indexPath: String, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, idCol, textCol, n); () }

  /** The committed index as one frame in the
    * [[graft.ext.Dedup.buildContainmentIndex]] shape — pass straight
    * to `containmentScreenIndexed`. */
  def loadIndex(spark: SparkSession, indexPath: String,
      idType: DataType = LongType): DataFrame =
    StreamingAnn.loadCommitted(spark, indexPath, indexSchema(idType))

  /** Screen a batch against everything streamed so far — byte-for-byte
    * [[graft.ext.Dedup.containmentScreenIndexed]] over the committed
    * corpus. */
  def screen(
      batch: DataFrame, spark: SparkSession, indexPath: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double, n: Int = 3, maxDf: Int = 64): DataFrame =
    Dedup.containmentScreenIndexed(batch,
      loadIndex(spark, indexPath), idCol, textCol, threshold, n, maxDf)
}
