package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.ext.TextSearch

/**
 * Streaming maintenance of a persisted lexical (BM25) inverted index —
 * the retrieval-side member of the [[StreamingAnn]] lifecycle family: new
 * documents flow into the [[graft.ext.TextSearch.buildLexicalIndex]]
 * layout continuously, so batch probes
 * ([[graft.ext.TextSearch.bm25TopKIndexed]]) always see the corpus up to
 * the last committed micro-batch without any batch job re-tokenizing
 * history.
 *
 * Reuses [[StreamingAnn]]'s append-only commit verbatim (dot-prefixed
 * temp dir → one atomic rename to `batch=<batchId>/`; at-least-once
 * replay skips on the existing marker; readers never see a partial
 * batch): both index stripes are per-doc-local projections, so streamed
 * history never changes and `committed batches ∪ next batch` equals a
 * from-scratch build over the same documents — the
 * [[graft.ext.TextSearch.buildLexicalIndex]] append law, which also
 * means probe-time N/avgdl/df reflect every committed batch with no
 * stored-statistics refresh step. Unlike the IVF/PQ flavors there is NO
 * parameter generation to invalidate: the only contract is the corpus
 * tokenizer, fixed library-wide.
 *
 * Small-file hygiene: each batch adds one `batch=` partition — fold into
 * the flat layout with [[graft.ext.TextSearch.maintainLexicalIndex]] (or
 * `Staging.compact` with `partitionCol = "batch"` to keep the partition
 * layout) on the schedule batches accrete on.
 */
object StreamingLex {

  /** The [[graft.ext.TextSearch.buildLexicalIndex]] schema, for
    * degrade-to-empty reads of a not-yet-started index. */
  private val indexSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("term", StringType),
    StructField("tf", LongType),
    StructField("dl", LongType)))

  /** Commit one micro-batch of documents into the lexical index at
    * `indexPath`. Returns false (no-op) for an already-committed
    * `batchId` — the at-least-once replay path. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text"): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => TextSearch.buildLexicalIndex(batch, idCol, textCol)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingLex.sink(path))`. */
  def sink(indexPath: String, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Long) => Unit =
    (batch, batchId) => { appendBatch(batch, indexPath, batchId, idCol, textCol); () }

  /** The committed index as one frame in the
    * [[graft.ext.TextSearch.buildLexicalIndex]] shape — pass straight to
    * `bm25TopKIndexed`. The `batch` partition column is commit metadata,
    * not index content, and is dropped; a path with no committed batch
    * reads as an empty index (empty corpus ⇒ empty result), not a
    * schema-inference error. */
  def loadIndex(spark: SparkSession, indexPath: String): DataFrame =
    StreamingAnn.loadCommitted(spark, indexPath, indexSchema)
}
