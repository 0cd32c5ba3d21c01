package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.ext.Boilerplate

/**
 * Streaming maintenance of the persisted line-frequency boilerplate
 * index ([[graft.ext.Boilerplate.buildBoilerplateIndex]]) — the
 * template-detection member of the [[StreamingAnn]] lifecycle family:
 * each micro-batch's per-`(group, key)` distinct-document counts land as
 * one committed stripe, so a batch cut
 * ([[graft.ext.Boilerplate.stripBoilerplateIndexed]]) always screens
 * against template knowledge up to the last committed batch without
 * re-exploding a line of history.
 *
 * Reuses [[StreamingAnn]]'s append-only commit verbatim (dot-prefixed
 * temp dir → one atomic rename to `batch=<batchId>/`; at-least-once
 * replay skips on the existing marker). Correctness leans on the same
 * law the batch side pins: batch stripes are additive for DOC-DISJOINT
 * batches ([[graft.ext.Boilerplate.mergeBoilerplateIndexes]]), which a
 * streaming ingest satisfies by construction when each document arrives
 * once — compose with [[StreamingAnalytics.dedupStream]] upstream if
 * the feed can re-deliver documents under the same id. [[loadIndex]]
 * folds the stripes with one hash aggregate (sum of per-batch counts ≡
 * the from-scratch index — spec-pinned), so stripe count never changes
 * the answer, only load cost; fold into a flat layout with
 * `Staging.compactDir` on the schedule batches accrete on.
 */
object StreamingBoilerplate {

  /** The [[graft.ext.Boilerplate.buildBoilerplateIndex]] schema for
    * degrade-to-empty reads. The group column's type follows the corpus
    * (`buildBoilerplateIndex` is group-type-generic), so a non-string
    * grouping passes its own `grpType` — the StreamingFuzzy lesson: a
    * wrongly-typed empty frame would fail or coerce downstream. */
  private def indexSchema(grpType: DataType) = StructType(Seq(
    StructField("_grp", grpType),
    StructField("_key", StringType),
    StructField("_df", LongType)))

  /** Commit one micro-batch of documents as a boilerplate-index stripe
    * at `indexPath`. Returns false (no-op) for an already-committed
    * `batchId` — the at-least-once replay path. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      idCol: String = "doc_id", textCol: String = "text",
      groupCol: String = "source"): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => Boilerplate.buildBoilerplateIndex(batch, idCol, textCol, groupCol)
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingBoilerplate.sink(path))`. */
  def sink(indexPath: String, idCol: String = "doc_id",
      textCol: String = "text", groupCol: String = "source")
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      appendBatch(batch, indexPath, batchId, idCol, textCol, groupCol); ()
    }

  /** The committed stripes folded to ONE frame in the
    * [[graft.ext.Boilerplate.buildBoilerplateIndex]] shape — pass
    * straight to `stripBoilerplateIndexed`. The fold is the additive
    * merge (sum per `(grp, key)`); an unstarted path reads as an empty
    * index (nothing is ever boilerplate), not an inference error. */
  def loadIndex(spark: SparkSession, indexPath: String,
      grpType: DataType = StringType): DataFrame =
    Boilerplate.foldIndexes(
      StreamingAnn.loadCommitted(spark, indexPath, indexSchema(grpType)))
}
