package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ext.Privacy

/**
 * Streaming k-anonymity audit index: each micro-batch appends its OWN
 * equivalence-class partials ([[Privacy.equivalenceClasses]] — the
 * additive class-size state q276 proves mergeable against q267's
 * oracle), and "is the accumulated release still k-anonymous?" is
 * answered at read time by folding the committed partials
 * ([[Privacy.mergeClasses]]) and profiling the class frame
 * ([[Privacy.kAnonymityFromClasses]]) — no batch is ever re-scanned
 * and the fold is class-frame-sized, so the audit can gate every
 * incremental publish of a growing table.
 *
 * [[StreamingMoments]]' append-only pattern: at-least-once replay
 * skips on the `batch=<id>` marker (additive counts would
 * double-count without it). The quasi-identifier column list is fixed
 * per index — it IS the store key.
 */
object StreamingPrivacy {

  /** Commit one micro-batch's class partials at `indexPath`. Returns
    * false (no-op) for an already-committed `batchId` — the replay
    * guard. */
  def appendBatch(
      batch: DataFrame, indexPath: String, batchId: Long,
      quasiNames: Seq[String]): Boolean =
    StreamingAnn.commitBatch(batch.sparkSession, indexPath, batchId,
      tmp => Privacy.equivalenceClasses(batch, quasiNames.map(col))
        .write.mode("overwrite").parquet(tmp))

  /** `foreachBatch` adapter. */
  def sink(indexPath: String, quasiNames: Seq[String])
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      { appendBatch(batch, indexPath, batchId, quasiNames); () }

  /** The streamed data's folded class frame up to the last committed
    * batch — exactly [[Privacy.equivalenceClasses]] over everything
    * streamed (the merge law). `storeSchema` declares the partial
    * layout (quasi columns + `class_size`) so an unstarted index reads
    * as an empty class frame. */
  def loadClasses(
      spark: SparkSession, indexPath: String,
      storeSchema: StructType, quasiNames: Seq[String]): DataFrame =
    Privacy.mergeClasses(
      StreamingAnn.loadCommitted(spark, indexPath, storeSchema),
      quasiNames.map(col))

  /** The k-anonymity profile over everything streamed so far —
    * byte-for-byte [[Privacy.kAnonymityProfile]] of the union of all
    * committed batches, recomputed from class-sized state only. */
  def profile(
      spark: SparkSession, indexPath: String, storeSchema: StructType,
      quasiNames: Seq[String], ks: Seq[Int]): DataFrame =
    Privacy.kAnonymityFromClasses(
      loadClasses(spark, indexPath, storeSchema, quasiNames), ks)
}
