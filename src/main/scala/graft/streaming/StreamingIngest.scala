package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.clf.ClfParser

/**
 * Incremental file-ingest: the Spark-native form of the reference's
 * deployment contract (SURVEY.md §2.10) — new `.log` files trigger a
 * processing pass (`/root/reference/README.md:52-54`), each file is
 * processed exactly once and then archived out of the inbox
 * (`/root/reference/sree-etl-tdk-lambda.py:128-142,211`), results append
 * to the date-partitioned staging layer.
 *
 * Mechanics: checkpointed Structured Streaming file source tracks the
 * processed-file set (exactly-once across restarts, no manual bookkeeping);
 * `Trigger.AvailableNow` drains everything pending and stops, so a
 * scheduler can invoke [[runOnce]] on the reference's daily cadence;
 * `cleanSource=archive` moves committed inputs under `archiveDir` (the
 * file-source cleaner archives a batch's files after the batch commits —
 * lazily, on a subsequent maintenance pass, so the LAST drained batch's
 * files may remain in the inbox until the next run; the checkpoint already
 * guarantees they are never reprocessed).
 *
 * Scale: the text scan, CLF parse, and partitioned parquet append are the
 * same distributed operators as the batch path — the stream wrapper adds
 * only file tracking. Partitioning by event date keeps downstream reads
 * pruned exactly like [[graft.stage.Staging.readDay]].
 */
object StreamingIngest {

  /** Start a drain-everything-then-stop ingest pass. */
  def start(
      spark: SparkSession,
      inputDir: String,
      stagingPath: String,
      checkpointDir: String,
      archiveDir: String,
      glob: String = "*.log"): StreamingQuery = {
    val raw = spark.readStream
      .option("pathGlobFilter", glob)
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .text(inputDir)
    ClfParser.parse(raw)
      .withColumn("date", date_format(col("time"), "yyyy-MM-dd"))
      .writeStream
      .format("parquet")
      .partitionBy("date")
      .option("path", stagingPath)
      .option("compression", "snappy")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** [[start]] + block until the drain completes. */
  def runOnce(
      spark: SparkSession,
      inputDir: String,
      stagingPath: String,
      checkpointDir: String,
      archiveDir: String,
      glob: String = "*.log"): Unit =
    start(spark, inputDir, stagingPath, checkpointDir, archiveDir, glob)
      .awaitTermination()
}
