package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.clf.ClfParser
import graft.stage.Staging
import graft.analytics.LogAnalytics
import graft.sinks.Sink

/**
 * End-to-end batch pipeline: the reference's two entry points fused into
 * one Spark job.
 *
 * Reference behavior reproduced (SURVEY.md §3):
 *  - Lambda cleanse (`/root/reference/sree-etl-tdk-lambda.py:145-221`):
 *    list `*.log` under the input dir → parse CLF → stage as Snappy
 *    Parquet partitioned by ingest date → archive each processed input
 *    file out of the inbox (`:128-142`).
 *  - Glue aggregate (`/root/reference/sree-etl-tdk-glue-job.py:42-94`):
 *    partition-pruned read of the ingest day → per-user request counts
 *    (sink overwrite) + one totals row (sink append).
 *
 * Spark-first deltas: the whole-file-in-memory fetch becomes a distributed
 * text scan; the reference's three separate aggregate actions become one
 * cached day-slice with a single multi-aggregate totals pass; the S3
 * copy+delete archive becomes an atomic `FileSystem.rename`; staging uses
 * dynamic partition overwrite so a day re-run is idempotent.
 *
 * Scale: nothing here collects data rows to the driver — the only
 * driver-side materialization is the distinct input-file list (metadata,
 * one string per file) and the 3-scalar totals row, both O(metadata).
 */
object Pipeline {

  /** Small run summary (driver-side scalars only). */
  final case class Report(
      inputFiles: Seq[String],
      parsedRows: Long,
      rejectRows: Long,
      userCount: Long,
      totalSuccessful: Long)

  /**
   * Run the full pipeline for one ingest date.
   *
   * @param inputDir    inbox directory of raw `*.log` files
   * @param stagingPath root of the partitioned parquet staging layout
   * @param date        ingest date (`yyyy-MM-dd`) — explicit for
   *                    determinism, where the reference used "today"
   * @param sink        result-table sink (JDBC in production, parquet here)
   * @param archiveDir  where processed inputs move; None = leave in place
   * @param catalogTable register the staged layout under this catalog name
   *                     (the reference's Glue-table ensure,
   *                     `sree-etl-tdk-lambda.py:196-200`); None = skip
   */
  def run(
      spark: SparkSession,
      inputDir: String,
      stagingPath: String,
      date: String,
      sink: Sink,
      archiveDir: Option[String] = None,
      glob: String = "*.log",
      catalogTable: Option[String] = None): Report = {

    // provenance column is captured at scan time, BEFORE caching —
    // input_file_name() over an InMemoryRelation evaluates to ""
    val raw = ClfParser.read(spark, inputDir, glob)
      .withColumn("_src", input_file_name())
      .cache()
    try {
      val inputFiles = raw.select(col("_src")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted

      val parsed  = ClfParser.parse(raw)
      val rejects = ClfParser.rejects(raw).count()
      Staging.stage(parsed.withColumn("date", lit(date)), stagingPath)
      catalogTable.foreach(Staging.register(spark, _, stagingPath))

      // Aggregate over the staged day slice (partition-pruned re-read, as
      // the reference's Glue job does) so the sink reflects what was staged.
      val day = Staging.readDay(spark, stagingPath, date).cache()
      try {
        val parsedRows = day.count()
        sink.overwrite(
          LogAnalytics.requestsPerUser(day).orderBy(col("user_id").asc_nulls_last),
          "user_requests")
        val totals = LogAnalytics.totalsRow(
          day, runDate = lit(date), successPred = col("status_code") === 200)
        sink.append(totals, "total_requests")
        val t = totals.collect()(0)

        archiveDir.foreach(moveFiles(spark, inputFiles, _))
        Report(inputFiles, parsedRows, rejects,
          t.getAs[Long]("user_count"), t.getAs[Long]("total_successful_requests"))
      } finally day.unpersist()
    } finally raw.unpersist()
  }

  /** Archive processed inputs: atomic rename into `archiveDir` (the
    * reference's S3 copy+delete, `sree-etl-tdk-lambda.py:128-142`, made
    * exactly-once by construction). */
  private def moveFiles(spark: SparkSession, files: Seq[String], archiveDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(archiveDir)
    val fs   = dest.getFileSystem(conf)
    fs.mkdirs(dest)
    files.foreach { f =>
      val src = new Path(f)
      // a silently-failed rename would leave the file in the inbox to be
      // re-ingested under the NEXT run's date — fail the run instead
      require(fs.rename(src, new Path(dest, src.getName)),
        s"archive: could not move $src to $dest")
    }
  }
}
