package graft.stage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Partitioned columnar staging layer: Snappy Parquet partitioned by ingest
 * date, with partition-pruned day reads.
 *
 * Capability parity with the reference's cleansed layer
 * (`/root/reference/sree-etl-tdk-lambda.py:103-125` — Snappy Parquet
 * partitioned by ingest date) and its pruned scan
 * (`/root/reference/sree-etl-tdk-glue-job.py:38-46` —
 * `push_down_predicate="date = '<today>'"`).
 *
 * Scale notes: the `date` partition layout means a day query lists and reads
 * exactly one directory regardless of total table size; Catalyst partition
 * pruning turns the `.filter` in [[readDay]] into planning-time file
 * skipping, so this holds at 100 TB the same way it holds at sf0.01.
 */
object Staging {

  /** Add the ingest-date partition column derived from an event-time col. */
  def withDate(df: DataFrame, tsCol: String = "time"): DataFrame =
    df.withColumn("date", date_format(col(tsCol), "yyyy-MM-dd"))

  /** Stage to Snappy Parquet partitioned by `date`. Dynamic partition
    * overwrite: only the date partitions present in `df` are replaced, so a
    * daily ingest re-run is idempotent without clobbering earlier days.
    * Rows are shuffled onto their date before the write so each partition
    * directory gets one well-sized file instead of one sliver per task —
    * without this, T tasks × D days produce T×D small files, the classic
    * small-files failure at scale. */
  def stage(df: DataFrame, path: String): Unit =
    df.repartition(col("date"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy("date")
      .parquet(path)

  /**
   * Partition-pruned read of a single day. The equality filter on the
   * partition column prunes directories at planning time (visible as
   * `PartitionFilters: [isnotnull(date), (date = …)]` in `.explain`).
   */
  def readDay(spark: SparkSession, path: String, date: String): DataFrame =
    spark.read.parquet(path).filter(col("date") === lit(date))

  /** Read the whole staged table (all partitions). */
  def readAll(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Register the staged layout as a catalog table (idempotent). */
  def register(spark: SparkSession, table: String, path: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      spark.sql(
        s"CREATE TABLE $table USING parquet OPTIONS (path '$path')")
      spark.sql(s"MSCK REPAIR TABLE $table")
    }
}
