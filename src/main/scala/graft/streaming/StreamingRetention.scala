package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, DateType, LongType, StructField, StructType}

import graft.analytics.LogAnalytics
import graft.ext.Materialize

/**
 * Streaming maintenance of the distinct user-week store behind
 * [[graft.analytics.LogAnalytics.cohortRetention]] — the cohort-matrix
 * member of the standing-state family next to [[StreamingSurvival]]
 * (spans): each micro-batch's user-weeks fold into the store by
 * [[LogAnalytics.mergeWeeks]], so the retention matrix is always
 * computable from user-week-sized state without rescanning event
 * history.
 *
 * Replay safety is ALGEBRAIC (the [[StreamingSurvival]] argument):
 * distinct union is idempotent, so an at-least-once replay converges
 * to the same store with no `_bid` high-water mark. The store advances
 * by [[StateSwap]] (the distinct REWRITES per user-week), and the swap
 * write is user-week-sized, not event-sized.
 */
object StreamingRetention {

  private def storeSchema(idType: DataType) = StructType(Seq(
    StructField("user_id", idType),
    StructField("w", DateType)))

  /** Fold one micro-batch of raw events into the user-week store at
    * `statePath`. Always merges (replays are absorbed by idempotence);
    * returns the number of user-weeks in the updated store. */
  def appendBatch(
      batch: DataFrame, statePath: String,
      userCol: String = "user_id", tsCol: String = "ts",
      idType: DataType = LongType): Long = {
    val spark = batch.sparkSession
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    Materialize.scoped(spark) {
      // lineage-cut: the swap write must never read the directory it
      // replaces (the StateSwap contract)
      val stored = Materialize.cut(loadWeeks(spark, statePath, idType))
      val merged = LogAnalytics.mergeWeeks(stored,
        LogAnalytics.userWeeks(batch, userCol, tsCol)
          .withColumnRenamed(userCol, "user_id"))
      val out = Materialize.cut(merged)
      StateSwap.advance(fs, statePath, out)
      out.count()
    }
  }

  /** `foreachBatch` adapter. */
  def sink(statePath: String, userCol: String = "user_id",
      tsCol: String = "ts", idType: DataType = LongType)
      : (DataFrame, Long) => Unit =
    (batch, _) => {
      appendBatch(batch, statePath, userCol, tsCol, idType)
      ()
    }

  /** The committed user-week store ([[LogAnalytics.userWeeks]] shape);
    * an unstarted path reads as an empty store of the declared
    * `idType`. */
  def loadWeeks(spark: SparkSession, statePath: String,
      idType: DataType = LongType): DataFrame = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    if (fs.exists(new Path(statePath))) spark.read.parquet(statePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      storeSchema(idType))
  }

  /** The retention matrix over the committed store — the streaming
    * read face of [[LogAnalytics.cohortRetention]]. */
  def matrix(spark: SparkSession, statePath: String,
      idType: DataType = LongType): DataFrame =
    LogAnalytics.cohortRetentionFromWeeks(
      loadWeeks(spark, statePath, idType), "user_id")
}
