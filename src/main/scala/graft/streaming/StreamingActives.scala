package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

import graft.analytics.TimeSeries
import graft.ext.Materialize

/**
 * Streaming maintenance of the distinct user-day store behind
 * [[graft.analytics.TimeSeries.rollingDistinctUsers]] and
 * [[TimeSeries.stickiness]] — the activity member of the
 * standing-state family next to [[StreamingRetention]] (user-weeks):
 * each micro-batch's user-days fold into the store by
 * [[TimeSeries.mergeUserDays]], so rolling actives / DAU / MAU are
 * always computable from user-day-sized state without rescanning
 * event history.
 *
 * Replay safety is ALGEBRAIC ([[StreamingRetention]]'s argument):
 * distinct union is idempotent, so at-least-once replay converges with
 * no high-water mark. The store advances by [[StateSwap]]; the swap
 * write is user-day-sized, not event-sized.
 */
object StreamingActives {

  private def storeSchema(idType: DataType) = StructType(Seq(
    StructField("_u", idType),
    StructField("_d", LongType)))

  /** Fold one micro-batch of raw events into the user-day store at
    * `statePath`; returns the store's user-day count. */
  def appendBatch(
      batch: DataFrame, statePath: String,
      userCol: String = "user_id", tsCol: String = "ts",
      idType: DataType = LongType): Long = {
    val spark = batch.sparkSession
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    Materialize.scoped(spark) {
      val stored = Materialize.cut(loadUserDays(spark, statePath, idType))
      val merged = TimeSeries.mergeUserDays(stored,
        TimeSeries.userDays(batch, userCol, tsCol))
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

  /** The committed user-day store ([[TimeSeries.userDays]] shape); an
    * unstarted path reads as an empty store of the declared idType. */
  def loadUserDays(spark: SparkSession, statePath: String,
      idType: DataType = LongType): DataFrame = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    if (fs.exists(new Path(statePath))) spark.read.parquet(statePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      storeSchema(idType))
  }

  /** Rolling distinct actives over the committed store — the streaming
    * read face of [[TimeSeries.rollingDistinctUsers]]. */
  def rollingActives(spark: SparkSession, statePath: String,
      windowDays: Int, idType: DataType = LongType): DataFrame =
    TimeSeries.rollingFromUserDays(
      loadUserDays(spark, statePath, idType), windowDays)
}
