package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

import graft.analytics.Survival
import graft.ext.Materialize

/**
 * Streaming maintenance of the per-user activity-span store behind
 * [[graft.analytics.Survival.kaplanMeier]] — the retention-curve member
 * of the standing-state family next to [[StreamingRollup]] (additive
 * cells) and [[StreamingTrend]] (moment sums): each micro-batch's spans
 * fold into the store by [[graft.analytics.Survival.mergeSpans]], so
 * the churn curve is always computable from user-count-sized state
 * without rescanning event history.
 *
 * Replay safety is ALGEBRAIC here, not mark-based: span merge is
 * idempotent (min/max absorb re-delivered rows), so an at-least-once
 * replay converges to the same store by construction and no `_bid`
 * high-water mark is needed — the property [[StreamingRollup]]'s
 * additive cells lack and must compensate for with a marker row. The
 * store still advances by [[StateSwap]] (spans REWRITE per user), and
 * the swap write is user-count-sized, not event-sized.
 *
 * The user id's type is a parameter (`idType`), not a hardcoded Long —
 * a string-keyed store must read back string-keyed even before its
 * first commit (the degrade-to-empty contract).
 */
object StreamingSurvival {

  private def storeSchema(idType: DataType) = StructType(Seq(
    StructField("user", idType),
    StructField("first_b", LongType),
    StructField("last_b", LongType)))

  /**
   * Fold one micro-batch of raw events into the span store at
   * `statePath`. Always merges (replays are absorbed by idempotence);
   * returns the number of users in the updated store.
   */
  def appendBatch(
      batch: DataFrame, statePath: String,
      userCol: String = "user_id", tsCol: String = "ts",
      bucketSeconds: Long = 3600L,
      idType: DataType = LongType): Long = {
    val spark = batch.sparkSession
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    Materialize.scoped(spark) {
      // lineage-cut: the swap write must never read the directory it
      // replaces (the StateSwap contract)
      val stored = Materialize.cut(loadSpans(spark, statePath, idType))
      val merged = Survival.mergeSpans(stored,
        Survival.userSpans(batch, userCol, tsCol, bucketSeconds))
      val out = Materialize.cut(merged)
      StateSwap.advance(fs, statePath, out)
      out.count()
    }
  }

  /** `foreachBatch` adapter: `stream.writeStream.foreachBatch(
    * StreamingSurvival.sink(path))`. */
  def sink(statePath: String, userCol: String = "user_id",
      tsCol: String = "ts", bucketSeconds: Long = 3600L,
      idType: DataType = LongType): (DataFrame, Long) => Unit =
    (batch, _) => {
      appendBatch(batch, statePath, userCol, tsCol, bucketSeconds, idType)
      ()
    }

  /** The committed span store ([[graft.analytics.Survival.userSpans]]
    * shape); an unstarted path reads as an empty store of the declared
    * `idType`, not an inference error. */
  def loadSpans(spark: SparkSession, statePath: String,
      idType: DataType = LongType): DataFrame = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    if (fs.exists(new Path(statePath))) spark.read.parquet(statePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      storeSchema(idType))
  }

  /** The churn curve over the committed store — the streaming read face
    * of [[graft.analytics.Survival.kaplanMeier]]. */
  def curve(spark: SparkSession, statePath: String,
      horizonBuckets: Int, idType: DataType = LongType): DataFrame =
    Survival.kaplanMeierFromSpans(
      loadSpans(spark, statePath, idType), horizonBuckets)
}
