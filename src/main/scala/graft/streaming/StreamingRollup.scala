package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analytics.Rollup
import graft.ext.Materialize

/**
 * Streaming maintenance of the persisted additive rollup
 * ([[graft.analytics.Rollup]]) — the aggregate-side member of the
 * lifecycle family next to [[StreamingDedup]] (state), [[StreamingAnn]]
 * (vectors) and [[StreamingLex]] (terms): each micro-batch's partial
 * rollup merges into the standing (day, event_type) table, so dashboard
 * reads always see counts up to the last committed batch without any
 * batch job rescanning event history.
 *
 * Unlike the append-only index stripes, a rollup REWRITES cells
 * (algebraic merge), so this store advances by [[StateSwap]]'s
 * crash-safe swap, not partition appends. Replay safety comes from the
 * batch-id high-water mark persisted WITH the state (`_bid`, constant
 * per write, riding the same atomic swap): `foreachBatch` ids are
 * monotonic and a replay re-delivers the LAST id, so a batch with
 * `batchId ≤` the stored mark is a replay of work the store already
 * holds — merging it again would double-count, the failure mode
 * additive aggregates have and id-keyed stores don't. The swap write is
 * rollup-sized (time × type cells), amortizing exactly like the batch
 * [[graft.analytics.Rollup.merge]] path it reuses.
 *
 * The mark rides a DEDICATED marker row (all data columns NULL — a
 * shape no real rollup cell can have, since `dailyRollup` cells always
 * carry a count ≥ 1), not the data rows: a merge that produces zero
 * cells (empty store + a batch of only NULL-ts events) still persists
 * the mark, so a replay of that batch id stays a no-op even though the
 * batch contributed nothing. Loaders filter the marker out by
 * `n IS NOT NULL`.
 */
object StreamingRollup {

  /** Store schema: [[graft.analytics.Rollup.dailyRollup]]'s output plus
    * the replay high-water mark, for degrade-to-empty first reads. */
  private def storeSchema(typeCol: String) = StructType(Seq(
    StructField("day", DateType),
    StructField(typeCol, StringType),
    StructField("n", LongType),
    StructField("min_v", DoubleType),
    StructField("max_v", DoubleType),
    StructField("_bid", LongType)))

  /**
   * Merge one micro-batch of raw events into the rollup at `statePath`.
   * Returns false (no-op) when `batchId` is at or below the store's
   * committed high-water mark — the at-least-once replay path.
   */
  def appendBatch(
      batch: DataFrame, statePath: String, batchId: Long,
      tsCol: String = "ts", typeCol: String = "event_type",
      valueCol: String = "value"): Boolean = {
    val spark = batch.sparkSession
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    Materialize.scoped(spark) {
      // lineage-cut so the swap write never reads the directory it
      // replaces (the StateSwap contract)
      val raw = Materialize.cut(
        if (fs.exists(new Path(statePath))) spark.read.parquet(statePath)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          storeSchema(typeCol)))
      val hwm = raw.agg(max(col("_bid"))).first()
      if (!hwm.isNullAt(0) && batchId <= hwm.getLong(0)) false
      else {
        val merged = Rollup.merge(
            raw.filter(col("n").isNotNull).drop("_bid"),
            Rollup.dailyRollup(batch, tsCol, typeCol, valueCol), typeCol)
          .withColumn("_bid", lit(batchId))
        // the out-of-band mark: one NULL-celled row carrying only _bid,
        // so the high-water mark survives even a zero-cell merge
        val marker = spark.createDataFrame(
          java.util.Collections.singletonList(
            org.apache.spark.sql.Row(null, null, null, null, null, batchId)),
          storeSchema(typeCol))
        StateSwap.advance(fs, statePath, merged.unionByName(marker))
        true
      }
    }
  }

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(StreamingRollup.sink(path))`. */
  def sink(statePath: String, tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value")
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      appendBatch(batch, statePath, batchId, tsCol, typeCol, valueCol); ()
    }

  /** The committed rollup in [[graft.analytics.Rollup.dailyRollup]]'s
    * shape (the `_bid` mark and its NULL-celled marker row are commit
    * metadata, not rollup content); an unstarted path reads as an empty
    * rollup, not an inference error. */
  def loadRollup(spark: SparkSession, statePath: String,
      typeCol: String = "event_type"): DataFrame = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StateSwap.recover(fs, statePath)
    if (fs.exists(new Path(statePath)))
      spark.read.parquet(statePath)
        .filter(col("n").isNotNull).drop("_bid")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(storeSchema(typeCol).dropRight(1)))
  }
}
