package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.{AsofJoin, Materialize}

/**
 * Streaming as-of enrichment — the continuous twin of the batch
 * [[graft.ext.AsofJoin.asofBackward]]: over one tagged event stream, each
 * LEFT row (a purchase, a trade, an error) is matched to the most recent
 * prior RIGHT row (a click, a quote, a config push) of the same key, where
 * "prior" spans batch boundaries. Spark's stream-stream interval joins
 * cannot express "the single most recent match" (they emit every match in
 * the interval), so the idiomatic construction is the same `foreachBatch` +
 * compact-store shape as [[StreamingDedup]]:
 *
 *  1. right rows seen so far live in a parquet store at `statePath` — one
 *    flat row per deposit (key, time, tie, payload) inside the horizon;
 *  2. eviction BEFORE matching: store rows whose event time has fallen
 *    more than `horizonSeconds` behind the high-water mark expire, exactly
 *    as a watermark expires built-in state — state is bounded by arrival
 *    rate × horizon, not stream length;
 *  3. the batch's left rows as-of join (batch operator, single shuffle, no
 *    pair blowup) against live store rows UNION the batch's own right
 *    rows, so same-batch deposits are visible to same-batch lefts with
 *    exact event-time interleaving;
 *  4. the enriched lefts are EMITTED BEFORE the store advances (the same
 *    at-least-once contract as [[StreamingDedup]]: an emit failure leaves
 *    the store untouched and the replay re-emits; a crash after the
 *    advance replays lefts against a store that already holds the batch's
 *    deposits — as-of matching is idempotent, the replay emits the same
 *    matches); the store then advances by the crash-safe [[StateSwap]].
 *
 * A right row that arrives LATER than a left row it would have matched
 * (cross-batch late data) does not retro-update the already-emitted left —
 * standard enrich-at-arrival semantics; size `horizonSeconds` to the
 * out-of-orderness the source actually exhibits. Re-delivered right rows
 * dedupe in the store by (key, time, tie).
 *
 * The reference has no streaming surface (its pipeline is a
 * Lambda-triggered daily batch, `/root/reference/sree-etl-tdk-lambda.py`);
 * this extends SURVEY.md §2.10's streaming set alongside the near-dup
 * store.
 */
object StreamingAsof {

  /**
   * Process one micro-batch: split it into left rows (`leftFilter`) and
   * right deposits (`rightFilter`), as-of match the lefts, hand them to
   * `emit` (which must fully consume the DataFrame — cuts are released on
   * return), then advance the store. Right rows with a null key or time
   * are dropped (they could satisfy no match); left rows pass through
   * with a null match when nothing qualifies. Driver-side scalars: one
   * `first()` for the event-time high-water mark — metadata, not data.
   */
  def processBatch(
      batch: DataFrame, statePath: String,
      leftFilter: Column, rightFilter: Column,
      keyCol: String, timeCol: String, tieCol: String,
      payloadCols: Seq[String],
      horizonSeconds: Long = 3600L)(emit: DataFrame => Unit): Unit = {
    require(payloadCols.nonEmpty, "payloadCols must name at least one column")
    val spark = batch.sparkSession
    val storeCols = (Seq(keyCol, timeCol, tieCol) ++ payloadCols).distinct
    Materialize.scoped(spark) {
      // batch deposits — cut once: matched against AND written to the store
      val rights = Materialize.cut(
        batch.filter(rightFilter)
          .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
          .select(storeCols.map(col): _*).distinct())
      val lefts = Materialize.cut(batch.filter(leftFilter))

      val fs = new Path(statePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      StateSwap.recover(fs, statePath)
      val store0 = Materialize.cut(
        if (fs.exists(new Path(statePath))) spark.read.parquet(statePath)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rights.schema))

      // horizon eviction before matching: the high-water mark over stored
      // and arriving event times defines "now"
      val hwm = store0.select(col(timeCol))
        .unionAll(rights.select(col(timeCol)))
        .unionAll(lefts.select(col(timeCol)))
        .agg(max(col(timeCol))).first().getTimestamp(0)
      val store =
        if (hwm == null) store0
        else store0.filter(col(timeCol) >= lit(
          new java.sql.Timestamp(hwm.getTime - horizonSeconds * 1000L)))

      val deposits = store.unionByName(rights).distinct()
      val enriched = AsofJoin.asofBackward(
        lefts, deposits, keyCol, keyCol, timeCol, timeCol, payloadCols, tieCol)

      // EMIT FIRST — see the delivery contract in the object doc
      emit(enriched)

      // no-op batches (no new deposits, nothing evicted) skip the swap
      // rather than re-write the store on every idle trigger
      val changedStore = rights.limit(1).count() > 0 ||
        (hwm != null && store.count() != store0.count())
      if (hwm != null && changedStore)
        StateSwap.advance(fs, statePath, Materialize.cut(deposits))
    }
  }

  /** `foreachBatch` adapter: `stream.writeStream.foreachBatch(sink(...))`.
    * `onEnriched` runs BEFORE the store advances and must fully consume
    * the enriched DataFrame. */
  def sink(
      statePath: String,
      leftFilter: Column, rightFilter: Column,
      keyCol: String, timeCol: String, tieCol: String,
      payloadCols: Seq[String],
      horizonSeconds: Long = 3600L)(
      onEnriched: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, statePath, leftFilter, rightFilter,
        keyCol, timeCol, tieCol, payloadCols, horizonSeconds)(
        enriched => onEnriched(enriched, batchId))
}
