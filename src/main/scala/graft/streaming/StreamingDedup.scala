package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Materialize}

/**
 * Streaming NEAR-duplicate dedup — the continuous-ingest twin of the batch
 * [[graft.ext.Dedup.dedup]] (X1), completing the streaming dedup surface:
 * [[StreamingAnalytics.dedupStream]] drops exact-key re-deliveries; this
 * drops re-deliveries whose TEXT is a near-duplicate (exact Jaccard ≥
 * threshold over word shingles) of a document already emitted within the
 * event-time horizon.
 *
 * Shape: a `foreachBatch` stage over a representative store. Spark's
 * built-in stateful operators key state by exact group — there is no
 * built-in "fuzzy key" state — so the idiomatic construction is micro-batch
 * joins against a compact store of surviving representatives:
 *
 *  1. within-batch: [[graft.ext.Dedup.dedup]] (exact-collapse skew guard +
 *     banded LSH + exact-Jaccard verify, least id survives);
 *  2. cross-batch: LSH band buckets of the batch survivors equi-joined
 *     against the store's buckets (never all-pairs), candidates verified by
 *     exact Jaccard against the stored shingle sets — matches drop;
 *  3. eviction: store rows whose event time has fallen more than
 *     `horizonSeconds` behind the high-water mark are deleted, so state is
 *     bounded by arrival rate × horizon, not stream length — the same
 *     guarantee a watermark gives built-in streaming state.
 *
 * The store holds one row per surviving doc inside the horizon — id, event
 * time, shingle set, MinHash signature — in parquet at `statePath` (any
 * Hadoop FS; HDFS/S3 on a cluster). At 100 TB/day the store stays a
 * bucket-equi-join away from each micro-batch and its size is set by the
 * horizon, not the feed.
 *
 * Semantics across restarts: the store is rewritten once per batch AFTER
 * survivors are computed; replaying a batch against an already-updated
 * store drops the replayed docs as near-dups of themselves — re-delivery
 * converges rather than duplicating (at-least-once sink contract, the
 * standard `foreachBatch` position).
 *
 * Docs with fewer than `n` tokens have no shingles, pass through as
 * survivors, and never enter the store (near-dup of a <n-token text is
 * ill-defined); compose with [[StreamingAnalytics.dedupStream]] for
 * exact-key dedup of short docs.
 *
 * The reference has no streaming surface at all (its pipeline is a
 * Lambda-triggered daily batch, `/root/reference/sree-etl-tdk-lambda.py`);
 * this is part of the SURVEY.md §2.10/§2.11 extension set.
 */
object StreamingDedup {

  /**
   * Process one micro-batch: returns the batch's near-dup survivors
   * (materialized — consume then `unpersist()`), and advances the store at
   * `statePath` (evict past-horizon reps, append this batch's surviving
   * reps). Driver-side scalars: one `first()` for the event-time high-water
   * mark — metadata, not data. Calls `Materialize.release` on exit, the
   * per-unit-of-work lifecycle Bench/Verify use.
   */
  def processBatch(
      batch: DataFrame, statePath: String,
      idCol: String = "doc_id", textCol: String = "text", timeCol: String = "time",
      threshold: Double = 0.8, horizonSeconds: Long = 3600L, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val spark = batch.sparkSession
    try {
      // 1. within-batch near-dup dedup; checkpointed because both the
      // output and the rep projection below read it (LSH is the expensive
      // part — never run it twice)
      val local = Dedup.dedup(batch, idCol, textCol, threshold, n, bands, rowsPerBand)
        .localCheckpoint()

      // survivors' representative rows; cut BEFORE the band explode so the
      // signature is computed once, not once per band (projection collapse)
      val rep = local.select(
          col(idCol).as("id"), col(timeCol).as("ts"),
          Dedup.shingles(col(textCol), n).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("sig", Dedup.minhashSignature(col("sh"), bands * rowsPerBand))
        .localCheckpoint()

      // 2. store lookup. EVICT FIRST: the high-water mark over stored and
      // batch event times defines the horizon, and a rep that has fallen
      // out of it is expired state — it must stop vetoing new arrivals
      // BEFORE the match, exactly as a watermark expires built-in state.
      val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rawStore =
        if (fs.exists(new Path(statePath))) spark.read.parquet(statePath)
        else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          rep.schema)
      val hwm = rawStore.select(col("ts"))
        .unionAll(rep.select(col("ts")))
        .agg(max(col("ts")).as("hwm")).first().getTimestamp(0)
      val store =
        if (hwm == null) rawStore
        else rawStore.filter(col("ts") >= lit(
          new java.sql.Timestamp(hwm.getTime - horizonSeconds * 1000L)))

      // band-bucket equi-join new reps vs live stored reps, exact-Jaccard
      // verify the candidates only
      val cand = Dedup.bandBuckets(rep, "id", "sig", bands, rowsPerBand)
        .select(col("id").as("new_id"), col("band"), col("bucket"))
        .join(Dedup.bandBuckets(store, "id", "sig", bands, rowsPerBand)
          .select(col("id").as("old_id"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .select("new_id", "old_id").distinct()
      val dropped = cand
        .join(rep.select(col("id").as("new_id"), col("sh").as("new_sh")), "new_id")
        .join(store.select(col("id").as("old_id"), col("sh").as("old_sh")), "old_id")
        .filter(size(array_union(col("new_sh"), col("old_sh"))) > 0 &&
          size(array_intersect(col("new_sh"), col("old_sh"))).cast("double")
            / size(array_union(col("new_sh"), col("old_sh"))).cast("double")
            >= threshold)
        .select(col("new_id").as(idCol)).distinct()

      val survivors = local.join(dropped, Seq(idCol), "left_anti").localCheckpoint()

      // 3. advance the store: live (post-eviction) rows plus this batch's
      // surviving reps. Materialize the new store BEFORE the overwrite —
      // its plan reads the old store files.
      if (hwm != null) {
        val newStore = store.unionByName(
            rep.join(survivors.select(col(idCol).as("id")), Seq("id"), "left_semi"))
          .localCheckpoint()
        newStore.write.mode("overwrite").parquet(statePath)
        newStore.unpersist(blocking = true)
      }
      local.unpersist(blocking = true)
      rep.unpersist(blocking = true)
      survivors
    } finally Materialize.release(spark)
  }

  /**
   * `foreachBatch` adapter: `stream.writeStream.foreachBatch(sink(...))`.
   * `onSurvivors` must fully consume the survivor DataFrame (it is
   * unpersisted when the callback returns).
   */
  def sink(
      statePath: String,
      idCol: String = "doc_id", textCol: String = "text", timeCol: String = "time",
      threshold: Double = 0.8, horizonSeconds: Long = 3600L, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2)(
      onSurvivors: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val survivors = processBatch(batch, statePath, idCol, textCol, timeCol,
        threshold, horizonSeconds, n, bands, rowsPerBand)
      try onSurvivors(survivors, batchId)
      finally survivors.unpersist(blocking = true)
    }
}
