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
 *     `horizonSeconds` behind the high-water mark are expired BEFORE
 *     matching, so state is bounded by arrival rate × horizon and an
 *     expired rep stops vetoing new arrivals — the same guarantee a
 *     watermark gives built-in streaming state.
 *
 * The store holds one row per surviving doc inside the horizon — id, event
 * time, shingle set, MinHash signature — in parquet at `statePath` (any
 * Hadoop FS; HDFS/S3 on a cluster). At 100 TB/day the store stays a
 * bucket-equi-join away from each micro-batch and its size is set by the
 * horizon, not the feed. It is read ONCE per batch (lineage-cut) and
 * advanced by a crash-safe swap write with both half-states recovered on
 * the next batch, so a crash can never silently reset the store to empty
 * (mechanics — commit marker, recovery, rename caveats — in the shared
 * [[StateSwap]] helper).
 *
 * Delivery contract (at-least-once, like any `foreachBatch` sink): the
 * batch's survivors are EMITTED BEFORE the store advances. A failure in
 * the downstream emit leaves the store untouched, so the replayed batch
 * recomputes and re-emits the same survivors (duplicates possible, loss
 * not); a crash after the store advanced replays into a store that
 * already holds the batch's reps, so the replay emits nothing — and its
 * docs were already emitted before the advance. Cuts are scoped
 * ([[graft.ext.Materialize.scoped]]): concurrent streams or batch jobs on
 * the same session keep their own checkpoints.
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
   * Process one micro-batch: compute the batch's near-dup survivors, hand
   * them to `emit` (which must fully consume them — they are unpersisted
   * on return), then advance the store at `statePath`. Driver-side
   * scalars: one `first()` for the event-time high-water mark — metadata,
   * not data.
   */
  def processBatch(
      batch: DataFrame, statePath: String,
      idCol: String = "doc_id", textCol: String = "text", timeCol: String = "time",
      threshold: Double = 0.8, horizonSeconds: Long = 3600L, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2)(emit: DataFrame => Unit): Unit = {
    val spark = batch.sparkSession
    Materialize.scoped(spark) {
      // 1. within-batch near-dup dedup; checkpointed because both the
      // output and the rep projection below read it (LSH is the expensive
      // part — never run it twice)
      val local = Materialize.cut(
        Dedup.dedup(batch, idCol, textCol, threshold, n, bands, rowsPerBand))

      // survivors' representative rows; cut BEFORE the band explode so the
      // signature is computed once, not once per band (projection collapse).
      // ghash (the same 128-bit content hash the batch index keys on) rides
      // along so the store doubles as a batch dedup index — see
      // [[storeAsDedupIndex]].
      val rep = Materialize.cut(
        local.select(
            col(idCol).as("id"), col(timeCol).as("ts"),
            md5(col(textCol).cast("binary")).as("ghash"),
            Dedup.shingles(col(textCol), n).as("sh"))
          .filter(size(col("sh")) > 0)
          .withColumn("sig", Dedup.minhashSignature(col("sh"), bands * rowsPerBand)))

      // 2. store load — exactly one disk scan (checkpointed), then evict:
      // the high-water mark over stored and batch event times defines the
      // horizon, and a rep that has fallen out of it is expired state — it
      // must stop vetoing new arrivals BEFORE the match, exactly as a
      // watermark expires built-in state
      val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
      StateSwap.recover(fs, statePath)
      // migrate a store written before ghash joined the schema: the
      // stream itself never reads ghash (its match is sig buckets +
      // shingle verify), so NULL is fully functional — the rows just
      // don't contribute to storeAsDedupIndex until they age out of
      // the horizon and post-migration rows replace them
      val rawStore: Option[DataFrame] =
        if (fs.exists(new Path(statePath))) {
          val raw = spark.read.parquet(statePath)
          Some(if (raw.columns.contains("ghash")) raw
            else raw.withColumn("ghash", lit(null).cast("string")))
        } else None
      val store0 = Materialize.cut(rawStore match {
        case Some(withGhash) =>
          // repair rows persisted before the boundary-empty shingle fix
          // (no-op on clean rows): a stale stored set holds phantom
          // windows that depress Jaccard, so a near-dup re-delivery of a
          // whitespace-padded doc would evade the cross-batch screen
          // until the row aged out of the horizon. Rows whose repaired
          // set empties are below the n-token floor under current
          // semantics — a rebuilt store would not contain them, so they
          // leave (their ghash never screened cross-batch: the stream's
          // match is shingle-based)
          Dedup.repairPreFixShingles(withGhash, n, bands, rowsPerBand)
            .filter(size(col("sh")) > 0)
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rep.schema)
      })
      val hwm = store0.select(col("ts"))
        .unionAll(rep.select(col("ts")))
        .agg(max(col("ts")).as("hwm")).first().getTimestamp(0)
      val store =
        if (hwm == null) store0
        else store0.filter(col("ts") >= lit(
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
          Dedup.jaccard(col("new_sh"), col("old_sh")) >= threshold)
        .select(col("new_id").as(idCol)).distinct()

      val survivors = Materialize.cut(local.join(dropped, Seq(idCol), "left_anti"))

      // 3. EMIT FIRST: a downstream failure must leave the store untouched
      // so the replay re-emits these survivors instead of losing them
      // (every cut above is released by the enclosing scope, exception or
      // not — emit must fully consume before returning)
      emit(survivors)

      // 4. advance the store — live (post-eviction) rows plus this batch's
      // surviving reps — by [[StateSwap]] (every input is already
      // lineage-cut, so no extra materialization is needed and the plan
      // never reads the directory being replaced). A batch that
      // contributed no reps and evicted nothing is a no-op — skip the
      // swap entirely rather than re-write the full store (and re-open
      // the swap's crash window) on every idle trigger — UNLESS the
      // on-load repair changed rows: then disk still holds pre-fix
      // shingles that store0 only fixed in memory, and skipping would
      // leave them stale indefinitely (storeAsDedupIndex readers see the
      // raw parquet). The repair disjunct scans the raw store's sh
      // column, so it sits LAST: || short-circuits, and the scan is paid
      // only on the idle batches the other two disjuncts would skip —
      // at most once per pre-fix store, since the swap it forces
      // persists the repair.
      def repairChangedRows: Boolean = rawStore.exists(
        _.filter(Dedup.hasPreFixShingles(n)).limit(1).count() > 0)
      val changedStore = rep.limit(1).count() > 0 ||
        (hwm != null && store.count() != store0.count()) ||
        repairChangedRows
      if (hwm != null && changedStore)
        StateSwap.advance(fs, statePath, store.unionByName(
          rep.join(survivors.select(col(idCol).as("id")), Seq("id"), "left_semi")))
    }
  }

  /**
   * View a streaming rep store as a BATCH incremental-dedup index (the
   * [[graft.ext.Dedup.buildDedupIndex]] schema: `ghash, sh, sig`), so a
   * batch job can screen against what the stream has emitted without
   * re-deriving anything — one shared format for both screens:
   *
   * {{{
   * val idx = StreamingDedup.storeAsDedupIndex(spark.read.parquet(statePath))
   * Dedup.dedupIncrementalIndexed(dailyBatch, idx, "doc_id", "text", 0.8)
   * }}}
   *
   * Scope caveats, all inherent to what the store IS: it covers only the
   * event-time horizon (evicted reps no longer screen — by design, that
   * is the stream's own guarantee); only shingleable docs (short docs
   * pass through the stream without entering the store, so the batch
   * exact stage cannot see them either); and only reps written AFTER the
   * ghash column joined the store schema — migrated pre-ghash rows carry
   * NULL and are excluded here (a NULL key can never match either screen
   * stage, so keeping them would only pay dead candidate-join work),
   * which means they don't veto batch duplicates until the horizon
   * retires them. The stream must have run with the same `n`/`bands`/
   * `rowsPerBand` as the batch screen. A store last written before the
   * boundary-empty shingle fix is read here RAW — either let the stream
   * process ONE batch (its load repairs stale rows, and the swap
   * persists the repair even when the batch itself adds and evicts
   * nothing) or pass the frame through
   * [[graft.ext.Dedup.repairPreFixShingles]] first.
   */
  def storeAsDedupIndex(store: DataFrame): DataFrame =
    store.filter(col("ghash").isNotNull).select("ghash", "sh", "sig")

  /**
   * `foreachBatch` adapter: `stream.writeStream.foreachBatch(sink(...))`.
   * `onSurvivors` is the downstream emit — it runs BEFORE the store
   * advances (see the delivery contract in the object doc) and must fully
   * consume the survivor DataFrame.
   */
  def sink(
      statePath: String,
      idCol: String = "doc_id", textCol: String = "text", timeCol: String = "time",
      threshold: Double = 0.8, horizonSeconds: Long = 3600L, n: Int = 3,
      bands: Int = 16, rowsPerBand: Int = 2)(
      onSurvivors: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, statePath, idCol, textCol, timeCol,
        threshold, horizonSeconds, n, bands, rowsPerBand)(
        survivors => onSurvivors(survivors, batchId))
}
