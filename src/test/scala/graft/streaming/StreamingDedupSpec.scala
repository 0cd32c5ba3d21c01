package graft.streaming

import java.sql.Timestamp

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends GraftSpec {
  import spark.implicits._

  private val baseA = "the quick brown fox jumps over the lazy dog near the river"
  private val nearA1 = "the quick brown fox jumps over the lazy cat near the river"
  private val nearA2 = "the quick brown fox jumps over the lazy dog near the stream"
  private val textB = "completely different words about spark catalyst codegen and shuffles"
  private val textC = "yet another unrelated document describing partition pruning strategy"

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ids(df: DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().toSeq.sorted

  test("near-dup re-deliveries drop across batches; state is horizon-bounded") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup").resolve("store").toString

    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Seq[Long])]()
    val q = mem.toDF().toDF("doc_id", "text", "time")
      .writeStream
      .foreachBatch(StreamingDedup.sink(statePath,
        threshold = 0.5, horizonSeconds = 3600L) { (survivors, batchId) =>
        emitted += batchId -> ids(survivors)
      })
      .start()
    try {
      // batch 0: a near-dup pair within the batch plus one unrelated doc —
      // within-batch LSH dedup keeps the least id of the pair
      mem.addData((1L, baseA, ts("2015-11-13 10:00:00")),
        (2L, nearA1, ts("2015-11-13 10:00:30")),
        (3L, textB, ts("2015-11-13 10:01:00")))
      q.processAllAvailable()
      // batch 1: a near-dup RE-DELIVERY of doc 1's text (cross-batch — only
      // the rep store can catch it) and one genuinely new doc
      mem.addData((4L, nearA2, ts("2015-11-13 10:10:00")),
        (5L, textC, ts("2015-11-13 10:10:30")))
      q.processAllAvailable()
      // batch 2: far past the horizon — the store has evicted doc 1's rep,
      // so the same text survives again (bounded state, by design)
      mem.addData((6L, baseA, ts("2015-11-13 20:00:00")))
      q.processAllAvailable()

      assert(emitted.toList == List(
        0L -> Seq(1L, 3L), 1L -> Seq(5L), 2L -> Seq(6L)))

      // the store is bounded by the horizon: only batch 2's survivor is
      // inside it now — everything earlier was evicted, not accumulated
      val stored = spark.read.parquet(statePath)
        .select("id").as[Long].collect().toSet
      assert(stored == Set(6L))
    } finally q.stop()
  }

  test("emit failure leaves the store untouched; the retry re-emits (no loss)") {
    // at-least-once: the downstream emit runs BEFORE the store advances, so
    // a sink failure must not burn the batch's survivors into the store —
    // the replay recomputes and re-emits them
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_fail").resolve("store").toString
    val batch = Seq(
      (1L, baseA, ts("2015-11-13 10:00:00")),
      (2L, textB, ts("2015-11-13 10:00:30"))
    ).toDF("doc_id", "text", "time")

    val boom = intercept[RuntimeException] {
      StreamingDedup.processBatch(batch, statePath, threshold = 0.5) { _ =>
        throw new RuntimeException("downstream sink down")
      }
    }
    assert(boom.getMessage.contains("sink down"))
    assert(!new java.io.File(statePath).exists()) // store never advanced

    var retried: Seq[Long] = Nil
    StreamingDedup.processBatch(batch, statePath, threshold = 0.5) { s =>
      retried = ids(s)
    }
    assert(retried == Seq(1L, 2L)) // re-emitted in full — nothing lost
  }

  test("replay after a successful emit converges: no duplicates, store stable") {
    // crash AFTER the store advance but before the offsets commit: the
    // replayed batch finds its own reps in the store and emits nothing —
    // its docs were already emitted before the advance
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_replay").resolve("store").toString
    val batch = Seq(
      (1L, baseA, ts("2015-11-13 10:00:00")),
      (2L, textB, ts("2015-11-13 10:00:30"))
    ).toDF("doc_id", "text", "time")

    var first: Seq[Long] = Nil
    StreamingDedup.processBatch(batch, statePath, threshold = 0.5)(s => first = ids(s))
    assert(first == Seq(1L, 2L))

    var replay: Seq[Long] = Nil
    StreamingDedup.processBatch(batch, statePath, threshold = 0.5)(s => replay = ids(s))
    assert(replay.isEmpty)
    assert(spark.read.parquet(statePath)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("half-finished store swaps are recovered, not treated as empty state") {
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup_swap")
    val statePath = base.resolve("store").toString
    val batch1 = Seq((1L, baseA, ts("2015-11-13 10:00:00")))
      .toDF("doc_id", "text", "time")
    StreamingDedup.processBatch(batch1, statePath, threshold = 0.5)(_ => ())

    // simulate a crash between the delete and the rename: only .swap-tmp
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(statePath),
      new org.apache.hadoop.fs.Path(statePath + ".swap-tmp"))
    assert(!new java.io.File(statePath).exists())

    // next batch must recover the advanced store and still drop the dup
    var out: Seq[Long] = Nil
    StreamingDedup.processBatch(
      Seq((9L, nearA1, ts("2015-11-13 10:05:00"))).toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)(s => out = ids(s))
    assert(out.isEmpty) // doc 1's rep survived the interrupted swap
  }

  test("a dest torn mid-delete (marker gone) is replaced by the complete tmp") {
    // advance un-commits dest (atomic marker delete) before the
    // NON-atomic recursive delete — so the worst crash inside that delete
    // leaves a marker-less, partially-deleted dest plus a complete tmp.
    // Recovery must promote the tmp, never trust the torn dest.
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup_tear")
    val statePath = base.resolve("store").toString
    StreamingDedup.processBatch(
      Seq((1L, baseA, ts("2015-11-13 10:00:00"))).toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)(_ => ())
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // the complete advanced store becomes the tmp; dest is rebuilt as the
    // mid-delete wreck: one junk file, marker already removed
    assert(fs.rename(new Path(statePath), new Path(statePath + ".swap-tmp")))
    val wreck = java.nio.file.Files.createDirectory(base.resolve("store"))
    java.nio.file.Files.write(wreck.resolve("part-00000.parquet"),
      "half-deleted".getBytes)

    var out: Seq[Long] = Nil
    StreamingDedup.processBatch(
      Seq((9L, nearA1, ts("2015-11-13 10:05:00"))).toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)(s => out = ids(s))
    assert(out.isEmpty) // doc 1's rep survived via the promoted tmp
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(statePath + ".swap-tmp")))
    assert(spark.read.parquet(statePath)
      .select("id").as[Long].collect().toSet == Set(1L))
  }

  test("a torn .swap-tmp (no _SUCCESS) is discarded, never promoted") {
    // crash MID-write of the very first store: tmp exists with a partial
    // file and no _SUCCESS marker, no store yet. Promoting it would wedge
    // every later read; recovery must discard it and start clean.
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup_torn")
    val statePath = base.resolve("store").toString
    val torn = java.nio.file.Files.createDirectory(base.resolve("store.swap-tmp"))
    java.nio.file.Files.write(torn.resolve("part-00000.parquet"),
      "not parquet".getBytes)

    var out: Seq[Long] = Nil
    StreamingDedup.processBatch(
      Seq((1L, baseA, ts("2015-11-13 10:00:00"))).toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)(s => out = ids(s))
    assert(out == Seq(1L))
    assert(!java.nio.file.Files.exists(torn)) // torn write discarded
    assert(spark.read.parquet(statePath)
      .select("id").as[Long].collect().toSet == Set(1L))
  }

  test("the rep store doubles as a batch dedup index (one shared format)") {
    import graft.ext.Dedup
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_idx").resolve("store").toString
    // the stream accepts two docs; its store is now the settled corpus
    StreamingDedup.processBatch(
      Seq((1L, baseA, ts("2015-11-13 10:00:00")),
          (2L, textB, ts("2015-11-13 10:00:30")))
        .toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)(_ => ())

    val index = StreamingDedup.storeAsDedupIndex(spark.read.parquet(statePath))
    val batch = Seq(
      (10L, baseA),  // byte-identical to a streamed doc → exact-stage drop
      (11L, nearA1), // near-dup of a streamed doc → near-stage drop
      (12L, textC)   // fresh → survives
    ).toDF("doc_id", "text")
    val r = Dedup.dedupIncrementalIndexed(batch, index, "doc_id", "text",
      threshold = 0.5)
    assert(ids(r.accepted) == Seq(12L))
    // identical to the self-contained screen against the emitted corpus
    assert(ids(Dedup.dedupIncremental(batch,
      Seq((1L, baseA), (2L, textB)).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5)) == Seq(12L))
  }

  test("a pre-ghash store migrates in place: no crash, old reps still veto") {
    import graft.ext.Dedup
    import org.apache.spark.sql.functions.{col, size => asize}
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_mig").resolve("store").toString
    // hand-write an old-schema store (id, ts, sh, sig — no ghash) with a
    // commit marker, exactly what a pre-migration build left behind
    val oldRows = Seq((1L, ts("2015-11-13 10:00:00"), baseA))
      .toDF("id", "ts", "text")
      .select(col("id"), col("ts"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(asize(col("sh")) > 0)
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 32))
    oldRows.write.mode("overwrite").parquet(statePath)
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(statePath, "_GRAFT_COMMIT"), true).close()

    // the next batch reads the old store without crashing AND its rep
    // still vetoes a near-dup re-delivery
    var out: Seq[Long] = Nil
    StreamingDedup.processBatch(
      Seq((9L, nearA1, ts("2015-11-13 10:05:00")),
          (10L, textB, ts("2015-11-13 10:05:30")))
        .toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)(s => out = ids(s))
    assert(out == Seq(10L)) // 9 dropped against the migrated rep
    // the advanced store is on the new schema: old row carries NULL ghash,
    // the new survivor carries a real one
    val stored = spark.read.parquet(statePath)
      .select("id", "ghash").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(stored.keySet == Set(1L, 10L))
    assert(stored(1L).isEmpty && stored(10L).nonEmpty)
  }

  test("processBatch: short docs pass through and never enter the store") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_short").resolve("store").toString
    val batch = Seq(
      (1L, "two words", ts("2015-11-13 10:00:00")),
      (2L, baseA, ts("2015-11-13 10:00:10"))
    ).toDF("doc_id", "text", "time")
    var s1: Seq[Long] = Nil
    StreamingDedup.processBatch(batch, statePath, threshold = 0.5)(s => s1 = ids(s))
    assert(s1 == Seq(1L, 2L))
    assert(spark.read.parquet(statePath)
      .select("id").as[Long].collect().toSet == Set(2L))

    // an identical short doc re-delivered later is NOT near-dup-deduped
    // (no shingles — compose with dedupStream for exact-key dedup)
    var s2: Seq[Long] = Nil
    StreamingDedup.processBatch(
      Seq((3L, "two words", ts("2015-11-13 10:05:00")))
        .toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)(s => s2 = ids(s))
    assert(s2 == Seq(3L))
  }

  test("a pre-shingle-fix store repairs on load: re-deliveries still screened") {
    import org.apache.spark.sql.functions._
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_shfix").resolve("store").toString
    // 5 tokens → 3 real trigrams; the PRE-FIX shingler also persisted the
    // phantom trailing window "delta epsilon " for the padded ingest.
    // Stale Jaccard vs a trimmed re-delivery is 3/4 = 0.75 < the 0.8
    // threshold — without the on-load repair the duplicate would re-emit.
    val text = "alpha beta gamma delta epsilon"
    val realSh =
      Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon")
    Seq((1L, ts("2015-11-13 10:00:00"))).toDF("id", "ts")
      .withColumn("ghash", md5(lit(text + " ").cast("binary")))
      .withColumn("sh", typedLit(realSh :+ "delta epsilon "))
      .withColumn("sig", graft.ext.Dedup.minhashSignature(col("sh"), 32))
      .write.parquet(statePath)
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(statePath, "_GRAFT_COMMIT"), true).close()

    var emitted: Seq[Long] = null
    StreamingDedup.processBatch(
      Seq((2L, text, ts("2015-11-13 10:10:00"))).toDF("doc_id", "text", "time"),
      statePath)(s => emitted = ids(s))
    assert(emitted.isEmpty) // repaired store row vetoes (Jaccard 1.0)

    // the advance rewrote the repaired row: the phantom window is gone
    val storedSh = spark.read.parquet(statePath)
      .select("sh").collect().map(_.getSeq[String](0).sorted).toSeq
    assert(storedSh == Seq(realSh.sorted))
  }

  test("an idle batch still persists the on-load repair of a pre-fix store") {
    import org.apache.spark.sql.functions._
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_idlefix").resolve("store").toString
    val text = "alpha beta gamma delta epsilon"
    val realSh =
      Seq("alpha beta gamma", "beta gamma delta", "gamma delta epsilon")
    Seq((1L, ts("2015-11-13 10:00:00"))).toDF("id", "ts")
      .withColumn("ghash", md5(lit(text + " ").cast("binary")))
      .withColumn("sh", typedLit(realSh :+ "delta epsilon "))
      .withColumn("sig", graft.ext.Dedup.minhashSignature(col("sh"), 32))
      .write.parquet(statePath)
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(statePath, "_GRAFT_COMMIT"), true).close()

    // an EMPTY batch adds no reps and evicts nothing — before the repair
    // disjunct joined changedStore, this skipped the swap and left the
    // phantom window on disk indefinitely (storeAsDedupIndex readers of
    // the raw parquet kept seeing pre-fix shingles)
    var emitted: Seq[Long] = null
    StreamingDedup.processBatch(
      Seq.empty[(Long, String, Timestamp)].toDF("doc_id", "text", "time"),
      statePath)(s => emitted = ids(s))
    assert(emitted.isEmpty)
    val storedSh = spark.read.parquet(statePath)
      .select("sh").collect().map(_.getSeq[String](0).sorted).toSeq
    assert(storedSh == Seq(realSh.sorted),
      "idle batch left pre-fix shingles on disk")

    // and the NEXT idle batch is a true no-op again: disk is clean, so
    // the repair disjunct stops forcing swaps (no standing write churn)
    val mtime = fs.getFileStatus(new org.apache.hadoop.fs.Path(statePath))
      .getModificationTime
    StreamingDedup.processBatch(
      Seq.empty[(Long, String, Timestamp)].toDF("doc_id", "text", "time"),
      statePath)(s => emitted = ids(s))
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(statePath))
      .getModificationTime == mtime, "clean store was re-swapped on idle")
  }
}
