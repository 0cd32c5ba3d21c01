package graft.streaming

import java.sql.Timestamp

import graft.GraftSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends GraftSpec {
  import spark.implicits._

  private val baseA = "the quick brown fox jumps over the lazy dog near the river"
  private val nearA1 = "the quick brown fox jumps over the lazy cat near the river"
  private val nearA2 = "the quick brown fox jumps over the lazy dog near the stream"
  private val textB = "completely different words about spark catalyst codegen and shuffles"
  private val textC = "yet another unrelated document describing partition pruning strategy"

  private def ts(s: String) = Timestamp.valueOf(s)

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
        emitted += batchId -> survivors.select("doc_id").as[Long].collect().toSeq.sorted
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

  test("processBatch: replaying a batch after a crash emits no duplicates") {
    // foreachBatch is at-least-once: a sink failure after the store advance
    // replays the batch against the already-updated store. The replayed
    // docs must all drop as near-dups of their own stored reps — replay
    // converges instead of re-emitting.
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_replay").resolve("store").toString
    val batch = Seq(
      (1L, baseA, ts("2015-11-13 10:00:00")),
      (2L, textB, ts("2015-11-13 10:00:30"))
    ).toDF("doc_id", "text", "time")

    val first = StreamingDedup.processBatch(batch, statePath, threshold = 0.5)
    assert(first.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    first.unpersist(true)

    val replay = StreamingDedup.processBatch(batch, statePath, threshold = 0.5)
    assert(replay.count() == 0L)
    replay.unpersist(true)
    // and the store did not grow from the replay
    assert(spark.read.parquet(statePath)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("processBatch: short docs pass through and never enter the store") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sdedup_short").resolve("store").toString
    val batch = Seq(
      (1L, "two words", ts("2015-11-13 10:00:00")),
      (2L, baseA, ts("2015-11-13 10:00:10"))
    ).toDF("doc_id", "text", "time")
    val s1 = StreamingDedup.processBatch(batch, statePath, threshold = 0.5)
    assert(s1.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    s1.unpersist(true)
    assert(spark.read.parquet(statePath)
      .select("id").as[Long].collect().toSet == Set(2L))

    // an identical short doc re-delivered later is NOT near-dup-deduped
    // (no shingles — compose with dedupStream for exact-key dedup)
    val s2 = StreamingDedup.processBatch(
      Seq((3L, "two words", ts("2015-11-13 10:05:00")))
        .toDF("doc_id", "text", "time"),
      statePath, threshold = 0.5)
    assert(s2.select("doc_id").as[Long].collect().toSet == Set(3L))
    s2.unpersist(true)
  }
}
