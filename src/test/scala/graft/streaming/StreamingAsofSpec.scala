package graft.streaming

import java.sql.Timestamp

import graft.GraftSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAsofSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def matches(df: DataFrame): Map[Long, Option[Long]] =
    df.select(col("event_id"), col("asof_event_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap

  test("matches span batches; horizon evicts deposits; same-batch visible") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Timestamp)]
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sasof").resolve("store").toString

    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Map[Long, Option[Long]])]()
    val q = mem.toDF().toDF("event_id", "kind", "user_id", "ts")
      .writeStream
      .foreachBatch(StreamingAsof.sink(statePath,
        leftFilter = col("kind") === "purchase",
        rightFilter = col("kind") === "click",
        keyCol = "user_id", timeCol = "ts", tieCol = "event_id",
        payloadCols = Seq("event_id", "ts"),
        horizonSeconds = 3600L) { (enriched, batchId) =>
        emitted += batchId -> matches(enriched)
      })
      .start()
    try {
      // batch 0: a click then a purchase of the same user IN THE SAME
      // batch (deposit must be visible), plus a purchase with no click
      mem.addData(
        (1L, "click", 7L, ts("2015-11-13 10:00:00")),
        (2L, "purchase", 7L, ts("2015-11-13 10:05:00")),
        (3L, "purchase", 8L, ts("2015-11-13 10:05:00")))
      q.processAllAvailable()
      // batch 1: a purchase whose click arrived a batch ago (only the
      // store can know), and a fresher click for user 7
      mem.addData(
        (4L, "purchase", 7L, ts("2015-11-13 10:20:00")),
        (5L, "click", 7L, ts("2015-11-13 10:30:00")))
      q.processAllAvailable()
      // batch 2: far past the horizon — user 7's clicks are expired
      // state, the purchase must NOT match them
      mem.addData((6L, "purchase", 7L, ts("2015-11-13 20:00:00")))
      q.processAllAvailable()

      assert(emitted.toList == List(
        0L -> Map(2L -> Some(1L), 3L -> None),
        1L -> Map(4L -> Some(1L)),
        2L -> Map(6L -> None)))

      // the store is horizon-bounded: the expired clicks are gone
      val stored = spark.read.parquet(statePath)
        .select("event_id").as[Long].collect().toSet
      assert(stored == Set.empty[Long])
    } finally q.stop()
  }

  test("re-delivered deposits dedupe in the store; emit failure leaves it untouched") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sasof_fail").resolve("store").toString
    val b0 = Seq(
      (1L, "click", 7L, ts("2015-11-13 10:00:00")),
      (1L, "click", 7L, ts("2015-11-13 10:00:00")) // at-least-once source
    ).toDF("event_id", "kind", "user_id", "ts")
    StreamingAsof.processBatch(b0, statePath,
      col("kind") === "purchase", col("kind") === "click",
      "user_id", "ts", "event_id", Seq("event_id", "ts"))(_ => ())
    assert(spark.read.parquet(statePath).count() == 1L, "duplicate deposit stored")

    // emit failure: store must not advance past the crash
    val b1 = Seq((2L, "click", 7L, ts("2015-11-13 10:10:00")))
      .toDF("event_id", "kind", "user_id", "ts")
    intercept[RuntimeException] {
      StreamingAsof.processBatch(b1, statePath,
        col("kind") === "purchase", col("kind") === "click",
        "user_id", "ts", "event_id", Seq("event_id", "ts"))(_ =>
        throw new RuntimeException("sink down"))
    }
    assert(spark.read.parquet(statePath)
      .select("event_id").as[Long].collect().toSet == Set(1L),
      "store advanced past a failed emit")

    // the replay of the same batch then lands the deposit exactly once
    StreamingAsof.processBatch(b1, statePath,
      col("kind") === "purchase", col("kind") === "click",
      "user_id", "ts", "event_id", Seq("event_id", "ts"))(_ => ())
    assert(spark.read.parquet(statePath)
      .select("event_id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
