package graft.streaming

import graft.GraftSpec
import graft.analytics.Rollup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingRollupSpec extends GraftSpec {
  import spark.implicits._

  private def snapshot(df: DataFrame) =
    df.orderBy("day", "event_type").collect().map(r =>
      (r.getDate(0).toString, r.getString(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSeq

  private def ev(rows: Seq[(Long, Long, String, Double)]): DataFrame =
    rows.toDF("event_id", "sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec") + 1704067200L)) // 2024-01-01
      .drop("sec")

  test("streamed rollup == batch rollup after N micro-batches; replayed " +
    "batch ids are absorbed") {
    implicit val ctx = spark.sqlContext
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sroll").resolve("state").toString
    val all = (0L until 30L).map(i =>
      (i, i * 7200L, if (i % 3 == 0) "click" else "view", i.toDouble))

    val mem = MemoryStream[(Long, Long, String, Double)]
    val q = mem.toDF().toDF("event_id", "sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec") + 1704067200L))
      .drop("sec")
      .writeStream.foreachBatch(StreamingRollup.sink(statePath)).start()
    try {
      all.grouped(10).foreach { slice =>
        mem.addData(slice)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = snapshot(StreamingRollup.loadRollup(spark, statePath))
    assert(streamed == snapshot(Rollup.dailyRollup(ev(all))))
    assert(streamed.map(_._3).sum == 30L)

    // at-least-once replay: a batch id at or below the high-water mark
    // must not double-count
    val replay = StreamingRollup.appendBatch(ev(all.take(10)), statePath,
      batchId = 0L)
    assert(!replay)
    assert(snapshot(StreamingRollup.loadRollup(spark, statePath)) == streamed)

    // a genuinely new batch id still merges
    assert(StreamingRollup.appendBatch(ev(Seq((99L, 0L, "click", 5.0))),
      statePath, batchId = 999L))
    val after = snapshot(StreamingRollup.loadRollup(spark, statePath))
    assert(after.map(_._3).sum == 31L)
  }

  test("the high-water mark survives a zero-cell merge: a NULL-ts-only " +
    "first batch still absorbs its replay") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sroll_nullts").resolve("store").toString
    // NULL-ts events roll up to ZERO cells — before the marker row, the
    // _bid mark had no row to ride and the batch id was forgotten
    val nullTs = Seq((1L, "click", 5.0)).toDF("event_id", "event_type", "value")
      .withColumn("ts", lit(null).cast("timestamp"))
    assert(StreamingRollup.appendBatch(nullTs, statePath, batchId = 7L))
    assert(StreamingRollup.loadRollup(spark, statePath).count() == 0L)
    // the replay of batch 7 must be a no-op, and so must any id <= 7
    assert(!StreamingRollup.appendBatch(
      ev(Seq((1L, 0L, "click", 5.0))), statePath, batchId = 7L))
    assert(StreamingRollup.loadRollup(spark, statePath).count() == 0L)
    // a genuinely new id merges, and the marker row never leaks into data
    assert(StreamingRollup.appendBatch(
      ev(Seq((2L, 0L, "click", 3.0))), statePath, batchId = 8L))
    val cells = snapshot(StreamingRollup.loadRollup(spark, statePath))
    assert(cells.map(_._3).sum == 1L && cells.forall(_._2 != null))
  }

  test("an unstarted state path reads as an empty rollup") {
    val empty = StreamingRollup.loadRollup(spark,
      java.nio.file.Files.createTempDirectory("graft_sroll_e")
        .resolve("never").toString)
    assert(empty.count() == 0
      && empty.columns.toSeq == Seq("day", "event_type", "n", "min_v", "max_v"))
  }
}
