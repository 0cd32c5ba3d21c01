package graft.streaming

import java.sql.Timestamp

import graft.{GraftSpec, Tables}
import graft.analytics.Survival
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSurvivalSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed spans fold to the batch curve; replays are absorbed " +
    "algebraically; an unstarted store degrades to an empty curve") {
    implicit val ctx = spark.sqlContext
    val ev = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ssurv").resolve("state").toString

    // unstarted path: empty curve, declared id type
    assert(StreamingSurvival.curve(spark, path, 12).count() == 0L)

    val mem = MemoryStream[(Long, Timestamp)]
    val q = mem.toDF().toDF("user_id", "ts")
      .writeStream.foreachBatch(StreamingSurvival.sink(path)).start()
    try {
      val all = ev.select("user_id", "ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = StreamingSurvival.curve(spark, path, 12)
      .collect().toSeq
    val batch = Survival.kaplanMeier(ev, bucketSeconds = 3600L,
      horizonBuckets = 12).collect().toSeq
    assert(streamed == batch, "streamed store reproduces the batch curve")

    // replay: re-deliver an arbitrary slice — min/max absorb it, the
    // store (and therefore the curve) is unchanged
    val before = StreamingSurvival.loadSpans(spark, path)
      .orderBy("user").collect().toSeq
    StreamingSurvival.appendBatch(ev.limit(40), path)
    val after = StreamingSurvival.loadSpans(spark, path)
      .orderBy("user").collect().toSeq
    assert(after == before, "idempotent replay")
    assert(StreamingSurvival.curve(spark, path, 12).collect().toSeq ==
      batch)
  }

  test("a string-keyed store reads back string-keyed before its first " +
    "commit (the StreamingFuzzy id-type lesson)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ssurv2").resolve("state").toString
    val empty = StreamingSurvival.loadSpans(spark, path,
      org.apache.spark.sql.types.StringType)
    assert(empty.schema("user").dataType ==
      org.apache.spark.sql.types.StringType)
    // and a string-keyed batch commits + folds
    val b = Seq(("u1", Timestamp.valueOf("2024-01-01 00:00:00")),
      ("u1", Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("user_id", "ts")
    StreamingSurvival.appendBatch(b, path,
      idType = org.apache.spark.sql.types.StringType)
    val spans = StreamingSurvival.loadSpans(spark, path,
      org.apache.spark.sql.types.StringType).collect()
    assert(spans.length == 1 && spans.head.getString(0) == "u1" &&
      spans.head.getLong(2) - spans.head.getLong(1) == 24L)
  }
}
