package graft.streaming

import java.sql.Timestamp

import graft.{GraftSpec, Tables}
import graft.analytics.LogAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingRetentionSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed user-weeks fold to the batch retention matrix; " +
    "replays are absorbed algebraically; an unstarted store is empty") {
    implicit val ctx = spark.sqlContext
    val ev = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val path = java.nio.file.Files
      .createTempDirectory("graft_sret").resolve("state").toString

    assert(StreamingRetention.matrix(spark, path).count() == 0L)

    val mem = MemoryStream[(Long, Timestamp)]
    val q = mem.toDF().toDF("user_id", "ts")
      .writeStream.foreachBatch(StreamingRetention.sink(path)).start()
    try {
      val all = ev.select("user_id", "ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("cohort_week", "week_offset").collect().toSeq
    val streamed = rows(StreamingRetention.matrix(spark, path))
    val batch = rows(LogAnalytics.cohortRetention(ev))
    assert(streamed == batch, "streamed store reproduces the batch matrix")

    // replay: re-deliver a slice — the distinct union absorbs it
    val before = StreamingRetention.loadWeeks(spark, path)
      .orderBy("user_id", "w").collect().toSeq
    StreamingRetention.appendBatch(ev.limit(40), path)
    val after = StreamingRetention.loadWeeks(spark, path)
      .orderBy("user_id", "w").collect().toSeq
    assert(after == before, "idempotent replay")
    assert(rows(StreamingRetention.matrix(spark, path)) == batch)
  }
}
