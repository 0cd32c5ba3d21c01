package graft.streaming

import java.sql.Timestamp

import graft.{GraftSpec, Tables}
import graft.analytics.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingActivesSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed user-days fold to the batch rolling actives; replays " +
    "are absorbed algebraically; an unstarted store is empty") {
    implicit val ctx = spark.sqlContext
    val ev = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val path = java.nio.file.Files
      .createTempDirectory("graft_sact").resolve("state").toString

    assert(StreamingActives.rollingActives(spark, path, 7).count() == 0L)

    val mem = MemoryStream[(Long, Timestamp)]
    val q = mem.toDF().toDF("user_id", "ts")
      .writeStream.foreachBatch(StreamingActives.sink(path)).start()
    try {
      val all = ev.select("user_id", "ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("day").collect().toSeq
    val streamed = rows(StreamingActives.rollingActives(spark, path, 7))
    val batch = rows(TimeSeries.rollingDistinctUsers(ev, "user_id",
      "ts", 7))
    assert(streamed == batch, "streamed store reproduces the batch view")

    val before = StreamingActives.loadUserDays(spark, path)
      .orderBy("_u", "_d").collect().toSeq
    StreamingActives.appendBatch(ev.limit(40), path)
    val after = StreamingActives.loadUserDays(spark, path)
      .orderBy("_u", "_d").collect().toSeq
    assert(after == before, "idempotent replay")
    assert(rows(StreamingActives.rollingActives(spark, path, 7)) == batch)
  }
}
