package graft.streaming

import graft.{GraftSpec, Tables}
import graft.analytics.Trend
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingTrendSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private def x = col("xs").cast("double")
  private def y = col("value")

  private def fitRows(path: String): Seq[Seq[Any]] =
    StreamingTrend.fit(spark, path)
      .orderBy($"g").collect().map(_.toSeq).toSeq

  private def batchDirs(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (!p.exists()) Seq.empty
    else p.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("batch=")).map(_.getName).toSeq.sorted
  }

  test("streamed moment partials fold to the batch fit; replay is a " +
    "no-op; compaction preserves the fit AND the replay marker") {
    implicit val ctx = spark.sqlContext
    // pre-derive the regressor so the stream carries plain columns
    val ev = Tables(spark, sfDir, "events")
      .filter($"event_type".isNotNull && $"ts".isNotNull &&
        $"value".isNotNull)
      .select($"event_type",
        floor(($"ts".cast("long") - lit(1704067200L)) / lit(3600.0))
          .cast("long").as("xs"),
        $"value")
    val path = java.nio.file.Files
      .createTempDirectory("graft_strend").resolve("index").toString

    val mem = MemoryStream[(String, Long, Double)]
    val q = mem.toDF().toDF("event_type", "xs", "value")
      .writeStream
      .foreachBatch(StreamingTrend.sink(path, "event_type", x, y)).start()
    try {
      val all = ev.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val expected = Trend.trend(ev, "event_type", x, y)
      .orderBy($"event_type").collect().map(_.toSeq).toSeq
    assert(fitRows(path) == expected)

    // at-least-once replay: a committed batchId must not double-count
    assert(!StreamingTrend.appendBatch(ev.limit(9), path, 0L,
      "event_type", x, y))
    assert(fitRows(path) == expected)

    // compaction folds to one partition under the max batch id (the
    // replay-skippable marker), fit unchanged
    assert(batchDirs(path).size == 3, batchDirs(path))
    assert(StreamingTrend.compactIndex(spark, path) > 0L)
    assert(batchDirs(path) == Seq("batch=2"), batchDirs(path))
    assert(fitRows(path) == expected)
    assert(!StreamingTrend.appendBatch(ev.limit(9), path, 2L,
      "event_type", x, y))
    assert(fitRows(path) == expected)

    // a genuinely new batch shifts the fit like a batch refit would
    val extra = Seq(("zz_new", 1L, 1.0), ("zz_new", 2L, 3.0),
      ("zz_new", 3L, 5.0)).toDF("event_type", "xs", "value")
    assert(StreamingTrend.appendBatch(extra, path, 3L, "event_type", x, y))
    val after = StreamingTrend.fit(spark, path)
      .filter($"g" === "zz_new").collect().head
    assert(after.getDouble(2) == 2.0 && after.getDouble(3) == -1.0,
      s"new-group fit wrong: $after")
    val refit = Trend.trend(ev.unionByName(extra
        .select($"event_type", $"xs", $"value")), "event_type", x, y)
      .orderBy($"event_type").collect().map(_.toSeq).toSeq
    assert(fitRows(path) == refit)
  }

  test("an empty or missing index reads as an empty fit; compaction " +
    "no-ops at 0") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_strend_empty").resolve("nothing").toString
    assert(StreamingTrend.fit(spark, path).count() == 0L)
    assert(StreamingTrend.compactIndex(spark, path) == 0L)
  }
}
