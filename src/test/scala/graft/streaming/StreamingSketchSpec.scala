package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSketchSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def batchDirs(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (!p.exists()) Seq.empty
    else p.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("batch=")).map(_.getName).toSeq.sorted
  }

  test("streamed sub-sketches fold to the one-shot batch sketch; " +
    "replay is a no-op; compaction preserves cells and the marker") {
    implicit val ctx = spark.sqlContext
    val ev = Tables(spark, sfDir, "events")
      .filter($"user_id".isNotNull)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ssketch").resolve("index").toString

    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("user_id")
      .writeStream.foreachBatch(
        StreamingSketch.sink(path, "user_id", depth = 4, width = 32))
      .start()
    try {
      val all = ev.select("user_id").collect().map(_.getLong(0))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def cells = StreamingSketch.loadSketch(spark, path).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = Sketches
      .cmsBuild(ev, col("user_id"), depth = 4, width = 32)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells == expected, "streamed fold == one batch pass")

    // the estimate readout rides the folded sketch
    val keys = ev.groupBy($"user_id").count()
      .orderBy($"count".desc, $"user_id").limit(3)
    val est = StreamingSketch.estimate(spark, path,
        keys.select("user_id"), "user_id", depth = 4, width = 32)
      .join(keys, Seq("user_id")).collect()
    est.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"streamed CMS undercounted: $r"))

    // replayed batch id: additive cells must not double-count
    assert(!StreamingSketch.appendBatch(ev.limit(5), path, 0L, "user_id",
      depth = 4, width = 32))
    assert(cells == expected)

    // compaction folds to one partition under the max batch id
    assert(batchDirs(path).size == 3, batchDirs(path))
    assert(StreamingSketch.compactIndex(spark, path) > 0L)
    assert(batchDirs(path) == Seq("batch=2"), batchDirs(path))
    assert(cells == expected)
    assert(!StreamingSketch.appendBatch(ev.limit(5), path, 2L, "user_id",
      depth = 4, width = 32))
    assert(cells == expected)
  }

  test("an empty or missing index estimates 0 for every key") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ssketch_empty").resolve("none").toString
    val got = StreamingSketch.estimate(spark, path,
      Seq(7L, 9L).toDF("user_id"), "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 0L, 9L -> 0L), s"$got")
  }
}
