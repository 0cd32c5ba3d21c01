package graft.streaming

import graft.{GraftSpec, Tables}
import graft.analytics.StatsTests
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingWelchSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  private def batchDirs(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (!p.exists()) Seq.empty
    else p.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("batch=")).map(_.getName).toSeq.sorted
  }

  test("streamed moment partials fold to the batch Welch screen; " +
    "replay is a no-op; compaction preserves moments and the marker") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, sfDir, "documents")
      .filter($"source".isNotNull && $"n_chars".isNotNull)
      .select($"source", $"n_chars".cast("long").as("n_chars"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_swelch").resolve("index").toString

    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("source", "n_chars")
      .writeStream.foreachBatch(
        StreamingWelch.sink(path, col("source"), col("n_chars")))
      .start()
    try {
      val all = docs.collect().map(r => (r.getString(0), r.getLong(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def screenRows = StreamingWelch.screen(spark, path)
      .orderBy($"g").collect().toSeq.map(_.toSeq)
    val expected = StatsTests.groupWelchZ(docs, $"source", $"n_chars")
      .orderBy($"g").collect().toSeq.map(_.toSeq)
    assert(screenRows == expected, "streamed fold == one batch pass")

    // replayed batch id: additive moments must not double-count
    assert(!StreamingWelch.appendBatch(
      docs.limit(5), path, 0L, col("source"), col("n_chars")))
    assert(screenRows == expected)

    // compaction folds to one partition under the max batch id
    assert(batchDirs(path).size == 3, batchDirs(path))
    assert(StreamingWelch.compactIndex(spark, path) > 0L)
    assert(batchDirs(path) == Seq("batch=2"), batchDirs(path))
    assert(screenRows == expected)
    assert(!StreamingWelch.appendBatch(
      docs.limit(5), path, 2L, col("source"), col("n_chars")))
    assert(screenRows == expected)

    // a genuinely new batch moves the screen like a batch recount
    val extra = Seq(("zzz-new-source", 100000L), ("zzz-new-source", 90L))
      .toDF("source", "n_chars")
    assert(StreamingWelch.appendBatch(
      extra, path, 3L, col("source"), col("n_chars")))
    val grown = StatsTests.groupWelchZ(
      docs.unionByName(extra), $"source", $"n_chars")
      .orderBy($"g").collect().toSeq.map(_.toSeq)
    assert(screenRows == grown, "post-append fold == batch over union")
  }
}
