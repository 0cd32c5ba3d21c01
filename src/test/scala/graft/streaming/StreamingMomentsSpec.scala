package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.Probe
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingMomentsSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def batchDirs(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (!p.exists()) Seq.empty
    else p.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("batch=")).map(_.getName).toSeq.sorted
  }

  test("streamed moment partials fold to the batch ridge fit; replay " +
    "is a no-op; compaction preserves moments and the marker") {
    implicit val ctx = spark.sqlContext
    val emb = Tables(spark, sfDir, "embeddings")
      .filter($"embedding".isNotNull && $"label".isNotNull)
    val y = when(col("label") === 0, 1.0)
      .when(col("label").isNotNull, 0.0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_smoments").resolve("index").toString

    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val q = mem.toDF().toDF("vec_id", "embedding", "label")
      .writeStream.foreachBatch(
        StreamingMoments.sink(path, "embedding", y, dim = 64))
      .start()
    try {
      val all = emb.select("vec_id", "embedding", "label").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def streamedFit = StreamingMoments.fit(spark, path, dim = 64).toSeq
    val expected = Probe.fitRidge(emb, "embedding", y, dim = 64).toSeq
    assert(streamedFit == expected, "streamed fold == one batch pass")

    // replayed batch id: additive moments must not double-count
    assert(!StreamingMoments.appendBatch(
      emb.limit(5), path, 0L, "embedding", y, 64))
    assert(streamedFit == expected)

    // compaction folds to one partition under the max batch id
    assert(batchDirs(path).size == 3, batchDirs(path))
    assert(StreamingMoments.compactIndex(spark, path) > 0L)
    assert(batchDirs(path) == Seq("batch=2"), batchDirs(path))
    assert(streamedFit == expected)
    assert(!StreamingMoments.appendBatch(
      emb.limit(5), path, 2L, "embedding", y, 64))
    assert(streamedFit == expected)

    // a genuinely new batch moves the fit like a batch recount
    val extra = emb.limit(40)
      .withColumn("vec_id", col("vec_id") + 100000L)
    assert(StreamingMoments.appendBatch(
      extra, path, 3L, "embedding", y, 64))
    val grown = Probe.fitRidge(
      emb.unionByName(extra), "embedding", y, dim = 64).toSeq
    assert(streamedFit == grown, "post-append fold == batch over union")
  }
}
