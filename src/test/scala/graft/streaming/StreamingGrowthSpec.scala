package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingGrowthSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private val width = 100L

  private def curveRows(path: String): Seq[Seq[Any]] =
    StreamingGrowth.curve(spark, path, width)
      .orderBy($"bucket").collect().map(_.toSeq).toSeq

  private def batchDirs(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (!p.exists()) Seq.empty
    else p.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("batch=")).map(_.getName).toSeq.sorted
  }

  test("streamed growth partials fold to the batch curve; replay is a " +
    "no-op; compaction preserves the curve AND the last replay marker") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, sfDir, "documents")
    val path = java.nio.file.Files
      .createTempDirectory("graft_sgrow").resolve("index").toString

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamingGrowth.sink(path, width)).start()
    try {
      val all = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val expected = TextOps.vocabGrowth(docs, "doc_id", "text", width)
      .orderBy($"bucket").collect().map(_.toSeq).toSeq
    assert(curveRows(path) == expected)

    // at-least-once replay: a committed batchId is a no-op — the
    // additive stats MUST NOT double-count
    assert(!StreamingGrowth.appendBatch(docs.limit(7), path, 0L, width))
    assert(curveRows(path) == expected)

    // compaction folds the batch partitions into one, the curve is
    // byte-identical, and the SURVIVING partition is the max batch id —
    // the one Structured Streaming could still replay
    val ids = batchDirs(path)
    assert(ids.size == 3, s"expected 3 committed batches, got $ids")
    val n = StreamingGrowth.compactIndex(spark, path)
    assert(n > 0L)
    assert(batchDirs(path) == Seq("batch=2"), batchDirs(path))
    assert(curveRows(path) == expected)

    // the replayed last batch still skips after compaction...
    assert(!StreamingGrowth.appendBatch(docs.limit(7), path, 2L, width))
    assert(curveRows(path) == expected)
    // ...while genuinely new batches keep appending and folding
    val extra = Seq((100000L, "zzz-unseen zzz-unseen")).toDF("doc_id", "text")
    assert(StreamingGrowth.appendBatch(extra, path, 3L, width))
    val grown = StreamingGrowth.curve(spark, path, width)
    assert(grown.filter($"bucket" === 100000L / width).count() == 1L)
    // one unseen term minted in the new bucket, nothing else changed
    assert(grown.agg(org.apache.spark.sql.functions.sum($"new_terms"))
      .head().getLong(0) ==
      expected.map(_(3).asInstanceOf[Long]).sum + 1L)

    // a second compaction reproduces the grown curve exactly
    val grownRows = curveRows(path)
    StreamingGrowth.compactIndex(spark, path)
    assert(curveRows(path) == grownRows)
  }

  test("an empty or missing index reads as an empty curve; compaction " +
    "no-ops at 0") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_sgrow_empty").resolve("nothing").toString
    assert(StreamingGrowth.curve(spark, path, width).count() == 0L)
    assert(StreamingGrowth.compactIndex(spark, path) == 0L)
  }
}
