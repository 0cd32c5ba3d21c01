package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.DataPrep
import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingFunnelSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  // the q345 rule chain, over whatever text column the stream carries
  private def rules: Seq[(String, Column)] = {
    val tk = graft.ext.TextOps.tokens(col("text"))
    val wc = size(tk)
    Seq(
      "min_words_20" -> (wc >= 20),
      "ttr_0.35" ->
        (size(array_distinct(tk)).cast("double") / wc >= 0.35),
      "has_stopword" ->
        (array_contains(tk, "the") || array_contains(tk, "a")))
  }

  private def batchDirs(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (!p.exists()) Seq.empty
    else p.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("batch=")).map(_.getName).toSeq.sorted
  }

  test("streamed per-batch censuses fold to the batch funnel; replay is " +
      "a no-op; compaction preserves both the funnel and the marker") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, sfDir, "documents")
    val path = java.nio.file.Files
      .createTempDirectory("graft_sfunnel").resolve("index").toString

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamingFunnel.sink(path, rules)).start()
    try {
      val all = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def funnelRows = StreamingFunnel.loadFunnel(spark, path)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val expected = DataPrep.filterFunnel(docs, rules)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(funnelRows == expected)
    // the funnel actually discriminates on this corpus (not all-pass)
    assert(expected.map(_._3).sum > 0L)

    // replayed batch id: additive marginals must not double-count
    assert(!StreamingFunnel.appendBatch(docs.limit(5), path, 0L, rules))
    assert(funnelRows == expected)

    // compaction folds to one partition under the max batch id
    assert(batchDirs(path).size == 3, batchDirs(path))
    assert(StreamingFunnel.compactIndex(spark, path) == rules.size.toLong)
    assert(batchDirs(path) == Seq("batch=2"), batchDirs(path))
    assert(funnelRows == expected)
    assert(!StreamingFunnel.appendBatch(docs.limit(5), path, 2L, rules))
    assert(funnelRows == expected)
  }
}
