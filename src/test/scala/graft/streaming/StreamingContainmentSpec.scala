package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingContainmentSpec extends GraftSpec {
  import spark.implicits._

  test("streamed posting index == batch screen after N micro-batches; " +
    "replay is absorbed; unstarted index screens nothing") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_scont").resolve("index").toString

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamingContainment.sink(indexPath))
      .start()
    try {
      val all = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // screening the whole corpus against the streamed index reproduces
    // the self-contained pairs (the q214 probe==index law, streamed)
    val streamed = rows(StreamingContainment.screen(docs, spark,
      indexPath, threshold = 0.5))
    assert(streamed ==
      rows(Dedup.containmentPairs(docs, "doc_id", "text", 0.5)))
    assert(streamed.nonEmpty, "fixture corpus must contain contained pairs")

    // replayed batch id: no-op, screen unchanged
    assert(!StreamingContainment.appendBatch(
      docs.select("doc_id", "text").limit(5), indexPath, batchId = 0L))
    assert(rows(StreamingContainment.screen(docs, spark, indexPath,
      threshold = 0.5)) == streamed)

    // an unstarted path reads as empty: a batch screened against it can
    // only pair within itself
    val emptyPath = java.nio.file.Files
      .createTempDirectory("graft_scont_e").resolve("never").toString
    assert(StreamingContainment.loadIndex(spark, emptyPath).count() == 0)
    val lone = Seq((900L, "totally novel text with no twin")).toDF(
      "doc_id", "text")
    assert(StreamingContainment.screen(lone, spark, emptyPath,
      threshold = 0.5).count() == 0)
  }
}
