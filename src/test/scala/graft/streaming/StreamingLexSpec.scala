package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.TextSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingLexSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched"),
      r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSeq

  test("streamed lexical index == batch-built probe after N micro-batches; " +
    "replay and crash-temp are absorbed") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, sfDir, "documents")
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_slex").resolve("index").toString

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamingLex.sink(indexPath)).start()
    try {
      val all = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    // probe-time N/avgdl/df see every committed batch — identical ranking
    // to the self-contained corpus scan and to a batch-built index
    val self = rows(TextSearch.bm25TopK(
      docs, "doc_id", "text", "dup key window", k = 20))
    val streamed = rows(TextSearch.bm25TopKIndexed(
      StreamingLex.loadIndex(spark, indexPath), "dup key window",
      k = 20, idCol = "doc_id"))
    assert(streamed == self)

    // at-least-once replay: a committed batchId is a no-op
    val n0 = StreamingLex.loadIndex(spark, indexPath).count()
    assert(!StreamingLex.appendBatch(docs.limit(5), indexPath, 0L))
    assert(StreamingLex.loadIndex(spark, indexPath).count() == n0)

    // crash before rename leaves only a hidden temp dir — ignored by
    // readers, cleaned and committed by the retry (empty batch = marker)
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(indexPath, ".batch=99.tmp"))
    assert(StreamingLex.loadIndex(spark, indexPath).count() == n0)
    assert(StreamingLex.appendBatch(
      docs.filter(col("doc_id") < 0), indexPath, 99L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(indexPath, ".batch=99.tmp")))
    assert(StreamingLex.loadIndex(spark, indexPath).count() == n0)
  }

  test("a not-yet-started index path degrades to an empty probe") {
    val empty = java.nio.file.Files
      .createTempDirectory("graft_slex_empty").resolve("never").toString
    assert(TextSearch.bm25TopKIndexed(
      StreamingLex.loadIndex(spark, empty), "dup key window", k = 5).count() == 0)
  }
}
