package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.FuzzyJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingFuzzySpec extends GraftSpec {
  import spark.implicits._

  test("streamed block index == batch-built probe after N micro-batches; " +
    "replay is absorbed") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_sfuzz").resolve("index").toString

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamingFuzzy.sink(indexPath)).start()
    try {
      val all = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = pairs(FuzzyJoin.editDistancePairsIndexed(
      docs, StreamingFuzzy.loadIndex(spark, indexPath)))
    assert(streamed == pairs(FuzzyJoin.editDistancePairs(docs)))
    assert(streamed.nonEmpty, "fixture corpus must contain fuzzy pairs")

    // replayed batch id: no-op, index unchanged
    assert(!StreamingFuzzy.appendBatch(
      docs.select("doc_id", "text").limit(5), indexPath, batchId = 0L))
    assert(pairs(FuzzyJoin.editDistancePairsIndexed(
      docs, StreamingFuzzy.loadIndex(spark, indexPath))) == streamed)
  }

  test("an unstarted index path reads as empty, and probing it pairs " +
    "nothing") {
    val empty = StreamingFuzzy.loadIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_sfuzz_e")
        .resolve("never").toString)
    assert(empty.count() == 0)
    val probe = Seq((1L, "some probe text here")).toDF("doc_id", "text")
    assert(FuzzyJoin.editDistancePairsIndexed(probe, empty).count() == 0)
  }

  test("a string-keyed corpus degrades to an empty index of the SAME id " +
    "type — no silent Long coercion in the probe comparisons") {
    import org.apache.spark.sql.types.StringType
    val empty = StreamingFuzzy.loadIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_sfuzz_s")
        .resolve("never").toString,
      idType = StringType)
    assert(empty.schema("doc_id").dataType == StringType)
    val probe = Seq(("doc-a", "some probe text here")).toDF("doc_id", "text")
    assert(FuzzyJoin.editDistancePairsIndexed(probe, empty).count() == 0)
  }
}
