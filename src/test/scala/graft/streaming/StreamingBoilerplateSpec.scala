package graft.streaming

import graft.GraftSpec
import graft.ext.Boilerplate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingBoilerplateSpec extends GraftSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "A", "Home | About\nunique one\n(c) A"),
    (2L, "A", "Home | About\nunique two\n(c) A"),
    (3L, "A", "Home | About\nunique three\n(c) A"),
    (4L, "B", "page four\nHome | About"),
    (5L, "B", "page five")
  ).toDF("doc_id", "source", "text")

  private def snap(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("streamed stripes fold to the from-scratch index; the indexed cut " +
    "over them equals the batch cut; replays are absorbed") {
    implicit val ctx = spark.sqlContext
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_sboil").resolve("index").toString

    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("doc_id", "source", "text")
      .writeStream.foreachBatch(StreamingBoilerplate.sink(indexPath))
      .start()
    try {
      mem.addData((1L, "A", "Home | About\nunique one\n(c) A"),
        (2L, "A", "Home | About\nunique two\n(c) A"))
      q.processAllAvailable()
      mem.addData((3L, "A", "Home | About\nunique three\n(c) A"),
        (4L, "B", "page four\nHome | About"),
        (5L, "B", "page five"))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamingBoilerplate.loadIndex(spark, indexPath)
    val scratch = Boilerplate.buildBoilerplateIndex(corpus)
    assert(streamed.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      scratch.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet)

    // the streamed index feeds the SAME cut the batch index does
    assert(snap(Boilerplate.stripBoilerplateIndexed(corpus, streamed,
        minDocs = 3))
      == snap(Boilerplate.stripBoilerplate(corpus, minDocs = 3)))

    // at-least-once replay: re-committing batch 0 is a no-op
    assert(!StreamingBoilerplate.appendBatch(
      corpus.filter($"doc_id" <= 2L), indexPath, batchId = 0L))
    assert(StreamingBoilerplate.loadIndex(spark, indexPath)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet == scratch.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet)
  }

  test("an unstarted index path reads as empty — nothing is boilerplate") {
    val empty = StreamingBoilerplate.loadIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_sboil_e")
        .resolve("never").toString)
    assert(empty.count() == 0)
    assert(snap(Boilerplate.stripBoilerplateIndexed(corpus, empty))
      .forall(_._3 == 0L)) // n_cut 0 everywhere
  }
}
