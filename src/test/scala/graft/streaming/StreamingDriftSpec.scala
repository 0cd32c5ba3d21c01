package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.CorpusCompare
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDriftSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  private def batchDirs(path: String): Seq[String] = {
    val p = new java.io.File(path)
    if (!p.exists()) Seq.empty
    else p.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("batch=")).map(_.getName).toSeq.sorted
  }

  test("streamed term counts fold to the batch divergence; replay is a " +
    "no-op; compaction preserves both counts and the replay marker") {
    implicit val ctx = spark.sqlContext
    val docs = Tables(spark, sfDir, "documents")
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 =!= 0)
    val refCounts = CorpusCompare.termCounts(even)
    val path = java.nio.file.Files
      .createTempDirectory("graft_sdrift").resolve("index").toString

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(StreamingDrift.sink(path)).start()
    try {
      val all = odd.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def driftRow = StreamingDrift
      .driftAgainst(spark, path, refCounts).collect().head.toSeq
    val expected = CorpusCompare.jsDivergence(even, odd)
      .collect().head.toSeq
    assert(driftRow == expected)

    // replayed batch id: additive counts must not double-count
    assert(!StreamingDrift.appendBatch(odd.limit(5), path, 0L))
    assert(driftRow == expected)

    // compaction folds to one partition under the max batch id
    assert(batchDirs(path).size == 3, batchDirs(path))
    assert(StreamingDrift.compactIndex(spark, path) > 0L)
    assert(batchDirs(path) == Seq("batch=2"), batchDirs(path))
    assert(driftRow == expected)
    assert(!StreamingDrift.appendBatch(odd.limit(5), path, 2L))
    assert(driftRow == expected)

    // the χ² view reads the SAME folded counts and equals the batch
    // homogeneity test over the same two corpora (q170's algebra)
    val chi = StreamingDrift.driftChi2(spark, path, refCounts)
      .collect().head
    val batchChi = graft.analytics.StatsTests.chiSquared(
        even.select($"doc_id", $"text")
          .withColumn("_c", org.apache.spark.sql.functions.lit("a"))
          .unionByName(odd.select($"doc_id", $"text")
            .withColumn("_c", org.apache.spark.sql.functions.lit("b")))
          .select($"_c", org.apache.spark.sql.functions.explode(
            graft.ext.TextOps.tokens($"text")).as("term")),
        $"_c", $"term")
      .collect().head
    assert(chi.getLong(0) == batchChi.getLong(0), "total tokens")
    assert(chi.getLong(3) == batchChi.getLong(3), "dof")
    assert(chi.getDouble(4) == batchChi.getDouble(4), "chi2")

    // a genuinely new batch moves the live side like a batch recount
    val extra = Seq((99999L, "zzz-drift zzz-drift zzz-drift"))
      .toDF("doc_id", "text")
    assert(StreamingDrift.appendBatch(extra, path, 3L))
    val refit = CorpusCompare.jsDivergence(even,
        odd.select($"doc_id", $"text").unionByName(extra))
      .collect().head.toSeq
    assert(driftRow == refit)
  }

  test("an empty index reads as empty counts; drift against it is the " +
    "all-reference divergence; compaction no-ops at 0") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_sdrift_e").resolve("nothing").toString
    assert(StreamingDrift.loadCounts(spark, path).count() == 0L)
    assert(StreamingDrift.compactIndex(spark, path) == 0L)
    // a NON-uniform reference: an empty stream smooths to uniform, so a
    // uniform reference would (correctly) measure zero drift
    val ref = CorpusCompare.termCounts(
      Seq((1L, "a a a b")).toDF("doc_id", "text"))
    val row = StreamingDrift.driftAgainst(spark, path, ref)
      .collect().head
    // union vocab = reference vocab; the stream side is all-smoothing
    assert(row.getLong(0) == 2L && row.getLong(2) == 0L)
    assert(row.getDouble(5) > 0.0)
  }
}
