package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.AnnIvf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAnnSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"),
      r.getAs[Double]("sim"), r.getAs[Long]("rank"))).toSeq

  test("streamed index == batch-built index probe after N micro-batches") {
    implicit val ctx = spark.sqlContext
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = AnnIvf.trainCentroids(emb, k = 16, iters = 2)
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_sann").resolve("index").toString

    // stream the corpus in 3 micro-batches through the foreachBatch sink
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(StreamingAnn.sink(indexPath, centroids)).start()
    try {
      val all = emb.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val queries = emb.filter(col("vec_id") < 8)
    val streamed = rows(AnnIvf.annTopKIndexed(
      queries, StreamingAnn.loadIndex(spark, indexPath), centroids,
      kNeighbors = 5, nprobe = 10))
    val batchBuilt = rows(AnnIvf.annTopKIndexed(
      queries, AnnIvf.buildIvfIndex(emb, centroids), centroids,
      kNeighbors = 5, nprobe = 10))
    assert(streamed == batchBuilt)

    // at-least-once replay: re-delivering a committed batchId is a no-op
    val n0 = StreamingAnn.loadIndex(spark, indexPath).count()
    assert(!StreamingAnn.appendBatch(
      emb.limit(10).select("vec_id", "embedding"), indexPath, centroids, 0L))
    assert(StreamingAnn.loadIndex(spark, indexPath).count() == n0)

    // crash before the rename leaves only a hidden temp dir: readers
    // ignore it and the retry cleans it up and commits
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(indexPath, ".batch=99.tmp"))
    assert(StreamingAnn.loadIndex(spark, indexPath).count() == n0)
    assert(StreamingAnn.appendBatch(
      emb.filter(col("vec_id") < 0).select("vec_id", "embedding"),
      indexPath, centroids, 99L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(indexPath, ".batch=99.tmp")))
    assert(StreamingAnn.loadIndex(spark, indexPath).count() == n0)
  }

  test("streamed PQ code table == batch-built PQ index probe") {
    implicit val ctx = spark.sqlContext
    import graft.ext.AnnPq
    val emb = Tables(spark, sfDir, "embeddings")
    val cb = AnnPq.trainCodebooks(emb, m = 8, ksub = 16, iters = 1)
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_spq").resolve("index").toString

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(StreamingAnn.pqSink(indexPath, cb)).start()
    try {
      val all = emb.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      all.grouped((all.length + 1) / 2).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val queries = emb.filter(col("vec_id") < 4)
    val streamed = rows(AnnPq.topKIndexed(queries,
      StreamingAnn.loadPqIndex(spark, indexPath), emb, cb,
      kNeighbors = 5, rerank = 30))
    val batchBuilt = rows(AnnPq.topKIndexed(queries,
      AnnPq.buildPqIndex(emb, cb), emb, cb, kNeighbors = 5, rerank = 30))
    assert(streamed == batchBuilt)

    // replay no-op + empty-path degrade, the IVF contracts verbatim
    assert(!StreamingAnn.appendPqBatch(
      emb.limit(5).select("vec_id", "embedding"), indexPath, cb, 0L))
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_spq_empty").resolve("index").toString
    assert(StreamingAnn.loadPqIndex(spark, fresh).count() == 0)
  }

  test("an index path with no committed batch reads as an empty index") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = AnnIvf.trainCentroids(emb, k = 4, iters = 1)
    val idx = StreamingAnn.loadIndex(spark, "/tmp/graft_sann_never_written")
    assert(idx.count() == 0)
    assert(idx.columns.toSeq == Seq("cell", "nn_id", "nn_emb", "nn_n"))
    assert(AnnIvf.annTopKIndexed(emb.limit(3), idx, centroids,
      kNeighbors = 3, nprobe = 2).count() == 0)
  }
}
