package graft.streaming

import graft.{GraftSpec, Tables}
import graft.ext.Privacy
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

class StreamingPrivacySpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val quasi = Seq("c_nationkey", "c_mktsegment")
  private val store = StructType(Seq(
    StructField("c_nationkey", IntegerType),
    StructField("c_mktsegment", StringType),
    StructField("class_size", LongType)))

  test("streamed class partials fold to the batch k-anonymity " +
    "profile; replay is a no-op; empty index reads empty") {
    implicit val ctx = spark.sqlContext
    val cust = Tables(spark, sfDir, "customer")
    val path = java.nio.file.Files
      .createTempDirectory("graft_spriv").resolve("index").toString

    assert(StreamingPrivacy.profile(spark, path, store, quasi,
      ks = Seq(2, 5)).count() == 0L, "unstarted index audits nothing")

    val mem = MemoryStream[(Int, String)]
    val q = mem.toDF().toDF("c_nationkey", "c_mktsegment")
      .writeStream.foreachBatch(StreamingPrivacy.sink(path, quasi))
      .start()
    try {
      val all = cust.select("c_nationkey", "c_mktsegment").collect()
        .map(r => (r.getInt(0), r.getString(1)))
      all.grouped((all.length + 2) / 3).foreach { slice =>
        mem.addData(slice.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def streamed = StreamingPrivacy.profile(spark, path, store, quasi,
      ks = Seq(2, 5, 10, 25)).collect().toSeq
    val expected = Privacy.kAnonymityProfile(cust,
      quasi.map(col), ks = Seq(2, 5, 10, 25)).collect().toSeq
    assert(streamed == expected, "streamed fold == one batch pass")

    // replayed batch id: additive class sizes must not double-count
    assert(!StreamingPrivacy.appendBatch(cust.limit(5), path, 0L, quasi))
    assert(streamed == expected)
  }
}
