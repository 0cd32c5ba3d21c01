package graft.streaming

import java.sql.Timestamp

import graft.GraftSpec
import graft.ext.DataPrep
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming corpus-prep composition: [[DataPrep.screen]] (stateless
  * per-row scrub + quality filters — stream-safe by construction) feeding
  * [[StreamingDedup.processBatch]] inside one foreachBatch. This is the
  * micro-batch twin of the batch `DataPrep.prepare` front half, running
  * against the same operators — no streaming-only reimplementation to
  * drift. */
class StreamingPrepSpec extends GraftSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog near the quiet river today"
  private val goodDup =
    "the quick brown fox jumps over the lazy cat near the quiet river today"
  private val spam = Array.fill(30)("buy now").mkString(" ")
  private val mailed =
    "completely different words about spark catalyst codegen shuffles " +
      "please contact someone@example.com regarding the nightly delivery"

  test("stream screen → near-dup store: junk dropped, emails masked, dups dropped") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sprep").resolve("store").toString
    val cfg = DataPrep.Config(maskEmails = true,
      minQuality = 0.1, maxDupWordFrac = 0.5, maxTopBigram = 5L)

    val emitted = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = mem.toDF().toDF("doc_id", "text", "time")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingDedup.processBatch(
            DataPrep.screen(batch, "text", cfg), statePath,
            threshold = 0.5) { out =>
          emitted ++= out.select(col("doc_id"), col("text"))
            .collect().map(r => (r.getLong(0), r.getString(1)))
        }
      }
      .start()
    try {
      mem.addData(
        (1L, good, Timestamp.valueOf("2024-01-01 10:00:00")),
        (2L, spam, Timestamp.valueOf("2024-01-01 10:00:01")),
        (3L, mailed, Timestamp.valueOf("2024-01-01 10:00:02")))
      q.processAllAvailable()
      // batch 2: a near-dup of doc 1 arrives later — the store drops it
      mem.addData((4L, goodDup, Timestamp.valueOf("2024-01-01 10:10:00")))
      q.processAllAvailable()
    } finally q.stop()

    val byId = emitted.toMap
    assert(byId.keySet == Set(1L, 3L), s"got ${emitted.map(_._1)}")
    assert(byId(3L).contains("<email>") && !byId(3L).contains("@example.com"))
  }

  test("the reference-LM gate composes into the same foreachBatch: " +
    "out-of-distribution docs drop at the micro-batch boundary") {
    implicit val ctx = spark.sqlContext
    import graft.ext.LmScore
    val mem = MemoryStream[(Long, String, Timestamp)]
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_sprep_lm").resolve("store").toString
    val cfg = DataPrep.Config(minQuality = 0.1, maxDupWordFrac = 0.5,
      maxTopBigram = 5L)
    // a STANDING model, trained once before the stream starts — the
    // persisted-model contract: per batch the gate only joins count frames
    val lm = LmScore.train(Seq((0L, good), (1L, mailed)).toDF("doc_id", "text"), "text")
    val junk = "zxq wvu tsr qpo nml kji hgf edc bax zyw vut srq pon mlk"
    val cap = {
      val probe = Seq((1L, good), (9L, junk)).toDF("doc_id", "text")
      val s = LmScore.score(probe, "doc_id", "text", lm)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(s(1L) < s(9L))
      (s(1L) + s(9L)) / 2
    }

    val emitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = mem.toDF().toDF("doc_id", "text", "time")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingDedup.processBatch(
            LmScore.screen(DataPrep.screen(batch, "text", cfg),
              "doc_id", "text", lm, cap),
            statePath, threshold = 0.5) { out =>
          emitted ++= out.select(col("doc_id")).collect().map(_.getLong(0))
        }
      }
      .start()
    try {
      mem.addData(
        (1L, good, Timestamp.valueOf("2024-01-01 10:00:00")),
        (9L, junk, Timestamp.valueOf("2024-01-01 10:00:01")))
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted.toSet == Set(1L), s"got $emitted")
  }

  test("the media decoders run inside the same foreachBatch: a streamed " +
    "binary ingest decodes per micro-batch, corrupt payloads stay NULL") {
    // the decode core is a stateless mapPartitions pass, so the decoder
    // IS the streaming decoder — same instance, no twin to drift
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val dec = new graft.ext.NetpbmDecoder(channels = 1, batchSize = 2)
    val out = scala.collection.mutable.Map[Long, Option[Seq[Double]]]()
    val q = mem.toDF().toDF("doc_id", "payload")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        dec.decode(batch, "payload", "f")
          .select(col("doc_id"), col("f")).collect()
          .foreach(r => out(r.getLong(0)) = Option(r.getSeq[Double](1)))
        ()
      }
      .start()
    try {
      mem.addData(
        (1L, "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20)),
        (2L, "corrupt".getBytes("US-ASCII")))
      q.processAllAvailable()
      mem.addData(
        (3L, "P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](7)))
      q.processAllAvailable()
    } finally q.stop()
    assert(out(1L).get == Seq(2.0, 1.0, 30.0, 500.0))
    assert(out(2L).isEmpty)
    assert(out(3L).get == Seq(1.0, 1.0, 7.0, 49.0))
  }
}
