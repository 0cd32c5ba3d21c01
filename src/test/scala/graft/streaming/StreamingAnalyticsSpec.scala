package graft.streaming

import graft.GraftSpec
import graft.clf.ClfParser
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingAnalyticsSpec extends GraftSpec {
  import spark.implicits._

  private def line(user: Long, hhmmss: String, status: Long): String =
    s"""10.0.0.1 - $user [13/Nov/2015:$hhmmss +0000] "GET /r HTTP/1.0" $status 1 "-" "ua""""

  test("windowedCounts: tumbling event-time windows per status") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    val counts = StreamingAnalytics.windowedCounts(
      ClfParser.parse(mem.toDF()), "1 hour", "10 minutes")
    val q = counts.writeStream.format("memory")
      .queryName("graft_wc").outputMode("update").start()
    try {
      mem.addData(
        line(1, "10:05:00", 200), line(1, "10:55:00", 200),
        line(2, "10:30:00", 500), line(2, "11:10:00", 200))
      q.processAllAvailable()
      val rows = spark.table("graft_wc")
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant.toString,
          r.getAs[Long]("status_code"), r.getAs[Long]("cnt"))).toSet
      assert(rows == Set(
        ("2015-11-13T10:00:00Z", 200L, 2L),
        ("2015-11-13T10:00:00Z", 500L, 1L),
        ("2015-11-13T11:00:00Z", 200L, 1L)))
    } finally q.stop()
  }

  test("dedupStream: re-deliveries within the watermark are dropped") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    // key excludes the event-time column — the documented contract: any
    // same-key arrival inside the watermark horizon drops, byte-equal
    // timestamp or not
    val out = StreamingAnalytics.dedupStream(
      ClfParser.parse(mem.toDF()), Seq("user_id"), "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("graft_dedup").outputMode("append").start()
    try {
      // same-batch duplicate + a distinct second key
      mem.addData(line(1, "10:00:00", 200), line(1, "10:00:00", 200),
        line(2, "10:10:00", 200))
      q.processAllAvailable()
      // cross-batch re-deliveries inside the horizon: one byte-identical,
      // one with a DIFFERENT timestamp — exact-key dedup would emit the
      // latter; within-watermark key dedup drops both
      mem.addData(line(1, "10:00:00", 200), line(1, "10:20:00", 200))
      q.processAllAvailable()
      assert(spark.table("graft_dedup").count() == 2)
    } finally q.stop()
  }

  test("intervalJoin: same-key in-horizon pairs across batches; out-of-horizon and cross-key absent") {
    implicit val ctx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2015-11-13 $s")
    val imps = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = StreamingAnalytics.intervalJoin(
      imps.toDF().toDF("user_id", "imp_time", "imp_id"),
      clicks.toDF().toDF("user_id", "click_time", "click_id"),
      "user_id", "imp_time", "click_time",
      horizonSeconds = 60L, watermarkDelay = "1 hour")
    val q = joined.writeStream.format("memory")
      .queryName("graft_ij").outputMode("append").start()
    try {
      imps.addData((1L, ts("10:00:00"), "I1"), (1L, ts("10:01:30"), "I2"))
      clicks.addData(
        (1L, ts("10:00:30"), "C1"), // in I1's horizon
        (1L, ts("10:02:00"), "C2"), // past I1's horizon, inside I2's
        (2L, ts("10:00:10"), "C3")) // same time range, different key
      q.processAllAvailable()
      // a later batch matches against the BUFFERED impression state
      clicks.addData((1L, ts("10:00:50"), "C4"))
      q.processAllAvailable()
      val pairs = spark.table("graft_ij")
        .collect()
        .map(r => (r.getAs[String]("imp_id"), r.getAs[String]("click_id")))
        .toSet
      assert(pairs == Set(("I1", "C1"), ("I2", "C2"), ("I1", "C4")))
    } finally q.stop()
  }

  test("sessionize: gap closes a session; watermark closes idle ones") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    val sessions = StreamingAnalytics.sessionize(
      ClfParser.parse(mem.toDF()), gapSeconds = 600L, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("graft_sess").outputMode("append").start()
    try {
      // user 1: two requests 5 min apart (one session), then a request
      // 2 hours later → explicit gap closes the first session
      mem.addData(line(1, "10:00:00", 200), line(1, "10:05:00", 200))
      q.processAllAvailable()
      mem.addData(line(1, "12:00:00", 200))
      q.processAllAvailable()
      val afterGap = spark.table("graft_sess").as[UserSession].collect()
      assert(afterGap.exists(s =>
        s.user_id == 1L && s.n_requests == 2L &&
          s.session_end - s.session_start == 300L))

      // a later event from another user advances the watermark far past
      // user 1's idle deadline → the 12:00 session closes by timeout
      mem.addData(line(2, "15:00:00", 200))
      q.processAllAvailable()
      mem.addData(line(2, "18:00:00", 200))
      q.processAllAvailable()
      val all = spark.table("graft_sess").as[UserSession].collect()
      assert(all.exists(s => s.user_id == 1L && s.n_requests == 1L))
    } finally q.stop()
  }

  test("sessionize: same-batch late events within a gap merge into one late session") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    val sessions = StreamingAnalytics.sessionize(
      ClfParser.parse(mem.toDF()), gapSeconds = 600L, watermarkDelay = "6 hours")
    val q = sessions.writeStream.format("memory")
      .queryName("graft_sess_late").outputMode("append").start()
    try {
      // open a session at 12:00
      mem.addData(line(1, "12:00:00", 200))
      q.processAllAvailable()
      // one batch of in-watermark late events, all > gap before 12:00:
      // a lone event at 09:00 (its own late session — 10:00 is an hour
      // away) and a 10:00/10:05/10:08 cluster whose internal gaps are
      // within 600s — ONE merged late session, not three singletons
      mem.addData(
        line(1, "09:00:00", 200), line(1, "10:00:00", 200),
        line(1, "10:05:00", 200), line(1, "10:08:00", 200))
      q.processAllAvailable()
      val late = spark.table("graft_sess_late").as[UserSession].collect()
        .map(s => (s.n_requests, s.session_end - s.session_start)).toSet
      assert(late == Set((1L, 0L), (3L, 480L)),
        s"late cluster fragmented: $late")
    } finally q.stop()
  }
}
