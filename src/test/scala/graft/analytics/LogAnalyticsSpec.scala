package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions._

class LogAnalyticsSpec extends GraftSpec {
  import spark.implicits._

  // golden fixture: 6 requests, 3 users (one NULL user), 2 with status 200
  private lazy val logs = Seq(
    (Some(1L), "/a", 200L),
    (Some(1L), "/b", 404L),
    (Some(1L), "/c", 200L),
    (Some(2L), "/a", 500L),
    (Some(2L), "/d", 301L),
    (None,     "/e", 304L)
  ).toDF("user_id", "request_resource", "status_code")
    .withColumn("time", to_timestamp(lit("2024-05-06 07:08:09")))

  test("requestsPerUser matches hand-computed golden counts") {
    val got = LogAnalytics.requestsPerUser(logs)
      .orderBy(asc_nulls_first("user_id"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1)))
    assert(got.toSeq == Seq((None, 1L), (Some(1L), 3L), (Some(2L), 2L)))
  }

  test("distinctUsers excludes NULLs (SQL count-distinct semantics)") {
    assert(LogAnalytics.distinctUsers(logs).collect()(0).getLong(0) == 2L)
  }

  test("totalsRow computes all three scalars in one pass") {
    val r = LogAnalytics.totalsRow(
      logs,
      runDate = date_format(col("time"), "yyyy-MM-dd"),
      successPred = col("status_code") === 200
    ).collect()(0)
    assert(r.getAs[String]("run_date") == "2024-05-06")
    assert(r.getAs[Long]("user_count") == 2L)
    assert(r.getAs[Long]("total_successful_requests") == 2L)
  }

  test("approx distinct is within rsd of exact") {
    val exact = 2.0
    val approx = LogAnalytics.approxDistinctUsers(logs, rsd = 0.01)
      .collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05)
  }

  test("sessionCounts: gap splits sessions; null users excluded") {
    import spark.implicits._
    val events = Seq(
      (Some(1L), "2024-05-06 10:00:00", "/a"),
      (Some(1L), "2024-05-06 10:10:00", "/b"), // same session (10 min)
      (Some(1L), "2024-05-06 12:00:00", "/c"), // new session (>30 min gap)
      (Some(2L), "2024-05-06 09:00:00", "/a"),
      (None,     "2024-05-06 09:00:00", "/x")  // null user dropped
    ).toDF("user_id", "t", "request_resource")
      .withColumn("time", to_timestamp(col("t"))).drop("t")
    val got = LogAnalytics.sessionCounts(events, gapSeconds = 1800L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("sessionIntervals: bounds per session, disjoint, counts agree") {
    import spark.implicits._
    val events = Seq(
      (Some(1L), "2024-05-06 10:00:00", "/a"),
      (Some(1L), "2024-05-06 10:10:00", "/b"),
      (Some(1L), "2024-05-06 12:00:00", "/c"),
      (Some(2L), "2024-05-06 09:00:00", "/a"),
      (None,     "2024-05-06 09:00:00", "/x")
    ).toDF("user_id", "t", "request_resource")
      .withColumn("time", to_timestamp(col("t"))).drop("t")
    val iv = LogAnalytics.sessionIntervals(events, gapSeconds = 1800L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val ep = java.time.LocalDateTime.parse("2024-05-06T10:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    assert(iv == Seq(
      (1L, 1L, ep, ep + 600),          // 10:00–10:10 session
      (1L, 2L, ep + 7200, ep + 7200),  // single-event 12:00 session
      (2L, 1L, ep - 3600, ep - 3600)))
    // per-user interval counts equal sessionCounts
    val fromIv = iv.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val counts = LogAnalytics.sessionCounts(events, gapSeconds = 1800L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromIv == counts)
    // one shuffle: the bounds groupBy reuses the window's user clustering
    val p = LogAnalytics.sessionIntervals(events, gapSeconds = 1800L)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected one shuffle:\n$p")
  }

  test("athena validation trio runs over a registered table") {
    logs.createOrReplaceTempView("graft_athena_test")
    val Seq(nonnull, perUser, success) =
      LogAnalytics.athenaSql("graft_athena_test").map(spark.sql)
    assert(nonnull.collect()(0).getLong(0) == 5L)  // 5 rows with non-null user
    assert(perUser.count() == 3L)                  // users 1, 2, and the NULL group
    assert(success.collect()(0).getLong(0) == 2L)  // 2 with status 200
  }
}
