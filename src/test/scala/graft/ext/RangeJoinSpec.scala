package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends GraftSpec {
  import spark.implicits._

  private lazy val ranges = Seq(
    ("narrow", 10.0, 20.0),   // inside one bucket
    ("wide", 15.0, 85.0),     // spans several buckets
    ("aligned", 30.0, 40.0),  // both bounds on bucket boundaries
    ("empty", 50.0, 50.0)     // lo == hi: half-open ⇒ matches nothing
  ).toDF("label", "lo", "hi")

  test("half-open bounds: lo inclusive, hi exclusive, multi-bucket ranges hit") {
    val points = Seq(10.0, 19.999, 20.0, 30.0, 39.999, 40.0, 50.0, 84.999)
      .toDF("v")
    val hits = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 10.0)
      .select(col("v"), col("label")).as[(Double, String)].collect().toSet
    assert(hits == Set(
      (10.0, "narrow"), (19.999, "narrow"), (19.999, "wide"), (20.0, "wide"),
      (30.0, "wide"), (30.0, "aligned"), (39.999, "wide"), (39.999, "aligned"),
      (40.0, "wide"), (50.0, "wide"), (84.999, "wide")))
  }

  test("equals the naive BETWEEN join on the real events table") {
    val e = graft.Tables(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"), col("value"))
    val bands = spark.range(0, 10).select(
      col("id").as("band"),
      (col("id") * 50.0d).as("lo"), (col("id") * 50.0d + 50.0d).as("hi"))
    val fast = RangeJoin.pointInRange(e, "value", bands, "lo", "hi", 50.0)
      .select(col("event_id"), col("band"))
    val naive = e.join(bands,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select(col("event_id"), col("band"))
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "bucketized range join diverged from the BETWEEN join")
  }

  test("each point matches a range at most once (bucket explode never dupes)") {
    val points = Seq(15.0, 17.0, 84.0).toDF("v")
    val out = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 10.0)
      .groupBy(col("v"), col("label")).count()
      .filter(col("count") > 1)
    assert(out.isEmpty, "a (point, range) pair was emitted more than once")
  }

  test("shared column names across sides stay unambiguous") {
    // points carries its own "lo" column — the residual must resolve
    // lo/hi against the ranges side, not throw AMBIGUOUS_REFERENCE
    val points = Seq((15.0, -1.0), (95.0, -2.0)).toDF("v", "lo")
    val hits = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", 10.0)
      .select(col("v"), col("label")).as[(Double, String)].collect().toSet
    assert(hits == Set((15.0, "narrow"), (15.0, "wide")))
  }

  test("keyed mode: a point only matches intervals of its own key") {
    // two users with overlapping numeric intervals — without the key the
    // point at 5.0 would match both
    val sessions = Seq(
      ("u1", "s1", 0.0, 10.0),
      ("u2", "s2", 0.0, 10.0),
      ("u1", "s3", 40.0, 60.0)
    ).toDF("suser", "session", "lo", "hi")
    val points = Seq(("u1", 1L, 5.0), ("u2", 2L, 5.0), ("u1", 3L, 45.0),
      ("u3", 4L, 5.0)).toDF("puser", "pid", "v")
    val got = RangeJoin.pointInRange(points, "v", sessions, "lo", "hi", 10.0,
        keys = Seq("puser" -> "suser"))
      .select(col("pid"), col("session")).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "s1"), (2L, "s2"), (3L, "s3")))
  }

  test("plan: an equi hash join on the bucket id, never a nested loop") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("value"))
    val bands = spark.range(0, 10).select(
      col("id").as("band"),
      (col("id") * 50.0d).as("lo"), (col("id") * 50.0d + 50.0d).as("hi"))
    val p = RangeJoin.pointInRange(e, "value", bands, "lo", "hi", 50.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n$p")
    assert(p.contains("HashJoin"), p)
  }
}
