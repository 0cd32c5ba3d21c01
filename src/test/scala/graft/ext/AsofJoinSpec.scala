package graft.ext

import java.sql.Timestamp

import graft.GraftSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // left: (id, key, time); right: (id, key, time, tag)
  private lazy val left = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")), // after r10+r11 tie, before r12
    (2L, "a", ts("2024-01-01 09:00:00")), // exactly at the r10/r11 tie
    (3L, "a", ts("2024-01-01 08:00:00")), // before every right row
    (4L, "b", ts("2024-01-01 10:00:00")), // key with no right rows at all
    (5L, "c", ts("2024-01-01 10:00:00"))  // right rows only after → no match
  ).toDF("id", "key", "time")

  private lazy val right = Seq(
    (10L, "a", ts("2024-01-01 09:00:00"), "tie-lo"),
    (11L, "a", ts("2024-01-01 09:00:00"), "tie-hi"),
    (12L, "a", ts("2024-01-01 11:00:00"), "late"),
    (20L, "c", ts("2024-01-01 12:00:00"), "future")
  ).toDF("rid", "rkey", "rtime", "tag")

  private lazy val joined = AsofJoin.asofBackward(
    left, right, "key", "rkey", "time", "rtime",
    rightPayload = Seq("rid", "tag"), rightTie = "rid")

  test("matches the most recent prior right row; inclusive at equal time") {
    val m = joined.collect().map(r =>
      r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(m(1L).contains(11L), "10:00 should see the 09:00 deposit")
    assert(m(2L).contains(11L), "equal time is inclusive")
  }

  test("ties at equal right time break to the greatest tie column") {
    val r1 = joined.filter(col("id") === 1L).collect().head
    assert(r1.getAs[Long]("asof_rid") == 11L)
    assert(r1.getAs[String]("asof_tag") == "tie-hi")
  }

  test("left-outer: no prior right row gives a null payload") {
    val m = joined.collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(m(3L), "left row before all right rows")
    assert(m(4L), "key absent from right")
    assert(m(5L), "right rows exist only in the future")
    assert(joined.count() == left.count(), "every left row survives exactly once")
  }

  test("asofForward: nearest following row, inclusive, ties to greatest") {
    val j = AsofJoin.asofForward(left, right, "key", "rkey", "time", "rtime",
      Seq("rid", "tag"), "rid")
    val m = j.collect().map(r =>
      r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(m(3L).contains(11L), "08:00 → nearest following is the 09:00 tie; greatest rid wins")
    assert(m(2L).contains(11L), "equal time is inclusive")
    assert(m(1L).contains(12L), "10:00 → next is 11:00")
    assert(m(4L).isEmpty, "key absent from right")
    assert(m(5L).contains(20L), "future right row is forward-visible")
  }

  test("a string tie column orders lexicographically, no numeric cast") {
    val r = Seq(
      ("ver-a", "a", ts("2024-01-01 09:00:00"), "x"),
      ("ver-b", "a", ts("2024-01-01 09:00:00"), "y")
    ).toDF("rid", "rkey", "rtime", "tag")
    val j = AsofJoin.asofBackward(left, r, "key", "rkey", "time", "rtime",
      Seq("rid"), "rid")
    val m = j.collect().map(row => row.getLong(0) -> row.getString(3)).toMap
    assert(m(1L) == "ver-b", "greatest string tie must win")
  }

  test("a left column that would collide with an asof_ output is rejected") {
    val clashing = left.withColumn("asof_rid", lit(0L))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(clashing, right, "key", "rkey", "time", "rtime",
        Seq("rid"), "rid")
    }
    assert(e.getMessage.contains("asof_rid"))
  }

  test("right rows with null key or time are dropped, not matched") {
    val r2 = right.unionByName(Seq(
      (98L, null.asInstanceOf[String], ts("2024-01-01 01:00:00"), "nullkey"),
      (99L, "a", null.asInstanceOf[Timestamp], "nulltime")
    ).toDF("rid", "rkey", "rtime", "tag"))
    val j2 = AsofJoin.asofBackward(left, r2, "key", "rkey", "time", "rtime",
      Seq("rid", "tag"), "rid")
    val tags = j2.select(col("asof_tag")).na.drop().as[String].collect().toSet
    assert(!tags.contains("nullkey") && !tags.contains("nulltime"))
  }

  test("equals the naive pair-join formulation on the real events table") {
    val e = graft.Tables(spark, "/root/testdata/sf0.01", "events")
    val l = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val fast = AsofJoin.asofBackward(l, r, "user_id", "c_user", "ts", "c_ts",
        Seq("c_id"), "c_id")
      .select(col("event_id"), col("asof_c_id").as("c_id"))
    val naive = l.join(r,
        col("user_id") === col("c_user") && col("c_ts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_id"))
          .orderBy(col("c_ts").desc_nulls_last, col("c_id").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("c_id"))
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "as-of result diverged from the naive pair join")
  }

  test("plan: one shuffle by key into a running window, no join node") {
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"pair-materializing join appeared:\n$p")
  }
}
