package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions._

class RollupSpec extends GraftSpec {
  import spark.implicits._

  private def ev(rows: (String, String, Option[Double])*) =
    rows.zipWithIndex.map { case ((s, t, v), i) => (i.toLong, s, t, v) }
      .toDF("event_id", "s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")

  private lazy val all = ev(
    ("2024-01-01 10:00:00", "click", Some(5.0)),
    ("2024-01-01 11:00:00", "click", Some(1.0)),
    ("2024-01-01 12:00:00", "view", None), // NULL value: counted, no bounds
    ("2024-01-02 09:00:00", "click", Some(9.0)),
    ("2024-01-02 10:00:00", "view", Some(2.0)))

  private def snapshot(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("day", "event_type").collect().map(r =>
      (r.getDate(0).toString, r.getString(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSeq

  test("merge(history, batch) equals the from-scratch rollup — including " +
    "a late batch overlapping an already-rolled-up day") {
    // batch carries a LATE event for Jan 1 plus Jan 2's rows
    val history = all.filter(col("ts") < lit("2024-01-01 11:30:00"))
    val batch = all.filter(col("ts") >= lit("2024-01-01 11:30:00"))
    val merged = Rollup.merge(Rollup.dailyRollup(history),
      Rollup.dailyRollup(batch))
    assert(snapshot(merged) == snapshot(Rollup.dailyRollup(all)))
  }

  test("merge is associative over three batches (day-by-day maintenance)") {
    val days = Seq("2024-01-01 11:00:00", "2024-01-02 09:30:00").map(lit)
    val r1 = Rollup.dailyRollup(all.filter(col("ts") < days(0)))
    val r2 = Rollup.dailyRollup(
      all.filter(col("ts") >= days(0) && col("ts") < days(1)))
    val r3 = Rollup.dailyRollup(all.filter(col("ts") >= days(1)))
    assert(snapshot(Rollup.merge(Rollup.merge(r1, r2), r3)) ==
      snapshot(Rollup.dailyRollup(all)))
  }

  test("all-NULL value cell keeps NULL bounds; NULL ts rows are excluded") {
    val withNullTs = all.unionByName(
      Seq((99L, "view", Option(7.0)))
        .toDF("event_id", "event_type", "value")
        .withColumn("ts", lit(null).cast("timestamp"))
        .select("event_id", "event_type", "value", "ts"))
    val r = snapshot(Rollup.dailyRollup(withNullTs))
    assert(r == snapshot(Rollup.dailyRollup(all)), "NULL ts must not land")
    val viewJan1 = r.find(x => x._1 == "2024-01-01" && x._2 == "view").get
    assert(viewJan1._3 == 1L && viewJan1._4.isEmpty && viewJan1._5.isEmpty)
  }
}
