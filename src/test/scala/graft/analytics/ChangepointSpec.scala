package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions._

class ChangepointSpec extends GraftSpec {
  import spark.implicits._

  test("cusum: a clean level shift bends the curve to its extremum at " +
    "the last pre-shift bucket; hand-computed standardization") {
    // 10,10,10,20,20,20: μ=15, population σ=5 → S = -1,-2,-3,-2,-1,0
    val series = Seq((1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20))
      .toDF("day", "n")
    val got = Changepoint.cusum(series, "day", "n").orderBy("day").collect()
    assert(got.map(_.getDouble(2)).toSeq ==
      Seq(-1.0, -2.0, -3.0, -2.0, -1.0, 0.0))
    assert(got.map(_.getBoolean(3)).toSeq ==
      Seq(false, false, true, false, false, false),
      "the |S| extremum (day 3, the last pre-shift bucket) is the flag")
  }

  test("cusum: constant series yields NULL cusum and no flag; extremum " +
    "ties flag the FIRST bucket only") {
    val flat = Seq((1, 7), (2, 7), (3, 7)).toDF("day", "n")
    val gotFlat = Changepoint.cusum(flat, "day", "n").collect()
    assert(gotFlat.forall(_.isNullAt(2)), "σ=0 ⇒ NULL, not ±Inf")
    assert(gotFlat.forall(!_.getBoolean(3)))
    // 10,20,10,20: S = -1,0,-1,0 — |S| ties at days 1 and 3; flag day 1
    val tied = Seq((1, 10), (2, 20), (3, 10), (4, 20)).toDF("day", "n")
    val flags = Changepoint.cusum(tied, "day", "n").orderBy("day")
      .collect().map(_.getBoolean(3)).toSeq
    assert(flags == Seq(true, false, false, false))
  }

  test("cusum: NULL order/value rows drop before the curve is built") {
    val series = Seq[(Integer, Integer)]((1, 10), (null, 99), (2, null),
      (3, 20)).toDF("day", "n")
    val got = Changepoint.cusum(series, "day", "n").collect()
    assert(got.length == 2)
  }

  test("seasonalIndex: a flat series indexes 1.0 everywhere; doubling " +
    "one weekday moves only that index") {
    val days = (0 until 14).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), 10))
    val flat = Changepoint.seasonalIndex(days.toDF("day", "n"), "day", "n")
    assert(flat.collect().forall(_.getDouble(3) == 1.0))
    val boosted = days.map { case (d, v) =>
      // 2024-01-01 is a Monday (dayofweek = 2 in Spark's Sunday=1 base)
      (d, if (d.toLocalDate.getDayOfWeek.getValue == 1) 2 * v else v) }
    val got = Changepoint.seasonalIndex(
      boosted.toDF("day", "n"), "day", "n")
      .orderBy("dow").collect()
    val monday = got.find(_.getInt(0) == 2).get
    assert(monday.getDouble(2) == 20.0)
    // overall mean = (2·20 + 12·10)/14 = 80/7; index = 20/(80/7) = 1.75
    assert(monday.getDouble(3) == 1.75)
    assert(got.filter(_.getInt(0) != 2).forall(_.getDouble(3) == 0.875))
  }

  test("segmentedTrend: a planted level shift recovers the two flat " +
    "slopes; a constant series yields an empty frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 10 at days 1-5, 30 at days 6-10: CUSUM flags day 5; both sides
    // are flat lines (slope 0, intercept = the level, r2 NULL since
    // vary = 0)
    val series = ((1 to 5).map(d => (d.toLong, 10L)) ++
      (6 to 10).map(d => (d.toLong, 30L))).toDF("day", "n")
    val got = Changepoint.segmentedTrend(series, "day", "n")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("pre", "post"), s"$got")
    assert(got("pre") == ((5L, 0.0, 10.0)), s"pre $got")
    assert(got("post") == ((5L, 0.0, 30.0)), s"post $got")

    val flat = Changepoint.segmentedTrend(
      (1 to 6).map(d => (d.toLong, 7L)).toDF("day", "n"), "day", "n")
    assert(flat.isEmpty, "sigma = 0 flags nothing to segment at")
  }

  test("imrChart: hand-computed moving-range limits flag the shifted " +
    "point; the first point has no MR") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a sustained baseline is needed: a lone step inflates MR-bar
    // itself (9 flat points, then the shift)
    val s = ((1 to 9).map(i => (f"d$i%02d", 10.0)) :+ ("d10", 50.0))
      .toDF("day", "v")
    val got = Changepoint.imrChart(s, "day", "v").collect()
    val xbar = 140.0 / 10.0
    val mrbar = 40.0 / 9.0
    assert(got.forall(_.getDouble(2) == r6(xbar)))
    assert(got.forall(_.getDouble(3) == r6(xbar + 2.66 * mrbar)))
    assert(got.head.isNullAt(5), "first point has no moving range")
    val flags = got.map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(flags("d10") && flags.count(_._2) == 1,
      s"only the shifted point flags: $flags")
  }

  test("varianceDecomposition: a pure trend puts all structure in the " +
    "trend bucket; pure noise leaves structure_r2 near 0") {
    import spark.implicits._
    import java.sql.Date
    def days(vals: Double*) = vals.zipWithIndex.map { case (v, i) =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
    }.toDF("day", "v")
    val trend = Changepoint.varianceDecomposition(
      days((1 to 14).map(_.toDouble): _*), "day", "v").head()
    assert(trend.getLong(0) == 14L)
    assert(trend.getDouble(4) == 0.0, "a perfect line leaves no residual")
    assert(trend.getDouble(5) == 1.0, s"$trend")
    assert(trend.getDouble(2) > trend.getDouble(3),
      "trend dominates seasonality on a line")
    // the ledger sums: total = trend + seasonal + residual
    assert(r(trend.getDouble(2) + trend.getDouble(3) +
      trend.getDouble(4)) == r(trend.getDouble(1)))
  }

  private def r(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cChart: hand-computed Poisson limits flag the spike and only " +
    "the spike; the lower limit clamps at zero") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = Seq(("d1", 1L), ("d2", 1L), ("d3", 1L), ("d4", 25L))
      .toDF("day", "n")
    val got = Changepoint.cChart(s, "day", "n").collect()
    val cbar = 28.0 / 4.0
    assert(got.forall(_.getDouble(2) == r6(cbar)))
    assert(got.forall(_.getDouble(3) == r6(cbar + 3.0 * math.sqrt(cbar))))
    assert(got.forall(_.getDouble(4) ==
      r6(math.max(cbar - 3.0 * math.sqrt(cbar), 0.0))))
    assert(got.map(r => r.getString(0) -> r.getBoolean(5)).toMap ==
      Map("d1" -> false, "d2" -> false, "d3" -> false, "d4" -> true))
    // small mean → the lower limit floor engages
    val tiny = Changepoint.cChart(
      Seq(("a", 1L), ("b", 2L)).toDF("day", "n"), "day", "n")
      .collect()
    assert(tiny.forall(_.getDouble(4) == 0.0), "LCL clamps at zero")
  }
}
