package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions.col

class TrendSpec extends GraftSpec {
  import spark.implicits._

  test("trend: a perfect line recovers slope/intercept exactly, r2 = 1") {
    val df = Seq.tabulate(10)(i => ("a", i.toDouble, 2.0 * i + 1.0))
      .toDF("g", "x", "y")
    val row = Trend.trend(df, "g", col("x"), col("y")).collect().head
    assert(row.getLong(1) == 10L)
    assert(row.getDouble(2) == 2.0, "slope")
    assert(row.getDouble(3) == 1.0, "intercept")
    assert(row.getDouble(4) == 1.0, "r2")
  }

  test("influence: a perfect line has zero residuals and NULL Cook " +
    "(s2 = 0); leverage matches the closed form") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(("a", 0.0, 1.0), ("b", 1.0, 2.0), ("c", 2.0, 3.0))
      .toDF("o", "x", "y")
    val got = Trend.influence(df, "o", col("x"), col("y")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(got.forall(_.getDouble(3) == 0.0), "zero residuals")
    assert(got.forall(_.isNullAt(5)), "s2 = 0 -> Cook undefined")
    // h = 1/3 + (x-1)^2/2
    assert(got(0).getDouble(4) == r6(1.0 / 3.0 + 1.0 / 2.0))
    assert(got(1).getDouble(4) == r6(1.0 / 3.0))
  }

  test("influence: the planted outlier carries the dominant Cook's D " +
    "(hand-computed moments)") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(("d1", 0.0, 0.0), ("d2", 1.0, 1.0), ("d3", 2.0, 2.0),
      ("d4", 3.0, 9.0)).toDF("o", "x", "y")
    val got = Trend.influence(df, "o", col("x"), col("y")).collect()
    // n=4 sx=6 sy=12 sxx=14 syy=86 sxy=32 → slope=2.8, icept=-1.2,
    // sxxc=5, s2=(50-2.8*14)/2
    val slope = (4.0 * 32.0 - 6.0 * 12.0) / (4.0 * 14.0 - 6.0 * 6.0)
    val icept = (12.0 - slope * 6.0) / 4.0
    val s2 = ((86.0 - 12.0 * 12.0 / 4.0) -
      slope * (32.0 - 6.0 * 12.0 / 4.0)) / 2.0
    val x4 = 3.0
    val fit4 = icept + slope * x4
    val res4 = 9.0 - fit4
    val h4 = 1.0 / 4.0 + (x4 - 1.5) * (x4 - 1.5) / 5.0
    val cook4 = res4 * res4 * h4 / (2.0 * s2 * (1.0 - h4) * (1.0 - h4))
    val d4 = got.find(_.getString(0) == "d4").get
    assert(d4.getDouble(2) == r6(fit4) && d4.getDouble(3) == r6(res4))
    assert(d4.getDouble(4) == r6(h4) && d4.getDouble(5) == r6(cook4))
    assert(got.filter(!_.isNullAt(5)).map(_.getDouble(5)).max ==
      d4.getDouble(5), "the outlier dominates")
  }

  test("trend: constant x degenerates to NULL slope/intercept/r2; NULL " +
    "x or y rows drop from the fit") {
    val df = Seq(("c", Some(5.0), Some(1.0)), ("c", Some(5.0), Some(9.0)),
      ("c", None, Some(4.0)), ("ok", Some(1.0), Some(1.0)),
      ("ok", Some(2.0), None), ("ok", Some(3.0), Some(5.0)))
      .toDF("g", "x", "y")
    val rows = Trend.trend(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("c").getLong(1) == 2L) // the NULL-x row dropped
    assert(rows("c").isNullAt(2) && rows("c").isNullAt(3) &&
      rows("c").isNullAt(4))
    assert(rows("ok").getLong(1) == 2L) // the NULL-y row dropped
    assert(rows("ok").getDouble(2) == 2.0)
  }

  test("trend: decimal moments make the fit partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(500)(i =>
      ("g", i.toDouble, 0.3 * i + rnd.nextGaussian()))
    val one = Trend.trend(data.toDF("g", "x", "y").repartition(1),
      "g", col("x"), col("y")).collect().head
    val many = Trend.trend(data.toDF("g", "x", "y").repartition(13),
      "g", col("x"), col("y")).collect().head
    assert(one == many)
  }

  test("autocorr: an alternating series is perfectly anti-correlated at " +
    "lag 1; a constant series has no variance → NULL r") {
    val df = (Seq.tabulate(10)(i =>
        ("alt", i.toLong, i.toLong, if (i % 2 == 0) 1.0 else -1.0)) ++
      Seq.tabulate(6)(i => ("const", i.toLong, i.toLong, 3.0)))
      .toDF("g", "ts", "id", "value")
    val rows = Trend.autocorr(df, "g", "ts", "id", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("alt").getLong(1) == 9L)
    assert(rows("alt").getDouble(2) == -1.0)
    assert(rows("const").getLong(1) == 5L)
    assert(rows("const").isNullAt(2))
  }

  test("autocorr: NULL values stay in the window order but their pairs " +
    "drop — both the row and its successor's pair") {
    val df = Seq(("g", 1L, 1L, Some(1.0)), ("g", 2L, 2L, None),
      ("g", 3L, 3L, Some(2.0)), ("g", 4L, 4L, Some(4.0)))
      .toDF("g", "ts", "id", "value")
    val row = Trend.autocorr(df, "g", "ts", "id", "value").collect().head
    // pairs: (1,null)x (null,2)x (2,4)✓ → one pair; r NULL (zero variance
    // on a single pair)
    assert(row.getLong(1) == 1L)
    assert(row.isNullAt(2))
  }

  test("ewma: hand-computed taps, gap look-through, all-NULL window") {
    val df = Seq(("g", 1L, 1L, Some(1.0)), ("g", 2L, 2L, Some(3.0)),
      ("g", 3L, 3L, None), ("g", 4L, 4L, Some(5.0)))
      .toDF("g", "ts", "id", "value")
    val e = Trend.ewma(df, "g", "ts", "id", "value", alpha = 0.5, k = 2)
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(e(1L).contains(1.0)) // first row: itself only
    assert(e(2L).contains(math.rint(((3.0 + 0.5 * 1.0) / 1.5) * 1e6) / 1e6))
    assert(e(3L).contains(3.0)) // own value NULL, tap-1 = 3.0 carries
    assert(e(4L).contains(5.0)) // tap-1 is the NULL row → drops, only self
  }

  test("moment partials are associative: prefix AND interleaved splits " +
    "merge to the identical fit (the standing-index law)") {
    val rnd = new scala.util.Random(31)
    val data = Seq.tabulate(400)(i =>
      (s"g${i % 4}", i.toDouble, 0.7 * i + rnd.nextGaussian() * 5))
    val df = data.toDF("g", "x", "y")
    val whole = Trend.trend(df, "g", col("x"), col("y"))
      .orderBy("g").collect().toSeq
    def merged(splits: Seq[Seq[(String, Double, Double)]]) = {
      val parts = splits.map(s =>
        Trend.momentPartials(s.toDF("g", "x", "y"), "g",
          col("x"), col("y")))
      Trend.trendFromMoments(
        Trend.mergeMoments(parts.reduce(_.unionByName(_)), "g"), "g")
        .orderBy("g").collect().toSeq
    }
    assert(merged(data.grouped(100).toSeq) == whole, "prefix split")
    assert(merged(Seq(
      data.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
      data.zipWithIndex.filter(_._2 % 2 == 1).map(_._1))) == whole,
      "interleaved split")
  }

  test("ewmaWeights is the (1-α)^j kernel") {
    assert(Trend.ewmaWeights(0.5, 4) == Seq(1.0, 0.5, 0.25, 0.125))
    assert(Trend.ewmaWeights(0.25, 2) == Seq(1.0, 0.75))
  }

  test("crossCorr: a shifted copy peaks at exactly its lag; r at the " +
    "peak is 1; degenerate overlaps are NULL") {
    // y_t = x_{t-2}: corr(x_t, y_{t+l}) peaks at l = +2
    val x = (0L until 30L).map(t => (t, math.sin(t * 0.7) * 10 + t % 5))
    val y = x.map { case (t, v) => (t + 2, v) }
    val a = x.toDF("t", "v")
    val b = y.toDF("t", "v")
    val got = Trend.crossCorr(a, b, "t", "v", maxLag = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.keySet == (-3L to 3L).toSet)
    assert(got(2L).contains(1.0), got.toString)
    assert((-3L to 3L).filter(_ != 2L).forall(l =>
      got(l).forall(_ < 1.0)), got.toString)
    // constant series: zero variance -> NULL r everywhere
    val const = (0L until 10L).map(t => (t, 1.0)).toDF("t", "v")
    assert(Trend.crossCorr(const, const, "t", "v", 1)
      .collect().forall(_.isNullAt(2)))
    intercept[IllegalArgumentException] {
      Trend.crossCorr(a, b, "t", "v", -1)
    }
  }

  test("periodogram: a pure p-cycle concentrates power at p; constant " +
    "series has ~zero power everywhere") {
    val wave = (0L until 84L).map(t =>
      (t, 100.0 + 40.0 * math.cos(2 * math.Pi * (t % 7) / 7.0)))
      .toDF("t", "v")
    val got = Trend.periodogram(wave, "t", "v", Seq(3, 5, 7, 14))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(7L) > 100 * got(3L) && got(7L) > 100 * got(5L), got)
    // the 14-bucket projection also sees the 7-cycle? No: 84 = 6 full
    // 14-cycles and cos(2pi t/7) is orthogonal to the 14-fundamental
    assert(got(7L) > 100 * got(14L), got)
    val flat = (0L until 28L).map(t => (t, 3.0)).toDF("t", "v")
    assert(Trend.periodogram(flat, "t", "v", Seq(7))
      .collect().head.getDouble(2) < 1e-9)
    intercept[IllegalArgumentException] {
      Trend.periodogram(wave, "t", "v", Seq(1))
    }
  }

  test("decayedCounts: an event one half-life old counts half; a hot " +
    "key outranks a bigger stale one; halflife validated") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    def ev(rows: (String, Long)*) = rows.toDF("k", "ep")
      .withColumn("ts", timestamp_seconds(col("ep"))).drop("ep")
    // key a: 1 event at T; key b: 3 events one half-life before T
    // decayed(a) = 1, decayed(b) = 3·0.5 = 1.5 → b first, but a beats
    // a SINGLE stale event trivially
    val got = Trend.decayedCounts(
        ev(("a", 1000L), ("b", 400L), ("b", 400L), ("b", 400L)),
        col("k"), col("ts"), halflifeSeconds = 600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("b", 3L, 1.5), ("a", 1L, 1.0)),
      s"${got.toSeq}")
    // 4 stale events (2 half-lives) lose to 3 fresh ones
    val hot = Trend.decayedCounts(
        ev(Seq.fill(3)(("fresh", 2000L)) ++
          Seq.fill(4)(("stale", 800L)): _*),
        col("k"), col("ts"), halflifeSeconds = 600L)
      .collect().map(_.getString(0))
    assert(hot.head == "fresh", s"${hot.toSeq}")
    intercept[IllegalArgumentException] {
      Trend.decayedCounts(ev(("a", 1L)), col("k"), col("ts"), 0L)
    }
  }
}
