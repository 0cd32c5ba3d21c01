package graft.analytics

import graft.GraftSpec

class RobustSpec extends GraftSpec {
  import spark.implicits._

  private def stats(rows: Seq[(String, Double, Long)], pLo: Double = 0.05,
      pHi: Double = 0.95, parts: Int = 1) =
    Robust.winsorizedMean(
        rows.toDF("g", "value", "id").repartition(parts),
        "g", "value", "id", pLo, pHi)
      .collect().map(r => r.getString(0) -> r).toMap

  test("one hot outlier clips to the rank-exact p95 value and stops " +
    "dominating the mean") {
    val rows = (1 to 19).map(i => ("a", i.toDouble, i.toLong)) :+
      (("a", 1.0e9, 20L))
    val r = stats(rows)("a")
    // n=20: lo pos = ceil(.05*20)=2 (0.05 double is a hair above 1/20),
    // hi pos = ceil(.95*20) = 19 → bounds are the 2nd/19th values
    val posLo = math.ceil(0.05 * 20).toLong
    val posHi = math.ceil(0.95 * 20).toLong
    assert(r.getLong(1) == 20L)
    assert(r.getDouble(2) == posLo.toDouble, "lo is an actual data value")
    assert(r.getDouble(3) == posHi.toDouble, "hi is an actual data value")
    assert(r.getLong(4) == posLo - 1, "rows clipped up")
    assert(r.getLong(5) == 1L, "the outlier clipped down")
    val clipped = rows.map(_._2).map(v =>
      math.min(math.max(v, posLo.toDouble), posHi.toDouble))
    assert(math.abs(r.getDouble(6) - clipped.sum / 20) < 1e-6)
    assert(r.getDouble(6) < 30.0, "winsorized mean ignores the 1e9 row")
  }

  test("an all-equal group: bounds collapse to the value, nothing clips") {
    val r = stats(Seq.tabulate(8)(i => ("b", 4.25, i.toLong)))("b")
    assert(r.getDouble(2) == 4.25 && r.getDouble(3) == 4.25)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.getDouble(6) == 4.25)
  }

  test("madOutliers: rank-exact median and MAD, the 3.5 modified-z rule, " +
    "zero-MAD degenerate flags every non-median value") {
    // group a: 1..9 plus a wild outlier — median of 10 values is the
    // 5th (rank ceil(0.5*10)=5), deviations re-rank the same way
    val rows = ((1 to 9).map(i => ("a", i.toDouble, i.toLong)) :+
      (("a", 1000.0, 10L))) ++
      Seq(("z", 5.0, 1L), ("z", 5.0, 2L), ("z", 5.0, 3L), ("z", 9.0, 4L))
    val got = Robust.madOutliers(rows.toDF("g", "value", "id"),
        "g", "value", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got("a")._1 == 10L)
    assert(got("a")._2 == 5.0, "median is the rank-5 value")
    // deviations from 5: 4,3,2,1,0,1,2,3,4,995 sorted → 5th is 2
    assert(got("a")._3 == 2.0, "MAD is the rank-5 deviation")
    // flags: 0.6745*|v-5| > 3.5*2 = 7 → |v-5| > 10.378 → only the 1000
    assert(got("a")._4 == 1L)
    // group z: median 5, MAD 0 → every non-median value flags
    assert(got("z") == ((4L, 5.0, 0.0, 1L)))
  }

  test("decimal fold: identical output at 1 and 11 partitions") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(300)(i =>
      (s"g${i % 3}", rnd.nextGaussian() * 100, i.toLong))
    assert(stats(rows, parts = 1).view.mapValues(_.toString).toMap ==
      stats(rows, parts = 11).view.mapValues(_.toString).toMap)
  }

  test("quantileNormalize: mid-rank ties by hand; NULLs drop; the " +
    "two-level cumulative is bucket-width-invariant (exact law)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Some(1.0), Some(1.0), Some(2.0), Some(5.0), None)
      .toDF("v")
    val got = Robust.quantileNormalize(df, col("v"))
      .orderBy("value").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1.0, 2L, 0.25), (2.0, 1L, 0.625),
      (5.0, 1L, 0.875)))
    // bucketing is an implementation detail: any width, same mapping
    val rnd = new scala.util.Random(7)
    val big = Seq.fill(500)(rnd.nextGaussian() * 50).toDF("v")
    def runW(w: Double) = Robust.quantileNormalize(big, col("v"), w)
      .orderBy("value").collect().toSeq
    assert(runW(0.25) == runW(1000.0))
    intercept[IllegalArgumentException] {
      Robust.quantileNormalize(df, col("v"), bucketWidth = 0.0)
    }
  }

  test("theilSen: one wild outlier cannot move the median slope; a " +
    "single point yields an empty frame") {
    import org.apache.spark.sql.functions.col
    // v = 2x on 0..3, plus (4, 100): 6 of 10 pairwise slopes are 2,
    // so the lower median (rank 5) is exactly 2; intercepts v−2x are
    // [0,0,0,0,92] → lower median 0
    val pts = Seq((0L, 0.0), (1L, 2.0), (2L, 4.0), (3L, 6.0),
      (4L, 100.0)).toDF("x", "v")
    val got = Robust.theilSen(pts, col("x"), col("v")).head()
    assert(got.getLong(0) == 5L && got.getLong(1) == 10L, s"$got")
    assert(got.getDouble(2) == 2.0, s"slope $got")
    assert(got.getDouble(3) == 0.0, s"intercept $got")

    // equal-x pairs are excluded, remaining pairs still rank
    val dup = Seq((0L, 0.0), (0L, 10.0), (1L, 2.0)).toDF("x", "v")
    val d = Robust.theilSen(dup, col("x"), col("v")).head()
    // slopes: (2−0)/1 = 2, (2−10)/1 = −8 → lower median (rank 1) = −8
    assert(d.getLong(1) == 2L && d.getDouble(2) == -8.0, s"$d")

    assert(Robust.theilSen(Seq((1L, 1.0)).toDF("x", "v"),
      col("x"), col("v")).isEmpty, "one point has no pair")
  }
}
