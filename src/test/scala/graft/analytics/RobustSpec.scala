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

  test("decimal fold: identical output at 1 and 11 partitions") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(300)(i =>
      (s"g${i % 3}", rnd.nextGaussian() * 100, i.toLong))
    assert(stats(rows, parts = 1).view.mapValues(_.toString).toMap ==
      stats(rows, parts = 11).view.mapValues(_.toString).toMap)
  }
}
