package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class FeatureScreenSpec extends GraftSpec {
  import spark.implicits._

  // f0 reproduces the label through its median split, f1 is constant,
  // f2 splits independently of the label
  private def df = Seq(
    (1L, Seq(1.0, 5.0, 1.0), 0.0),
    (2L, Seq(2.0, 5.0, 3.0), 0.0),
    (3L, Seq(3.0, 5.0, 2.0), 1.0),
    (4L, Seq(4.0, 5.0, 4.0), 1.0))
    .toDF("id", "features", "y")

  test("infoGain: a label-reproducing split scores H(Y) = 1 bit; a " +
    "constant feature and an independent split score 0") {
    val got = FeatureScreen.infoGain(df, col("features"), col("y"),
      col("id")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val byF = got.map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
    assert(byF(0L) == (2.0, 1.0), "perfect split = full label entropy")
    assert(byF(1L) == (5.0, 0.0), "one branch carries no information")
    assert(byF(2L) == (2.0, 0.0), "independent split carries none")
  }

  test("infoGain: a partially informative split lands strictly " +
    "between 0 and H(Y)") {
    // f0 splits {1,2,3} vs {4,5,6}; y = {0,0,1} vs {1,1,0} — mixed
    val d = Seq(
      (1L, Seq(1.0), 0.0), (2L, Seq(2.0), 0.0), (3L, Seq(3.0), 1.0),
      (4L, Seq(4.0), 1.0), (5L, Seq(5.0), 1.0), (6L, Seq(6.0), 0.0))
      .toDF("id", "features", "y")
    val ig = FeatureScreen.infoGain(d, col("features"), col("y"),
      col("id")).head().getDouble(2)
    assert(ig > 0.0 && ig < 1.0, s"got $ig")
  }
}
