package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends GraftSpec {
  import spark.implicits._

  private def cal = Seq(
    ("a", 0.0, 1L), ("a", 1.0, 2L), ("a", 2.0, 3L), ("a", 3.0, 4L))
    .toDF("g", "v", "id")

  test("splitConformal: hand-computed Vovk rank — mean 1.5, residuals " +
    "{0.5,0.5,1.5,1.5}, q̂ at ⌈(n+1)(1−α)⌉; empirical coverage counted") {
    val test = Seq(("a", 0.0, 10L), ("a", 3.5, 11L)).toDF("g", "v", "id")
    // α=0.5 → rank ⌈5·0.5⌉ = 3 → q̂ = 1.5; |0−1.5|≤1.5 in, |3.5−1.5| out
    val got = Conformal.splitConformal(cal, test, "g", "v", "id", 0.5)
      .collect().head
    assert(got.getLong(1) == 4L && got.getLong(2) == 2L)
    assert(got.getDouble(3) == 1.5, "prediction = calibration mean")
    assert(got.getDouble(4) == 1.5, "q̂ = 3rd smallest residual")
    assert(got.getDouble(5) == 0.5)
  }

  test("splitConformal: the rank clamps into the calibration sample; " +
    "one-sided groups drop; alpha is validated") {
    // α=0.1 → ⌈5·0.9⌉ = 5 > n=4 → clamp to 4 → q̂ = max residual
    val test = Seq(("a", 3.0, 10L), ("b", 1.0, 11L)).toDF("g", "v", "id")
    val got = Conformal.splitConformal(cal, test, "g", "v", "id", 0.1)
      .collect()
    assert(got.length == 1, "group b has no calibration half")
    assert(got.head.getDouble(4) == 1.5 && got.head.getDouble(5) == 1.0)
    intercept[IllegalArgumentException] {
      Conformal.splitConformal(cal, test, "g", "v", "id", 0.0)
    }
  }

  test("splitConformal: coverage holds at or above 1−α on an " +
    "exchangeable split (the guarantee, checked empirically)") {
    val rows = (1L to 400L).map(i =>
      ("g", (i * 2654435761L % 97L).toDouble, i))
    val c = rows.filter(_._3 % 2 == 0).toDF("g", "v", "id")
    val t = rows.filter(_._3 % 2 == 1).toDF("g", "v", "id")
    val cov = Conformal.splitConformal(c, t, "g", "v", "id", 0.2)
      .collect().head.getDouble(5)
    assert(cov >= 0.75, s"coverage $cov far below 1−α = 0.8")
  }
}
