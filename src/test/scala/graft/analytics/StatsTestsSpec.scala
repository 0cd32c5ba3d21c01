package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions._

class StatsTestsSpec extends GraftSpec {
  import spark.implicits._

  test("chiSquared: perfectly proportional cells score 0; perfect " +
    "association scores n; dof = (R-1)(C-1)") {
    def rows(spec: Seq[((String, String), Int)]) =
      spec.flatMap { case (ab, k) => Seq.fill(k)(ab) }
        .toDF("a", "b")
    val indep = StatsTests.chiSquared(
      rows(Seq(("x", "p") -> 10, ("x", "q") -> 20,
        ("y", "p") -> 20, ("y", "q") -> 40)),
      col("a"), col("b")).collect().head
    assert(indep.getLong(0) == 90L)
    assert(indep.getLong(3) == 1L, "dof")
    assert(indep.getDouble(4) == 0.0, "proportional ⇒ χ² = 0")
    val assoc = StatsTests.chiSquared(
      rows(Seq(("x", "p") -> 10, ("y", "q") -> 10)),
      col("a"), col("b")).collect().head
    assert(assoc.getDouble(4) == 20.0, "φ = 1 ⇒ χ² = n")
  }

  test("tvDistance: 0 for identical samples, 1 for disjoint supports, " +
    "hand-computed half-overlap; union bins carry absent-side zeros") {
    def df(vs: Double*) = vs.toDF("v")
    val a = df(1.0, 6.0) // width-5 bins 0 and 1, share .5/.5
    assert(StatsTests.tvDistance(a, a, col("v"), 5.0)
      .collect().head.getDouble(3) == 0.0)
    val disjoint = StatsTests.tvDistance(a, df(11.0, 16.0), col("v"), 5.0)
      .collect().head
    assert(disjoint.getLong(0) == 4L && disjoint.getDouble(3) == 1.0)
    // b all in bin 0 → TV = ½(|.5−1| + |.5−0|) = 0.5
    val half = StatsTests.tvDistance(a, df(1.0, 2.0), col("v"), 5.0)
      .collect().head
    assert(half.getDouble(3) == 0.5)
  }

  test("benfordProfile: arithmetic digit extraction across magnitudes; " +
    "expectations sum to 1; a perfectly Benford sample scores ~0") {
    val digits = StatsTests.benfordProfile(
        Seq(0.02, 3.5, 999.0, 1000.0, 0.5).toDF("v"), col("v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(digits == Map(2 -> 1L, 3 -> 1L, 9 -> 1L, 1 -> 1L, 5 -> 1L))
    assert(math.abs(StatsTests.benfordExpected.sum - 1.0) < 1e-12)
    // 1000 values drawn AS the Benford proportions → every term ≈ 0
    val counts = StatsTests.benfordExpected.map(p => math.round(p * 1000))
    val vals = counts.zipWithIndex.flatMap { case (k, i) =>
      Seq.fill(k.toInt)((i + 1).toDouble) }
    val prof = StatsTests.benfordProfile(vals.toDF("v"), col("v"))
      .collect()
    assert(prof.length == 9)
    assert(prof.map(_.getDouble(4)).sum < 0.05,
      "rounding-only χ² residue")
    // non-positive and NULL values drop
    assert(StatsTests.benfordProfile(
      Seq(Some(-5.0), Some(0.0), Option.empty[Double]).toDF("v"),
      col("v")).count() == 0L)
  }
}
