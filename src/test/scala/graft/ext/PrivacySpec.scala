package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends GraftSpec {
  import spark.implicits._

  // 3 classes: (n1,A)×4, (n1,B)×2, (n2,A)×1; sensitive s ∈ {x,y}
  private def df = Seq(
    (1L, "A", "x"), (1L, "A", "x"), (1L, "A", "y"), (1L, "A", "x"),
    (1L, "B", "x"), (1L, "B", "x"),
    (2L, "A", "y"))
    .toDF("nat", "seg", "sens")

  test("kAnonymityProfile: hand-computed class sizes {4,2,1} against " +
    "thresholds 2 and 5") {
    val got = Privacy.kAnonymityProfile(df,
      Seq(col("nat"), col("seg")), ks = Seq(2, 5))
      .collect()
    assert(got.length == 2)
    val k2 = got(0)
    // k=2: only the singleton class is below — 1 class, 1 row at risk
    assert(k2.getLong(0) == 2L && k2.getLong(1) == 3L)
    assert(k2.getLong(2) == 1L, "min class size")
    assert(k2.getLong(3) == 1L && k2.getLong(4) == 1L)
    assert(k2.getLong(5) == 7L)
    assert(k2.getDouble(6) == math.rint(1.0 / 7.0 * 1e6) / 1e6)
    val k5 = got(1)
    // k=5: every class is below — all 7 rows at risk
    assert(k5.getLong(3) == 3L && k5.getLong(4) == 7L)
    assert(k5.getDouble(6) == 1.0)
  }

  test("kAnonymityProfile: null quasi-identifier values form their own " +
    "class; thresholds are validated") {
    val withNull = df.union(
      Seq((null.asInstanceOf[java.lang.Long], "A", "x"),
        (null.asInstanceOf[java.lang.Long], "A", "x"))
        .toDF("nat", "seg", "sens"))
    val got = Privacy.kAnonymityProfile(withNull,
      Seq(col("nat"), col("seg")), ks = Seq(2)).collect().head
    assert(got.getLong(1) == 4L, "the (null,A) pair is a 4th class")
    assert(got.getLong(4) == 1L, "its 2 members are not at risk at k=2")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityProfile(df, Seq(col("nat")), ks = Seq(1))
    }
  }

  test("mergeClasses: disjoint-batch partials fold to the whole-data " +
    "class frame — the merged profile equals the batch profile") {
    val quasi = Seq(col("nat"), col("seg"))
    val whole = Privacy.kAnonymityProfile(df, quasi, ks = Seq(2, 5))
      .collect().toSeq
    val halves = Privacy.equivalenceClasses(
      df.filter(col("sens") === "x"), quasi)
      .union(Privacy.equivalenceClasses(
        df.filter(col("sens") =!= "x"), quasi))
    val merged = Privacy.kAnonymityFromClasses(
      Privacy.mergeClasses(halves, quasi), ks = Seq(2, 5))
      .collect().toSeq
    assert(merged == whole)
  }

  test("diversityHistogram: per-class distinct sensitive values — " +
    "{(n1,A)→2, (n1,B)→1, (n2,A)→1} summarizes to the histogram") {
    val got = Privacy.diversityHistogram(df,
      Seq(col("nat"), col("seg")), col("sens"))
      .collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L &&
      got(0).getLong(2) == 3L, "two homogeneous classes holding 3 rows")
    assert(got(1).getLong(0) == 2L && got(1).getLong(1) == 1L &&
      got(1).getLong(2) == 4L)
  }

  test("diversityHistogram: null sensitive values do not count as a " +
    "diversity value (all-null class lands at diversity 0)") {
    val d = Seq((1L, "A", "x"), (1L, "A", null.asInstanceOf[String]),
      (2L, "A", null.asInstanceOf[String]))
      .toDF("nat", "seg", "sens")
    val got = Privacy.diversityHistogram(d,
      Seq(col("nat"), col("seg")), col("sens")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((0L, 1L, 1L), (1L, 1L, 2L)))
  }
}
