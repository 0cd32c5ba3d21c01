package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions.col

class SketchesSpec extends GraftSpec {
  import spark.implicits._

  // skewed multiset: key k appears k times, keys 1..30 — forced
  // collisions at width 8
  private lazy val skewed =
    (1L to 30L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")

  private def exact = skewed.groupBy(col("k"))
    .agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n"))

  test("cmsEstimate never undercounts, and row sums equal the " +
    "insertion total") {
    val sk = Sketches.cmsBuild(skewed, col("k"), depth = 4, width = 8)
    val est = Sketches.cmsEstimate(sk, exact, "k", depth = 4, width = 8)
      .join(exact, Seq("k"))
      .collect()
    assert(est.length == 30)
    est.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"CMS undercounted key ${r.getLong(0)}: $r"))
    // every row of the sketch holds the full multiset
    val rowSums = sk.groupBy(col("r"))
      .agg(org.apache.spark.sql.functions.sum(col("cnt")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = skewed.count()
    (0 to 3).foreach(r => assert(rowSums(r) == total, s"row $r"))
  }

  test("bucket arithmetic is the documented Carter-Wegman chain " +
    "(replayable by an external engine)") {
    val sk = Sketches.cmsBuild(Seq(42L).toDF("k"), col("k"),
      depth = 4, width = 64)
    val got = sk.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val p = Sketches.P
    Sketches.hashRows.zipWithIndex.foreach { case ((a, b), r) =>
      val want = ((a * (42L % p) + b) % p) % 64L
      assert(got(r) == want, s"row $r: got ${got(r)}, want $want")
    }
  }

  test("merge law: element-wise fold of sub-sketches equals the " +
    "one-shot sketch, cell for cell") {
    val parted = skewed.withColumn("part", col("k") % 3)
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuildPartitioned(parted, col("part"), col("k"),
        depth = 3, width = 8).drop("part"))
    val full = Sketches.cmsBuild(skewed, col("k"), depth = 3, width = 8)
    val m = merged.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val f = full.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == f, s"merged != full:\n$m\n$f")
  }

  test("cmsJoinSize never undercounts the true join size; disjoint " +
    "key sets with no collisions estimate 0") {
    val a = (1L to 20L).flatMap(k => Seq.fill(2)(k)).toDF("k")
    val b = (11L to 30L).toDF("k")
    // true join size: keys 11..20 with c_a=2, c_b=1 → 20
    val est = Sketches.cmsJoinSize(
      Sketches.cmsBuild(a, col("k"), depth = 4, width = 16),
      Sketches.cmsBuild(b, col("k"), depth = 4, width = 16))
      .head().getLong(0)
    assert(est >= 20L, s"inner product must cover the true size: $est")
    // a join against an empty side is exactly 0
    val zero = Sketches.cmsJoinSize(
      Sketches.cmsBuild(a, col("k")),
      Sketches.cmsBuild(a.limit(0), col("k")))
      .head().getLong(0)
    assert(zero == 0L, "empty side has no co-occupied cells")
  }

  test("a never-inserted key reads only collision mass (possibly 0); " +
    "depth/width are validated") {
    val sk = Sketches.cmsBuild(skewed, col("k"), depth = 4, width = 8)
    val ghost = Sketches.cmsEstimate(sk, Seq(999999L).toDF("k"), "k",
      depth = 4, width = 8).collect()
    assert(ghost.length == 1 && ghost.head.getLong(1) >= 0L)
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(skewed, col("k"), depth = 9)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(skewed, col("k"), width = 0)
    }
  }
}
