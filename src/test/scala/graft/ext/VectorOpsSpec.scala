package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.Row

class VectorOpsSpec extends GraftSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 10.0f, 7.0f)),
    (2L, Array(3.0f, 10.0f, 9.0f))
  ).toDF("vec_id", "embedding")

  test("dimStats: per-dimension mean and population stddev, 1-based dims") {
    val st = VectorOps.dimStats(vecs, "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(st(1) == ((2.0, 1.0)))
    assert(st(2) == ((10.0, 0.0))) // constant dimension
    assert(st(3) == ((8.0, 1.0)))
  }

  test("standardize: z-scores against collected stats; a constant " +
    "dimension z-scores to NULL, excess dimensions to NULL") {
    val st = VectorOps.dimStats(vecs, "embedding")
    val withLong = vecs.union(
      Seq((3L, Array(2.0f, 10.0f, 8.0f, 99.0f))).toDF("vec_id", "embedding"))
    val z = VectorOps.standardize(withLong, "embedding", st)
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(z(1L) == Seq(-1.0, null, -1.0))
    assert(z(2L) == Seq(1.0, null, 1.0))
    assert(z(3L) == Seq(0.0, null, 0.0, null)) // 4th dim unseen by stats
  }

  test("projectionSigns: deterministic in the salt, ±1 entries, " +
    "salt-sensitive") {
    val a = VectorOps.projectionSigns("s1", 16, 4)
    assert(a == VectorOps.projectionSigns("s1", 16, 4))
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    assert(a != VectorOps.projectionSigns("s2", 16, 4))
    assert(a.size == 4 && a.forall(_.size == 16))
  }

  test("randomProject: each output is the signed sum over √d; a vector " +
    "of the wrong length projects to NULL") {
    val d = 4
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val signs = VectorOps.projectionSigns("t", d, 2)
    val out = VectorOps.randomProject(df, "embedding", d, 2, "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    val v = Array(1.0, 2.0, 3.0, 4.0)
    for (j <- 0 until 2) {
      val expect = v.zip(signs(j)).map { case (x, s) => x * s }.sum /
        math.sqrt(d.toDouble)
      val got = out(1L).getDouble(2 + j)
      assert(math.abs(got - expect) < 1e-6, s"p${j + 1}: $got vs $expect")
    }
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(3))
  }

  test("centroidDrift: identical corpora → cosine 1 / l2 0; orthogonal " +
    "centroids → cosine 0 / l2 √2") {
    val ax = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val ay = Seq((3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val same = VectorOps.centroidDrift(ax, ax, "embedding").collect().head
    assert(same.getLong(0) == 2L)
    assert(same.getDouble(1) == 1.0 && same.getDouble(2) == 0.0)
    val orth = VectorOps.centroidDrift(ax, ay, "embedding").collect().head
    assert(orth.getDouble(1) == 0.0)
    assert(orth.getDouble(2) == 1.414214)
  }

  test("embeddingHealth: hand-computed norms, zero-vector census, and " +
    "anisotropy 1.0 for a perfectly collapsed (one-direction) corpus") {
    val df = Seq(
      (1L, Some(Seq(3.0f, 4.0f))), // norm 5, unit (.6, .8)
      (2L, Some(Seq(6.0f, 8.0f))), // norm 10, same direction
      (3L, Some(Seq(0.0f, 0.0f))), // zero-norm: counted, excluded from units
      (4L, None) // NULL vector: excluded entirely
    ).toDF("vec_id", "embedding")
    val r = VectorOps.embeddingHealth(df).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 5.0, "mean norm (5+10+0)/3")
    assert(r.getDouble(3) == 4.082483, "sqrt(125/3 - 25)")
    assert(r.getDouble(4) == 1.0, "collapsed corpus => anisotropy 1")
  }

  test("embeddingHealth anisotropy is 0 for a perfectly spread corpus " +
    "and partitioning-invariant") {
    val spread = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r1 = VectorOps.embeddingHealth(spread.repartition(1)).collect().head
    val r7 = VectorOps.embeddingHealth(spread.repartition(7)).collect().head
    assert(r1 == r7, "decimal folds make the report partitioning-invariant")
    assert(r1.getDouble(4) == 0.0)
    assert(r1.getDouble(2) == 1.0 && r1.getDouble(3) == 0.0)
  }

  test("randomProject at 1 and 5 partitions agrees (zero-shuffle " +
    "projection, but the fold order is per-row fixed)") {
    val rnd = new scala.util.Random(9)
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    def run(parts: Int): Seq[Row] =
      VectorOps.randomProject(df.repartition(parts), "embedding", 8, 3)
        .orderBy("vec_id").collect().toSeq
    assert(run(1) == run(5))
  }

  test("daviesBouldin: hand-computed scatter and worst ratio on two " +
    "planted clusters; a singleton label has zero scatter") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Seq(0f, 0f), "a"), (2L, Seq(2f, 0f), "a"),
      (3L, Seq(10f, 0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.daviesBouldin(df, "embedding", "label", "vec_id")
      .collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = got.find(_.getString(0) == "a").get
    val b = got.find(_.getString(0) == "b").get
    // centroid a = (1,0): scatter = mean(1,1) = 1; M(a,b) = 9
    assert(a.getLong(1) == 2L && a.getDouble(2) == 1.0)
    assert(a.getDouble(3) == r6((1.0 + 0.0) / 9.0), s"$a")
    assert(b.getLong(1) == 1L && b.getDouble(2) == 0.0,
      "singleton scatter is zero")
    assert(b.getDouble(3) == a.getDouble(3), "symmetric pair ratio")
  }

  test("daviesBouldin: coincident centroids leave r_max NULL; tighter " +
    "clusters score lower (better) ratios") {
    import org.apache.spark.sql.functions.col
    val same = Seq((1L, Seq(1f, 1f), "a"), (2L, Seq(1f, 1f), "b"))
      .toDF("vec_id", "embedding", "label")
    assert(VectorOps.daviesBouldin(same, "embedding", "label", "vec_id")
      .collect().forall(_.isNullAt(3)), "no separation to score")
    def rmax(spread: Float): Double = {
      val df = Seq(
        (1L, Seq(-spread, 0f), "a"), (2L, Seq(spread, 0f), "a"),
        (3L, Seq(10f - spread, 0f), "b"), (4L, Seq(10f + spread, 0f), "b"))
        .toDF("vec_id", "embedding", "label")
      VectorOps.daviesBouldin(df, "embedding", "label", "vec_id")
        .collect().head.getDouble(3)
    }
    assert(rmax(0.5f) < rmax(2.0f), "compactness improves the index")
  }

  test("matryoshkaEval: hand-built prefix geometry — truncation flips " +
      "the neighbor, the full-dim row is its own 1.0 baseline") {
    import org.apache.spark.sql.functions._
    // query q=(1,0,0,1). Under the 2-dim prefix, n1=(1,0,...) is the
    // perfect match; under full 4 dims, n2=(1,0,0,1) is. n3 is noise.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 1f)),  // the query (vec_id < 1)
      (1L, Seq(1f, 0f, 9f, -9f)), // prefix twin, full-dim stranger
      (2L, Seq(1f, 0f, 0f, 1f)),  // full-dim twin
      (3L, Seq(-1f, 2f, -3f, 4f))
    ).toDF("vec_id", "embedding")
    val got = VectorOps.matryoshkaEval(emb, "vec_id", "embedding",
        prefixes = Seq(2, 4), k = 1, col("vec_id") < 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // prefix 2: top-1 is vec 1 or 2 (both cosine 1 on (1,0)) → tie
    // breaks to cid 1, which is NOT the full-dim top-1 (vec 2) → recall 0
    assert(got(2L) == 0.0, "the truncated index found the wrong neighbor")
    assert(got(4L) == 1.0, "full dims are their own baseline")
    // widen k: with k=2 both twins fit, truncation recovers the true one
    val got2 = VectorOps.matryoshkaEval(emb, "vec_id", "embedding",
        Seq(2, 4), k = 2, col("vec_id") < 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got2(2L) == 0.5 && got2(4L) == 1.0)
    intercept[IllegalArgumentException] {
      VectorOps.matryoshkaEval(emb, "vec_id", "embedding", Seq.empty, 1,
        col("vec_id") < 1)
    }
  }

  test("matryoshkaEval: the eval-sample contract is enforced — an " +
      "oversized query set fails fast, maxQueries = 0 opts out, and " +
      "prefixes must reach the true dimensionality") {
    import org.apache.spark.sql.functions._
    val emb = (0L to 9L).map(i => (i, Seq(i.toFloat, 1f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    // queryPred matching the whole corpus over a 3-row cap: the |Q|·n
    // quadratic the guard exists to refuse (the q22 precedent)
    val e = intercept[IllegalArgumentException] {
      VectorOps.matryoshkaEval(emb, "vec_id", "embedding", Seq(2, 4),
        k = 1, queryPred = lit(true), maxQueries = 3)
    }
    assert(e.getMessage.contains("matryoshkaEval"), e.getMessage)
    // the documented opt-out: maxQueries = 0 disables the probe
    assert(VectorOps.matryoshkaEval(emb, "vec_id", "embedding", Seq(2, 4),
      k = 1, queryPred = lit(true), maxQueries = 0).count() == 2L)
    // a prefix set that omits the true dimensionality would silently
    // grade against a truncated baseline — refused loudly instead
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.matryoshkaEval(emb, "vec_id", "embedding", Seq(1, 2),
        k = 1, col("vec_id") < 1)
    }
    assert(e2.getMessage.contains("dimensionality"), e2.getMessage)
    // mixed-length vectors: the aggregate probe fires DETERMINISTICALLY
    // (an arbitrary-row probe would pass or fail depending on which row
    // it happened to sample)
    val mixed = Seq((0L, Seq(1f, 0f, 0f, 1f)), (1L, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      VectorOps.matryoshkaEval(mixed, "vec_id", "embedding", Seq(2, 4),
        k = 1, col("vec_id") < 1)
    }
    assert(e3.getMessage.contains("homogeneous"), e3.getMessage)
  }
}
