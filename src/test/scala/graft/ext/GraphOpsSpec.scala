package graft.ext

import graft.GraftSpec
import java.math.{BigDecimal => JBD, RoundingMode}

class GraphOpsSpec extends GraftSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3,
      damping: Double = 0.85, parts: Int = 1): Map[Long, Double] =
    GraphOps.pageRank(
        edges.toDF("src", "dst").repartition(parts), "src", "dst",
        iters, damping)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Driver-side reference with the engine's exact algebra: round-12
    * decimal terms (Spark's toString-based double→decimal conversion),
    * exact decimal sums, round-9 ranks. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int,
      damping: Double): Map[Long, Double] = {
    def r9(x: Double): Double =
      JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP).doubleValue
    def dec12(x: Double): JBD = JBD.valueOf(
        JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP).doubleValue)
      .setScale(12, RoundingMode.HALF_UP)
    val e = edges.distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> r9(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        dec12(r(u) / deg(u)) }.reduce(_.add(_))).toMap
      val dm = nodes.filterNot(deg.contains).map(v => dec12(r(v)))
        .foldLeft(JBD.ZERO.setScale(12))(_.add(_))
      r = nodes.map { v =>
        v -> r9((1.0 - damping) / n + damping *
          (contrib.get(v).map(_.doubleValue).getOrElse(0.0) +
            dm.doubleValue / n))
      }.toMap
    }
    r
  }

  test("ring graph: all ranks equal 1/n and the total mass stays 1") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(r.values.toSet.size == 1, s"ring ranks diverged: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(math.abs(r(1L) - 1.0 / 3) < 1e-6)
  }

  test("star graph: the pointed-at center outranks its leaves; dangling " +
    "center mass redistributes so the total stays 1") {
    val r = ranks(Seq((1L, 9L), (2L, 9L), (3L, 9L)))
    assert(r(9L) > r(1L), s"center must outrank leaves: $r")
    assert(r(1L) == r(2L) && r(2L) == r(3L))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("multi-edges collapse: duplicating an edge changes nothing") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(ranks(base) == ranks(base ++ base))
  }

  test("matches the driver-side reference algebra exactly on seeded " +
    "random graphs, at 1 and 7 partitions") {
    val rnd = new scala.util.Random(1123)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(30)(
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
        .filter { case (a, b) => a != b }
      val expect = refRanks(edges, iters = 3, damping = 0.85)
      assert(ranks(edges, parts = 1) == expect, s"trial $trial, 1 part")
      assert(ranks(edges, parts = 7) == expect, s"trial $trial, 7 parts")
    }
  }

  test("triangleCounts: K4 has 4 triangles crediting every corner 3×; " +
    "direction, multiplicity and self-loops never inflate the count") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    // reverse every edge, duplicate one, add a self-loop and a pendant
    val noisy = k4 ++ k4.map(_.swap) ++ Seq((1L, 2L), (3L, 3L), (4L, 9L))
    val got = GraphOps.triangleCounts(
        noisy.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
    // a triangle-free graph (star) returns an empty frame
    assert(GraphOps.triangleCounts(
      Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst"),
      "src", "dst").count() == 0L)
  }

  test("coOccurrence: support counts distinct groups, threshold cuts, " +
    "pairs oriented low→high") {
    val rel = Seq((10L, 1L), (10L, 2L), (10L, 2L), // dup row collapses
      (20L, 2L), (20L, 1L), (30L, 1L), (30L, 2L), (30L, 3L))
      .toDF("g", "item")
    val co = GraphOps.coOccurrence(rel, "g", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // (1,2) shares groups 10, 20, 30; (1,3)/(2,3) share only group 30
    assert(co == Map((1L, 2L) -> 3L), co)
  }

  test("coOccurrence: maxGroupSize truncates a degenerate hot group to " +
    "its smallest item ids before pairing; default-off is unchanged") {
    // group 10 is hot (items 1..5 → 10 pairs uncapped); group 20 is
    // small and must be untouched by the cap
    val rel = ((1L to 5L).map(i => (10L, i)) ++ Seq((20L, 1L), (20L, 2L)))
      .toDF("g", "item")
    val uncapped = GraphOps.coOccurrence(rel, "g", "item", minSupport = 1L)
    assert(uncapped.count() == 10L) // C(5,2) ∪ {(1,2)} — (1,2) merges
    val capped = GraphOps.coOccurrence(rel, "g", "item",
        minSupport = 1L, maxGroupSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // hot group keeps items {1,2,3} → pairs (1,2)(1,3)(2,3); group 20
    // still contributes its (1,2), so support(1,2) = 2
    assert(capped ==
      Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L), capped)
  }

  test("degreeProfile: distinct-edge degrees, zero-filled missing " +
    "directions") {
    val prof = GraphOps.degreeProfile(
        Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"),
        "src", "dst")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(prof(1L) == ((2L, 0L, 2L))) // dup edge collapsed
    assert(prof(2L) == ((1L, 1L, 2L)))
    assert(prof(3L) == ((0L, 2L, 2L)))
  }

  test("hits: hand-computed two-round authority scores; multi-edges " +
    "collapse; topK and iters validated") {
    // c1→{p1,p2}, c2→{p2}, c3→{p2,p3}:
    // h1 = (2,1,2); a1 = (p1:2, p2:5, p3:2); h2 = (7,5,7);
    // a2 = (p1:7, p2:19, p3:7) — total 33
    val edges = Seq((1L, 11L), (1L, 12L), (1L, 12L), (2L, 12L),
      (3L, 12L), (3L, 13L)).toDF("src", "dst")
    val got = GraphOps.hits(edges, "src", "dst", iters = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (12L, 19L, 0.575758),
      (11L, 7L, 0.212121),
      (13L, 7L, 0.212121)), s"${got.toSeq}")
    // one round stops at a1; topK cuts with the id tiebreak
    val one = GraphOps.hits(edges, "src", "dst", iters = 1, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.toSeq == Seq((12L, 5L), (11L, 2L)), s"${one.toSeq}")
    intercept[IllegalArgumentException] {
      GraphOps.hits(edges, "src", "dst", iters = 5)
    }
    intercept[IllegalArgumentException] {
      GraphOps.hits(edges, "src", "dst", topK = 0)
    }
  }

  test("clusteringCoefficient: a triangle closes fully (C = 1), a " +
    "star never closes (C = 0); counts match by hand") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = GraphOps.clusteringCoefficient(tri, "src", "dst").head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 3L)
    assert(got.getLong(2) == 1L && got.getLong(3) == 3L)
    assert(got.getDouble(4) == 1.0, s"$got")
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val s = GraphOps.clusteringCoefficient(star, "src", "dst").head()
    assert(s.getLong(2) == 0L && s.getLong(3) == 3L &&
      s.getDouble(4) == 0.0, s"$s")
  }

  test("assortativity: a star is perfectly disassortative (r = -1); " +
    "a triangle with a tail matches the replicated moment chain") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(GraphOps.assortativity(star, "src", "dst").head()
      .getDouble(2) == -1.0)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = GraphOps.assortativity(g, "src", "dst").head()
    // degrees 1→2, 2→2, 3→3, 4→1; both orientations of each edge
    val pts = Seq((2.0, 2.0), (2.0, 2.0), (2.0, 3.0), (3.0, 2.0),
      (2.0, 3.0), (3.0, 2.0), (3.0, 1.0), (1.0, 3.0))
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val r = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(got.getLong(0) == 4L && got.getLong(1) == 4L)
    assert(got.getDouble(2) == r6(r), s"$got")
    // a regular graph has no degree variance to correlate
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    assert(GraphOps.assortativity(ring, "src", "dst").head().isNullAt(2))
  }

  test("modularity: two triangles + bridge under the triangle " +
    "partition — hand-computed Q = 6/7 − 98/196") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b")).toDF("node", "c")
    val got = GraphOps.modularity(edges, "src", "dst",
      labels, "node", "c").head()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 6L && got.getLong(1) == 7L)
    assert(got.getLong(2) == 2L && got.getLong(3) == 6L)
    assert(got.getDouble(4) ==
      r6(6.0 / 7.0 - 98.0 / (4.0 * 7.0 * 7.0)), s"$got")
  }

  test("modularity: reversed duplicates and self-loops collapse; an " +
    "unlabeled endpoint drops its edge from the scored subgraph") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 9L))
      .toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("node", "c")
    val got = GraphOps.modularity(edges, "src", "dst",
      labels, "node", "c").head()
    // surviving labeled edges: 1-2 (intra a), 2-3 (cross) — m=2,
    // intra=1, d: 1→1, 2→2, 3→1 → d_a=3, d_b=1, S=10
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 3L && got.getLong(1) == 2L)
    assert(got.getLong(3) == 1L)
    assert(got.getDouble(4) == r6(1.0 / 2.0 - 10.0 / (4.0 * 2.0 * 2.0)))
    // a perfectly mixed partition scores <= 0
    val mixed = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("node", "c")
    assert(GraphOps.modularity(edges, "src", "dst", mixed, "node", "c")
      .head().getDouble(4) <= 0.0)
  }

  test("triangleCounts: degree-ordered orientation matches brute force " +
    "on a random hub-skewed graph") {
    // planted hub (node 0 linked to everyone) + random edges: the shape
    // the (degree, id) orientation exists for — the hub centers no
    // wedges. Brute force over the collected simple graph is truth.
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = ((1 until n).map(i => (0L, i.toLong)) ++
      Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)))
    val simple = edges.collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }.distinct
    val adj = simple.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = (for {
      (a, b) <- simple
      c <- (adj(a) & adj(b)).toSeq if c > b // toSeq: a Set generator would dedupe the yields
      node <- Seq(a, b, c)
    } yield node).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = GraphOps.triangleCounts(edges.toDF("src", "dst"),
        "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected.nonEmpty)
    assert(got == expected)
  }
}
