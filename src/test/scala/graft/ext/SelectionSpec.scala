package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class SelectionSpec extends GraftSpec {
  import spark.implicits._

  // freq: d=4, a=3, c=3, b=2 → top-3 vocab (freq DESC, token ASC) =
  // {d, a, c}; b is OOV. Target = en docs (d1, d2).
  private lazy val docs = Seq(
    (1L, "a a b", "en"),
    (2L, "a b c", "en"),
    (3L, "c c d", "es"),
    (4L, "d d d", "es"),
    (5L, null.asInstanceOf[String], "es")
  ).toDF("doc_id", "text", "lang")

  private lazy val ratios = Selection.ngramLogRatios(
    docs, docs.filter($"lang" === "en"), "text", vocabK = 3)

  private def r12(x: Double): BigDecimal =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  test("ngramLogRatios: V+1 bucket domain with hand-computed ratios") {
    val m = ratios.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDecimal(3))).toMap
    assert(m.keySet == Set("d", "a", "c", Selection.OovBucket))
    assert(m("a")._1 == 3L && m("a")._2 == 3L)
    assert(m(Selection.OovBucket)._1 == 2L &&
      m(Selection.OovBucket)._2 == 2L)
    assert(m("d")._1 == 4L && m("d")._2 == 0L)
    // N_raw=12, N_tgt=6, V=3: p_t=(c+1)/10, p_r=(c+1)/16
    assert(BigDecimal(m("a")._3) ==
      r12(math.log(4.0 / 10) - math.log(4.0 / 16)))   // ln 1.6
    assert(BigDecimal(m("d")._3) ==
      r12(math.log(1.0 / 10) - math.log(5.0 / 16)))   // ln 0.32
    assert(BigDecimal(m("c")._3) ==
      r12(math.log(2.0 / 10) - math.log(4.0 / 16)))   // ln 0.8
  }

  test("importanceWeights: exact decimal token-sum; NULL text weighs 0") {
    val lr = ratios.collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(3))).toMap
    val w = Selection.importanceWeights(docs, "doc_id", "text", ratios)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toMap
    assert(w(1L) == ((3L, lr("a") * 2 + lr(Selection.OovBucket))))
    assert(w(2L) == ((3L,
      lr("a") + lr("c") + lr(Selection.OovBucket))))
    assert(w(4L) == ((3L, lr("d") * 3)))
    assert(w(5L) == ((0L, BigDecimal(0))))
    // the target slice outscores the off-target slice
    assert((w(1L)._2 + w(2L)._2) / 2 > (w(3L)._2 + w(4L)._2) / 2)
  }

  test("select: deterministic top-k by (weight DESC, id), dense ranks") {
    val sel = Selection.select(
      Selection.importanceWeights(docs, "doc_id", "text", ratios),
      "doc_id", k = 3).collect()
    assert(sel.length == 3)
    assert(sel.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    val ws = sel.map(r => BigDecimal(r.getDecimal(2)))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // en docs 1 and 2 lead the selection
    assert(sel.take(2).map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("weights are repartition-invariant (exact decimal fold)") {
    val a = Selection.importanceWeights(docs, "doc_id", "text", ratios)
      .collect().map(r => (r.getLong(0), r.getDecimal(2))).toSet
    val b = Selection.importanceWeights(
        docs.repartition(7), "doc_id", "text", ratios)
      .collect().map(r => (r.getLong(0), r.getDecimal(2))).toSet
    assert(a == b)
  }

  test("ngramLogRatiosFromTf: merged shard tf ≡ from-scratch fit") {
    def tf(df: org.apache.spark.sql.DataFrame) =
      TextOps.termFrequencies(df, "text")
    val rawTf = TextOps.mergeTermFrequencies(
      tf(docs.filter($"doc_id" % 2 === 0)),
      tf(docs.filter($"doc_id" % 2 === 1)))
    val tgt = docs.filter($"lang" === "en")
    val tgtTf = TextOps.mergeTermFrequencies(
      tf(tgt.filter($"doc_id" % 2 === 0)),
      tf(tgt.filter($"doc_id" % 2 === 1)))
    val merged = Selection.ngramLogRatiosFromTf(rawTf, tgtTf, 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3))).toSet
    val direct = ratios.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3))).toSet
    assert(merged == direct)
  }

  test("scale shape: ratio table rides broadcast, no cartesian") {
    val plan = Selection.importanceWeights(docs, "doc_id", "text", ratios)
      .queryExecution.executedPlan.toString
    // vocab + ratio lookups are broadcast hash joins; the only nested-
    // loop joins are the 1-row scalar attaches inside ngramLogRatios
    // (the established crossJoin(broadcast(<1-row agg>)) pattern).
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("softDedupWeights: 1/cluster_size decimals, rows preserved, " +
      "NULL keys one cluster") {
    val d = Seq(
      (1L, "k1"), (2L, "k1"), (3L, "k1"),
      (4L, "k2"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String])
    ).toDF("id", "k")
    val w = Selection.softDedupWeights(d, "id", "k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap
    assert(w.size == 6) // soft: nothing dropped
    assert(w(1L) == ((3L, r12(1.0 / 3))))
    assert(w(2L) == w(1L) && w(3L) == w(1L))
    assert(w(4L) == ((1L, r12(1.0))))
    assert(w(5L) == ((2L, r12(0.5))) && w(6L) == w(5L))
    // a cluster's total weight is ~1 doc's worth: 3·round(1/3) ≈ 1
    assert((w(1L)._2 * 3 - 1).abs < BigDecimal("1e-11"))
  }

  test("perplexityBuckets: per-group NTILE terciles, score-then-id " +
      "order, head = lowest score") {
    val scored = Seq(
      // group g1: 7 docs, scores break 3/2/2 by the NTILE rule
      (1L, "g1", 0.1), (2L, "g1", 0.2), (3L, "g1", 0.3), (4L, "g1", 0.4),
      (5L, "g1", 0.5), (6L, "g1", 0.6), (7L, "g1", 0.7),
      // group g2: ties everywhere — the id tiebreak decides
      (10L, "g2", 1.0), (11L, "g2", 1.0), (12L, "g2", 1.0)
    ).toDF("id", "g", "s")
    val b = Selection.perplexityBuckets(scored, "id", "g", "s").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // 7 rows: first ceil buckets get the extra row → 3,2,2
    assert(Seq(1L, 2L, 3L).forall(b(_) == "head"))
    assert(Seq(4L, 5L).forall(b(_) == "middle"))
    assert(Seq(6L, 7L).forall(b(_) == "tail"))
    // equal scores: lowest id is head
    assert(b(10L) == "head" && b(11L) == "middle" && b(12L) == "tail")
  }

  test("domainReweight: hand-computed linearized MW step; clamp floors " +
      "a catastrophic domain at 0") {
    val losses = Seq(("d1", 1.0), ("d2", 2.0), ("d3", 6.0))
      .toDF("domain", "loss")
    // mean 3: excess −2, −1, 3; η=0.5 → factors 0, 0.5, 2.5; total 3
    val w = Selection.domainReweight(losses, "domain", "loss", eta = 0.5)
      .collect()
      .map(r => r.getString(0) ->
        ((BigDecimal(r.getDecimal(2)), r.getDouble(3)))).toMap
    assert(w("d1") == ((r12(-2.0), 0.0)))        // clamped: max(0, 1−1)
    assert(w("d2") == ((r12(-1.0), 0.166667)))   // 0.5/3 → 6 dp
    assert(w("d3") == ((r12(3.0), 0.833333)))    // 2.5/3
  }

  test("softDedup index laws: merge(index(a), index(b)) ≡ index(a ∪ b); " +
      "indexed batch weights ≡ full-corpus weights restricted to batch; " +
      "NULL keys survive the lookup") {
    val hist = Seq((1L, "k1"), (2L, "k1"),
      (3L, null.asInstanceOf[String])).toDF("id", "k")
    val batch = Seq((10L, "k1"), (11L, "k2"),
      (12L, null.asInstanceOf[String])).toDF("id", "k")
    // merge law
    val mergedIdx = Selection.mergeSoftDedupIndex(
        Selection.buildSoftDedupIndex(hist, "k")
          .unionByName(Selection.buildSoftDedupIndex(batch, "k")))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val wholeIdx = Selection.buildSoftDedupIndex(
        hist.unionByName(batch), "k")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(mergedIdx == wholeIdx)
    assert(mergedIdx == Map(Some("k1") -> 3L, Some("k2") -> 1L,
      (None: Option[String]) -> 2L))
    // indexed ≡ from-scratch restricted to batch (incl. the NULL key)
    val indexed = Selection.softDedupWeightsIndexed(batch,
        Selection.buildSoftDedupIndex(hist, "k"), "id", "k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toSet
    val whole = Selection.softDedupWeights(
        hist.unionByName(batch), "id", "k")
      .filter($"id" >= 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toSet
    assert(indexed == whole)
    assert(indexed.exists(t => t._1 == 12L && t._2 == 2L),
      "NULL-keyed batch doc found its history NULL cluster")
  }

  test("bucket thresholds: cuts are the tile maxima; indexed assignment " +
      "matches the self-contained buckets away from cut ties; unseen " +
      "group buckets to tail") {
    val scored = Seq(
      (1L, "g1", 0.1), (2L, "g1", 0.2), (3L, "g1", 0.3), (4L, "g1", 0.4),
      (5L, "g1", 0.5), (6L, "g1", 0.6), (7L, "g1", 0.7)
    ).toDF("id", "g", "s")
    val th = Selection.buildBucketThresholds(scored, "id", "g", "s")
      .collect()
    assert(th.length == 1)
    assert((th(0).getString(0), th(0).getDouble(1), th(0).getDouble(2))
      == (("g1", 0.3, 0.5))) // head tile {0.1,0.2,0.3}, middle {0.4,0.5}
    // a fresh batch with scores strictly between the corpus's buckets
    val batch = Seq((20L, "g1", 0.05), (21L, "g1", 0.45),
      (22L, "g1", 0.9), (23L, "g1", 0.3), (24L, "gX", 0.0))
      .toDF("id", "g", "s")
    val got = Selection.bucketsIndexed(batch,
        Selection.buildBucketThresholds(scored, "id", "g", "s"), "g", "s")
      .select($"id", $"ppl_bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(20L) == "head" && got(21L) == "middle" && got(22L) == "tail")
    assert(got(23L) == "head", "a cut tie lands in the lower bucket")
    assert(got(24L) == "tail", "unseen group defaults to tail")
  }

  test("domainReweight: weights renormalize to ~1 and the input stays " +
      "domain-sized metadata (no corpus shuffle added)") {
    val losses = Seq(("a", 1.2), ("b", 1.5), ("c", 0.9), ("d", 1.8))
      .toDF("domain", "loss")
    val out = Selection.domainReweight(losses, "domain", "loss")
    val total = out.agg(sum($"weight")).collect()(0).getDouble(0)
    assert((total - 1.0).abs < 1e-5)
    // plan: tiny frame + two broadcast scalar attaches, no SortMergeJoin
    assert(!out.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"))
  }

  test("prototypicalityPrune: hand geometry — the centroid twin ranks " +
      "first and is pruned, the outlier survives, zero-norm ranks last") {
    // label "x": two copies of e1, one e2, one zero vector.
    // centroid = round(mean, 6) per dim = (0.5, 0.25, 0)
    val emb = Seq(
      (1L, "x", Seq(1f, 0f, 0f)),
      (2L, "x", Seq(1f, 0f, 0f)),
      (3L, "x", Seq(0f, 1f, 0f)),
      (4L, "x", Seq(0f, 0f, 0f)),
      (5L, "y", Seq(0f, 0f, 2f))
    ).toDF("vec_id", "label", "embedding")
    val got = Selection.prototypicalityPrune(
        emb, "vec_id", "embedding", "label", pruneFrac = 0.3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
          r.getLong(3), r.getBoolean(4))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c = Seq(0.5, 0.25, 0.0) // exact 6-dp means
    val nc = math.sqrt(c.map(v => v * v).sum)
    def cos(v: Seq[Double]): Double = {
      val dot = v.zip(c).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(v.map(x => x * x).sum) * nc)
    }
    // ranks in "x": e1 twins (cos highest) -> ids 1,2; outlier 3; zero 4
    assert(got(("x", 1L)) == (r6(cos(Seq(1, 0, 0))), 1L, false),
      s"${got(("x", 1L))}") // floor(0.3*4) = 1 -> rank 1 pruned
    assert(got(("x", 2L)) == (r6(cos(Seq(1, 0, 0))), 2L, true))
    assert(got(("x", 3L)) == (r6(cos(Seq(0, 1, 0))), 3L, true))
    val (zs, zr, zk) = got(("x", 4L))
    assert(zs.isNaN && zr == 4L && zk,
      "zero-norm must rank last with NULL sim and survive")
    // label "y": its own centroid's twin, cos = 1, n = 1, floor(.3) = 0
    assert(got(("y", 5L)) == (1.0, 1L, true))
    intercept[IllegalArgumentException] {
      Selection.prototypicalityPrune(emb, "vec_id", "embedding", "label",
        pruneFrac = 1.0)
    }
  }
}
