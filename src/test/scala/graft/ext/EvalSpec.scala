package graft.ext

import graft.GraftSpec

class EvalSpec extends GraftSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes + one vector planted INSIDE
  // the wrong cluster — its neighbors all vote the other label
  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.01f), 0),
    (2L, Array(1.0f, 0.01f, 0.0f), 0),
    (3L, Array(0.99f, 0.0f, 0.02f), 0),
    (4L, Array(0.0f, 1.0f, 0.01f), 1),
    (5L, Array(0.01f, 1.0f, 0.0f), 1),
    (6L, Array(0.0f, 0.99f, 0.02f), 1),
    (7L, Array(0.0f, 1.0f, 0.03f), 0) // mislabeled plant
  ).toDF("vec_id", "embedding", "label")

  test("clean cluster members classify correctly; the planted vector " +
    "gets outvoted") {
    val got = Eval.knnClassify(emb, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    (1L to 3L).foreach(i => assert(got(i) == ((0, 0, 1L)), s"vec $i"))
    (4L to 6L).foreach(i => assert(got(i) == ((1, 1, 1L)), s"vec $i"))
    assert(got(7L) == ((0, 1, 0L)), "plant must be outvoted by its cluster")
  }

  test("vote ties break to the smallest label") {
    // k=2: each query sees one neighbor of each label → 1-1 tie → label 0
    val tied = Seq(
      (1L, Array(1.0f, 0.0f), 5),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.9f, -0.1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Eval.knnClassify(tied, k = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(1L) == 0, "1-1 tie must resolve to the smallest label")
  }

  test("NULL labels and NULL vectors are excluded from both sides") {
    val withNulls = emb.unionByName(Seq(
      (8L, Array(1.0f, 0.0f, 0.0f), Option.empty[Int]),
      (9L, null.asInstanceOf[Array[Float]], Option(0))
    ).toDF("vec_id", "embedding", "label"))
    val got = Eval.knnClassify(withNulls, k = 3)
    assert(got.count() == 7L)
    // and the labeled rows' votes are unchanged by the excluded rows
    assert(got.filter($"vec_id" === 7L).head().getInt(2) == 1)
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] { Eval.knnClassify(emb, k = 0) }
    intercept[IllegalArgumentException] {
      Eval.knnClassifyAnn(emb.limit(0), emb, k = 0)
    }
  }

  test("knnClassifyAnn: the ANN-fed vote equals exact knnClassify under " +
    "full probe coverage") {
    // full coverage: nprobe = centroid count → the cell equi-join
    // enumerates every labeled vector as a candidate, so the neighbor
    // frame IS the exact top-k and the shared vote must reproduce
    // knnClassify row for row — including the outvoted plant
    val centroids = AnnIvf.trainCentroids(emb, k = 2, iters = 2)
    val neighbors = AnnIvf.knnJoin(emb, centroids, kNeighbors = 3, nprobe = 2)
    val ann = Eval.knnClassifyAnn(neighbors, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    val exact = Eval.knnClassify(emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(ann == exact, s"ann=$ann exact=$exact")

    // the vote also composes with the PERSISTED neighbor path: an
    // indexed knnJoin feeds the identical frame shape
    val idx = AnnIvf.buildIvfIndex(emb, centroids)
    val annIdx = Eval.knnClassifyAnn(
        AnnIvf.knnJoinIndexed(idx, centroids, kNeighbors = 3, nprobe = 2),
        emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(annIdx == exact)
  }

  test("knnClassifyAnn: labelless rows neither vote nor get classified") {
    val withNulls = emb.unionByName(Seq(
      (8L, Array(0.0f, 1.0f, 0.02f), Option.empty[Int])
    ).toDF("vec_id", "embedding", "label"))
    val centroids = AnnIvf.trainCentroids(emb, k = 2, iters = 2)
    // neighbor frame over the LABELED subset (the documented leave-one-out
    // contract); labels frame still carries the NULL row — it must drop
    val neighbors = AnnIvf.knnJoin(emb, centroids, kNeighbors = 3, nprobe = 2)
    val got = Eval.knnClassifyAnn(neighbors, withNulls, k = 3)
    assert(got.count() == 7L)
    assert(got.filter($"vec_id" === 7L).head().getInt(2) == 1)
  }

  test("confusion: cells with within-label shares; the plant shows up " +
    "off-diagonal") {
    val got = Eval.confusion(Eval.knnClassify(emb, k = 3))
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // label 0: 3 correct + the plant predicted 1 → shares 0.75 / 0.25
    assert(got((0, 0)) == ((3L, 0.75)))
    assert(got((0, 1)) == ((1L, 0.25)))
    assert(got((1, 1)) == ((3L, 1.0)))
    assert(!got.contains((1, 0)))
  }

  test("classificationReport: per-class precision/recall/F1 from exact " +
    "counts; zero-vs-undefined axes distinguished") {
    // labels:  a a a b b c   preds: a a b b b a
    // class a: support 3, predicted 3, diag 2 → p=2/3 r=2/3 f1=2/3
    // class b: support 2, predicted 3, diag 2 → p=2/3 r=1   f1=0.8
    // class c: support 1, predicted 0, diag 0 → p NULL, r 0, f1 NULL
    val cls = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "a")).toDF("label", "pred")
    val got = Eval.classificationReport(cls)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4))))).toMap
    assert(got("a") == ((3L, Some(0.666667), Some(0.666667), Some(0.666667))))
    assert(got("b") == ((2L, Some(0.666667), Some(1.0), Some(0.8))))
    assert(got("c") == ((1L, None, Some(0.0), None)))
    // a prediction onto a label that never truly occurs: support 0,
    // precision 0.0 (predicted, always wrong), recall NULL (undefined)
    val phantom = Eval.classificationReport(
        cls.unionByName(Seq(("a", "z")).toDF("label", "pred")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(phantom("z") == ((0L, Some(0.0), None)))
  }

  test("spearman: +1 on a monotone pair, -1 on a reversed pair, ties " +
    "broken by id; n<2 yields NULL") {
    def frame(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("id", "a", "b")
    val mono = Eval.spearman(frame(Seq((1L, 1L, 10L), (2L, 2L, 20L),
      (3L, 3L, 30L))), "a", "b", "id").head()
    assert(mono.getLong(0) == 3L && mono.getDouble(1) == 1.0)
    val rev = Eval.spearman(frame(Seq((1L, 1L, 30L), (2L, 2L, 20L),
      (3L, 3L, 10L))), "a", "b", "id").head()
    assert(rev.getDouble(1) == -1.0)
    // all-tied values: no rank variance → textbook rho undefined (NULL);
    // the deterministic id-tiebreak variant ranks by id on both axes → 1
    val allTied = frame(Seq((1L, 5L, 7L), (2L, 5L, 7L)))
    assert(Eval.spearman(allTied, "a", "b", "id").head().isNullAt(1))
    assert(Eval.spearman(allTied, "a", "b", "id", tieAverage = false)
      .head().getDouble(1) == 1.0)
    val single = Eval.spearman(frame(Seq((1L, 1L, 1L))), "a", "b", "id")
      .head()
    assert(single.getLong(0) == 1L && single.isNullAt(1))
  }

  test("spearman: tie-heavy data matches the textbook fractional-rank rho") {
    // a = [1,2,2,4,5], b = [2,1,3,4,4]
    // avg ranks: ra = [1, 2.5, 2.5, 4, 5], rb = [2, 1, 3, 4.5, 4.5]
    // Pearson(ra, rb) = 7.5 / 9.5 = 0.7894736... (scipy.stats.spearmanr
    // gives the same) → 0.789474 at 6 dp. The id-tiebreak variant on the
    // same data gives 1 - 6*2/120 = 0.9 — demonstrably NOT textbook rho.
    val df = Seq((1L, 1L, 2L), (2L, 2L, 1L), (3L, 2L, 3L),
      (4L, 4L, 4L), (5L, 5L, 4L)).toDF("id", "a", "b")
    val got = Eval.spearman(df, "a", "b", "id").head()
    assert(got.getLong(0) == 5L && got.getDouble(1) == 0.789474,
      s"rho = ${got.getDouble(1)}")
    val fallback =
      Eval.spearman(df, "a", "b", "id", tieAverage = false).head()
    assert(fallback.getDouble(1) == 0.9)
  }
}
