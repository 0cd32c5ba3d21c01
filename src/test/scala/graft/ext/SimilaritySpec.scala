package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends GraftSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(0.9f, 0.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0") {
    val r = vecs.filter($"vec_id" === 0)
      .select(
        Similarity.cosine(col("embedding"), col("embedding")).as("self"),
        Similarity.cosine(col("embedding"),
          typedLit(Array(0.0f, 1.0f, 0.0f))).as("orth"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("brute-force top-k: rank-1 neighbor of each query is itself") {
    val top = Similarity.bruteForceTopK(vecs, vecs, k = 2)
      .filter(col("rank") === 1).collect()
    assert(top.forall(r => r.getAs[Long]("q_id") == r.getAs[Long]("nn_id")))
    assert(top.length == 4)
  }

  test("brute-force top-k: nearest non-self neighbor is correct") {
    val nn = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 2)
      .filter(col("rank") === 2).collect()(0)
    assert(nn.getAs[Long]("nn_id") == 3L) // (0.9,0.1) closer to x-axis than (1,1)
  }

  test("zero-norm corpus vector scores NULL sim and never displaces a real neighbor") {
    // 0/0 would be NaN, which Spark orders ABOVE every double — an
    // unguarded zero vector would be the rank-1 "neighbor" of every query
    val corpus = vecs.unionAll(
      Seq((99L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(
        vecs.filter($"vec_id" === 0), corpus, k = 5)
      .select("rank", "nn_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2)))
    // every real vector outranks the zero vector; its sim is NULL, not NaN
    assert(top.filter(_._1 <= 4).forall(_._2 != 99L))
    assert(top.find(_._2 == 99L).get == ((5L, 99L, true)))
    // and the threshold path: a zero-vector pair fails the filter instead
    // of passing it as NaN
    val pairs = Similarity.nearDupPairsBlocked(
      corpus.withColumn("blk", lit(1)), "vec_id", "embedding", "blk",
      threshold = 0.0)
    assert(pairs.filter(col("a_id") === 99L || col("b_id") === 99L).count() == 0)
  }

  test("sparseCosineTopK: parallel sparse vectors score 1, disjoint " +
    "supports never pair, ties break by neighbor id, both orientations " +
    "rank") {
    import spark.implicits._
    val f = Seq(
      (1L, "x", 1L), (1L, "y", 2L),
      (2L, "x", 2L), (2L, "y", 4L), // parallel to user 1
      (3L, "z", 5L),                // shares nothing
      (4L, "x", 3L)
    ).toDF("id", "ft", "v")
    val got = Similarity.sparseCosineTopK(f, "id", "ft", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got((1L, 1L)) == ((2L, 1.0)), "parallel vectors")
    assert(got((2L, 1L)) == ((1L, 1.0)))
    assert(!got.keySet.exists(_._1 == 3L), "disjoint support: no pairs")
    // u4 vs u1 and u2: 3/(√5·3) = 6/(√20·3) = .447214 — tie → smaller id
    assert(got((4L, 1L)) == ((1L, 0.447214)))
    assert(got((4L, 2L)) == ((2L, 0.447214)))
  }
}
