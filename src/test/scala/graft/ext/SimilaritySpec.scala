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
}
