package graft.ext

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

class AnnLshSpec extends GraftSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("plane matrix is deterministic and ±1-valued") {
    val p1 = AnnLsh.planeMatrix(8, 16, seed = 42L)
    val p2 = AnnLsh.planeMatrix(8, 16, seed = 42L)
    assert(p1 == p2)
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(AnnLsh.planeMatrix(8, 16, seed = 43L) != p1)
  }

  test("buckets: one row per table, bucket within [0, 2^bits)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val b = AnnLsh.buckets(vecs, "vec_id", "embedding", dim = 3,
      bitsPerTable = 4, numTables = 6)
    assert(b.count() == 12)
    val range = b.agg(min("bucket"), max("bucket")).collect()(0)
    assert(range.getLong(0) >= 0L && range.getLong(1) < 16L)
  }

  test("identical vectors always share every bucket") {
    val vecs = Seq(
      (0L, Array(0.3f, -1.2f, 0.8f, 0.1f)),
      (1L, Array(0.3f, -1.2f, 0.8f, 0.1f))
    ).toDF("vec_id", "embedding")
    val shared = AnnLsh
      .buckets(vecs, "vec_id", "embedding", dim = 4, bitsPerTable = 8, numTables = 4)
      .groupBy("table", "bucket").count().filter(col("count") === 2)
    assert(shared.count() == 4)
  }

  test("recall vs brute force >= 0.9 on sf0.01 embeddings") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
    val ann   = pairs(AnnLsh.annTopK(queries, emb, k = 5, dim = 64))
    val recall = (truth & ann).size.toDouble / truth.size
    info(f"ANN recall on near-uniform embeddings: $recall%.3f")
    assert(recall >= 0.9)
  }
}
