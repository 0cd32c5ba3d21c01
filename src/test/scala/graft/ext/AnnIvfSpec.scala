package graft.ext

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

class AnnIvfSpec extends GraftSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("centroids: deterministic across runs, k cells, corpus dims") {
    val emb = Tables(spark, sfDir, "embeddings")
    def train() = AnnIvf.trainCentroids(emb, k = 8, iters = 2)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
      .sortBy(_._1)
    val c1 = train(); val c2 = train()
    assert(c1.length == 8)
    assert(c1.forall(_._2.length == 64))
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq)
  }

  test("every corpus vector lands in exactly one cell") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = AnnIvf.trainCentroids(emb, k = 8, iters = 1)
    val cells = AnnIvf.assignCells(emb, centroids)
    assert(cells.count() == emb.count())
    assert(cells.select("vec_id").distinct().count() == emb.count())
    // cell ids are the seed vectors' vec_ids — at most k distinct values
    assert(cells.select("cell").distinct().count() <= 8)
  }

  test("recall vs brute force >= 0.9 on sf0.01 embeddings") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val centroids = AnnIvf.trainCentroids(emb, k = 16, iters = 3)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
    val ann = pairs(AnnIvf.annTopK(queries, emb, centroids,
      kNeighbors = 5, nprobe = 10))
    val recall = (truth & ann).size.toDouble / truth.size
    info(f"IVF recall on near-uniform embeddings (nprobe 10/16): $recall%.3f")
    assert(recall >= 0.9)
  }
}
