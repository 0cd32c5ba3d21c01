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

  test("knnJoin: rank structure holds, no self-pairs, within-cell recall measured") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = AnnIvf.trainCentroids(emb, k = 16, iters = 3)
    val knn = AnnIvf.knnJoin(emb, centroids, kNeighbors = 3)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"),
        r.getAs[Double]("sim"), r.getAs[Long]("rank")))
    assert(knn.nonEmpty)
    assert(knn.forall { case (q, nn, _, _) => q != nn })
    // per query: ranks contiguous from 1, sims non-increasing in rank
    knn.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).sameElements(1L to sorted.length),
        s"q=$q ranks ${sorted.map(_._4).toSeq}")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
    // probed-cell recall vs brute force over a query slice: nprobe 4/16
    // on NEAR-UNIFORM vectors is the adversarial case for any ANN index
    // (no cluster structure to exploit) — measure, don't assume
    // brute k=4 ranks the self-pair first (cosine 1); excluding it leaves
    // exactly the top-3 TRUE neighbors — no further rank filter, which
    // would cut the denominator to top-2
    val truth = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 32), emb, k = 4)
      .filter(col("nn_id") =!= col("q_id"))
      .select("q_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = knn.filter(_._1 < 32).map(t => (t._1, t._2)).toSet
    val recall = (truth & got).size.toDouble / truth.size
    info(f"knnJoin recall vs brute force (nprobe 4/16, uniform data): $recall%.3f")
    assert(recall > 0.4)
  }

  test("empty corpus: training, assignment, and topK degrade to empty, not throw") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val empty = emb.filter(col("vec_id") < 0)
    val cents = AnnIvf.trainCentroids(empty, k = 4)
    assert(cents.count() == 0)
    assert(AnnIvf.assignCells(emb, cents).count() == 0)
    val topk = AnnIvf.annTopK(emb.limit(5), emb, cents, kNeighbors = 3, nprobe = 2)
    assert(topk.count() == 0)
    assert(topk.columns.toSeq == Seq("q_id", "nn_id", "sim", "rank"))
  }
}
