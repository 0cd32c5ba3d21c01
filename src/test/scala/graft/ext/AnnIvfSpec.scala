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

  test("persisted index: indexed topK ≡ self-contained; index append ≡ from-scratch rebuild") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val centroids = AnnIvf.trainCentroids(emb, k = 16, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("nn_id"),
        r.getAs[Double]("sim"), r.getAs[Long]("rank"))).toSeq

    // the parquet round-trip IS the production shape — spec it, not just
    // the in-memory frame
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    try {
      AnnIvf.buildIvfIndex(emb, centroids).write.mode("overwrite").parquet(tmp)
      val index = spark.read.parquet(tmp)
      val self = rows(AnnIvf.annTopK(queries, emb, centroids,
        kNeighbors = 5, nprobe = 10))
      val indexed = rows(AnnIvf.annTopKIndexed(queries, index, centroids,
        kNeighbors = 5, nprobe = 10))
      assert(indexed == self)

      // append half of the maintenance loop: index(old) ∪ buildIvfIndex(new)
      // equals buildIvfIndex(old ∪ new) under the SAME centroid generation
      val oldHalf = emb.filter(col("vec_id") % 2 === 0)
      val newHalf = emb.filter(col("vec_id") % 2 === 1)
      val appended = AnnIvf.buildIvfIndex(oldHalf, centroids)
        .unionAll(AnnIvf.buildIvfIndex(newHalf, centroids))
      def idxRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("nn_id"),
          r.getSeq[Float](r.fieldIndex("nn_emb")).toSeq,
          r.getAs[Double]("nn_n"))).toSet
      assert(idxRows(appended) == idxRows(AnnIvf.buildIvfIndex(emb, centroids)))

      // and the probe against the appended index screens identically
      assert(rows(AnnIvf.annTopKIndexed(queries, appended, centroids,
        kNeighbors = 5, nprobe = 10)) == self)
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("cell-bucketed index table: same result, corpus side never shuffles") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val centroids = AnnIvf.trainCentroids(emb, k = 16, iters = 2)
    try {
      AnnIvf.stageIvfCells(AnnIvf.buildIvfIndex(emb, centroids),
        "graft_ivf_cells", numBuckets = 4)
      val index = spark.table("graft_ivf_cells")
      val self = AnnIvf.annTopK(queries, emb, centroids,
        kNeighbors = 5, nprobe = 10).collect().toSeq
      assert(AnnIvf.annTopKIndexed(queries, index, centroids,
        kNeighbors = 5, nprobe = 10).collect().toSeq == self)

      // plan shape with broadcast off: ONE cell-keyed Exchange — the probe
      // (query) side — while the bucketed corpus scan satisfies the
      // candidate join's partitioning itself. The window's q_id Exchange
      // is downstream and out of scope for the cell count.
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = AnnIvf.annTopKIndexed(queries, index, centroids,
          kNeighbors = 5, nprobe = 10).queryExecution.executedPlan.toString
        val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(p).size
        assert(cellExchanges == 1, s"corpus side shuffled:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

      // knnJoinIndexed: the corpus-wide neighbor refresh from the index
      // alone matches the raw-corpus knnJoin
      assert(
        AnnIvf.knnJoinIndexed(index, centroids, kNeighbors = 3).collect().toSeq
          == AnnIvf.knnJoin(emb, centroids, kNeighbors = 3).collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ivf_cells")
  }

  test("native nearest-cells ≡ unrolled reference; codegen holds at k=256") {
    val emb = Tables(spark, sfDir, "embeddings")
    // bit-equality of assignment AND probe selection at a small k and at a
    // k the unrolled form was architecturally capped near
    for (k <- Seq(16, 256)) {
      val centroids = AnnIvf.trainCentroids(emb, k = k, iters = 1)
      def cellsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.get(1))).toSet
      assert(cellsOf(AnnIvf.assignCells(emb, centroids))
        == cellsOf(AnnIvf.assignCellsUnrolled(emb, centroids)),
        s"assignment drifted from the unrolled reference at k=$k")
      // probe path (nprobe > 1): ordered cell lists must match per query
      val cents = centroids.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1), r.getDouble(2))).toSeq.sortBy(_._1)
      val both = emb.filter(col("vec_id") < 32).select(col("vec_id"),
          AnnIvf.nearestCellsUnrolled(col("embedding"), cents, 4).as("ref"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val native = AnnIvf.annTopK(emb.filter(col("vec_id") < 32), emb, centroids,
        kNeighbors = 1, nprobe = 4) // exercises the native probe end-to-end
      assert(native.count() > 0)
      val nativeProbe = AnnIvf.probeCellsNative(emb.filter(col("vec_id") < 32), centroids, 4)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(nativeProbe == both, s"probe selection drifted at k=$k")
    }
    // plan shape at k=256: the executed assignment plan must stay inside
    // whole-stage codegen with zero CodegenFallback nodes — the exact
    // regression the unrolled form hit at large k
    val centroids = AnnIvf.trainCentroids(emb, k = 256, iters = 1)
    val plan = AnnIvf.assignCells(emb, centroids)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan.take(2000))
    // the `*(n)` operator prefix IS the whole-stage-codegen marker in
    // executedPlan.toString; the assignment projection must carry it
    assert(plan.contains("*(1) Project"), plan.take(2000))
  }

  test("broadcast centroid carrier ≡ literal carrier, codegen holds, " +
    "and the dispatch ceiling routes large k to the broadcast path") {
    val emb = Tables(spark, sfDir, "embeddings")
    val centroids = AnnIvf.trainCentroids(emb, k = 64, iters = 1)
    val cents = AnnIvf.collectCents(centroids)
    // bit-equality: the two carriers share IvfNearestCells.compute, and
    // this pins the transport (broadcast fetch + codegen init path) too
    def probes(c: org.apache.spark.sql.Column) =
      emb.select(col("vec_id"), c.as("cells")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(probes(AnnIvf.nearestCellsBcast(col("embedding"), cents, 4))
      == probes(AnnIvf.nearestCells(col("embedding"), cents, 4)),
      "broadcast carrier drifted from the literal carrier")
    // the broadcast path must stay inside whole-stage codegen
    val plan = emb.select(
        AnnIvf.nearestCellsBcast(col("embedding"), cents, 4).as("cells"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan.take(2000))
    // dispatch: above the ceiling nearestCells must choose the broadcast
    // carrier (prettyName distinguishes the two expressions in the plan)
    val bigCents: AnnIvf.Cents = (0 until AnnIvf.LiteralCentroidCeiling + 1)
      .map(i => (i.toLong, Seq(1.0f + i, 2.0f), math.sqrt((1.0 + i) * (1.0 + i) + 4.0)))
    val bigPlan = emb.limit(1).select(
        AnnIvf.nearestCells(col("embedding"), bigCents, 2).as("cells"))
      .queryExecution.analyzed.toString
    assert(bigPlan.contains("graft_ivf_cells_bc"),
      s"k > ceiling must route to the broadcast carrier:\n${bigPlan.take(500)}")
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
    // the persisted-index path degrades the same way
    val idx = AnnIvf.buildIvfIndex(emb, cents)
    assert(idx.count() == 0)
    assert(idx.columns.toSeq == Seq("cell", "nn_id", "nn_emb", "nn_n"))
    val topkIdx = AnnIvf.annTopKIndexed(emb.limit(5), idx, cents,
      kNeighbors = 3, nprobe = 2)
    assert(topkIdx.count() == 0)
    assert(topkIdx.columns.toSeq == Seq("q_id", "nn_id", "sim", "rank"))
  }
}
