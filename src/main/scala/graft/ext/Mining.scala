package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Contrastive-pair mining over an ANN neighbor frame — the training-data
 * op that turns a labeled embedding corpus into (anchor, positive) and
 * (anchor, hard-negative) pairs for metric-learning / InfoNCE-style
 * objectives (hard negatives — the most similar items with a DIFFERENT
 * label — are the pairs that carry gradient; random negatives are
 * trivially separable). Standard practice in the retrieval literature
 * (DPR's in-batch + hard negatives, Sentence-BERT mining).
 *
 * Input is a precomputed neighbor frame (`(q_id, nn_id, sim, rank)` —
 * [[AnnIvf.knnJoin]] / [[AnnIvf.knnJoinIndexed]], self-pairs already
 * excluded), so mining cost is label joins + one query-partitioned
 * re-rank, never a similarity scan of its own: at corpus scale the ANN
 * frame is the bounded cell equi-join, and this composes downstream of
 * it exactly like [[Eval.knnClassifyAnn]] (same frame can feed both).
 *
 * Mine with the neighbor frame's `kNeighbors` well above `kPos + kNeg`:
 * pairs are taken from WITHIN the frame's top-k, so a frame that is all
 * positives for some anchor yields fewer than `kNeg` negatives for it —
 * that is the honest answer at mining depth k, not a gap to backfill
 * with worse candidates. Anchors or neighbors without labels drop
 * (mining is defined on labeled data).
 */
object Mining {

  /**
   * Label each in-frame neighbor `pos` (same label as the anchor) or
   * `neg` (different), re-rank within `(q_id, kind)` by the frame's
   * similarity rank, and keep the top `kPos` / `kNeg` of each kind.
   * Returns `(q_id, nn_id, kind, pair_rank)` — deterministic: the
   * underlying frame's rank is already total (sim desc, nn_id asc).
   */
  def contrastivePairs(
      neighbors: DataFrame, labels: DataFrame,
      idCol: String = "vec_id", labelCol: String = "label",
      kPos: Int = 2, kNeg: Int = 3): DataFrame = {
    require(kPos >= 0 && kNeg >= 0 && kPos + kNeg > 0,
      s"need kPos >= 0, kNeg >= 0, kPos + kNeg > 0; got ($kPos, $kNeg)")
    val lab = labels.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol))
    val byKind = Window.partitionBy(col("q_id"), col("kind"))
      .orderBy(col("rank").asc)
    neighbors
      .join(lab.select(col(idCol).as("nn_id"),
        col(labelCol).as("_nn_label")), "nn_id")
      .join(lab.select(col(idCol).as("q_id"),
        col(labelCol).as("_q_label")), "q_id")
      .withColumn("kind",
        when(col("_q_label") === col("_nn_label"), lit("pos"))
          .otherwise(lit("neg")))
      .withColumn("pair_rank", row_number().over(byKind).cast("long"))
      .filter(
        (col("kind") === "pos" && col("pair_rank") <= kPos) ||
        (col("kind") === "neg" && col("pair_rank") <= kNeg))
      .select(col("q_id"), col("nn_id"), col("kind"), col("pair_rank"))
  }

  /**
   * Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
   * of a candidate frame: greedily pick, per query, the candidate
   * maximizing `λ·sim(q,c) − (1−λ)·max_{s∈S} cos(c,s)` — relevance
   * traded against redundancy with what is already selected. The
   * diversification step every retrieval stack runs between ANN top-N
   * and the final top-k (near-duplicate hits crowd out coverage).
   *
   * Input is `(q_id, nn_id, sim, embedding)` — an ANN/brute-force
   * neighbor frame JOINED back to its vectors; rows with a NULL sim or
   * embedding drop. The greedy scan is inherently sequential per query,
   * so it runs as `flatMapGroups` over `q_id`: each group holds only
   * that query's candidate top-N (bounded by the feeding frame's k —
   * document N, never the corpus), groups are distributed across
   * executors, and the first pick is pure relevance (empty-set penalty
   * 0). Determinism: candidates order by (sim DESC, nn_id ASC), score
   * ties break to the smaller nn_id; pairwise cosine is the
   * [[Similarity]] array-order left-fold (zero-norm pairs penalize 0).
   * Returns `(q_id, nn_id, mmr_rank, score)`, `mmr_rank` 1-based.
   *
   * Not SQL-expressible (greedy recursion over the selected set), so
   * spec-verified against a driver-side reference — the [[BpeTrain]]
   * precedent.
   */
  def mmrDiversify(
      candidates: DataFrame, lambda: Double, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates
      .filter(col("sim").isNotNull && col("embedding").isNotNull)
      .select(col("q_id").cast("long"), col("nn_id").cast("long"),
        col("sim").cast("double"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val cands = it.toArray.sortBy(c => (-c._3, c._2))
        val n = cands.length
        def dot(a: Array[Float], b: Array[Float]): Double = {
          var s = 0.0; var i = 0
          val m = math.min(a.length, b.length)
          while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
          s
        }
        val norms = cands.map(c => math.sqrt(dot(c._4, c._4)))
        def cos(i: Int, j: Int): Double =
          if (norms(i) == 0.0 || norms(j) == 0.0) 0.0
          else dot(cands(i)._4, cands(j)._4) / (norms(i) * norms(j))
        val selected = new scala.collection.mutable.ArrayBuffer[Int]()
        val chosen = new Array[Boolean](n)
        val out = new scala.collection.mutable.ArrayBuffer[
          (Long, Long, Int, Double)]()
        var rank = 1
        while (rank <= math.min(k, n)) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!chosen(i)) {
              var pen = 0.0
              selected.foreach(j => pen = math.max(pen, cos(i, j)))
              val score = lambda * cands(i)._3 - (1.0 - lambda) * pen
              // strict > : on ties the earlier candidate (higher sim,
              // then smaller nn_id) wins — deterministic
              if (score > bestScore) { best = i; bestScore = score }
            }
            i += 1
          }
          chosen(best) = true
          selected += best
          out += ((q, cands(best)._2, rank,
            BigDecimal(bestScore)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          rank += 1
        }
        out.iterator
      }
      .toDF("q_id", "nn_id", "mmr_rank", "score")
  }

  /**
   * Association rules over `(basket, item)` memberships — Agrawal &
   * Srikant's support/confidence/lift for every ORDERED item pair whose
   * joint support clears `minSupport` baskets: the co-consumption
   * signal behind "users who did A also did B" and source-mix analyses.
   * Duplicate memberships collapse first (support counts BASKETS).
   *
   *   support(a→b)    = n_ab / n_baskets
   *   confidence(a→b) = n_ab / n_a
   *   lift(a→b)       = n_ab·n_baskets / (n_a·n_b)   (> 1 ⇒ positive
   *                      association; symmetric, but confidence isn't)
   *
   * All three are single IEEE divisions of exact longs, 6-dp. Shape at
   * scale: one dedup aggregate, a basket-keyed self-join bounded by
   * per-basket item counts (the [[GraphOps.coOccurrence]] cost note
   * applies — cap degenerate hot baskets upstream), item-keyed margin
   * joins, and a broadcast 1-row basket total.
   *
   * Returns `(antecedent, consequent, n_ab, support, confidence,
   * lift)`.
   */
  def associationRules(
      memberships: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val m = memberships
      .select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .filter(col("_b").isNotNull && col("_i").isNotNull)
      .distinct()
    val itemN = m.groupBy(col("_i")).agg(count(lit(1)).as("_ni"))
    val total = m.agg(countDistinct(col("_b")).as("_n"))
    val joint = m.as("a").join(m.as("b"),
        col("a._b") === col("b._b") && col("a._i") =!= col("b._i"))
      .groupBy(col("a._i").as("antecedent"), col("b._i").as("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    joint
      .join(itemN.select(col("_i").as("antecedent"), col("_ni").as("_na")),
        "antecedent")
      .join(itemN.select(col("_i").as("consequent"), col("_ni").as("_nb")),
        "consequent")
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        round(col("n_ab").cast("double") / col("_n").cast("double"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("_na").cast("double"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("_n").cast("double") /
          (col("_na").cast("double") * col("_nb").cast("double")), 6)
          .as("lift"))
  }
}
