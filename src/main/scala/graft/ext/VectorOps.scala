package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-column preprocessing — the projections a vector corpus runs
 * between "raw encoder output" and "index/training input": per-dimension
 * standardization (whitening-lite; stops high-variance dimensions from
 * dominating L2/cosine) and seeded random projection (Johnson–
 * Lindenstrauss sign projection — the cheap dimensionality cut used for
 * sketching, LSH seeding, and disk-light near-dup passes; Achlioptas
 * 2003 shows ±1 entries preserve pairwise distances like Gaussians do).
 *
 * Reference scope: the reference engine has no vector surface
 * (`/root/reference/sree-etl-tdk-glue-job.py` is flat log aggregation);
 * this extends the X3 similarity family's input side the same way
 * [[Quantize.quantizeInt8]] extends its storage side.
 *
 * Both operators are ZERO-SHUFFLE narrow projections at apply time:
 * dimension statistics and projection signs are metadata-sized
 * (dimension-count rows / literals), so at 100 TB the corpus is mapped
 * in place — no joins, no aggregation over the data after the one
 * stats pass (standardize) or none at all (project).
 */
object VectorOps {

  /**
   * Per-dimension mean / population-stddev of a vector column — one hash
   * aggregate over the posexploded corpus, dimension-count rows out.
   * `dim` is 1-based. Stats round to 9 dp (the cross-engine float-sum
   * tolerance this repo's oracles standardize on).
   */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("_p", "_v")))
      .select((col("_p") + 1).cast("int").as("dim"),
        col("_v").cast("double").as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy("dim")
      .agg(round(avg(col("_v")), 9).as("mean"),
        round(stddev_pop(col("_v")), 9).as("sd"))

  /**
   * Standardize every vector against precomputed [[dimStats]]: element i
   * maps to `round((v_i − mean_i)/sd_i, 6)` (NULL where sd = 0 — a
   * constant dimension carries no signal and a ±∞ z would poison
   * downstream dot products). The stats frame is dimension-sized, so it
   * collects to plan literals and the apply side is a single
   * `transform` projection — zero shuffle, whole-stage-codegen'd, scan
   * partitioning untouched. Vectors longer than the stats (dims the
   * stats pass never saw) z-score to NULL elements.
   *
   * Returns the input with `vecCol` replaced by the z-scored array.
   */
  def standardize(
      df: DataFrame, vecCol: String, stats: DataFrame): DataFrame = {
    val rows = stats.select(col("dim"), col("mean"), col("sd"))
      .orderBy("dim").collect() // dimension-count rows: metadata-sized
    val d = rows.length
    require(d > 0, "dimStats frame is empty")
    require(rows.map(_.getInt(0)).toSeq == (1 to d),
      "dimStats dims must be contiguous 1..d")
    val means = array(rows.map(r => lit(r.getDouble(1))).toIndexedSeq: _*)
    val sds = array(rows.map(r =>
      if (r.isNullAt(2)) lit(null).cast("double") else lit(r.getDouble(2))
    ).toIndexedSeq: _*)
    // try_element_at: a vector longer than the stats z-scores its excess
    // elements to NULL instead of throwing under ANSI mode
    df.withColumn(vecCol,
      transform(col(vecCol), (v, i) =>
        round((v.cast("double") - try_element_at(means, i + 1)) /
          nullif(try_element_at(sds, i + 1), lit(0.0)), 6)))
  }

  /**
   * Embedding-space drift between two corpora: cosine and L2 distance
   * between their per-dimension mean vectors ([[dimStats]] means, 9-dp)
   * — the SEMANTIC companion to the lexical drift instruments
   * ([[CorpusCompare]]): a vocabulary can look stable while the
   * embedding centroid walks, and vice versa. Dimension-keyed join of
   * two dimension-sized stats frames; every cross-dimension sum folds
   * 12-dp decimal terms. Returns one row `(n_dims, cosine, l2)` —
   * cosine NULL if either centroid is the zero vector.
   */
  def centroidDrift(
      a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    def term(c: Column): Column = round(c, 12).cast(dec)
    val ma = dimStats(a, vecCol).select(col("dim"), col("mean").as("ma"))
    val mb = dimStats(b, vecCol).select(col("dim"), col("mean").as("mb"))
    ma.join(mb, Seq("dim"))
      .agg(count(lit(1)).as("n_dims"),
        sum(term(col("ma") * col("mb"))).as("_ab"),
        sum(term(col("ma") * col("ma"))).as("_aa"),
        sum(term(col("mb") * col("mb"))).as("_bb"),
        sum(term((col("ma") - col("mb")) * (col("ma") - col("mb"))))
          .as("_d2"))
      .select(col("n_dims"),
        round(col("_ab").cast("double") /
          nullif(sqrt(col("_aa").cast("double")) *
            sqrt(col("_bb").cast("double")), lit(0.0)), 6).as("cosine"),
        round(sqrt(col("_d2").cast("double")), 6).as("l2"))
  }

  /**
   * Davies–Bouldin cluster-quality profile of a labeled embedding
   * corpus — the embedding-space sibling of [[GraphOps.modularity]]'s
   * graph-side audit: with per-label centroids c_i, per-label scatter
   * `S_i = mean‖v − c_i‖` and centroid separations `M_ij = ‖c_i − c_j‖`,
   * each label reports `R_i = max_{j≠i} (S_i + S_j)/M_ij` — the worst
   * compactness-vs-separation ratio (Davies & Bouldin 1979; lower is
   * better, the classical DB index is the mean of these). The
   * question it answers: do the LABELS actually carve the embedding
   * space, or would a dedup/mixture decision keyed on them be noise?
   *
   * Determinism: centroids are exact 9-dp decimal sums over one
   * posexplode (never float `avg`); every squared-difference term
   * rounds 12-dp and folds as DECIMAL(38,12); the two sqrt chains and
   * the final ratio are fixed double ops, 6-dp out. Singleton labels
   * have scatter 0; coincident centroids yield NULL R (nullif — no
   * separation to score against).
   *
   * Shape at scale: one Generate (dim-× explode) feeding (label, dim)
   * and (label, id) hash aggregates — all shuffles on the label key
   * family; the centroid pair frame is k²-sized (labels are
   * enumerable by contract). Returns `(label, n_vecs, scatter,
   * r_max)` ordered by label.
   */
  def daviesBouldin(
      df: DataFrame, vecCol: String, labelCol: String,
      idCol: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val d9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val long = df
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("_l"), col(idCol).as("_id"),
        posexplode(col(vecCol)).as(Seq("_p", "_x")))
      .select(col("_l"), col("_id"), col("_p").cast("int").as("_p"),
        col("_x").cast("double").as("_x"))
    val cent = long.groupBy(col("_l"), col("_p"))
      .agg(count(lit(1)).as("_n"),
        sum(round(col("_x"), 9).cast(d9)).as("_s"))
      .select(col("_l"), col("_p"), col("_n"),
        (col("_s").cast("double") / col("_n").cast("double")).as("_c"))
    val rowDist = long
      .join(cent.select(col("_l"), col("_p"), col("_c")), Seq("_l", "_p"))
      .groupBy(col("_l"), col("_id"))
      .agg(sum(round((col("_x") - col("_c")) * (col("_x") - col("_c")),
        12).cast(dec12)).as("_d2"))
      .select(col("_l"), sqrt(col("_d2").cast("double")).as("_d"))
    val scatter = rowDist.groupBy(col("_l"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(round(col("_d"), 12).cast(dec12)).cast("double") /
          count(lit(1)).cast("double")).as("_sc"))
    val sep = cent.as("a")
      .join(cent.as("b"),
        col("a._p") === col("b._p") && col("a._l") =!= col("b._l"))
      .groupBy(col("a._l").as("_l"), col("b._l").as("_l2"))
      .agg(sum(round((col("a._c") - col("b._c")) *
        (col("a._c") - col("b._c")), 12).cast(dec12)).as("_m2"))
      .select(col("_l"), col("_l2"), sqrt(col("_m2").cast("double"))
        .as("_m"))
    val r = sep
      .join(scatter.select(col("_l"), col("_sc")), Seq("_l"))
      .join(scatter.select(col("_l").as("_l2"), col("_sc").as("_sc2")),
        Seq("_l2"))
      .groupBy(col("_l"))
      .agg(max((col("_sc") + col("_sc2")) / nullif(col("_m"), lit(0.0)))
        .as("_r"))
    scatter.join(r, Seq("_l"), "left")
      .select(col("_l").as("label"), col("n_vecs"),
        round(col("_sc"), 6).as("scatter"),
        round(col("_r"), 6).as("r_max"))
      .orderBy(col("label").asc)
  }

  /**
   * One-row corpus health report for an embedding column — the checks a
   * pipeline runs before trusting an encoder's output enough to build
   * indexes or train on it: `n_vec` (non-NULL vectors), `n_zero`
   * (zero-norm vectors — cosine-undefined, they poison ANN recall),
   * `mean_norm`/`std_norm` (a drifting or bimodal norm distribution
   * flags encoder version mixes), and `anisotropy` — the squared norm
   * of the mean UNIT vector, the Ethayarajh (2019) cone-collapse
   * diagnostic: 0 for a perfectly spread corpus, →1 when all vectors
   * point one way (and cosine similarity stops discriminating).
   *
   * Shape: per-vector norms are in-order array folds (zero shuffle,
   * matching [[Similarity.dot]]'s fold order, so an oracle's
   * `list_aggregate` reproduces them bit-for-bit); the corpus stats fold
   * 9-dp-rounded decimal terms (order-invariant); the unit-coordinate
   * means run one posexplode into a dimension-keyed hash aggregate
   * (map-side partials; dimension-sized output). Everything after the
   * two aggregates is one-row arithmetic.
   */
  def embeddingHealth(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val norm2 = aggregate(
      transform(col(vecCol), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val withNorm = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).as("_v"), sqrt(norm2).as("_n"))
    val stats = withNorm.agg(
      count(lit(1)).as("n_vec"),
      sum(when(col("_n") === 0.0, 1L).otherwise(0L)).as("n_zero"),
      sum(round(col("_n"), 9).cast(dec)).as("_s1"),
      sum(round(col("_n") * col("_n"), 9).cast(dec)).as("_s2"))
    val unitMeans = withNorm.filter(col("_n") > 0)
      .select(col("_n"), posexplode(col("_v")).as(Seq("_p", "_x")))
      .groupBy("_p")
      .agg(sum(round(col("_x").cast("double") / col("_n"), 12).cast(dec))
        .as("_su"), count(lit(1)).as("_c"))
    val anis = unitMeans
      .select(round((col("_su").cast("double") / col("_c")) *
        (col("_su").cast("double") / col("_c")), 12).cast(dec).as("_m2"))
      .agg(sum(col("_m2")).as("_a"))
    val mean = col("_s1").cast("double") / col("n_vec")
    stats.crossJoin(broadcast(anis))
      .select(col("n_vec"), col("n_zero"),
        round(mean, 6).as("mean_norm"),
        round(sqrt(greatest(
          col("_s2").cast("double") / col("n_vec") - mean * mean,
          lit(0.0))), 6).as("std_norm"),
        round(col("_a").cast("double"), 6).as("anisotropy"))
  }

  /** Deterministic ±1 sign for (input dim i, output dim j) under `salt`:
    * the first hex nibble of md5("rp:salt:i:j") — computed driver-side
    * (plain MD5 over UTF-8, no engine involved), so the engine plan and
    * any oracle share literal sign matrices by construction. */
  def projectionSigns(salt: String, dIn: Int, kOut: Int): Seq[Seq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (1 to kOut).map { j =>
      (1 to dIn).map { i =>
        md.reset()
        val h = md.digest(s"rp:$salt:$i:$j".getBytes(StandardCharsets.UTF_8))
        if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    }
  }

  /**
   * Seeded ±1 random projection of `vecCol` to `kOut` output columns
   * `p1..pk`: `p_j = round(Σ_i v_i·sign(i,j) / √dIn, 6)` — the
   * √dIn scale keeps expected norms comparable (JL convention). The sign
   * matrix rides as `kOut` literal arrays ([[projectionSigns]]); each
   * output is an in-order `aggregate` fold over one `zip_with`, so the
   * whole operator is a narrow zero-shuffle projection whose float fold
   * order is fixed (oracle-mirrorable). Vectors whose length ≠ `dIn`
   * yield NULL projections (zip_with pads with NULL, the fold propagates
   * it) rather than silently truncating.
   */
  def randomProject(
      df: DataFrame, vecCol: String,
      dIn: Int, kOut: Int, salt: String = "rp42"): DataFrame = {
    require(dIn >= 1 && kOut >= 1, s"need dIn, kOut >= 1; got ($dIn, $kOut)")
    val signs = projectionSigns(salt, dIn, kOut)
    val scale = math.sqrt(dIn.toDouble)
    val guarded = when(size(col(vecCol)) === dIn, col(vecCol))
    signs.zipWithIndex.foldLeft(df) { case (acc, (s, j)) =>
      val sLit = array(s.map(lit): _*)
      val dotCol: Column = aggregate(
        zip_with(guarded, sLit, (v, sg) => v.cast("double") * sg),
        lit(0.0), (a, x) => a + x)
      acc.withColumn(s"p${j + 1}", round(dotCol / lit(scale), 6))
    }
  }

  /**
   * Matryoshka truncation eval (Kusupati et al., NeurIPS 2022,
   * "Matryoshka Representation Learning"): how much retrieval quality
   * survives cutting the embedding to its first `m` dimensions? For
   * each prefix length, every query's exact-cosine top-`k` under the
   * truncated vectors is compared against the full-dimension top-`k`,
   * and the per-prefix `recall@k` — the fraction of true top-`k`
   * neighbors the truncated index still finds — is the number that
   * decides whether an ANN index can run at m/d of the memory and
   * bandwidth. One row per prefix: `(dims, n_queries, recall_at_k)`;
   * the full-dimension row is its own baseline (recall 1.0 — a built-in
   * sanity check of the rank plumbing).
   *
   * Determinism: sims are exact doubles (the [[Similarity.nativeDot]]
   * ascending-index fold both engines reproduce), ranking is
   * `(sim DESC NULLS LAST, id ASC)` — ties, including exact ones, break
   * identically everywhere.
   *
   * Shape at scale: the query set broadcasts (bounded, like q19's exact
   * baseline); the corpus is touched ONCE — all prefixes' sims compute
   * in the same projection from the same sliced arrays, then one window
   * per (prefix, query) group ranks |corpus|-sized partitions. This is
   * the EXACT eval harness — run it on a SAMPLED query set to grade a
   * truncation, not as the production retrieval path (that is the ANN
   * family's job, fed by the prefix this eval picks). That contract is
   * ENFORCED: the query side is probed against `maxQueries`
   * ([[graft.Guards.requireRowsAtMost]], the q22 precedent) — a
   * `queryPred` matching the whole corpus would otherwise silently go
   * quadratic (|Q|·n sims with an unbounded broadcast). Pass
   * `maxQueries = 0` to opt out explicitly when the scale is intended.
   *
   * `prefixes` MUST include the embedding's FULL dimensionality: the
   * largest prefix is the recall baseline, so omitting the true
   * dimension would silently grade truncations against a truncated
   * baseline while reporting it as full-dim recall. Enforced with one
   * aggregate probe (`min(size) = max(size) = prefixes.max`), so the
   * check is deterministic — an arbitrary-row probe would pass or fail
   * nondeterministically on (contract-violating) mixed-length data —
   * and also catches that contract violation itself.
   */
  def matryoshkaEval(
      emb: DataFrame, idCol: String, vecCol: String,
      prefixes: Seq[Int], k: Int, queryPred: Column,
      maxQueries: Long = 10000): DataFrame = {
    require(prefixes.nonEmpty && prefixes.forall(_ > 0),
      s"prefixes must be positive: $prefixes")
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val baseline = prefixes.max
    emb.agg(min(size(col(vecCol))).as("__dmin"),
        max(size(col(vecCol))).as("__dmax"))
      .head(1).filterNot(_.isNullAt(0)).foreach { r =>
        val (dMin, dMax) = (r.getInt(0), r.getInt(1))
        require(dMin == dMax,
          s"embedding vectors must be homogeneous in length, found " +
            s"sizes in [$dMin, $dMax]: recall over mixed-length vectors " +
            "is ill-defined (the prefix slice silently truncates or " +
            "short-reads depending on the row)")
        require(baseline == dMax,
          s"prefixes.max (= $baseline) must equal the embedding's full " +
            s"dimensionality (= $dMax): the largest prefix is the recall " +
            "baseline, and a truncated baseline would silently misgrade " +
            "every smaller prefix. Include the full dimension in " +
            "`prefixes` (it doubles as the rank-plumbing sanity row).")
      }
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    graft.Guards.requireRowsAtMost(queries, maxQueries,
      "VectorOps.matryoshkaEval query set")
    val corpus = emb.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val sims = prefixes.distinct.sorted.map(m =>
      struct(lit(m).as("dims"),
        Similarity.cosine(
          slice(col("qv"), 1, m), slice(col("cv"), 1, m)).as("sim")))
    val tops = corpus
      .join(broadcast(queries), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), explode(array(sims: _*)).as("s"))
      .select(col("qid"), col("cid"),
        col("s.dims").as("dims"), col("s.sim").as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("dims"), col("qid"))
          .orderBy(col("sim").desc_nulls_last, col("cid").asc)))
      .filter(col("rk") <= k)
    val base = tops.filter(col("dims") === baseline)
      .select(col("qid"), col("cid"))
    val nq = queries.agg(count(lit(1)).as("__nq"))
    val hits = tops.select(col("dims"), col("qid"), col("cid"))
      .join(base, Seq("qid", "cid"))
      .groupBy(col("dims"))
      .agg(count(lit(1)).as("__hits"))
    // one row per prefix even at zero hits — a fully-off truncation must
    // report recall 0, not vanish from the curve
    val spark = emb.sparkSession
    import spark.implicits._
    prefixes.distinct.sorted.map(_.toLong).toDF("dims")
      .join(broadcast(hits), Seq("dims"), "left")
      .crossJoin(broadcast(nq))
      .select(col("dims"),
        col("__nq").as("n_queries"),
        round(coalesce(col("__hits"), lit(0L)).cast("double")
          / (col("__nq") * k), 6).as("recall_at_k"))
  }
}
