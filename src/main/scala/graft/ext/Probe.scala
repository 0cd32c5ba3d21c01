package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Linear probing of embedding quality — the standard representation
 * eval (Alain & Bengio 2016): fit a LINEAR model from frozen embeddings
 * to a target and read the fit quality as "how linearly accessible is
 * this signal in the representation". Closed-form ridge least squares,
 * not SGD: the normal equations `(XᵀX + λI)w = Xᵀy` need exactly ONE
 * pass over the corpus to build dimension²-sized sums, after which the
 * solve is a driver-side (d+1)×(d+1) dense operation — no iteration,
 * no learning rate, deterministic.
 *
 * Reference scope: the reference engine has no vector surface; this
 * extends the X3 eval family ([[Eval.knnClassify]] probes labels
 * through NEIGHBORHOODS, this probes them through a linear map — the
 * two standard complementary views).
 *
 * Scale shape: the corpus pass explodes each row into
 * `(d+1)(d+2)/2 + (d+1)` upper-triangle/moment terms that collapse in a
 * map-side-partial hash aggregate keyed on `(i, j)` — the shuffle is
 * dimension²-sized regardless of corpus size, and the explode
 * amplification is the price of exact DECIMAL(38,12) folds
 * (order-invariant, oracle-replayable). d = 64 ⇒ ~2 200 terms/row; for
 * d ≳ 512 the same equations should be built with a float `Aggregator`
 * (one buffer per task, no explode) at the cost of last-ulp
 * nondeterminism — this module deliberately ships the exact form.
 * Scoring is a zero-shuffle in-order fold against plan-literal weights
 * (the [[Similarity.dot]] fold-order contract an oracle's
 * `list_aggregate` reproduces bit-for-bit).
 *
 * Determinism: every aggregated term rounds to 12 dp and folds as
 * decimal; the solve runs single-threaded driver-side in a fixed
 * elimination order; weights round to 9 dp before they become plan
 * literals — so fit and score are partitioning-invariant and identical
 * across reruns and engines.
 */
object Probe {

  private val dec = DecimalType(38, 12)

  /** Features + trailing 1.0 intercept slot, as doubles. */
  private def aug(vecCol: Column): Column =
    concat(transform(vecCol, _.cast("double")), array(lit(1.0)))

  /**
   * One-pass normal-equation sums: upper-triangle `Σ x_i·x_j`
   * (j = i..d over the augmented vector) plus the moment vector
   * `Σ x_i·y` (tagged j = −1). Rows with a NULL vector, NULL target, or
   * wrong dimension drop — the fit's row universe, which [[report]]
   * shares.
   */
  private def momentSums(
      df: DataFrame, vecCol: String, y: Column, dim: Int): DataFrame = {
    val d1 = dim + 1
    val rows = df
      .filter(col(vecCol).isNotNull && y.isNotNull &&
        size(col(vecCol)) === dim)
      .select(aug(col(vecCol)).as("_v"), y.cast("double").as("_y"))
    val aTerms = flatten(transform(col("_v"), (xi, i) =>
      transform(slice(col("_v"), i + lit(1), lit(d1) - i), (xj, k) =>
        struct(i.cast("int").as("i"), (i + k).cast("int").as("j"),
          round(xi * xj, 12).cast(dec).as("t")))))
    val bTerms = transform(col("_v"), (xi, i) =>
      struct(i.cast("int").as("i"), lit(-1).as("j"),
        round(xi * col("_y"), 12).cast(dec).as("t")))
    rows.select(explode(concat(aTerms, bTerms)).as("_e"))
      .groupBy(col("_e.i").as("i"), col("_e.j").as("j"))
      .agg(sum(col("_e.t")).as("s"))
  }

  /**
   * Fit ridge weights. Returns `dim + 1` doubles — feature weights then
   * the intercept (index `dim`), each rounded to 9 dp. `lambda` is added
   * to the FEATURE diagonal only (regularizing the intercept would bias
   * the mean). The collect is the (d+1)²-entry moment matrix —
   * metadata-sized by construction, never corpus rows.
   */
  def fitRidge(
      df: DataFrame, vecCol: String, y: Column, dim: Int,
      lambda: Double = 1e-3): Array[Double] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val d1 = dim + 1
    val a = Array.ofDim[Double](d1, d1)
    val b = new Array[Double](d1)
    var seen = 0L
    momentSums(df, vecCol, y, dim).collect().foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val s = r.getDecimal(2).doubleValue()
      if (j < 0) b(i) = s
      else { a(i)(j) = s; a(j)(i) = s; seen += 1 }
    }
    require(seen > 0, "no rows matched (empty input or wrong dim)")
    var i = 0
    while (i < dim) { a(i)(i) += lambda; i += 1 } // not the intercept
    solve(a, b).map(w =>
      BigDecimal(w).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Gaussian elimination with partial pivoting, in place; fixed
    * driver-side order ⇒ bit-reproducible for identical inputs. */
  private[ext] def solve(
      a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col0 = 0
    while (col0 < n) {
      var p = col0
      var r = col0 + 1
      while (r < n) {
        if (math.abs(a(r)(col0)) > math.abs(a(p)(col0))) p = r
        r += 1
      }
      require(a(p)(col0) != 0.0, s"singular moment matrix at column $col0")
      if (p != col0) {
        val tmp = a(p); a(p) = a(col0); a(col0) = tmp
        val tb = b(p); b(p) = b(col0); b(col0) = tb
      }
      r = col0 + 1
      while (r < n) {
        val f = a(r)(col0) / a(col0)(col0)
        if (f != 0.0) {
          var c = col0
          while (c < n) { a(r)(c) -= f * a(col0)(c); c += 1 }
          b(r) -= f * b(col0)
        }
        r += 1
      }
      col0 += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var c = i + 1
      while (c < n) { s -= a(i)(c) * x(c); c += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** The fitted weights as a frame `(idx, w)` — idx 0..dim-1 are feature
    * weights, idx = dim is the intercept. The declared-query face of
    * [[fitRidge]]. */
  def ridgeWeights(
      spark: SparkSession, df: DataFrame, vecCol: String, y: Column,
      dim: Int, lambda: Double = 1e-3): DataFrame = {
    import spark.implicits._
    fitRidge(df, vecCol, y, dim, lambda).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq
      .toDF("idx", "w")
  }

  /** Linear score `w · [x, 1]` as an in-order fold against literal
    * weights (zero shuffle; `weights.length = dim + 1`). */
  def score(vecCol: Column, weights: Array[Double]): Column =
    aggregate(
      zip_with(aug(vecCol), lit(weights), (x, w) => x * w),
      lit(0.0), (acc, t) => acc + t)

  /**
   * Fit + evaluate in one call: one row
   * `(n, mse, r2, accuracy)` over the same row universe the fit used —
   * `accuracy` thresholds the linear score at 0.5 (meaningful for 0/1
   * targets; still reported, just less meaningful, for regression).
   * SSE/SST fold 12-dp decimal terms; `r2` is NULL when the target is
   * constant (SST = 0).
   */
  def report(
      df: DataFrame, vecCol: String, y: Column, dim: Int,
      lambda: Double = 1e-3): DataFrame = {
    val w = fitRidge(df, vecCol, y, dim, lambda)
    val rows = df
      .filter(col(vecCol).isNotNull && y.isNotNull &&
        size(col(vecCol)) === dim)
      .select(y.cast("double").as("_y"),
        score(col(vecCol), w).as("_p"))
    val tot = rows.agg(count(lit(1)).as("n"), sum(col("_y")).as("_sy"))
    rows.crossJoin(broadcast(tot))
      .select(col("n"), col("_y"), col("_p"),
        (col("_sy") / col("n")).as("_my"))
      .groupBy(col("n"))
      .agg(
        sum(round((col("_y") - col("_p")) * (col("_y") - col("_p")), 12)
          .cast(dec)).as("_sse"),
        sum(round((col("_y") - col("_my")) * (col("_y") - col("_my")), 12)
          .cast(dec)).as("_sst"),
        sum(when((col("_p") >= 0.5) === (col("_y") === 1.0), 1L)
          .otherwise(0L)).as("_hit"))
      .select(col("n"),
        round(col("_sse").cast("double") / col("n"), 6).as("mse"),
        when(col("_sst").cast("double") > 0.0,
          round(lit(1.0) - col("_sse").cast("double") /
            col("_sst").cast("double"), 6)).as("r2"),
        round(col("_hit").cast("double") / col("n"), 6).as("accuracy"))
  }
}
