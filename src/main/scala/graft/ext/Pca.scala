package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Top principal component of an embedding column — the anisotropy probe
 * of representation health (a corpus whose embeddings collapse onto one
 * direction carries less usable signal than its dimension suggests;
 * Mu & Viswanath 2018's "all-but-the-top" postprocessing starts from
 * exactly this component) and the first step of PCA whitening.
 *
 * Reference scope: the reference engine has no vector surface; this
 * extends the X3/X+ embedding-audit family (q182's per-vector health
 * screens look at rows; this looks at the SPECTRUM).
 *
 * Scale shape (the [[Probe]] split): ONE distributed pass builds the
 * exact (d+1)² second-moment matrix through the same scaled-long
 * `Aggregator` the ridge probe uses — one flat buffer per task, no
 * per-term rows, shuffle is dimension²-sized regardless of corpus
 * size. Everything after that pass is driver-side arithmetic on a d×d
 * matrix: centering (C = (Σxxᵀ − n·μμᵀ)/n from the moment matrix's own
 * Σx row), then fixed-count power iteration — deterministic because
 * the input moments are order-invariant integers, the start vector and
 * iteration count are constants, and the result rounds to 9 dp before
 * leaving the driver.
 *
 * Sign convention: the component is normalized to unit length and
 * oriented so its largest-|coordinate| entry is positive (ties → the
 * lowest index), making the output unique — eigenvectors are only
 * defined up to sign.
 */
object Pca {

  /** Power-iteration step count: fixed, not convergence-tested, so the
    * arithmetic chain is identical on every run. Near-isotropic inputs
    * converge slowly (measured λ₂/λ₁ = 0.9874 on the synthetic
    * embeddings ⇒ error ratio e^(−2000·0.0127) ≈ 10⁻¹¹ at 2000 steps),
    * and 2000 steps on a d×d driver matrix is microseconds — so the
    * count is sized for the near-degenerate worst case, not the easy
    * one. */
  private val Iters = 2000

  /**
   * Compute the top eigenpair of the covariance of `vecCol`. Returns
   * `(component: Array[Double] of length dim (unit, 9-dp), lambda,
   * trace)` — `lambda/trace` is the top component's share of total
   * variance. Rows with NULL or wrong-dimension vectors drop.
   */
  def topComponent(
      df: DataFrame, vecCol: String, dim: Int): (Array[Double], Double, Double) = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    // y = 0: only the moment matrix side of the shared aggregator is used
    val (a, _, n) = Probe.momentSumsAgg(df, vecCol, lit(0.0), dim)
    require(n > 0, "no rows matched (empty input or wrong dim)")
    // centered covariance from the augmented moments: a(i)(dim) = Σxᵢ,
    // a(dim)(dim) = n
    val nd = n.toDouble
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        c(i)(j) = (a(i)(j) - a(i)(dim) * a(j)(dim) / nd) / nd
        j += 1
      }
      i += 1
    }
    var trace = 0.0
    i = 0
    while (i < dim) { trace += c(i)(i); i += 1 }
    // fixed-start power iteration: v₀ = 1/√d
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < Iters) {
      val w = new Array[Double](dim)
      i = 0
      while (i < dim) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += c(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var norm = 0.0
      i = 0
      while (i < dim) { norm += w(i) * w(i); i += 1 }
      norm = math.sqrt(norm)
      require(norm > 0.0, "zero-variance input (power iteration collapsed)")
      i = 0
      while (i < dim) { w(i) /= norm; i += 1 }
      v = w
      it += 1
    }
    // Rayleigh quotient (v is unit)
    var lambda = 0.0
    i = 0
    while (i < dim) {
      var s = 0.0
      var j = 0
      while (j < dim) { s += c(i)(j) * v(j); j += 1 }
      lambda += v(i) * s
      i += 1
    }
    // orientation: largest-|coordinate| entry positive, lowest index wins
    var am = 0
    i = 1
    while (i < dim) {
      if (math.abs(v(i)) > math.abs(v(am))) am = i
      i += 1
    }
    if (v(am) < 0.0) { i = 0; while (i < dim) { v(i) = -v(i); i += 1 } }
    (v.map(x =>
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble),
      BigDecimal(lambda).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble,
      BigDecimal(trace).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  /** The declared-query face of [[topComponent]]: one row per
    * coordinate `(idx, v)` plus two tagged scalar rows
    * `(idx = -1, lambda)` and `(idx = -2, trace)` — a single frame an
    * oracle can verify as an eigenpair (the q184 residual pattern). */
  def topComponentFrame(
      spark: SparkSession, df: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    import spark.implicits._
    val (v, lambda, trace) = topComponent(df, vecCol, dim)
    (v.zipWithIndex.map { case (x, i) => (i.toLong, x) } ++
      Seq((-1L, lambda), (-2L, trace)))
      .toSeq.toDF("idx", "v")
  }
}
