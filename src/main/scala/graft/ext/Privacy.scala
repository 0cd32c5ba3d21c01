package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Privacy-risk audits over tabular data — the checks a pipeline runs
 * BEFORE a dataset (or a per-group aggregate report built from it)
 * leaves the trust boundary. k-anonymity asks "how many people share
 * this row's quasi-identifier combination?" (Sweeney 2002): a row whose
 * equivalence class has fewer than k members is re-identifiable by
 * linking those quasi-identifiers to an external register. l-diversity
 * (Machanavajjhala et al. 2007) closes k-anonymity's homogeneity hole:
 * a class can be large yet leak the sensitive attribute outright when
 * every member shares one sensitive value.
 *
 * Reference scope: the reference publishes per-user aggregate tables to
 * an external warehouse (`/root/reference/sree-etl-tdk-glue-job.py:71-94`
 * writes `tdk_user_requests_table` to JDBC) with no release audit;
 * these are the audits that decide whether such a table is safe to ship.
 *
 * Determinism: everything is exact integer counting (class sizes,
 * distinct counts) plus one rounded ratio per output row. NULL
 * quasi-identifier values form their own class (GROUP BY null semantics,
 * identical in Spark and DuckDB); NULL sensitive values are not counted
 * as a diversity value (count-distinct null semantics, also identical).
 *
 * Shape at scale: one hash aggregate over the quasi-identifier key
 * produces the class-size frame; every subsequent aggregate runs over
 * that class frame (cardinality = number of equivalence classes, never
 * rows) or the bounded threshold list. No windows, no joins back to the
 * data, output bounded by |ks| and the sensitive-attribute cardinality.
 */
object Privacy {

  /** Equivalence-class sizes over the quasi-identifier columns: one row
    * per class with its member count. The shared first stage of both
    * audits — a single hash aggregate, class-frame-sized output. */
  def equivalenceClasses(df: DataFrame, quasi: Seq[Column]): DataFrame =
    df.groupBy(quasi: _*).agg(count(lit(1)).as("class_size"))

  /**
   * k-anonymity audit: for each threshold in `ks`, how much of the data
   * is at risk? Returns one row per k —
   * `(k, n_classes, min_class_size, n_classes_below, n_rows_at_risk,
   * n_rows, pct_rows_at_risk)` where a class is "below" when its size
   * is < k and at-risk rows are the members of those classes. The
   * release gate reads: ship only if `pct_rows_at_risk` at the policy's
   * k is zero (or suppress/generalize the at-risk classes first).
   *
   * The threshold fan-out explodes over the CLASS frame, not the data:
   * cost is `|classes| × |ks|` rows into one bounded aggregate.
   */
  def kAnonymityProfile(
      df: DataFrame, quasi: Seq[Column], ks: Seq[Int]): DataFrame =
    kAnonymityFromClasses(equivalenceClasses(df, quasi), ks)

  /** Column-wise fold of class-size partials from DISJOINT batches:
    * sizes are additive under union, so the audit is a standing state
    * — per-batch [[equivalenceClasses]] partials append and fold at
    * read, full-data re-audits never rescan history (the
    * [[graft.analytics.Trend.mergeMoments]] merge-law shape). */
  def mergeClasses(partials: DataFrame, quasi: Seq[Column]): DataFrame =
    partials.groupBy(quasi: _*)
      .agg(sum(col("class_size")).as("class_size"))

  /** [[kAnonymityProfile]]'s threshold profile evaluated over an
    * already-built class frame ([[equivalenceClasses]] directly or a
    * [[mergeClasses]] fold). */
  def kAnonymityFromClasses(
      classes: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 2), "thresholds must be >= 2")
    classes
      .select(col("class_size"),
        explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("min_class_size"),
        coalesce(sum(when(col("class_size") < col("k"), 1L)), lit(0L))
          .as("n_classes_below"),
        coalesce(sum(when(col("class_size") < col("k"),
          col("class_size"))), lit(0L)).as("n_rows_at_risk"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("pct_rows_at_risk",
        round(col("n_rows_at_risk").cast("double") /
          col("n_rows").cast("double"), 6))
      .orderBy(col("k").asc)
  }

  /**
   * l-diversity histogram: distinct sensitive values per equivalence
   * class, summarized as `(diversity, n_classes, n_rows)` ordered by
   * diversity. `diversity = 1` rows are the homogeneity leak — classes
   * where k-anonymity holds but every member shares the sensitive
   * value, so membership alone discloses it; a policy "every class has
   * l ≥ 2" is the assertion that the first histogram row is absent.
   * Output bounded by the sensitive attribute's cardinality.
   */
  def diversityHistogram(
      df: DataFrame, quasi: Seq[Column], sensitive: Column): DataFrame =
    df.groupBy(quasi: _*)
      .agg(countDistinct(sensitive).as("diversity"),
        count(lit(1)).as("class_size"))
      .groupBy(col("diversity"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .orderBy(col("diversity").asc)

  /** Uniform in (0,1) from the first 12 md5 nibbles of `salt:key` —
    * the repo's seeded-randomness idiom ([[Sampling]]'s es-key), offset
    * by half a grid step so 0 and 1 are unreachable (the Laplace
    * inverse CDF below takes a log of `1 − 2|u − ½|`).
    *
    * THE SALT IS A SECRET KEY. Every mechanism below derives its noise
    * as a deterministic function `PRF(secretSalt, group-key)` — that is
    * what makes a single release reproducible and oracle-testable, and
    * it is a standard construction (PRF-based DP noise), but the DP
    * guarantee holds ONLY against adversaries who do not know the
    * salt: anyone holding it recomputes the noise exactly and recovers
    * the true count from `released_count`. Operationally the salt is
    * key material — generate it with high entropy, store it like a
    * signing key, and NEVER ship it with (or derive it from) the
    * release. Publishing the salt voids the privacy guarantee
    * retroactively for every release made under it. The mechanism
    * parameters (`secretSalt`) are named to keep this contract loud at
    * every call site. */
  private def seededUniform(key: Column, salt: String): Column =
    (conv(substring(
        md5(concat(lit(s"$salt:"), key).cast("binary")), 1, 12),
      16, 10).cast("double") + 0.5) / lit(281474976710656.0) // 16^12

  /**
   * Inverse standard-normal CDF Φ⁻¹(p) — Acklam's rational
   * approximation (P. J. Acklam 2003, |relative error| < 1.15e-9):
   * a central rational in `q = p − ½` for p ∈ [0.02425, 0.97575] and
   * a tail rational in `q = √(−2·ln p)` (mirrored for the upper tail).
   *
   * Why this form and not Box–Muller or the exact erfinv: every
   * operation here is `+ − * /` on doubles (IEEE-correctly-rounded and
   * order-pinned by the shared parenthesization), one `ln` (the one
   * transcendental Spark and DuckDB bit-match — the Laplace path's
   * standing precedent) and one `sqrt` (IEEE requires correct
   * rounding) — so the value is ENGINE-BIT-MATCHED, which Box–Muller's
   * `cos` is not guaranteed to be. The DuckDB oracle mirrors this
   * exact expression tree ([[graft.SparkEntry]]'s probit SQL).
   */
  private[ext] def probit(p: Column): Column = {
    def central(q: Column): Column = {
      val r = q * q
      (((((lit(-3.969683028665376e+01) * r + lit(2.209460984245205e+02)) * r
        + lit(-2.759285104469687e+02)) * r + lit(1.383577518672690e+02)) * r
        + lit(-3.066479806614716e+01)) * r + lit(2.506628277459239e+00)) * q /
      ((((((lit(-5.447609879822406e+01) * r + lit(1.615858368580409e+02)) * r
        + lit(-1.556989798598866e+02)) * r + lit(6.680131188771972e+01)) * r
        + lit(-1.328068155288572e+01)) * r) + lit(1.0))
    }
    def tail(q: Column): Column =
      (((((lit(-7.784894002430293e-03) * q + lit(-3.223964580411365e-01)) * q
        + lit(-2.400758277161838e+00)) * q + lit(-2.549732539343734e+00)) * q
        + lit(4.374664141464968e+00)) * q + lit(2.938163982698783e+00)) /
      ((((lit(7.784695709041462e-03) * q + lit(3.224671290700398e-01)) * q
        + lit(2.445134137142996e+00)) * q + lit(3.754408661907416e+00)) * q
        + lit(1.0))
    when(p < lit(0.02425), tail(sqrt(lit(-2.0) * log(p))))
      .when(p > lit(0.97575),
        -tail(sqrt(lit(-2.0) * log(lit(1.0) - p))))
      .otherwise(central(p - lit(0.5)))
  }

  /** The analytic Gaussian-mechanism noise scale (Dwork & Roth 2014,
    * Thm A.1): `σ = √(2·ln(1.25/δ)) · Δ / ε` with sensitivity Δ = 1
    * for counting queries; the theorem is stated for ε ∈ (0, 1), so the
    * open interval is enforced (for ε ≥ 1 use the zCDP calibration
    * `zcdpSigma`, whose guarantee has no ε ceiling). Computed
    * driver-side so both the plan and the oracle embed the identical
    * double. */
  def gaussianSigma(epsilon: Double, delta: Double): Double = {
    require(epsilon > 0 && epsilon < 1.0,
      s"the analytic Gaussian bound needs epsilon in (0, 1), got $epsilon")
    require(delta > 0 && delta < 1, s"delta must be in (0, 1), got $delta")
    math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
  }

  /**
   * ε-differentially-private count release (Dwork et al. 2006): each
   * group's exact count plus Laplace(1/ε) noise — a count's sensitivity
   * under add/remove-one neighbors is 1 — released as the clamped
   * integer `max(0, ⌊count + noise + ½⌋)`. The exact count never
   * appears in the output; this is the mechanism that publishes a
   * per-group report (the reference's own per-user request table is
   * exactly such a release) with a provable bound on what any one row
   * can change.
   *
   * The noise is SEEDED: uniform from `md5(salt : group-key)` through
   * the Laplace inverse CDF `−(1/ε)·sgn(u−½)·ln(1−2|u−½|)`. A fixed
   * salt makes the release reproducible across engines and testable
   * against an oracle — and is also the correct production posture for
   * a SINGLE release (re-randomizing the same release leaks: averaging
   * n re-releases shrinks the noise √n-fold). Publishing k DIFFERENT
   * releases of the same data requires fresh salts AND paying ε each
   * time — sequential composition, total budget Σε — which is the
   * caller's ledger, priced here in the output's `epsilon` column.
   *
   * NULL group values form their own group, keyed by a sentinel
   * (`chr(0)`) that cannot appear in the cast group values; group keys
   * join with `chr(1)` so adjacent columns cannot concatenate-collide.
   *
   * Shape at scale: ONE hash aggregate (map-side partial) to the
   * group frame; noise is a per-group projection — no second pass, no
   * window, no join.
   */
  def dpCounts(
      df: DataFrame, groupCols: Seq[String],
      epsilon: Double, secretSalt: String): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val u = seededUniform(key, secretSalt)
    val t = u - lit(0.5)
    val noise = -signum(t) * log(lit(1.0) - lit(2.0) * abs(t)) / lit(epsilon)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) :+
        greatest(lit(0L),
          floor(col("__n") + noise + lit(0.5)).cast("long"))
          .as("released_count") :+
        lit(epsilon).as("epsilon"): _*)
  }

  /**
   * [[dpCounts]] evaluated over an already-built class frame — the
   * STANDING-CENSUS release shape: per-batch [[equivalenceClasses]]
   * partials accumulate (counts are additive, [[mergeClasses]]), and a
   * release is ONE noisy projection over the folded class frame with
   * zero passes over any batch's rows. The merge law
   * `dpCountsFromClasses(mergeClasses(cls(a) ∪ cls(b))) ≡
   * dpCounts(a ∪ b)` holds exactly because the noise seeds on the
   * GROUP KEY, not the data — the q349/q350 standing-state pattern
   * applied to a privacy release. Budget accounting is unchanged: each
   * distinct (salt, ε) release spends ε, however the counts were
   * assembled.
   */
  def dpCountsFromClasses(
      classes: DataFrame, groupCols: Seq[String],
      epsilon: Double, secretSalt: String): DataFrame = {
    require(groupCols.nonEmpty,
      "dpCountsFromClasses needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val u = seededUniform(key, secretSalt)
    val t = u - lit(0.5)
    val noise = -signum(t) * log(lit(1.0) - lit(2.0) * abs(t)) / lit(epsilon)
    classes.select(groupCols.map(col) :+
      greatest(lit(0L),
        floor(col("class_size") + noise + lit(0.5)).cast("long"))
        .as("released_count") :+
      lit(epsilon).as("epsilon"): _*)
  }

  /**
   * ε-DP top-k selection — the EXPONENTIAL mechanism (McSherry & Talwar
   * 2007) in its Gumbel-noise form: releasing
   * `argmax(count + (2/ε)·Gumbel)` is distributionally identical to the
   * exponential mechanism with utility = count and sensitivity 1, and
   * taking the k largest noisy scores at once is the one-shot top-k of
   * Durfee & Rogers (NeurIPS 2019). What leaves is the RANKED KEY LIST
   * ONLY — no count, noisy or otherwise: the "which languages dominate
   * this corpus?" release when even a Laplace-noised count says too
   * much. Each key's Gumbel draw `−ln(−ln u)` is seeded from
   * `md5(salt : key)` — the same reproducibility-and-budget posture as
   * [[dpCounts]] (one salt = one release; k keys from one draw set =
   * one Durfee–Rogers top-k budget, not k compositions).
   *
   * Output: `(rank, keyCol, epsilon)`, rank 1 = noisy-largest. NULL
   * keys participate as their own group (seeded by the sentinel).
   *
   * Shape at scale: one hash aggregate to the key frame; the noisy sort
   * is TakeOrdered-bounded to k over that metadata-sized frame.
   */
  def dpTopK(
      df: DataFrame, keyCol: String, k: Int,
      epsilon: Double, secretSalt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    import org.apache.spark.sql.expressions.Window
    val u = seededUniform(
      coalesce(col(keyCol).cast("string"), lit("\u0000")), secretSalt)
    val gumbel = -log(-log(u))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__score", col("__n") + lit(2.0 / epsilon) * gumbel)
      .orderBy(col("__score").desc, col(keyCol).asc_nulls_last)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__score").desc, col(keyCol).asc_nulls_last))
        .cast("long"))
      .select(col("rank"), col(keyCol), lit(epsilon).as("epsilon"))
  }

  /**
   * Randomized response (Warner 1965) — the LOCAL-DP reporting
   * primitive for a boolean attribute: each row's reported value is its
   * true value flipped with probability `flipProb`, seeded per row from
   * `md5(secretSalt : id)` (ln(1/p − 1)-LDP per report at flipProb = p).
   * NULL attributes report NULL (no evidence is not a "no"). Adds one
   * column, `reported`; per-row projection, no shuffle.
   *
   * TRUST MODEL — read before deploying: this operator runs SERVER-SIDE
   * over the true sensitive column, so the engine executing it (and
   * anyone with read access to its input) sees the truth. The local-DP
   * guarantee holds only against DOWNSTREAM consumers of the `reported`
   * column, and only while `secretSalt` is withheld from them (the
   * [[seededUniform]] key contract). True client-side LDP requires
   * running the flip on the client before collection; here the operator
   * is the ingest-boundary transform — run it at ingest, drop the true
   * column immediately, and never persist the input. `idCol` MUST be
   * unique per row: duplicate ids draw the same uniform, so their flips
   * are perfectly correlated (k copies of one row amplify its report
   * k-fold instead of averaging out), which both biases [[rrPrevalence]]
   * and weakens the per-individual guarantee.
   */
  def randomizedResponse(
      df: DataFrame, idCol: String, sensitive: Column,
      flipProb: Double, secretSalt: String): DataFrame = {
    require(flipProb > 0 && flipProb < 0.5,
      s"flipProb must be in (0, 0.5) — 0.5 destroys the signal: $flipProb")
    val flip = seededUniform(col(idCol).cast("string"), secretSalt) < flipProb
    df.withColumn("reported",
      when(sensitive.isNull, lit(null).cast("boolean"))
        .otherwise(when(flip, !sensitive).otherwise(sensitive)))
  }

  /**
   * The debiasing census over [[randomizedResponse]] reports: with flip
   * probability p, `E[reported yes rate] = π(1−p) + (1−π)p`, so the
   * unbiased prevalence estimate is `π̂ = (yes_rate − p) / (1 − 2p)` —
   * per group: `(…, n_reports, n_reported_yes, pi_hat)`. π̂ can land
   * outside [0,1] by sampling noise (small n, rare attribute); that is
   * the honest estimator — clamp at the consumer if a proportion is
   * required. One hash aggregate over the reports; NULL reports are
   * excluded from both n and yes (they carry no evidence).
   */
  def rrPrevalence(
      reports: DataFrame, groupCols: Seq[String],
      flipProb: Double): DataFrame = {
    require(flipProb > 0 && flipProb < 0.5,
      s"flipProb must be in (0, 0.5): $flipProb")
    reports
      .filter(col("reported").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_reports"),
        coalesce(sum(when(col("reported"), 1L)), lit(0L))
          .as("n_reported_yes"))
      .withColumn("pi_hat",
        round((col("n_reported_yes").cast("double")
            / col("n_reports") - flipProb) / (1.0 - 2.0 * flipProb), 6))
  }

  /** Shared release projection of the Gaussian mechanism: the seeded
    * uniform on the group key through [[probit]], scaled by the
    * analytic σ, clamped-floor released — the [[dpCountsFromClasses]]
    * shape with Gaussian tails. */
  private def gaussianRelease(
      classes: DataFrame, groupCols: Seq[String], countCol: String,
      epsilon: Double, delta: Double, secretSalt: String): DataFrame =
    noisyFloorRelease(classes, groupCols, countCol,
      gaussianSigma(epsilon, delta), secretSalt,
      Seq(lit(epsilon).as("epsilon"), lit(delta).as("delta")))

  /** The shared noisy-count projection every Gaussian-family release
    * reduces to: the seeded uniform on the group key through
    * [[probit]], scaled by the caller's \u03c3, clamped-floor released,
    * with the caller's budget columns appended. */
  private def noisyFloorRelease(
      classes: DataFrame, groupCols: Seq[String], countCol: String,
      sigma: Double, secretSalt: String,
      budgetCols: Seq[Column]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val key = concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val noise = lit(sigma) * probit(seededUniform(key, secretSalt))
    classes.select((groupCols.map(col) :+
      greatest(lit(0L),
        floor(col(countCol) + noise + lit(0.5)).cast("long"))
        .as("released_count")) ++ budgetCols: _*)
  }

  /**
   * (ε,δ)-differentially-private count release — the GAUSSIAN mechanism
   * (Dwork & Roth 2014, Thm A.1): each group's exact count plus
   * `N(0, σ²)` noise with `σ = √(2·ln(1.25/δ))/ε` (sensitivity 1,
   * valid for ε ≤ 1), released as the clamped integer
   * `max(0, ⌊count + noise + ½⌋)`. The (ε,δ) relaxation buys the
   * lighter tails that make high-dimensional and COMPOSED release sets
   * affordable: under k-fold composition Gaussian releases spend
   * ~√k·ε (the [[composeBudget]] advanced bound) where pure-ε Laplace
   * spends k·ε — this is the mechanism any real release PIPELINE runs,
   * with [[dpCounts]] as the single-release pure-ε special case.
   *
   * Noise is seeded per group key via [[seededUniform]] → [[probit]]
   * (engine-bit-matched — see the probit scaladoc), under the same
   * secret-salt contract and the same one-salt-one-release budget
   * posture as [[dpCounts]]; σ embeds driver-side so plan and oracle
   * carry the identical double. Output: group cols +
   * `(released_count, epsilon, delta)`.
   *
   * Shape at scale: ONE hash aggregate (map-side partial) to the group
   * frame; the noise is a per-group projection — no second pass, no
   * window, no join.
   */
  def dpCountsGaussian(
      df: DataFrame, groupCols: Seq[String],
      epsilon: Double, delta: Double, secretSalt: String): DataFrame =
    gaussianRelease(
      df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__n")),
      groupCols, "__n", epsilon, delta, secretSalt)

  /**
   * [[dpCountsGaussian]] over an already-built class frame — the
   * standing-census (ε,δ) release: per-batch [[equivalenceClasses]]
   * partials fold additively ([[mergeClasses]]) and a release is ONE
   * noisy projection with zero passes over any batch's rows. The merge
   * law `dpCountsGaussianFromClasses(mergeClasses(cls(a) ∪ cls(b))) ≡
   * dpCountsGaussian(a ∪ b)` holds exactly because the noise seeds on
   * the GROUP KEY — the [[dpCountsFromClasses]] law with Gaussian
   * tails.
   */
  def dpCountsGaussianFromClasses(
      classes: DataFrame, groupCols: Seq[String],
      epsilon: Double, delta: Double, secretSalt: String): DataFrame =
    gaussianRelease(classes, groupCols, "class_size",
      epsilon, delta, secretSalt)

  /** zCDP Gaussian calibration (Bun & Steinke 2016, Prop 1.6): the
    * Gaussian mechanism with `σ = Δ/√(2ρ)` satisfies ρ-zCDP, Δ = 1 for
    * counts. Unlike [[gaussianSigma]]'s Dwork & Roth bound this has NO
    * ε ceiling — zCDP is the calibration to use past ε ≈ 1 — and zCDP
    * composes by simple addition of ρ (no √k slack term, no δ' tax).
    * Computed driver-side so plan and oracle embed the identical
    * double. */
  def zcdpSigma(rho: Double): Double = {
    require(rho > 0, s"rho must be positive, got $rho")
    1.0 / math.sqrt(2.0 * rho)
  }

  /** zCDP→(ε,δ) conversion (Bun & Steinke 2016, Prop 1.3): ρ-zCDP
    * implies `(ρ + 2·√(ρ·ln(1/δ)), δ)`-DP for every δ ∈ (0, 1) — the
    * closed form that prices a zCDP ledger in the (ε,δ) currency
    * policies are written in. Driver-side for the same embedding
    * reason as [[zcdpSigma]]. */
  def zcdpEpsilon(rho: Double, delta: Double): Double = {
    require(rho > 0, s"rho must be positive, got $rho")
    require(delta > 0 && delta < 1, s"delta must be in (0, 1), got $delta")
    rho + 2.0 * math.sqrt(rho * math.log(1.0 / delta))
  }

  /**
   * ρ-zCDP count release (Bun & Steinke 2016): the Gaussian mechanism
   * calibrated in the zCDP currency — `σ = 1/√(2ρ)` ([[zcdpSigma]]),
   * the same seeded-probit noise and clamped-floor projection as
   * [[dpCountsGaussian]]. Why a second Gaussian front door: zCDP is
   * the accounting frame long release SCHEDULES actually run under —
   * k releases at ρ each are exactly kρ-zCDP (additive, tight for
   * Gaussians, no caller-chosen δ' slack), and the total converts to
   * (ε,δ) once at the end via [[zcdpEpsilon]] instead of paying the
   * DRV'10 slack per composition. It also covers the ε ≥ 1 regime
   * [[gaussianSigma]]'s cited bound excludes.
   *
   * Output: group cols + `(released_count, rho, epsilon, delta)` where
   * `epsilon` is the [[zcdpEpsilon]] conversion at the caller's δ —
   * the release self-describes in both currencies. Same
   * one-hash-aggregate + per-group-projection shape as
   * [[dpCountsGaussian]]; same secret-salt contract.
   */
  def dpCountsZcdp(
      df: DataFrame, groupCols: Seq[String],
      rho: Double, delta: Double, secretSalt: String): DataFrame =
    noisyFloorRelease(
      df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__n")),
      groupCols, "__n", zcdpSigma(rho), secretSalt,
      Seq(lit(rho).as("rho"),
        lit(zcdpEpsilon(rho, delta)).as("epsilon"),
        lit(delta).as("delta")))

  /**
   * [[dpCountsZcdp]] over an already-built class frame — the standing
   * census released in the zCDP currency: per-batch
   * [[equivalenceClasses]] partials fold additively
   * ([[mergeClasses]]) and a release is ONE noisy projection with zero
   * passes over any batch's rows. The merge law
   * `dpCountsZcdpFromClasses(mergeClasses(cls(a) ∪ cls(b))) ≡
   * dpCountsZcdp(a ∪ b)` holds exactly because the noise seeds on the
   * GROUP KEY — the [[dpCountsGaussianFromClasses]] law in the zCDP
   * currency, closing the front-door/standing-census pair for every
   * release family (Laplace q347/q355, Gaussian q356/q358, zCDP
   * q359/q366).
   */
  def dpCountsZcdpFromClasses(
      classes: DataFrame, groupCols: Seq[String],
      rho: Double, delta: Double, secretSalt: String): DataFrame =
    noisyFloorRelease(classes, groupCols, "class_size",
      zcdpSigma(rho), secretSalt,
      Seq(lit(rho).as("rho"),
        lit(zcdpEpsilon(rho, delta)).as("epsilon"),
        lit(delta).as("delta")))

  /**
   * Rényi-DP accountant (Mironov 2017): price a heterogeneous release
   * ledger at a GRID of Rényi orders and convert the best order to
   * (ε,δ). Per ledger row the mechanism's RDP curve at order α
   * (sensitivity 1, noise scale `scaleCol`):
   *
   *  - `gaussian` with σ: `ε_α = α/(2σ²)` (Mironov Cor. 3);
   *  - `laplace` with b:  `ε_α = (1/(α−1))·ln((α·e^((α−1)/b)
   *    + (α−1)·e^(−α/b)) / (2α−1))` (Mironov Table II, α > 1).
   *
   * RDP composes ADDITIVELY per order (Prop 1) — the whole ledger sums
   * at each α with 12-dp decimal terms (order-independent) — and each
   * order converts via `ε(δ) = ε_α + ln(1/δ)/(α−1)` (Prop 3); the
   * accountant releases the full curve plus `is_best` on the minimizing
   * order. This is the tight frame for long schedules: where the
   * DRV'10 bound ([[composeBudget]]) pays a fixed δ' slack per
   * PIPELINE, the RDP minimum tracks the actual mechanisms — for an
   * all-Gaussian ledger it recovers zCDP accounting exactly
   * (`ε_α = α·Σρ` is linear in α).
   *
   * Output: `(alpha, rdp_epsilon, converted_epsilon, is_best)` ordered
   * by α, 6-dp rounded from the 12-dp sums; `is_best` ties resolve on
   * 12-dp values so the flag is engine-stable. Shape at scale: the
   * ledger is releases-sized metadata × |orders| — one explode, one
   * hash aggregate, one |orders|-row window; the corpus never appears.
   */
  def rdpAccount(
      releases: DataFrame, mechCol: String, scaleCol: String,
      delta: Double,
      orders: Seq[Double] = Seq(1.5, 2.0, 3.0, 4.0, 8.0, 16.0, 32.0, 64.0))
      : DataFrame = {
    require(delta > 0 && delta < 1, s"delta must be in (0, 1), got $delta")
    require(orders.nonEmpty && orders.forall(_ > 1.0),
      s"Renyi orders must all exceed 1: $orders")
    val d12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val a = col("alpha")
    val b = col(scaleCol).cast("double")
    val gaussianTerm = a / (lit(2.0) * b * b)
    val laplaceTerm = (lit(1.0) / (a - lit(1.0))) *
      log((a * exp((a - lit(1.0)) / b) +
        (a - lit(1.0)) * exp(-a / b)) / (lit(2.0) * a - lit(1.0)))
    val term = when(col(mechCol) === "gaussian", gaussianTerm)
      .when(col(mechCol) === "laplace", laplaceTerm)
      .otherwise(raise_error(concat(
        lit("rdpAccount: unknown mechanism '"), col(mechCol),
        lit("' (expected 'gaussian' or 'laplace')"))).cast("double"))
    val curve = releases
      .select(col(mechCol), b.as(scaleCol),
        explode(array(orders.map(lit): _*)).as("alpha"))
      .groupBy(a)
      .agg(sum(round(term, 12).cast(d12)).as("__rdp"))
      .select(a,
        col("__rdp").cast("double").as("__rdpd"),
        (col("__rdp").cast("double") +
          log(lit(1.0) / lit(delta)) / (a - lit(1.0))).as("__conv"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    curve
      .withColumn("__best", min(round(col("__conv"), 12)).over(w))
      .select(a,
        round(col("__rdpd"), 6).as("rdp_epsilon"),
        round(col("__conv"), 6).as("converted_epsilon"),
        (round(col("__conv"), 12) === col("__best")).as("is_best"))
      .orderBy(a.asc)
  }

  /** Exact `ln C(a, j)` via BigInt factorials, driver-side — both the
    * plan and the oracle embed the identical double literal (binomials
    * to C(32,16) are exact in BigInt; the ln of the exact quotient is
    * correctly rounded once). */
  private[graft] def lnBinom(a: Int, j: Int): Double = {
    def fact(n: Int): BigInt = (1 to n).foldLeft(BigInt(1))(_ * _)
    math.log((fact(a) / (fact(j) * fact(a - j))).toDouble)
  }

  /**
   * RDP accountant for the SAMPLED (Poisson-subsampled) Gaussian
   * mechanism — privacy amplification by subsampling (Mironov, Talwar &
   * Zhang 2019, "Rényi Differential Privacy of the Sampled Gaussian
   * Mechanism", Thm 5 / the standard integer-order closed form): a
   * release that runs the Gaussian mechanism on a q-fraction Poisson
   * sample spends, at integer order α,
   *
   *   ε_α = ln( Σ_{j=0}^{α} C(α,j)·(1−q)^{α−j}·q^j·e^{(j²−j)/(2σ²)} )
   *         / (α−1)
   *
   * — strictly less than the full-data α/(2σ²) for q < 1, which is WHY
   * minibatched pipelines (DP-SGD-style: each step touches a q-sample)
   * are affordable: the per-step cost carries a ~q² factor at small q.
   * This is the accounting frame [[rdpAccount]]'s full-data curves
   * upper-bound; per ledger row `(qCol, sigmaCol)`, per order, the
   * closed form is evaluated as an ENGINE-SHARED expression tree —
   * exact-BigInt `ln C(α,j)` literals, a max-subtracted log-sum-exp
   * fold (the j = α exponent reaches (α²−α)/(2σ²); the raw sum would
   * overflow), identical left-fold association on both sides — then
   * composes additively per order with 12-dp decimal sums and converts
   * via Prop 3 exactly like [[rdpAccount]].
   *
   * Orders must be INTEGERS ≥ 2 (the closed form is the binomial
   * expansion at integer α); sampling rates must lie in (0,1) and σ > 0
   * (caller contract — the ledger is constructed, not user input).
   * Output: `(alpha, rdp_epsilon, converted_epsilon, is_best)` ordered
   * by α — [[rdpAccount]]'s exact shape. Scale: ledger-sized metadata ×
   * |orders|; the corpus never appears.
   */
  def sgmRdpAccount(
      releases: DataFrame, qCol: String, sigmaCol: String, delta: Double,
      orders: Seq[Int] = Seq(2, 3, 4, 8, 16, 32)): DataFrame = {
    require(delta > 0 && delta < 1, s"delta must be in (0, 1), got $delta")
    require(orders.nonEmpty && orders.forall(_ >= 2),
      s"sampled-Gaussian RDP needs integer orders >= 2: $orders")
    val d12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val qc = col(qCol).cast("double")
    val sc = col(sigmaCol).cast("double")
    val lnq = log(qc)
    val ln1q = log(lit(1.0) - qc)
    val s2x2 = lit(2.0) * sc * sc
    // The |orders| branches each re-read `releases`, so an expensive
    // ledger subtree (q370's is a distinct over the corpus) would be
    // re-scanned per order — cut it once; the branches then read the
    // materialized ledger (tiny: one row per release). A single-select
    // explode variant was measured SLOWER (3.98 s → 9.14 s at sf0.1):
    // fusing every order's ~α exp() terms into one projection produces
    // a codegen method too large to JIT well, while per-branch
    // projections stay small — the cut removes the re-scans without
    // touching the per-branch expression trees (oracle-identical).
    val rel = Materialize.cut(releases)
    val branches = orders.map { a =>
      val es = (0 to a).map { j =>
        lit(lnBinom(a, j)) + lit((a - j).toDouble) * ln1q +
          lit(j.toDouble) * lnq +
          lit((j.toLong * j - j).toDouble) / s2x2
      }
      val m = greatest(es: _*)
      val lse = m + log(es.map(e => exp(e - m)).reduce(_ + _))
      rel.select(lit(a.toDouble).as("alpha"),
        round(lse / lit((a - 1).toDouble), 12).cast(d12).as("__t"))
    }
    val al = col("alpha")
    val curve = branches.reduce(_ unionByName _)
      .groupBy(al).agg(sum(col("__t")).as("__rdp"))
      .select(al,
        col("__rdp").cast("double").as("__rdpd"),
        (col("__rdp").cast("double") +
          log(lit(1.0) / lit(delta)) / (al - lit(1.0))).as("__conv"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    curve
      .withColumn("__best", min(round(col("__conv"), 12)).over(w))
      .select(al,
        round(col("__rdpd"), 6).as("rdp_epsilon"),
        round(col("__conv"), 6).as("converted_epsilon"),
        (round(col("__conv"), 12) === col("__best")).as("is_best"))
      .orderBy(al.asc)
  }

  /**
   * Composition accounting — the privacy LEDGER over a release set:
   * given one row per past/planned release with its `(ε, δ)`, price the
   * total spend two ways and release both:
   *
   *  - **basic** (sequential) composition: `(Σε, Σδ)` — always valid,
   *    the bound pure-ε pipelines pay;
   *  - **advanced** composition (Dwork, Rothblum & Vadhan 2010, in the
   *    heterogeneous form of Dwork & Roth Thm 3.20): for any slack
   *    `δ' > 0`, the set is `(ε_adv, Σδ + δ')`-DP with
   *    `ε_adv = √(2·ln(1/δ')·Σε²) + Σ ε·(e^ε − 1)` — the √k-growth
   *    bound that makes long release schedules affordable, at the
   *    price of the caller-chosen `deltaSlack`.
   *
   * The budget gate reads: a new release ships only while
   * `min(basic_epsilon, advanced_epsilon)` stays under policy. One row
   * out: `(n_releases, basic_epsilon, basic_delta, advanced_epsilon,
   * advanced_delta)`, everything rounded at 6 dp from 12-dp decimal
   * term sums (order-independent over the ledger).
   *
   * Shape at scale: the ledger is releases-sized metadata — one
   * aggregate, no shuffle concern at any corpus scale (the corpus never
   * appears here; that is the mechanisms' job).
   */
  def composeBudget(
      releases: DataFrame, epsCol: String, deltaCol: String,
      deltaSlack: Double): DataFrame = {
    require(deltaSlack > 0 && deltaSlack < 1,
      s"deltaSlack must be in (0, 1), got $deltaSlack")
    val d12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val e = col(epsCol).cast("double")
    releases.agg(
        count(lit(1)).as("n_releases"),
        sum(round(e, 12).cast(d12)).as("__se"),
        sum(round(col(deltaCol).cast("double"), 12).cast(d12)).as("__sd"),
        sum(round(e * e, 12).cast(d12)).as("__s2"),
        sum(round(e * (exp(e) - lit(1.0)), 12).cast(d12)).as("__lin"))
      .select(
        col("n_releases"),
        round(col("__se").cast("double"), 6).as("basic_epsilon"),
        round(col("__sd").cast("double"), 6).as("basic_delta"),
        round(sqrt(lit(2.0) * log(lit(1.0) / lit(deltaSlack)) *
            col("__s2").cast("double")) +
          col("__lin").cast("double"), 6).as("advanced_epsilon"),
        round(col("__sd").cast("double") + lit(deltaSlack), 6)
          .as("advanced_delta"))
  }
}
