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
    * inverse CDF below takes a log of `1 − 2|u − ½|`). */
  private def seededUniform(key: Column, salt: String): Column =
    (conv(substring(
        md5(concat(lit(s"$salt:"), key).cast("binary")), 1, 12),
      16, 10).cast("double") + 0.5) / lit(281474976710656.0) // 16^12

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
      epsilon: Double, salt: String): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val u = seededUniform(key, salt)
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
      epsilon: Double, salt: String): DataFrame = {
    require(groupCols.nonEmpty,
      "dpCountsFromClasses needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("\u0001",
      groupCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val u = seededUniform(key, salt)
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
      epsilon: Double, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    import org.apache.spark.sql.expressions.Window
    val u = seededUniform(
      coalesce(col(keyCol).cast("string"), lit("\u0000")), salt)
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
   * Randomized response (Warner 1965) — LOCAL differential privacy for
   * a boolean attribute: each row reports its true value flipped with
   * probability `flipProb`, seeded per row from `md5(salt : id)`, so no
   * collector ever holds the true column (ln(1/p − 1)-LDP per report
   * at flipProb = p). NULL attributes report NULL (no evidence is not
   * a "no"). Adds one column, `reported`; per-row projection, no
   * shuffle — run it at ingest and drop the true column.
   */
  def randomizedResponse(
      df: DataFrame, idCol: String, sensitive: Column,
      flipProb: Double, salt: String): DataFrame = {
    require(flipProb > 0 && flipProb < 0.5,
      s"flipProb must be in (0, 0.5) — 0.5 destroys the signal: $flipProb")
    val flip = seededUniform(col(idCol).cast("string"), salt) < flipProb
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
}
