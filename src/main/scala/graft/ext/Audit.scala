package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality audit — the pre-flight checks an ingest runs BEFORE a
 * 100-TB corpus feeds the prep pipeline: a per-column statistical profile
 * (null rates, cardinality, value range) and a key/referential-integrity
 * audit between two tables. Both are plain aggregates with fixed, tiny
 * output schemas, so they slot into the same oracle/bench harness as the
 * analytics queries — an audit that is itself unverified is just more
 * unverified data.
 *
 * Scale design: [[profile]] is ONE corpus scan folded into one global
 * aggregate (map-side partial, 1-row result) — the per-column explosion
 * happens AFTER aggregation on that single row, never on data rows.
 * [[integrity]] reduces each side to its distinct-key counts first (the
 * aggregates-before-join rule), so the join that reconciles the two sides
 * carries |distinct keys| rows, not |rows|, and every check reads from
 * that one reconciled frame.
 */
object Audit {

  /**
   * Per-column profile of `cols`: one output row per column —
   * `(column, n_rows, n_nulls, n_distinct, min_s, max_s)` with min/max
   * computed on the NATIVE type (numeric order, not string order) and
   * cast to string only for the fixed output schema. NULL-only and empty
   * inputs degrade to NULL min/max, zero counts.
   *
   * `exact = true` (the default) counts distincts exactly — the form the
   * DuckDB oracle can replay; each exact distinct adds a plan-level
   * Expand duplication of the scan's rows, so the cost is
   * |cols| × one shuffle. At 100 TB set `exact = false`:
   * `approx_count_distinct` (HLL++, the q09 sketch) folds ALL columns in
   * the single partial aggregate — one scan, one 1-row reduce, no
   * Expand — with ~2% cardinality error, which is what a profile needs
   * (a null-rate regression or a cardinality collapse is visible at any
   * sketch precision).
   */
  def profile(
      df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val nd = if (exact) count_distinct(col(c))
               else approx_count_distinct(col(c))
      Seq(
        count(lit(1)).as(s"_n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"_nn_$c"),
        nd.as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // 1 aggregated row → |cols| rows: the explode touches metadata, not data
    val perCol = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"_n_$c").as("n_rows"),
      col(s"_nn_$c").as("n_nulls"),
      col(s"_nd_$c").as("n_distinct"),
      col(s"_mn_$c").as("min_s"),
      col(s"_mx_$c").as("max_s"))): _*)
    one.select(explode(perCol).as("p")).select("p.*")
      .orderBy(col("column").asc_nulls_last)
  }

  /**
   * Key/referential-integrity audit between `left` and `right`: a fixed
   * `(check, n)` report —
   *
   *  - `left_null_keys` / `right_null_keys`: rows whose key is NULL
   *    (never joinable, invisible to every downstream equi-join);
   *  - `left_dup_keys` / `right_dup_keys`: distinct key VALUES appearing
   *    more than once on that side (a "unique id" that isn't);
   *  - `left_orphans` / `right_orphans`: distinct non-NULL keys on one
   *    side with no match on the other (a doc without its embedding, an
   *    embedding for a dropped doc);
   *  - `matched_keys`: distinct keys present on both sides.
   *
   * Each side collapses to `(key, cnt)` in ONE scan — NULL keys ride
   * along as that side's NULL group — before the reconciling full-outer
   * join, so the join is distinct-key-sized; every check derives from
   * that one frame in a single final aggregate. NULL-keyed groups never
   * match in the join (SQL NULLs), surface as NULL-`k` rows, and are
   * routed to the `*_null_keys` checks rather than polluting the orphan
   * counts.
   */
  def integrity(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val l = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("lcnt"))
    val r = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("rcnt"))
    val k = col("k").isNotNull
    val report = l.join(r, Seq("k"), "full_outer").agg(
      coalesce(sum(when(!k, col("lcnt"))), lit(0L)).as("left_null_keys"),
      coalesce(sum(when(!k, col("rcnt"))), lit(0L)).as("right_null_keys"),
      count(when(k && col("lcnt") > 1, lit(1))).as("left_dup_keys"),
      count(when(k && col("rcnt") > 1, lit(1))).as("right_dup_keys"),
      count(when(k && col("lcnt").isNotNull && col("rcnt").isNull, lit(1)))
        .as("left_orphans"),
      count(when(k && col("lcnt").isNull && col("rcnt").isNotNull, lit(1)))
        .as("right_orphans"),
      count(when(k && col("lcnt").isNotNull && col("rcnt").isNotNull, lit(1)))
        .as("matched_keys"))
    val checks = Seq("left_null_keys", "right_null_keys", "left_dup_keys",
      "right_dup_keys", "left_orphans", "right_orphans", "matched_keys")
    report.select(explode(array(checks.map(name =>
        struct(lit(name).as("check"), col(name).cast("long").as("n"))): _*))
        .as("c"))
      .select("c.*")
      .orderBy(col("check").asc_nulls_last)
  }

  /**
   * Join-key skew profile: the top-`k` heaviest values of `keyCol` with
   * their share of all rows — the pre-join diagnostic that decides
   * between a plain shuffle join, the salted join
   * ([[graft.ext.SkewJoin]]), or an AQE skew split ("one user_id owns
   * 40% of the table" is the number that decision needs). NULL is a
   * first-class key here — a null-heavy join column is the most common
   * skew pathology — ranked NULLS FIRST on the key tiebreak so both
   * engines agree when it ties into the cutoff.
   *
   * Shape: per-key count (map-side partial), a 1-row total reduce read
   * as a plan-time scalar (the q100 stats pattern — never a 1-row
   * cross join), TakeOrdered for the top-k, and rank assignment over
   * those k rows only. The key is cast to string in the OUTPUT schema
   * only — ordering happens on the native type.
   */
  def skewProfile(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    val counts = df.groupBy(col(keyCol).as("_key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n"))).first() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val ord = Seq(col("n").desc, col("_key").asc_nulls_first)
    counts.orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy(ord: _*))
        .cast("long"))
      .select(col("_key").cast("string").as("key"), col("n"),
        round(col("n") / lit(total), 6).as("share"), col("rank"))
  }

  /**
   * Equal-count value bins per group (`ntile`): each group's non-NULL
   * values split into `bins` rank-contiguous buckets with per-bucket
   * count and value bounds — the empirical-quantile profile behind
   * score calibration ("is a quality score of 0.7 top-decile for src3
   * or merely median?") and drift checks between corpus slices. Rows
   * are ordered `(value, idCol)` inside each group — the id tiebreak
   * makes duplicate values bin deterministically, so reruns and engines
   * agree bucket-for-bucket, not just approximately.
   *
   * Shape: one per-group sort window (ntile is rank arithmetic, no
   * value math), then a count/min/max aggregate over the
   * GROUP×bins-sized output. NULL values carry no rank and are
   * excluded; bounds are exact min/max (order-free doubles, no float
   * sums anywhere).
   */
  def valueDeciles(
      df: DataFrame, keyCol: String, valueCol: String, idCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.filter(col(valueCol).isNotNull)
      .withColumn("bin", ntile(bins).over(w).cast("long"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }

  /**
   * Exact per-group quantiles (type-7 / linear interpolation — the
   * convention Spark's `percentile` and DuckDB's `quantile_cont`
   * share): one `p<NN>` column per requested probability, rounded to
   * 6 dp (the q89/q99 float armor — the two engines associate the
   * interpolation arithmetic differently in the last ulp). The exact
   * companion of the GK-sketch quantiles (q49): exact needs a per-group
   * sort and is the right tool at group-sized data; the sketch is the
   * 100 TB path.
   */
  def groupQuantiles(
      df: DataFrame, keyCol: String, valueCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p < 1.0),
      s"probs must lie strictly in (0,1), got $probs")
    val aggs = probs.map(p =>
      round(expr(s"percentile(`$valueCol`, $p)"), 6)
        .as(s"p${math.round(p * 100)}"))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
