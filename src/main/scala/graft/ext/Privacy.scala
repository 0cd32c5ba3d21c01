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
}
