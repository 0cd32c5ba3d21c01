package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends GraftSpec {
  import spark.implicits._

  /** Two events per user pin (first_day, last_day) exactly. */
  private def events(spans: (Long, Long, Long)*) =
    spans.flatMap { case (u, f, l) => Seq((u, f * 86400L), (u, l * 86400L)) }
      .toDF("user_id", "ep")
      .select(col("user_id"), col("ep").cast("timestamp").as("ts"))

  test("textbook curve: churn steps multiply, censoring leaves the risk " +
    "set silently, an emptied risk set pins survival to exactly 0") {
    // A dur 1 (churn), B dur 2 (churn), C dur 2 ending at the global max
    // day (censored under horizon 7), D dur 3 (churn).
    val km = Survival.kaplanMeier(
      events((1L, 0L, 1L), (2L, 0L, 2L), (3L, 98L, 100L), (4L, 0L, 3L)),
      horizonBuckets = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(km.toSeq == Seq(
      (1L, 4L, 1L, 0L, 0.75), // 4 at risk, 1 churn -> 3/4
      (2L, 3L, 1L, 1L, 0.5), // 3 at risk, 1 churn, 1 censored -> x 2/3
      (3L, 1L, 1L, 0L, 0.0))) // last at-risk user churns -> exactly 0
  }

  test("horizon 0 marks every user churned; censored-only lifetimes " +
    "emit no step rows") {
    val all = Survival.kaplanMeier(
      events((1L, 0L, 1L), (2L, 0L, 2L)), horizonBuckets = 0)
      .collect()
    assert(all.map(_.getLong(2)).sum == 2L, "everyone churns at horizon 0")
    // horizon larger than the whole span: nobody observably churns
    assert(Survival.kaplanMeier(
      events((1L, 0L, 1L), (2L, 0L, 2L)), horizonBuckets = 10)
      .count() == 0L)
  }

  test("NULL users and NULL timestamps drop; duplicate same-day events " +
    "collapse into the span") {
    val df = events((1L, 0L, 5L), (2L, 0L, 5L))
      .unionByName(Seq((Option.empty[Long], Option(0L)),
        (Option(9L), Option.empty[Long]))
        .toDF("user_id", "ep")
        .select(col("user_id"), col("ep").cast("timestamp").as("ts")))
      .unionByName(events((1L, 3L, 3L))) // extra mid-span day for u1
    val km = Survival.kaplanMeier(df, horizonBuckets = 0).collect()
    assert(km.length == 1 && km.head.getLong(0) == 5L &&
      km.head.getLong(1) == 2L && km.head.getLong(2) == 2L)
  }

  test("hour-bucket lifetimes rescale the same spans") {
    // same span in hours: u1 lives 48 h, churned under a 24 h horizon
    // against u2's later last event (u2 censored, 24 h lifetime)
    val km = Survival.kaplanMeier(
      events((1L, 0L, 2L), (2L, 4L, 5L)),
      bucketSeconds = 3600L, horizonBuckets = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(km.toSeq == Seq((48L, 1L, 1L, 0L, 0.0)))
  }

  test("span merge law: spans(A union B) = mergeSpans(spans(A), spans(B)); " +
    "the merge is idempotent (replay-absorbing)") {
    val a = events((1L, 0L, 3L), (2L, 5L, 9L))
    val b = events((1L, 2L, 7L), (3L, 4L, 4L))
    val whole = Survival.userSpans(a.unionByName(b))
      .orderBy("user").collect().toSeq
    val merged = Survival.mergeSpans(
      Survival.userSpans(a), Survival.userSpans(b))
      .orderBy("user").collect().toSeq
    assert(whole == merged)
    val again = Survival.mergeSpans(
      Survival.mergeSpans(Survival.userSpans(a), Survival.userSpans(b)),
      Survival.userSpans(b)) // replay b: min/max absorb
      .orderBy("user").collect().toSeq
    assert(again == merged, "idempotent under re-merge")
    // and the curve from merged spans equals the whole-corpus curve
    assert(
      Survival.kaplanMeierFromSpans(
        Survival.mergeSpans(Survival.userSpans(a), Survival.userSpans(b)),
        horizonBuckets = 2).collect().toSeq ==
        Survival.kaplanMeier(a.unionByName(b), horizonBuckets = 2)
          .collect().toSeq)
  }

  test("horizonBuckets and bucketSeconds are validated") {
    intercept[IllegalArgumentException] {
      Survival.kaplanMeier(events((1L, 0L, 1L)), horizonBuckets = -1)
    }
    intercept[IllegalArgumentException] {
      Survival.kaplanMeier(events((1L, 0L, 1L)), bucketSeconds = 0L)
    }
  }

  test("logRank: hand-computed hypergeometric terms; identical cohorts " +
    "score chi2 = 0 / p = 1; an all-censored pair is NULL") {
    import spark.implicits._
    def spans(lives: Long*) = lives.zipWithIndex
      .map { case (t, i) => (i.toLong, 0L, t) }
      .toDF("user", "first_b", "last_b")
    // A lifetimes (1,1,3), B (2,3), horizon 0 (everyone churns):
    // t=1: d=2 of n=5 (n1=3) → e1=1.2, v=.36
    // t=2: d=1 of n=3 (n1=1) → e1=1/3, v=2/9
    // t=3: d=2 of n=2 (n1=1) → e1=1,   v=0
    val got = Survival.logRank(spans(1L, 1L, 3L), spans(2L, 3L),
      horizonBuckets = 0).head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 2L)
    assert(got.getLong(2) == 3L, s"o1 $got")
    val e1 = 1.2 + 0.333333333333 + 1.0
    val v = 0.36 + 0.222222222222
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(3) == r6(e1), s"e1 $got")
    assert(got.getDouble(4) == r6((3.0 - e1) * (3.0 - e1) / v),
      s"chi2 $got")

    val same = Survival.logRank(spans(1L, 2L, 4L), spans(1L, 2L, 4L),
      horizonBuckets = 0).head()
    assert(same.getDouble(4) == 0.0 && same.getDouble(5) == 1.0,
      s"identical cohorts: $same")

    // horizon beyond every lifetime: nobody observably churns
    val cens = Survival.logRank(spans(1L, 2L), spans(2L, 3L),
      horizonBuckets = 100).head()
    assert(cens.getLong(2) == 0L && cens.isNullAt(4) && cens.isNullAt(5),
      s"all-censored: $cens")

    intercept[IllegalArgumentException] {
      Survival.logRank(spans(1L), spans(1L), horizonBuckets = -1)
    }
  }

  test("nelsonAalen: hand-computed hazards accumulate in lifetime " +
    "order") {
    import spark.implicits._
    val curve = Seq((1L, 10L, 2L, 0L, 0.8), (3L, 8L, 4L, 0L, 0.4))
      .toDF("t_life", "n_risk", "n_churn", "n_censored", "survival")
    val got = Survival.nelsonAalen(curve).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(got(0).getDouble(3) == 0.2 && got(0).getDouble(4) == 0.2)
    assert(got(1).getDouble(3) == 0.5 && got(1).getDouble(4) == 0.7,
      s"${got.toSeq}")
  }

  test("kmMedian: picks the first lifetime at or below 50% survival; " +
    "a curve that never reaches it reports NULL") {
    import spark.implicits._
    val curve = Seq(
      (1L, 10L, 2L, 0L, 0.8), (3L, 8L, 4L, 0L, 0.4),
      (5L, 4L, 1L, 0L, 0.3))
      .toDF("t_life", "n_risk", "n_churn", "n_censored", "survival")
    val got = Survival.kmMedian(curve).head()
    assert(got.getLong(0) == 10L && got.getLong(1) == 3L)
    assert(got.getDouble(2) == 0.4, s"$got")
    val shallow = Seq((1L, 10L, 2L, 0L, 0.8), (3L, 8L, 1L, 0L, 0.7))
      .toDF("t_life", "n_risk", "n_churn", "n_censored", "survival")
    val s = Survival.kmMedian(shallow).head()
    assert(s.getLong(0) == 10L && s.isNullAt(1) && s.isNullAt(2),
      "most of the population outlives the window")
  }

  test("golden vectors from tools/golden_stats.py (r13) — KM curve, " +
    "Nelson–Aalen and log-rank against the independent textbook " +
    "implementation") {
    import spark.implicits._
    def near(got: Double, want: Double, tag: String): Unit =
      assert(math.abs(got - want) <= 2e-6, s"$tag: $got vs $want")
    // spans (first,last) in buckets; horizon 2 over global max 10 →
    // censored iff last > 8
    val sp = Seq((0L, 10L), (0L, 6L), (1L, 9L), (2L, 6L), (0L, 3L),
      (3L, 6L), (2L, 10L), (1L, 4L), (0L, 2L), (5L, 6L))
      .zipWithIndex
      .map { case ((f, l), i) => (i.toLong, f, l) }
      .toDF("user", "first_b", "last_b")
    val km = Survival.kaplanMeierFromSpans(sp, horizonBuckets = 2)
    val rows = km.collect()
    // golden: (t, n_risk, d, censored, surv): (1,10,1,0,.9)
    // (2,9,1,0,.8) (3,8,3,0,.5) (4,5,1,0,.4) (6,4,1,0,.3)
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq((1L, 10L, 1L, 0L), (2L, 9L, 1L, 0L), (3L, 8L, 3L, 0L),
        (4L, 5L, 1L, 0L), (6L, 4L, 1L, 0L)), rows.mkString(","))
    Seq(0.9, 0.8, 0.5, 0.4, 0.3).zip(rows).foreach {
      case (want, r) => near(r.getDouble(4), want, "surv") }
    // Nelson–Aalen H(t) = Σ d/n: .1, .211111, .586111, .786111, 1.036111
    val na = Survival.nelsonAalen(km).collect()
    Seq(0.1, 0.211111, 0.586111, 0.786111, 1.036111).zip(na).foreach {
      case (want, r) => near(r.getDouble(4), want, "cum_hazard") }
    // log-rank vs a second cohort: O1 = 7, E1 = 6.121889,
    // V = 2.418219, χ² = 0.318862
    val spB = Seq((0L, 9L), (1L, 5L), (0L, 10L), (2L, 4L), (1L, 3L),
      (0L, 7L), (4L, 10L)).zipWithIndex
      .map { case ((f, l), i) => (100L + i, f, l) }
      .toDF("user", "first_b", "last_b")
    val lr = Survival.logRank(sp, spB, horizonBuckets = 2).head()
    assert(lr.getLong(0) == 10L && lr.getLong(1) == 7L)
    assert(lr.getLong(2) == 7L, s"O1: $lr")
    near(lr.getDouble(3), 6.121889, "E1")
    near(lr.getDouble(4), 0.318862, "chi2")
  }
}
