package graft.analytics

import graft.GraftSpec
import org.apache.spark.sql.functions._

class StatsTestsSpec extends GraftSpec {
  import spark.implicits._

  test("chiSquared: perfectly proportional cells score 0; perfect " +
    "association scores n; dof = (R-1)(C-1)") {
    def rows(spec: Seq[((String, String), Int)]) =
      spec.flatMap { case (ab, k) => Seq.fill(k)(ab) }
        .toDF("a", "b")
    val indep = StatsTests.chiSquared(
      rows(Seq(("x", "p") -> 10, ("x", "q") -> 20,
        ("y", "p") -> 20, ("y", "q") -> 40)),
      col("a"), col("b")).collect().head
    assert(indep.getLong(0) == 90L)
    assert(indep.getLong(3) == 1L, "dof")
    assert(indep.getDouble(4) == 0.0, "proportional ⇒ χ² = 0")
    val assoc = StatsTests.chiSquared(
      rows(Seq(("x", "p") -> 10, ("y", "q") -> 10)),
      col("a"), col("b")).collect().head
    assert(assoc.getDouble(4) == 20.0, "φ = 1 ⇒ χ² = n")
  }

  test("effectSize: hand-computed d and Hedges' g; degenerate sides " +
    "yield NULL magnitudes but real means") {
    def df(vs: Double*) = vs.toDF("v")
    val got = StatsTests.effectSize(df(0.0, 2.0), df(1.0, 3.0), col("v"))
      .collect().head
    // m1=1, m2=2, ss=2 each, sp=√((2+2)/2)=√2, d=-1/√2, J=1-3/7=4/7
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L)
    assert(got.getDouble(2) == 1.0 && got.getDouble(3) == 2.0)
    assert(got.getDouble(4) == 1.414214)
    assert(got.getDouble(5) == -0.707107)
    assert(got.getDouble(6) == -0.404061)
    val tiny = StatsTests.effectSize(df(1.0), df(2.0, 3.0), col("v"))
      .collect().head
    assert(tiny.isNullAt(4) && tiny.isNullAt(5) && tiny.isNullAt(6),
      "1-row side has no pooled spread")
    assert(tiny.getDouble(2) == 1.0)
    val flat = StatsTests.effectSize(
      df(5.0, 5.0), df(5.0, 5.0), col("v")).collect().head
    assert(flat.isNullAt(5), "zero pooled spread ⇒ NULL, not ±Inf")
  }

  test("burstiness: one-bucket concentration vs uniform spread over " +
    "the observed grid; hand-computed Fano and Goh–Barabási B") {
    // grid H = 4 distinct buckets; A fires 4× in one, B 1× in each
    val df = (Seq.fill(4)(("A", 1)) ++ (1 to 4).map(("B", _)))
      .toDF("e", "b")
    val got = StatsTests.burstiness(df, col("e"), col("b"))
      .orderBy("entity").collect()
    val a = got(0)
    // A: μ=1, var=16/4−1=3 → fano 3, B=(√3−1)/(√3+1)
    assert(a.getLong(1) == 4L && a.getLong(2) == 1L)
    assert(a.getDouble(3) == 3.0)
    assert(a.getDouble(4) == 0.267949)
    val b = got(1)
    // B: perfectly even on the grid → var 0, fano 0, B = −1
    assert(b.getDouble(3) == 0.0 && b.getDouble(4) == -1.0)
  }

  test("tvDistance: 0 for identical samples, 1 for disjoint supports, " +
    "hand-computed half-overlap; union bins carry absent-side zeros") {
    def df(vs: Double*) = vs.toDF("v")
    val a = df(1.0, 6.0) // width-5 bins 0 and 1, share .5/.5
    assert(StatsTests.tvDistance(a, a, col("v"), 5.0)
      .collect().head.getDouble(3) == 0.0)
    val disjoint = StatsTests.tvDistance(a, df(11.0, 16.0), col("v"), 5.0)
      .collect().head
    assert(disjoint.getLong(0) == 4L && disjoint.getDouble(3) == 1.0)
    // b all in bin 0 → TV = ½(|.5−1| + |.5−0|) = 0.5
    val half = StatsTests.tvDistance(a, df(1.0, 2.0), col("v"), 5.0)
      .collect().head
    assert(half.getDouble(3) == 0.5)
  }

  test("groupWelchZ: hand-computed two-group case; sub-2-row sides and " +
    "zero spread yield NULL z") {
    val df = (Seq(0.0, 2.0).map(("a", _)) ++ Seq(1.0, 3.0).map(("b", _)))
      .toDF("g", "v")
    val got = StatsTests.groupWelchZ(df, col("g"), col("v"))
      .orderBy("g").collect()
    // a: mean 1, s2 2; rest: mean 2, s2 2; se = sqrt(2/2 + 2/2)
    assert(got(0).getDouble(2) == 1.0)
    assert(got(0).getDouble(3) == -0.707107, got(0).toString)
    assert(got(1).getDouble(3) == 0.707107)
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    assert(StatsTests.groupWelchZ(tiny, col("g"), col("v"))
      .filter(col("g") === "a").collect().head.isNullAt(3),
      "1-row group is untestable")
    val flat = (Seq.fill(4)(("a", 5.0)) ++ Seq.fill(4)(("b", 5.0)))
      .toDF("g", "v")
    assert(StatsTests.groupWelchZ(flat, col("g"), col("v"))
      .collect().forall(_.isNullAt(3)), "zero spread => NULL, not ±Inf")
  }

  test("welch merge law: partials of arbitrary slices fold to the " +
    "one-pass screen exactly (the q200 contract)") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      (i, s"g${i % 5}", rng.nextInt(1000) / 7.0)
    }
    val df = rows.toDF("id", "g", "v")
    val onePass = StatsTests.groupWelchZ(df, col("g"), col("v"))
      .orderBy("g").collect().toSeq.map(_.toSeq)
    // three uneven slices, including one that misses some groups
    val partials = Seq(
      df.filter(col("id") < 40), df.filter(col("id") >= 40 &&
        col("id") < 240), df.filter(col("id") >= 240))
      .map(StatsTests.welchPartials(_, col("g"), col("v")))
      .reduce(_ unionByName _)
    val merged = StatsTests.welchFromMoments(
        StatsTests.mergeWelchMoments(partials))
      .orderBy("g").collect().toSeq.map(_.toSeq)
    assert(merged == onePass, "lossless decimal merge")
  }

  test("bootstrapMeanCI: deterministic, CI straddles the point mean, " +
    "NULLs drop, salt moves the draws, bad args rejected") {
    val df = (0 until 300).map(i => (i.toLong, (i % 97).toDouble))
      .toDF("id", "v")
    def run(salt: String) = StatsTests
      .bootstrapMeanCI(df, col("v"), "id", b = 200, salt = salt)
      .collect().head
    val r1 = run("bs42"); val r2 = run("bs42")
    assert(r1.toSeq == r2.toSeq, "pure function of salt + ids")
    assert(r1.getLong(0) == 300L)
    val (mean, lo, hi) =
      (r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] vs mean $mean")
    assert(hi > lo, "nonzero-width interval on dispersed data")
    assert(run("other").toSeq != r1.toSeq, "salt changes the resamples")
    // NULL values are invisible
    val withNulls = df.unionByName(
      Seq((900L, Option.empty[Double]), (901L, Option.empty[Double]))
        .toDF("id", "v"))
    assert(StatsTests.bootstrapMeanCI(withNulls, col("v"), "id", b = 200)
      .collect().head.toSeq == r1.toSeq)
    intercept[IllegalArgumentException] {
      StatsTests.bootstrapMeanCI(df, col("v"), "id", b = 1)
    }
    intercept[IllegalArgumentException] {
      StatsTests.bootstrapMeanCI(df, col("v"), "id", alpha = 0.0)
    }
  }

  test("normalTwoSidedP: 1 at z=0, ~0.05 at 1.96, monotone decreasing") {
    val ps = Seq(0.0, 1.0, 1.96, 3.0).toDF("z")
      .select(StatsTests.normalTwoSidedP(col("z")).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(ps.head == 1.0)
    assert(math.abs(ps(2) - 0.05) < 1e-4, s"p(1.96) = ${ps(2)}")
    assert(ps == ps.sorted.reverse, "monotone in |z|")
  }

  test("bhSignificance: textbook step-up (the non-contiguous rejection " +
    "property), all-null drops, alpha validated") {
    // thresholds at alpha .05, m 4: .0125 .025 .0375 .05 — rank 3's
    // p=.04 fails ITS threshold but rank 2 passes, so cut = 2
    val tests = Seq(("s1", 0.01), ("s2", 0.02), ("s3", 0.04), ("s4", 0.2))
      .toDF("id", "p")
    val got = StatsTests.bhSignificance(tests, "p", "id")
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == Seq(("s1", 1L, true), ("s2", 2L, true),
      ("s3", 3L, false), ("s4", 4L, false)))
    // step-up can rescue an individually-failing rank below the cut:
    // p = .01 .04 .045, m 3: thresholds .0166 .0333 .05 — rank 3 passes
    // so ALL THREE reject even though rank 2 fails its own threshold
    val rescue = Seq(("a", 0.01), ("b", 0.04), ("c", 0.045)).toDF("id", "p")
    assert(StatsTests.bhSignificance(rescue, "p", "id")
      .collect().forall(_.getBoolean(3)))
    val none = Seq(("a", 0.9), ("b", Double.NaN)).toDF("id", "p")
      .select(col("id"), when(col("p") < 1.0, col("p")).as("p"))
    assert(StatsTests.bhSignificance(none, "p", "id")
      .collect().map(_.getBoolean(3)).toSeq == Seq(false))
    intercept[IllegalArgumentException] {
      StatsTests.bhSignificance(tests, "p", "id", alpha = 1.0)
    }
  }

  test("twoProportionZ: equal rates score 0; hand-computed textbook " +
    "case; degenerate pools yield NULL z") {
    def cohort(n: Int, s: Int) =
      (Seq.fill(s)(true) ++ Seq.fill(n - s)(false)).toDF("ok")
    val eq = StatsTests.twoProportionZ(cohort(40, 10), cohort(80, 20),
      col("ok")).collect().head
    assert(eq.getDouble(4) == 0.25 && eq.getDouble(5) == 0.25)
    assert(eq.getDouble(6) == 0.0)
    // 30/100 vs 20/100: pool .25, se = √(.25·.75·(1/50)) = .0612372
    val diff = StatsTests.twoProportionZ(cohort(100, 30), cohort(100, 20),
      col("ok")).collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(diff.getDouble(6) ==
      r6(0.1 / math.sqrt(0.25 * 0.75 * (1.0 / 100 + 1.0 / 100))))
    val degen = StatsTests.twoProportionZ(cohort(5, 0), cohort(5, 0),
      col("ok")).collect().head
    assert(degen.isNullAt(6), "zero pooled variance")
  }

  test("abPower: hand-computed MDE and required n; zero-conversion " +
    "baseline yields NULL n_per_arm") {
    def cohort(n: Int, s: Int) =
      (Seq.fill(s)(true) ++ Seq.fill(n - s)(false)).toDF("ok")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pool p̄ = 50/200 = .25
    val got = StatsTests.abPower(cohort(100, 30), cohort(100, 20),
      col("ok")).collect().head
    assert(got.getLong(0) == 100L && got.getLong(1) == 100L)
    assert(got.getDouble(2) == 0.25)
    val z = 2.801585
    assert(got.getDouble(3) ==
      r6(z * math.sqrt(0.25 * 0.75 * (1.0 / 100 + 1.0 / 100))))
    // n = ⌈z²·2·.25·.75/(.025)²⌉ = ⌈4708.3…⌉ = 4709
    assert(got.getLong(4) ==
      math.ceil(z * z * 2.0 * 0.25 * 0.75 / (0.025 * 0.025)).toLong)
    val dead = StatsTests.abPower(cohort(5, 0), cohort(5, 0),
      col("ok")).collect().head
    assert(dead.isNullAt(4), "no baseline conversions — nothing to lift")
    assert(dead.getDouble(3) == 0.0, "MDE collapses to 0 at p̄ = 0")
  }

  test("mcnemar: discordant cells only; hand chi2; full agreement is " +
    "NULL; NULL-screen items drop") {
    // 10 both-pass, 6 A-only, 2 B-only, 3 both-fail, 1 with NULL B
    val items =
      (Seq.fill(10)((Some(true), Some(true))) ++
        Seq.fill(6)((Some(true), Some(false))) ++
        Seq.fill(2)((Some(false), Some(true))) ++
        Seq.fill(3)((Some(false), Some(false))) ++
        Seq((Some(true), Option.empty[Boolean])))
        .toDF("a", "b")
    val got = StatsTests.mcnemar(items, col("a"), col("b")).head()
    assert(got.getLong(0) == 21L && got.getLong(1) == 6L &&
      got.getLong(2) == 2L, s"$got")
    assert(got.getDouble(3) == 2.0, s"chi2 $got") // (6-2)²/8
    // p replays the Abramowitz-Stegun chain at z = 4/√8
    val x = math.abs(4.0 / math.sqrt(8.0)) * 0.7071067811865476
    val tt = 1.0 / (1.0 + 0.3275911 * x)
    val want = BigDecimal(((((1.061405429 * tt - 1.453152027) * tt
      + 1.421413741) * tt - 0.284496736) * tt + 0.254829592) * tt *
      math.exp(-x * x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(got.getDouble(4) == want, s"p $got")

    val agree = StatsTests.mcnemar(
      Seq((true, true), (false, false)).toDF("a", "b"),
      col("a"), col("b")).head()
    assert(agree.isNullAt(3) && agree.isNullAt(4), "no disagreements")
  }

  test("anovaF: hand-computed sums of squares; one group and " +
    "zero-spread inputs yield NULL F") {
    // g1: 1,2,3 (Σ=6, Σ²=14); g2: 4,5,6 (Σ=15, Σ²=77)
    // N=6, S1=21, bsum = 36/3 + 225/3 = 87
    // SSB = 87 − 441/6 = 13.5 ; SSW = 91 − 87 = 4
    // F = (13.5/1)/(4/4) = 13.5
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val got = StatsTests.anovaF(rows, col("g"), col("v")).head()
    assert(got.getLong(0) == 2L && got.getLong(1) == 6L)
    assert(got.getDouble(2) == 13.5 && got.getDouble(3) == 4.0, s"$got")
    assert(got.getDouble(4) == 13.5, s"$got")

    val one = StatsTests.anovaF(rows.filter(col("g") === "a"),
      col("g"), col("v")).head()
    assert(one.isNullAt(4), "k < 2 must be NULL")
    val flat = StatsTests.anovaF(
      Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v"),
      col("g"), col("v")).head()
    assert(flat.isNullAt(4), "zero within-spread must be NULL")
  }

  test("kruskalWallis: textbook no-tie case matches the closed form; " +
    "all-tied values yield NULL corrected H") {
    // g1: 1,2; g2: 3,4; g3: 5,6 — no ties
    // ranks: g1 {1,2}→R=3, g2 {3,4}→R=7, g3 {5,6}→R=11
    // H = 12/(6·7)·(9/2+49/2+121/2) − 3·7 = 12/42·89.5 − 21
    val rows = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val got = StatsTests.kruskalWallis(rows, col("g"), col("v")).head()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 3L && got.getLong(1) == 6L)
    assert(got.getDouble(2) == r6(12.0 / 42.0 * 89.5 - 21.0), s"$got")
    assert(got.getDouble(3) == got.getDouble(2),
      "no ties → correction is identity")

    val tied = StatsTests.kruskalWallis(
      Seq(("a", 7.0), ("a", 7.0), ("b", 7.0)).toDF("g", "v"),
      col("g"), col("v")).head()
    assert(tied.isNullAt(3), "all-tied correction denominator is 0")
  }

  test("wilsonLowerBound: a tiny perfect slice ranks BELOW a large " +
    "near-perfect one; bound is below the rate and within [0,1]") {
    val rows = (Seq.fill(2)(("tiny", true)) ++
      Seq.fill(90)(("big", true)) ++ Seq.fill(10)(("big", false)))
      .toDF("g", "ok")
    val got = StatsTests.wilsonLowerBound(rows, col("g"), col("ok"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4))))
    assert(got.head._1 == "big",
      s"90/100 must outrank 2/2 on the bound: ${got.toSeq}")
    got.foreach { case (g, (rate, lb)) =>
      assert(lb <= rate && lb >= 0.0 && lb <= 1.0, s"$g: $rate, $lb")
    }
    // hand value: p=1, n=2 → lb = (1 + z²/4 − z·√(z²/16)) / (1 + z²/2)
    val z = 1.959964
    val lbTiny = (1.0 + z * z / 4.0 - z * math.sqrt(z * z / 16.0)) /
      (1.0 + z * z / 2.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toMap.apply("tiny")._2 == r6(lbTiny), s"${got.toSeq}")
  }

  test("ebShrunkRates: small groups shrink toward the prior mean more " +
    "than large ones; a flat rate profile declines to shrink") {
    // rates .9 (n=10), .1 (n=10), .5 (n=1000): m/v from the 3 rates
    val rows = (Seq.fill(9)(("a", true)) ++ Seq(("a", false)) ++
      Seq(("b", true)) ++ Seq.fill(9)(("b", false)) ++
      Seq.fill(500)(("c", true)) ++ Seq.fill(500)(("c", false)))
      .toDF("g", "ok")
    val got = StatsTests.ebShrunkRates(rows, col("g"), col("ok"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    val (mA, mC) = (got("a"), got("c"))
    assert(math.abs(mA._2 - mA._1) > math.abs(mC._2 - mC._1),
      s"the n=10 group must move more than the n=1000 one: $got")
    assert(mA._2 < mA._1 && got("b")._2 > got("b")._1,
      s"both extremes shrink toward the middle: $got")

    val flat = (Seq.fill(5)(("a", true)) ++ Seq.fill(5)(("a", false)) ++
      Seq.fill(50)(("b", true)) ++ Seq.fill(50)(("b", false)))
      .toDF("g", "ok")
    StatsTests.ebShrunkRates(flat, col("g"), col("ok")).collect()
      .foreach(r => assert(r.isNullAt(4), s"zero variance: $r"))
  }

  test("cochranQ: hand-computed panel; unanimous items only is NULL; " +
    "NULL-rated items drop; needs >= 2 raters") {
    // R = (3,1,2,0,2), C = (4,3,1): Q = 2(3·26 − 64)/(24 − 18) = 14/3
    val panel = Seq(
      (Some(true), Some(true), Some(true)),
      (Some(true), Some(false), Some(false)),
      (Some(true), Some(true), Some(false)),
      (Some(false), Some(false), Some(false)),
      (Some(true), Some(true), Some(false)),
      (Some(true), Option.empty[Boolean], Some(true)) // drops
    ).toDF("r0", "r1", "r2")
    val raters = Seq($"r0", $"r1", $"r2")
    val got = StatsTests.cochranQ(panel, raters).head()
    assert(got.getLong(0) == 5L && got.getInt(1) == 2, s"$got")
    assert(got.getDouble(2) == 4.666667, s"$got")

    val unanimous = Seq((true, true, true), (false, false, false))
      .toDF("r0", "r1", "r2")
    assert(StatsTests.cochranQ(unanimous, raters).head().isNullAt(2),
      "no within-item variation")
    intercept[IllegalArgumentException] {
      StatsTests.cochranQ(panel, Seq($"r0"))
    }
  }

  test("cramersV: perfect association is 1, independence is 0, " +
    "single-category axis is NULL") {
    val perfect = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("p", "q")
    val gotP = StatsTests.cramersV(perfect, col("p"), col("q")).head()
    assert(gotP.getDouble(2) == 20.0 && gotP.getDouble(3) == 1.0, s"$gotP")

    val indep = (for { a <- Seq("a", "b"); b <- Seq("x", "y") }
      yield Seq.fill(5)((a, b))).flatten.toDF("p", "q")
    val gotI = StatsTests.cramersV(indep, col("p"), col("q")).head()
    assert(gotI.getDouble(3) == 0.0, s"$gotI")

    val single = Seq(("a", "x"), ("a", "y")).toDF("p", "q")
    assert(StatsTests.cramersV(single, col("p"), col("q")).head()
      .isNullAt(3), "min(r-1, c-1) = 0 is undefined")
  }

  test("kendallW: identical rankings score 1, two opposed judges " +
    "score 0; needs >= 2 judges") {
    // metrics all increasing with id → perfect concordance
    val agree = (1 to 6).map(i => (i.toLong, i.toDouble, i * 10L))
      .toDF("id", "a", "b")
    val w1 = StatsTests.kendallW(agree, "id", Seq(col("a"), col("b")))
      .head()
    assert(w1.getLong(0) == 6L && w1.getLong(1) == 2L)
    assert(w1.getDouble(2) == 1.0, s"$w1")
    // b reversed → every rank sum is n+1 → S = 0 → W = 0
    val oppose = (1 to 6).map(i => (i.toLong, i.toDouble, -i * 10L))
      .toDF("id", "a", "b")
    assert(StatsTests.kendallW(oppose, "id", Seq(col("a"), col("b")))
      .head().getDouble(2) == 0.0)
    intercept[IllegalArgumentException] {
      StatsTests.kendallW(agree, "id", Seq(col("a")))
    }
  }

  test("friedman: perfect concordance gives chi2 = k(n-1); opposed " +
    "judges give 0; dof = n-1") {
    val agree = (1 to 6).map(i => (i.toLong, i.toDouble, i * 10L))
      .toDF("id", "a", "b")
    val got = StatsTests.friedman(agree, "id", Seq(col("a"), col("b")))
      .head()
    // W = 1 → chi2_F = k(n−1) = 2·5 = 10
    assert(got.getLong(0) == 6L && got.getLong(1) == 2L)
    assert(got.getLong(2) == 5L && got.getDouble(3) == 10.0, s"$got")
    val oppose = (1 to 6).map(i => (i.toLong, i.toDouble, -i * 10L))
      .toDF("id", "a", "b")
    assert(StatsTests.friedman(oppose, "id", Seq(col("a"), col("b")))
      .head().getDouble(3) == 0.0)
  }

  test("jarqueBera: hand-computed moments on 1..5 (symmetric, " +
    "platykurtic); constant and tiny series are NULL") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = StatsTests.jarqueBera(
      (1 to 5).map(_.toDouble).toDF("v"), col("v")).head()
    // replicate the double chain: µ=3, m2=2, m3=0, m4=6.8
    val (mu, p2, p3, p4) = (15.0 / 5.0, 55.0 / 5.0, 225.0 / 5.0,
      979.0 / 5.0)
    val m2 = p2 - mu * mu
    val m4 = p4 - 4.0 * mu * p3 + 6.0 * mu * mu * p2 -
      3.0 * mu * mu * mu * mu
    val g2 = m4 / (m2 * m2) - 3.0
    val jb = 5.0 / 6.0 * (0.0 + g2 * g2 / 4.0)
    assert(got.getLong(0) == 5L)
    assert(got.getDouble(1) == 0.0, "symmetric → zero skew")
    assert(got.getDouble(2) == r6(g2), s"$got")
    assert(got.getDouble(3) == r6(jb), s"$got")
    assert(got.getDouble(4) == r6(math.exp(-jb / 2.0)), s"$got")
    assert(StatsTests.jarqueBera(Seq(4.0, 4.0, 4.0).toDF("v"), col("v"))
      .head().isNullAt(3), "zero variance")
    assert(StatsTests.jarqueBera(Seq(1.0, 2.0).toDF("v"), col("v"))
      .head().isNullAt(3), "n < 3")
  }

  test("brownForsythe: hand-computed F on two groups — medians 2 and " +
    "5, z-frames {1,0,1,8} and {0,0,0,0}") {
    val df = (Seq((1.0, 1L), (2.0, 2L), (3.0, 3L), (10.0, 4L))
      .map { case (v, i) => ("g1", v, i) } ++
      Seq(5.0, 5.0, 5.0, 5.0).zipWithIndex
        .map { case (v, i) => ("g2", v, i + 10L) })
      .toDF("g", "v", "id")
    val got = StatsTests.brownForsythe(df, col("g"), col("v"), col("id"))
      .head()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // SSB = 25 − 100/8 = 12.5 ; SSW = 66 − 25 = 41 ; F = 12.5/(41/6)
    assert(got.getLong(0) == 2L && got.getLong(1) == 8L)
    assert(got.getDouble(2) == 12.5 && got.getDouble(3) == 41.0, s"$got")
    assert(got.getDouble(4) == r6((12.5 / 1.0) / (41.0 / 6.0)), s"$got")
    // equal spreads → z-frames identical → SSB = 0 → F = 0
    val same = (Seq(1.0, 2.0, 3.0).zipWithIndex.map {
      case (v, i) => ("a", v, i.toLong) } ++
      Seq(11.0, 12.0, 13.0).zipWithIndex.map {
        case (v, i) => ("b", v, i + 10L) }).toDF("g", "v", "id")
    assert(StatsTests.brownForsythe(same, col("g"), col("v"), col("id"))
      .head().getDouble(4) == 0.0)
  }

  test("bimodality: a two-point mass scores b = 1; hand-computed " +
    "coefficient on 1..5; degenerate inputs NULL") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bi = StatsTests.bimodality(
      Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0).toDF("v"), col("v")).head()
    // g1 = 0, kurtosis 1 → g2 = -2 → b = 1/(−2+3) = 1
    assert(bi.getDouble(1) == 0.0 && bi.getDouble(2) == -2.0)
    assert(bi.getDouble(3) == 1.0, s"$bi")
    val uni = StatsTests.bimodality(
      (1 to 5).map(_.toDouble).toDF("v"), col("v")).head()
    assert(uni.getDouble(3) == r6(1.0 / (-1.3 + 3.0)), s"$uni")
    assert(StatsTests.bimodality(Seq(7.0, 7.0, 7.0).toDF("v"), col("v"))
      .head().isNullAt(3), "zero variance")
  }

  test("cmhTest: balanced strata score 0; a consistent within-stratum " +
    "effect pools to the hand-computed chi2") {
    import org.apache.spark.sql.functions.col
    // (stratum, arm, conv): two balanced strata → gap 0
    def stratum(s: String, convByArm: Boolean) =
      if (convByArm)
        Seq((s, true, true), (s, true, true), (s, false, false),
          (s, false, false))
      else
        Seq((s, true, true), (s, true, false), (s, false, true),
          (s, false, false))
    val balanced = (stratum("a", false) ++ stratum("b", false))
      .toDF("s", "arm", "y")
    val b = StatsTests.cmhTest(balanced, col("s"), col("arm"), col("y"))
      .head()
    assert(b.getLong(0) == 2L && b.getDouble(1) == 0.0 &&
      b.getDouble(3) == 0.0, s"$b")
    // both strata: a=2, e=1, var=1/3 → chi2 = (2)²/(2/3) = 6
    val effect = (stratum("a", true) ++ stratum("b", true))
      .toDF("s", "arm", "y")
    val e = StatsTests.cmhTest(effect, col("s"), col("arm"), col("y"))
      .head()
    assert(e.getDouble(1) == 2.0, s"$e")
    assert(e.getDouble(3) == 6.0 && e.getDouble(4) < 0.05, s"$e")
    // a single-row stratum carries no variance and drops
    val tiny = (stratum("a", true) ++ Seq(("z", true, true)))
      .toDF("s", "arm", "y")
    assert(StatsTests.cmhTest(tiny, col("s"), col("arm"), col("y"))
      .head().getLong(0) == 1L)
  }

  test("ratioMetricDelta: y strictly proportional to n has zero " +
    "ratio variance — the CI collapses onto the exact diff") {
    import org.apache.spark.sql.functions.col
    val users = Seq((true, 10.0, 2.0), (true, 20.0, 4.0),
      (false, 9.0, 3.0), (false, 9.0, 3.0)).toDF("arm", "y", "n")
    val got = StatsTests.ratioMetricDelta(users, col("arm"),
      col("y"), col("n")).head()
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L)
    assert(got.getDouble(2) == 5.0 && got.getDouble(3) == 3.0)
    assert(got.getDouble(4) == 2.0 && got.getDouble(5) == 0.0, s"$got")
    assert(got.getDouble(6) == 2.0 && got.getDouble(7) == 2.0)
    // real spread widens the interval around the diff
    val noisy = Seq((true, 10.0, 2.0), (true, 30.0, 4.0),
      (false, 6.0, 3.0), (false, 15.0, 3.0)).toDF("arm", "y", "n")
    val n2 = StatsTests.ratioMetricDelta(noisy, col("arm"),
      col("y"), col("n")).head()
    assert(n2.getDouble(5) > 0.0)
    assert(n2.getDouble(6) < n2.getDouble(4) &&
      n2.getDouble(4) < n2.getDouble(7))
  }

  test("holmSignificance: the step-down STOPS at the first failure " +
    "even when a later p would pass its own bar") {
    import org.apache.spark.sql.functions.col
    // m=4, bars: .0125, .0167, .025, .05
    // p = .01 (pass), .02 (fail) → stop; .024 passes ITS bar but stays
    // unrejected (the step-down), .9 unrejected
    val tests = Seq(("a", 0.01), ("b", 0.02), ("c", 0.024), ("d", 0.9))
      .toDF("id", "p")
    val got = StatsTests.holmSignificance(tests, "p", "id")
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(got == Map("a" -> true, "b" -> false, "c" -> false,
      "d" -> false), s"$got")
    // every bar passed → everything rejected (coalesce-TRUE branch)
    val all = Seq(("a", 0.001), ("b", 0.002)).toDF("id", "p")
    assert(StatsTests.holmSignificance(all, "p", "id")
      .collect().forall(_.getBoolean(3)))
  }

  test("tostEquivalence: identical large arms prove equivalence; the " +
    "same rates underpowered do NOT; a real gap never does") {
    import org.apache.spark.sql.functions.col
    def arm(n: Int, conv: Int) =
      ((1 to conv).map(_ => 1) ++ (1 to (n - conv)).map(_ => 0))
        .toDF("conv")
    val big = StatsTests.tostEquivalence(arm(10000, 5000),
      arm(10000, 5000), col("conv") === 1, margin = 0.02).head()
    assert(big.getBoolean(8), s"$big")
    assert(big.getDouble(4) == 0.0)
    val small = StatsTests.tostEquivalence(arm(100, 50), arm(100, 50),
      col("conv") === 1, margin = 0.02).head()
    assert(!small.getBoolean(8),
      "underpowered data cannot prove equivalence")
    val gap = StatsTests.tostEquivalence(arm(10000, 6000),
      arm(10000, 5000), col("conv") === 1, margin = 0.02).head()
    assert(!gap.getBoolean(8), "a 10-point gap is not equivalent")
    intercept[IllegalArgumentException] {
      StatsTests.tostEquivalence(arm(10, 5), arm(10, 5),
        col("conv") === 1, margin = 0.0)
    }
  }

  test("cohensH: hand-computed arcsine effect size; equal rates " +
    "score 0") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = ((1 to 5).map(_ => 1) ++ (1 to 5).map(_ => 0)).toDF("conv")
    val b = ((1 to 1).map(_ => 1) ++ (1 to 9).map(_ => 0)).toDF("conv")
    val got = StatsTests.cohensH(a, b, col("conv") === 1).head()
    val h = 2.0 * math.asin(math.sqrt(0.5)) -
      2.0 * math.asin(math.sqrt(0.1))
    assert(got.getDouble(4) == 0.5 && got.getDouble(5) == 0.1)
    assert(got.getDouble(6) == r6(h), s"$got")
    assert(StatsTests.cohensH(a, a, col("conv") === 1).head()
      .getDouble(6) == 0.0)
  }

  test("cuped: a perfectly predictive covariate (y = x + 1) gives " +
    "theta = 1, rho2 = 1, and fully absorbs the raw arm gap") {
    import org.apache.spark.sql.functions.col
    val users = Seq((true, 1.0, 2.0), (true, 3.0, 4.0),
      (false, 2.0, 3.0), (false, 4.0, 5.0)).toDF("arm", "x", "y")
    val got = StatsTests.cuped(users, col("arm"), col("x"), col("y"))
      .head()
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L)
    assert(got.getDouble(2) == 1.0 && got.getDouble(3) == 1.0)
    assert(got.getDouble(4) == -1.0, "raw gap is the covariate gap")
    assert(got.getDouble(5) == 0.0, "CUPED removes it entirely")
    // constant covariate: no signal, adjusted outputs NULL
    val flat = Seq((true, 5.0, 1.0), (false, 5.0, 2.0))
      .toDF("arm", "x", "y")
    val f = StatsTests.cuped(flat, col("arm"), col("x"), col("y"))
      .head()
    assert(f.isNullAt(2) && f.isNullAt(5))
  }

  test("srmCheck: a balanced split scores chi2 = 0; a skewed split " +
    "matches the hand chi2 and alarms") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = (1 to 50).toDF("id"); val b = (1 to 50).toDF("id")
    val bal = StatsTests.srmCheck(a, b).head()
    assert(bal.getLong(0) == 50L && bal.getDouble(3) == 0.0)
    // 70/30 on an intended 50/50: chi2 = 2·20²/50 = 16
    val skew = StatsTests.srmCheck((1 to 70).toDF("id"),
      (1 to 30).toDF("id")).head()
    assert(skew.getDouble(2) == 50.0)
    assert(skew.getDouble(3) ==
      r6(20.0 * 20.0 / 50.0 + 20.0 * 20.0 / 50.0), s"$skew")
    assert(skew.getDouble(4) < 0.001, "a 70/30 split must alarm")
    intercept[IllegalArgumentException] {
      StatsTests.srmCheck(a, b, ratioA = 1.0)
    }
  }

  test("simpsonCheck: a constructed paradox flags the sign reversal " +
    "between pooled and stratified reads") {
    import org.apache.spark.sql.functions.col
    // within each stratum the arm over-converts; pooled it appears
    // WORSE because the arm skews into the low-converting stratum
    val rows =
      Seq.fill(2)(("A", true, true)) ++ Seq.fill(5)(("A", false, true)) ++
      Seq.fill(1)(("A", false, false)) ++
      Seq.fill(1)(("B", true, true)) ++ Seq.fill(5)(("B", true, false)) ++
      Seq.fill(2)(("B", false, false))
    val got = StatsTests.simpsonCheck(rows.toDF("s", "arm", "y"),
      col("s"), col("arm"), col("y")).head()
    assert(got.getDouble(0) == 0.375 && got.getDouble(1) == 0.625)
    assert(got.getDouble(2) == -0.25, "pooled reads arm-worse")
    assert(got.getDouble(3) == 0.5, "strata read arm-better")
    assert(got.getBoolean(4), "the paradox flags")
    // aligned signs do not flag
    val aligned = (Seq.fill(3)(("A", true, true)) ++
      Seq.fill(3)(("A", false, false))).toDF("s", "arm", "y")
    assert(!StatsTests.simpsonCheck(aligned, col("s"), col("arm"),
      col("y")).head().getBoolean(4))
  }

  test("mhOddsRatio: balanced strata pool to OR 1; adding a pure " +
    "within-stratum effect lifts it; no discordance leaves it NULL") {
    import org.apache.spark.sql.functions.col
    def stratum(s: String, convByArm: Boolean) =
      if (convByArm)
        Seq((s, true, true), (s, true, true), (s, false, false),
          (s, false, false))
      else
        Seq((s, true, true), (s, true, false), (s, false, true),
          (s, false, false))
    val balanced = (stratum("a", false) ++ stratum("b", false))
      .toDF("s", "arm", "y")
    assert(StatsTests.mhOddsRatio(balanced, col("s"), col("arm"),
      col("y")).head().getDouble(3) == 1.0)
    // balanced (r=s=0.25) + pure effect (r=1, s=0) → OR = 1.25/0.25
    val mixed = (stratum("a", false) ++ stratum("b", true))
      .toDF("s", "arm", "y")
    assert(StatsTests.mhOddsRatio(mixed, col("s"), col("arm"),
      col("y")).head().getDouble(3) == 5.0)
    val pure = stratum("a", true).toDF("s", "arm", "y")
    assert(StatsTests.mhOddsRatio(pure, col("s"), col("arm"), col("y"))
      .head().isNullAt(3), "zero discordant mass is undefined")
  }

  test("wilcoxonSignedRank: hand-computed doubled ranks — balanced " +
    "signs give z = 0; ties tie-average; zero diffs drop") {
    import org.apache.spark.sql.functions.col
    val d1 = Seq(1.0, 2.0, -3.0, 0.0).toDF("d")
    val got = StatsTests.wilcoxonSignedRank(d1, col("d")).head()
    // |d| ranks 1,2,3 → W+ = 1+2 = 3; E(W+) = 3 → z = 0
    assert(got.getLong(0) == 3L, "the zero diff dropped")
    assert(got.getDouble(1) == 3.0 && got.getDouble(2) == 0.0, s"$got")
    val tied = Seq(1.0, -1.0).toDF("d")
    val t = StatsTests.wilcoxonSignedRank(tied, col("d")).head()
    // one tie group t=2 → r2 = 3 → W+ = 1.5 (tie-averaged), z = 0
    assert(t.getDouble(1) == 1.5 && t.getDouble(2) == 0.0, s"$t")
    val onesided = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).toDF("d")
    val o = StatsTests.wilcoxonSignedRank(onesided, col("d")).head()
    assert(o.getDouble(2) > 2.0, "all-positive diffs push z far up")
  }

  test("oddsRatio: hand-computed OR and Wald interval; a zero cell " +
    "triggers the Haldane correction on every cell") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = ((1 to 4).map(_ => 1) ++ (1 to 6).map(_ => 0)).toDF("conv")
    val b = ((1 to 2).map(_ => 1) ++ (1 to 8).map(_ => 0)).toDF("conv")
    val got = StatsTests.oddsRatio(a, b, col("conv") === 1).head()
    val lor = math.log(4.0 * 8.0 / (6.0 * 2.0))
    val se = math.sqrt(1.0 / 4.0 + 1.0 / 6.0 + 1.0 / 2.0 + 1.0 / 8.0)
    assert(got.getLong(0) == 10L && got.getLong(1) == 4L &&
      got.getLong(3) == 2L)
    assert(got.getDouble(4) == r6(math.exp(lor)), s"$got")
    assert(got.getDouble(5) ==
      r6(math.exp(lor - 1.959963984540054 * se)))
    assert(got.getDouble(6) ==
      r6(math.exp(lor + 1.959963984540054 * se)))
    // zero conversions in b → +0.5 everywhere, still finite
    val none = (1 to 10).map(_ => 0).toDF("conv")
    val h = StatsTests.oddsRatio(a, none, col("conv") === 1).head()
    val lorH = math.log(4.5 * 10.5 / (6.5 * 0.5))
    assert(h.getDouble(4) == r6(math.exp(lorH)), s"$h")
  }

  test("negBinomialFit: hand-computed moment fit on an overdispersed " +
    "sample; Poisson-or-under leaves r/p NULL") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // {1,2,9}: m=4, v=((1-4)²+(2-4)²+(9-4)²)/2 = 19 → r=16/15, p=4/19
    val got = StatsTests.negBinomialFit(
      Seq(1.0, 2.0, 9.0).toDF("v"), col("v")).head()
    assert(got.getLong(0) == 3L && got.getDouble(1) == 4.0)
    assert(got.getDouble(2) == 19.0)
    assert(got.getDouble(3) == r6(16.0 / 15.0), s"$got")
    assert(got.getDouble(4) == r6(4.0 / 19.0), s"$got")
    // equidispersed {3,3,3}: v = 0 <= m → no NB
    assert(StatsTests.negBinomialFit(Seq(3.0, 3.0, 3.0).toDF("v"),
      col("v")).head().isNullAt(3))
  }

  test("captureRecapture: hand-computed Chapman estimate and SE on " +
    "overlapping samples") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = Seq(1L, 2L, 3L, 2L).toDF("k") // distinct {1,2,3}
    val b = Seq(2L, 3L, 4L, 5L).toDF("k")
    val got = StatsTests.captureRecapture(a, b, col("k")).head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 4L &&
      got.getLong(2) == 2L)
    assert(got.getDouble(3) == r6(4.0 * 5.0 / 3.0 - 1.0), s"$got")
    assert(got.getDouble(4) ==
      r6(math.sqrt(4.0 * 5.0 * 1.0 * 2.0 / (3.0 * 3.0 * 4.0))), s"$got")
    // identical samples estimate exactly the observed population
    val same = StatsTests.captureRecapture(a, a, col("k")).head()
    assert(same.getDouble(3) == 3.0 && same.getDouble(4) == 0.0)
  }

  test("jackknifeMeanSE: constant values give zero SE; sparse data " +
    "that cannot fill k folds leaves SE NULL; mean is exact") {
    import org.apache.spark.sql.functions.col
    val const = (1L to 200L).map(i => (i, 5.0)).toDF("id", "v")
    val got = StatsTests.jackknifeMeanSE(const, col("v"), "id", k = 10)
      .head()
    assert(got.getLong(0) == 200L && got.getDouble(2) == 5.0)
    assert(got.getLong(1) == 10L, "200 hashed rows fill all 10 folds")
    assert(got.getDouble(3) == 0.0, "no spread, no variance")
    val tiny = Seq((1L, 1.0), (2L, 9.0)).toDF("id", "v")
    assert(StatsTests.jackknifeMeanSE(tiny, col("v"), "id", k = 10)
      .head().isNullAt(3), "2 rows cannot occupy 10 folds")
    val varied = (1L to 200L).map(i => (i, i.toDouble)).toDF("id", "v")
    val v = StatsTests.jackknifeMeanSE(varied, col("v"), "id", k = 10)
      .head()
    assert(v.getDouble(3) > 0.0, "real spread yields a positive SE")
    intercept[IllegalArgumentException] {
      StatsTests.jackknifeMeanSE(const, col("v"), "id", k = 1)
    }
  }

  test("gumbelFit: hand-computed moment fit on two block maxima; " +
    "degenerate inputs are NULL") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = StatsTests.gumbelFit(
      Seq(10.0, 14.0).toDF("v"), col("v"), returnPeriod = 12).head()
    val sd = math.sqrt((296.0 - 24.0 * 24.0 / 2.0) / 1.0)
    val beta = sd * 0.7796968012336761
    val mu = 12.0 - 0.5772156649015329 * beta
    val level = mu - beta * math.log(-math.log(1.0 - 1.0 / 12.0))
    assert(got.getLong(0) == 2L && got.getDouble(1) == 12.0)
    assert(got.getDouble(2) == r6(sd) && got.getDouble(3) == r6(beta))
    assert(got.getDouble(4) == r6(mu) && got.getDouble(5) == r6(level),
      s"$got")
    assert(level > 14.0, "the 12-block return level sits above both maxima")
    assert(StatsTests.gumbelFit(Seq(9.0, 9.0).toDF("v"), col("v"))
      .head().isNullAt(3), "zero spread fits nothing")
    intercept[IllegalArgumentException] {
      StatsTests.gumbelFit(Seq(1.0).toDF("v"), col("v"), returnPeriod = 1)
    }
  }

  test("dispersionTest: hand-computed index of dispersion on {2,4,6}; " +
    "constant series scores 0; n=1 is NULL") {
    import org.apache.spark.sql.functions.col
    val got = StatsTests.dispersionTest(
      Seq(2.0, 4.0, 6.0).toDF("v"), col("v")).head()
    // mean 4, sample var 4 → dispersion 1, chi2 = 2
    assert(got.getLong(0) == 3L && got.getDouble(1) == 4.0)
    assert(got.getDouble(2) == 4.0 && got.getDouble(3) == 1.0)
    assert(got.getDouble(4) == 2.0, s"$got")
    val const = StatsTests.dispersionTest(
      Seq(5.0, 5.0).toDF("v"), col("v")).head()
    assert(const.getDouble(3) == 0.0, "no spread, no dispersion")
    assert(StatsTests.dispersionTest(Seq(3.0).toDF("v"), col("v"))
      .head().isNullAt(2), "variance undefined at n=1")
  }

  test("mannKendall: a strictly monotone series scores S = ±C(n,2) " +
    "with the continuity-corrected z; all-tied is NULL") {
    import org.apache.spark.sql.functions.col
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def series(vals: Double*) = vals.zipWithIndex
      .map { case (v, i) => (f"k$i%02d", v) }.toDF("o", "v")
    val up = StatsTests.mannKendall(series(1, 2, 3, 4), "o", "v").head()
    val vv = (4.0 * 3.0 * 13.0 - 0.0) / 18.0
    assert(up.getLong(0) == 4L && up.getLong(1) == 6L)
    assert(up.getDouble(2) == r6(vv))
    assert(up.getDouble(3) == r6((6.0 - 1.0) / math.sqrt(vv)), s"$up")
    val down = StatsTests.mannKendall(series(4, 3, 2, 1), "o", "v")
      .head()
    assert(down.getLong(1) == -6L)
    assert(down.getDouble(3) == r6((-6.0 + 1.0) / math.sqrt(vv)))
    val tied = StatsTests.mannKendall(series(7, 7, 7), "o", "v").head()
    assert(tied.getLong(1) == 0L && tied.getDouble(2) == 0.0)
    assert(tied.isNullAt(3) && tied.isNullAt(4), "no variance, no test")
  }

  test("expGapFit: hand-computed MLE lambda and two-sided KS D over " +
    "gaps {1,2,2}; single-event users contribute nothing") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = Seq((1L, 0L, 10L), (1L, 1L, 11L), (1L, 3L, 12L),
      (2L, 0L, 20L), (2L, 2L, 21L), (3L, 50L, 30L))
      .toDF("user_id", "ep", "event_id")
      .withColumn("ts", timestamp_seconds(col("ep"))).drop("ep")
    val got = StatsTests.expGapFit(ev, "user_id", "ts", "event_id")
      .head()
    val l = 3.0 / 5.0
    val f1 = 1.0 - math.exp(-(l * 1.0))
    val f2 = 1.0 - math.exp(-(l * 2.0))
    val d = Seq(
      math.max(math.abs(1.0 / 3.0 - f1), math.abs(0.0 / 3.0 - f1)),
      math.max(math.abs(3.0 / 3.0 - f2), math.abs(1.0 / 3.0 - f2))).max
    assert(got.getLong(0) == 3L, "three gaps pooled across users")
    assert(got.getDouble(1) == r6(l) && got.getDouble(2) == r6(d),
      s"$got")
    val singles = Seq((1L, 0L, 1L), (2L, 5L, 2L))
      .toDF("user_id", "ep", "event_id")
      .withColumn("ts", timestamp_seconds(col("ep"))).drop("ep")
    assert(StatsTests.expGapFit(singles, "user_id", "ts", "event_id")
      .count() == 0L, "no second event, no gap, no fit")
  }

  test("grubbs: the planted spike is flagged with the hand-computed " +
    "G; constant series and tiny n are NULL") {
    def series(vals: Double*) = vals.zipWithIndex
      .map { case (v, i) => (f"k$i%02d", v) }.toDF("o", "v")
    // 5,5,5,5,25: m=9, sample var = (4·16+256)/4 = 80, s=√80
    val got = StatsTests.grubbs(series(5, 5, 5, 5, 25), "o", "v").head()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 5L && got.getString(1) == "k04", s"$got")
    assert(got.getDouble(2) == 25.0, s"$got")
    assert(got.getDouble(3) == r6(16.0 / math.sqrt(80.0)), s"$got")

    assert(StatsTests.grubbs(series(7, 7, 7), "o", "v").head()
      .isNullAt(3), "zero spread")
    assert(StatsTests.grubbs(series(1, 2), "o", "v").head()
      .isNullAt(3), "n < 3")
  }

  test("bySignificance: strictly more conservative than BH — the " +
    "harmonic factor shrinks the cut; hand case flips a borderline " +
    "rejection") {
    // m=4, c(4) = 1+1/2+1/3+1/4 = 25/12: BH cut at rank 2 needs
    // p <= .025; BY needs p <= .025·12/25 = .012
    val tests = Seq(("a", 0.001), ("b", 0.02), ("c", 0.2), ("d", 0.9))
      .toDF("id", "p")
    val bh = StatsTests.bhSignificance(tests, "p", "id")
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    val by = StatsTests.bySignificance(tests, "p", "id")
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(bh("a") && bh("b"), s"BH keeps both small p: $bh")
    assert(by("a") && !by("b"),
      s"BY's harmonic factor must drop the borderline b: $by")
    assert(by.forall { case (k, s) => !s || bh(k) },
      "every BY rejection is a BH rejection")
    intercept[IllegalArgumentException] {
      StatsTests.bySignificance(tests, "p", "id", alpha = 0.0)
    }
  }

  test("ljungBox: hand-computed r and cumulative Q on an alternating " +
    "series; a constant series yields NULLs; maxLag validated") {
    def series(vals: Double*) = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("o", "v")
    // (1,2)×4: m=1.5, den=2; r1 = −1.75/2, r2 = 1.5/2
    val got = StatsTests.ljungBox(
        series(1, 2, 1, 2, 1, 2, 1, 2), "o", "v", maxLag = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == -0.875 && got(2L)._1 == 0.75, s"$got")
    // q1 = 8·10·(0.875²/7) = 8.75; q2 = 80·(0.109375 + 0.75²/6)
    assert(got(1L)._2 == 8.75, s"$got")
    assert(got(2L)._2 == 16.25, s"$got")

    val flat = StatsTests.ljungBox(series(5, 5, 5, 5, 5), "o", "v",
      maxLag = 2).collect()
    flat.foreach(r => assert(r.isNullAt(1) && r.isNullAt(2),
      s"zero variance: $r"))
    intercept[IllegalArgumentException] {
      StatsTests.ljungBox(series(1, 2), "o", "v", maxLag = 0)
    }
  }

  test("turningPoints: strict extrema counted, ties are not turns, " +
    "closed-form z replays") {
    def series(vals: Double*) = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("o", "v")
    val got = StatsTests.turningPoints(series(1, 3, 2, 4, 3), "o", "v")
      .head()
    assert(got.getLong(0) == 5L && got.getLong(1) == 3L, s"$got")
    val e = 2.0 * 3.0 / 3.0
    val v = (16.0 * 5.0 - 29.0) / 90.0
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(2) == r6((3.0 - e) / math.sqrt(v)), s"$got")

    val tied = StatsTests.turningPoints(series(1, 2, 2, 1), "o", "v")
      .head()
    assert(tied.getLong(1) == 0L, s"a plateau is not a turn: $tied")
  }

  test("runsTest: hand-counted runs on an alternating and a blocked " +
    "series; median-equal values drop; one-sided input is NULL") {
    def series(vals: Double*) = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("o", "v")
    // 1,9,1,9,1,9 — lower median 1 drops the three 1s... pick: n=6,
    // rank ceil(3)=3 over (v,o): values sorted 1,1,1,9,9,9 → med=1;
    // equal-to-median drops the 1s → one side only → NULL z
    val alt = StatsTests.runsTest(series(1, 9, 1, 9, 1, 9), "o", "v")
      .head()
    assert(alt.getLong(0) == 3L && alt.getLong(1) == 0L, s"$alt")
    assert(alt.isNullAt(3) && alt.isNullAt(4), "one-sided → NULL")
    // 1,2,9,8,1,3,9,7: med = lower median of sorted(1,1,2,3,7,8,9,9)
    // at rank 4 = 3; drops the 3 → signs 0,0,1,1,0,1,1 → runs 4,
    // n1=4, n2=3
    val mix = StatsTests.runsTest(series(1, 2, 9, 8, 1, 3, 9, 7),
      "o", "v").head()
    assert(mix.getLong(0) == 4L && mix.getLong(1) == 3L &&
      mix.getLong(2) == 4L, s"$mix")
    // z replays the closed form: mu = 2·4·3/7+1, v per formula
    val (d1, d2) = (4.0, 3.0)
    val mu = 2 * d1 * d2 / (d1 + d2) + 1
    val vv = 2 * d1 * d2 * (2 * d1 * d2 - (d1 + d2)) /
      ((d1 + d2) * (d1 + d2) * (d1 + d2 - 1))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(mix.getDouble(3) == r6((4.0 - mu) / math.sqrt(vv)), s"$mix")
  }

  test("lorenzCurve: ascending-rank cumulative shares on a hand case") {
    val rows = (Seq.fill(1)("a") ++ Seq.fill(3)("b") ++ Seq.fill(6)("c"))
      .toDF("g")
    val got = StatsTests.lorenzCurve(rows, col("g")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "a", 1L, 0.333333, 0.1),
      (2L, "b", 3L, 0.666667, 0.4),
      (3L, "c", 6L, 1.0, 1.0)), s"${got.toSeq}")
  }

  test("mannWhitneyU: clean separation hits the U extremes; ties get " +
    "average ranks and the corrected variance; all-tied → NULL z") {
    def df(vs: Double*) = vs.toDF("v")
    // A = {1,2,3} all below B = {4,5,6}: R1 = 6, U1 = 0, z < 0
    val sep = StatsTests.mannWhitneyU(df(1, 2, 3), df(4, 5, 6),
      col("v")).collect().head
    assert(sep.getLong(0) == 3L && sep.getLong(1) == 3L)
    assert(sep.getDouble(2) == 0.0)
    // no ties: z = (0 − 4.5)/√(9/12·7) = −1.9640
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sep.getDouble(3) == r6(-4.5 / math.sqrt(9.0 / 12 * 7)))
    // interleaved with a cross-sample tie at 2: A={1,2}, B={2,3}
    // ranks: 1→1, the two 2s → 2.5 each, 3→4; R1 = 3.5, U1 = 0.5
    val tie = StatsTests.mannWhitneyU(df(1, 2), df(2, 3),
      col("v")).collect().head
    assert(tie.getDouble(2) == 0.5)
    // tie term: one pair → Σ(t³−t) = 6; var = 4/12·((5) − 6/12) = 1.5
    assert(tie.getDouble(3) == r6((0.5 - 2.0) / math.sqrt(1.5)))
    val allTied = StatsTests.mannWhitneyU(df(7, 7), df(7, 7),
      col("v")).collect().head
    assert(allTied.isNullAt(3), "zero variance under total ties")
  }

  test("golden vectors from tools/golden_stats.py — an INDEPENDENT " +
    "sort-based textbook implementation (catches a formula error " +
    "mirrored into both the Spark algebra and the oracle SQL)") {
    def df(vs: Double*) = vs.toDF("v")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mannWhitneyU(A=[1,2,2,3,5], B=[2,3,3,4]) → U1 = 7.0, z = -0.760639
    val mw = StatsTests.mannWhitneyU(
      df(1, 2, 2, 3, 5), df(2, 3, 3, 4), col("v")).head()
    assert(mw.getDouble(2) == 7.0 && mw.getDouble(3) == -0.760639,
      s"$mw")
    // wilcoxon(d=[1.5,-2,3,4,-1.5,2,5,-2]) → n=8, W+=26.5, z=1.197599
    val wx = StatsTests.wilcoxonSignedRank(
      df(1.5, -2, 3, 4, -1.5, 2, 5, -2).withColumnRenamed("v", "d"),
      col("d")).head()
    assert(wx.getLong(0) == 8L && wx.getDouble(1) == 26.5 &&
      wx.getDouble(2) == 1.197599, s"$wx")
    // ks(A=[1,2,2,3,5], B=[2,3,3,4]) → D = 0.35
    assert(StatsTests.ksTest(df(1, 2, 2, 3, 5), df(2, 3, 3, 4),
      col("v")).head().getDouble(2) == 0.35)
    // mannKendall([3,1,4,1,5,9,2,6]) → S=11, Var=64.333333, z=1.246757
    val mk = StatsTests.mannKendall(
      Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0).zipWithIndex
        .map { case (v, i) => (i, v) }.toDF("o", "v"),
      "o", "v").head()
    assert(mk.getLong(1) == 11L && mk.getDouble(2) == r6(193.0 / 3.0))
    assert(mk.getDouble(3) == 1.246757, s"$mk")
    // p via the A&S 7.1.26 polynomial (±1.5e-7): golden erfc = 0.212486
    assert(math.abs(mk.getDouble(4) - 0.212486) <= 2e-6, s"$mk")
  }

  test("golden vectors from tools/golden_stats.py, batch 2 (r13) — the " +
    "omnibus/agreement/moment/experimentation families against the " +
    "independent textbook implementations") {
    def near(got: Double, want: Double, tag: String): Unit =
      assert(math.abs(got - want) <= 2e-6, s"$tag: $got vs $want")
    val g1 = Seq(1.0, 2.0, 2.0, 5.0)
    val g2 = Seq(3.0, 4.0, 4.0)
    val g3 = Seq(2.0, 6.0, 7.0, 8.0)
    val grouped = (g1.map("a" -> _) ++ g2.map("b" -> _) ++
      g3.map("c" -> _)).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    // kruskal(G1,G2,G3) → H = 3.681818, H_c = 3.767442
    val kw = StatsTests.kruskalWallis(grouped, col("g"), col("v")).head()
    assert(kw.getLong(0) == 3L && kw.getLong(1) == 11L, s"$kw")
    near(kw.getDouble(2), 3.681818, "H")
    near(kw.getDouble(3), 3.767442, "H_c")
    // anovaF → ssb = 21.583333, ssw = 30.416667, f = 2.838356
    val af = StatsTests.anovaF(grouped, col("g"), col("v")).head()
    near(af.getDouble(2), 21.583333, "ssb")
    near(af.getDouble(3), 30.416667, "ssw")
    near(af.getDouble(4), 2.838356, "f")
    // brownForsythe (lower-median-centered |z|) → f = 0.906143
    val bf = StatsTests.brownForsythe(
      grouped, col("g"), col("v"), col("id")).head()
    near(bf.getDouble(2), 3.492424, "bf ssb")
    near(bf.getDouble(3), 15.416667, "bf ssw")
    near(bf.getDouble(4), 0.906143, "bf f")
    // 3 judges rank 4 subjects → W = 0.644444, χ²_F = 5.8, dof 3
    val judged = Seq(
      (1L, 0.9, 0.8, 0.3), (2L, 0.4, 0.5, 0.9),
      (3L, 0.7, 0.6, 0.8), (4L, 0.1, 0.2, 0.1))
      .toDF("id", "m1", "m2", "m3")
    val ms = Seq(col("m1"), col("m2"), col("m3"))
    val w = StatsTests.kendallW(judged, "id", ms).head()
    assert(w.getLong(0) == 4L && w.getLong(1) == 3L)
    near(w.getDouble(2), 0.644444, "W")
    val fr = StatsTests.friedman(judged, "id", ms).head()
    assert(fr.getLong(2) == 3L, "dof")
    near(fr.getDouble(3), 5.8, "chi2_f")
    // jarqueBera([1,2,2.5,3,10,2.2,1.8,2.9]) → g1 = 2.034084,
    // g2 = 2.590028, JB = 7.752743, p = 0.020726
    val jb = StatsTests.jarqueBera(
      Seq(1.0, 2.0, 2.5, 3.0, 10.0, 2.2, 1.8, 2.9).toDF("v"),
      col("v")).head()
    near(jb.getDouble(1), 2.034084, "skew")
    near(jb.getDouble(2), 2.590028, "kurt")
    near(jb.getDouble(3), 7.752743, "jb")
    near(jb.getDouble(4), 0.020726, "p")
    // ljungBox([1,3,2,5,4,6,5,8], 3) → r = (0.244718, 0.411972,
    // -0.181338), Q = (0.684423, 2.947367, 3.473503)
    val lb = StatsTests.ljungBox(
      Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 5.0, 8.0).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("o", "v"),
      "o", "v", maxLag = 3).collect()
    assert(lb.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    Seq(0.244718, 0.411972, -0.181338).zip(lb).foreach {
      case (want, r) => near(r.getDouble(1), want, "lb r") }
    Seq(0.684423, 2.947367, 3.473503).zip(lb).foreach {
      case (want, r) => near(r.getDouble(2), want, "lb q") }
    // cuped → θ = 0.942857, ρ² = 0.924187, raw diff = 1.666667,
    // adjusted diff = 0.723810
    val cu = StatsTests.cuped(
      Seq((true, 10.0, 12.0), (true, 8.0, 9.5), (true, 12.0, 13.0),
        (false, 9.0, 10.0), (false, 11.0, 11.5), (false, 7.0, 8.0))
        .toDF("arm", "x", "y"),
      col("arm"), col("x"), col("y")).head()
    near(cu.getDouble(2), 0.942857, "theta")
    near(cu.getDouble(3), 0.924187, "rho2")
    near(cu.getDouble(4), 1.666667, "diff_raw")
    near(cu.getDouble(5), 0.72381, "diff_cuped")
    // tost(400/120 vs 500/145, margin .05) → se = 0.030607,
    // z_lower = 1.960324, z_upper = 1.306883, NOT equivalent
    val to = StatsTests.tostEquivalence(
      (1 to 400).map(i => i <= 120).toDF("s"),
      (1 to 500).map(i => i <= 145).toDF("s"),
      col("s"), margin = 0.05).head()
    near(to.getDouble(5), 0.030607, "se")
    near(to.getDouble(6), 1.960324, "z_lower")
    near(to.getDouble(7), 1.306883, "z_upper")
    assert(!to.getBoolean(8), "1.306883 < 1.644854 → not equivalent")
  }

  test("ksTest: identical samples → D 0; disjoint supports → D 1; " +
    "hand-computed interleaved case") {
    def df(vs: Double*) = vs.toDF("v")
    val same = StatsTests.ksTest(df(1, 2, 3), df(1, 2, 3), col("v"))
      .collect().head
    assert(same.getLong(0) == 3L && same.getDouble(2) == 0.0)
    assert(StatsTests.ksTest(df(1, 2), df(5, 6), col("v"))
      .collect().head.getDouble(2) == 1.0)
    // A={1,3}, B={2,4}: CDF gaps at 1,2,3,4 → .5, 0, .5, 0 → D=.5
    assert(StatsTests.ksTest(df(1, 3), df(2, 4), col("v"))
      .collect().head.getDouble(2) == 0.5)
  }

  test("concentration: uniform shares hit the HHI floor and Gini 0; a " +
    "monopoly drives all three metrics to their ceilings") {
    def df(groups: (String, Int)*) =
      groups.flatMap { case (gname, k) => Seq.fill(k)(gname) }.toDF("g")
    val uniform = StatsTests.concentration(
      df("a" -> 5, "b" -> 5, "c" -> 5, "d" -> 5), col("g"))
      .collect().head
    assert(uniform.getLong(0) == 4L && uniform.getLong(1) == 20L)
    assert(uniform.getDouble(2) == 0.25, "HHI floor = 1/g")
    assert(uniform.getDouble(3) == 0.0, "equal shares → Gini 0")
    assert(uniform.getDouble(4) == 0.25)
    val monopoly = StatsTests.concentration(
      df("big" -> 97, "x" -> 1, "y" -> 1, "z" -> 1), col("g"))
      .collect().head
    assert(monopoly.getDouble(2) > 0.9 && monopoly.getDouble(4) == 0.97)
    // exact Gini: sorted c = (1,1,1,97); Σ i·c = 1+2+3+388 = 394
    // G = 2·394/(4·100) − 5/4 = 0.72
    assert(monopoly.getDouble(3) == 0.72)
  }

  test("benfordProfile: arithmetic digit extraction across magnitudes; " +
    "expectations sum to 1; a perfectly Benford sample scores ~0") {
    val digits = StatsTests.benfordProfile(
        Seq(0.02, 3.5, 999.0, 1000.0, 0.5).toDF("v"), col("v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(digits == Map(2 -> 1L, 3 -> 1L, 9 -> 1L, 1 -> 1L, 5 -> 1L))
    assert(math.abs(StatsTests.benfordExpected.sum - 1.0) < 1e-12)
    // 1000 values drawn AS the Benford proportions → every term ≈ 0
    val counts = StatsTests.benfordExpected.map(p => math.round(p * 1000))
    val vals = counts.zipWithIndex.flatMap { case (k, i) =>
      Seq.fill(k.toInt)((i + 1).toDouble) }
    val prof = StatsTests.benfordProfile(vals.toDF("v"), col("v"))
      .collect()
    assert(prof.length == 9)
    assert(prof.map(_.getDouble(4)).sum < 0.05,
      "rounding-only χ² residue")
    // non-positive and NULL values drop
    assert(StatsTests.benfordProfile(
      Seq(Some(-5.0), Some(0.0), Option.empty[Double]).toDF("v"),
      col("v")).count() == 0L)
  }

  test("groupKsD law: every group's D equals the pairwise ksTest of " +
    "group vs rest; an empty complement is NULL") {
    val rng = new scala.util.Random(11)
    val df = (0 until 240).map { i =>
      val g = Seq("a", "b", "c")(i % 3)
      // group c drawn shifted so at least one D is visibly nonzero
      val v = (if (g == "c") 50 else 0) + rng.nextInt(40)
      (i.toLong, g, v.toDouble)
    }.toDF("id", "g", "v")
    val got = StatsTests.groupKsD(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    Seq("a", "b", "c").foreach { g =>
      val pairwise = StatsTests.ksTest(
        df.filter(col("g") === g), df.filter(col("g") =!= g), col("v"))
        .collect().head.getDouble(2)
      assert(got(g) == pairwise, s"group $g: ${got(g)} vs $pairwise")
    }
    assert(got("c") > 0.5, "planted shift must be visible")
    // a lone group has no complement: NULL D
    val lone = StatsTests.groupKsD(
      df.filter(col("g") === "a"), col("g"), col("v"))
      .collect().head
    assert(lone.isNullAt(3))
  }

  test("hillTailIndex: recovers a planted Pareto alpha, all-tied tail " +
    "is NULL, non-positive values drop, plans as TakeOrdered") {
    // exact Pareto(alpha=2) quantiles: v = (i/n)^(-1/2)
    val n = 2000
    val pareto = (1 to n).map(i =>
      (i.toLong, math.pow(i.toDouble / n, -0.5)))
      .toDF("id", "v")
    val got = StatsTests.hillTailIndex(pareto, col("v"), "id", k = 200)
      .collect().head
    assert(got.getLong(0) == 200L)
    assert(math.abs(got.getDouble(3) - 2.0) < 0.15,
      s"alpha ${got.getDouble(3)} should sit near the planted 2.0")
    // all-tied top: sum of log-ratios is 0 -> NULL alpha, 0 inv_alpha
    val flat = (1 to 50).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val tied = StatsTests.hillTailIndex(flat, col("v"), "id", k = 10)
      .collect().head
    assert(tied.getDouble(2) == 0.0 && tied.isNullAt(3))
    // zero/negative values are outside the tail domain
    val mixed = pareto.unionByName(
      Seq((9001L, 0.0), (9002L, -5.0)).toDF("id", "v"))
    assert(StatsTests.hillTailIndex(mixed, col("v"), "id", 200)
      .collect().head.toSeq ==
      got.toSeq)
    val plan = StatsTests.hillTailIndex(pareto, col("v"), "id", 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    intercept[IllegalArgumentException] {
      StatsTests.hillTailIndex(pareto, col("v"), "id", 0)
    }
  }
}
