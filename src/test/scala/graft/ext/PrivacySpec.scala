package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends GraftSpec {
  import spark.implicits._

  // 3 classes: (n1,A)×4, (n1,B)×2, (n2,A)×1; sensitive s ∈ {x,y}
  private def df = Seq(
    (1L, "A", "x"), (1L, "A", "x"), (1L, "A", "y"), (1L, "A", "x"),
    (1L, "B", "x"), (1L, "B", "x"),
    (2L, "A", "y"))
    .toDF("nat", "seg", "sens")

  test("kAnonymityProfile: hand-computed class sizes {4,2,1} against " +
    "thresholds 2 and 5") {
    val got = Privacy.kAnonymityProfile(df,
      Seq(col("nat"), col("seg")), ks = Seq(2, 5))
      .collect()
    assert(got.length == 2)
    val k2 = got(0)
    // k=2: only the singleton class is below — 1 class, 1 row at risk
    assert(k2.getLong(0) == 2L && k2.getLong(1) == 3L)
    assert(k2.getLong(2) == 1L, "min class size")
    assert(k2.getLong(3) == 1L && k2.getLong(4) == 1L)
    assert(k2.getLong(5) == 7L)
    assert(k2.getDouble(6) == math.rint(1.0 / 7.0 * 1e6) / 1e6)
    val k5 = got(1)
    // k=5: every class is below — all 7 rows at risk
    assert(k5.getLong(3) == 3L && k5.getLong(4) == 7L)
    assert(k5.getDouble(6) == 1.0)
  }

  test("kAnonymityProfile: null quasi-identifier values form their own " +
    "class; thresholds are validated") {
    val withNull = df.union(
      Seq((null.asInstanceOf[java.lang.Long], "A", "x"),
        (null.asInstanceOf[java.lang.Long], "A", "x"))
        .toDF("nat", "seg", "sens"))
    val got = Privacy.kAnonymityProfile(withNull,
      Seq(col("nat"), col("seg")), ks = Seq(2)).collect().head
    assert(got.getLong(1) == 4L, "the (null,A) pair is a 4th class")
    assert(got.getLong(4) == 1L, "its 2 members are not at risk at k=2")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityProfile(df, Seq(col("nat")), ks = Seq(1))
    }
  }

  test("mergeClasses: disjoint-batch partials fold to the whole-data " +
    "class frame — the merged profile equals the batch profile") {
    val quasi = Seq(col("nat"), col("seg"))
    val whole = Privacy.kAnonymityProfile(df, quasi, ks = Seq(2, 5))
      .collect().toSeq
    val halves = Privacy.equivalenceClasses(
      df.filter(col("sens") === "x"), quasi)
      .union(Privacy.equivalenceClasses(
        df.filter(col("sens") =!= "x"), quasi))
    val merged = Privacy.kAnonymityFromClasses(
      Privacy.mergeClasses(halves, quasi), ks = Seq(2, 5))
      .collect().toSeq
    assert(merged == whole)
  }

  test("diversityHistogram: per-class distinct sensitive values — " +
    "{(n1,A)→2, (n1,B)→1, (n2,A)→1} summarizes to the histogram") {
    val got = Privacy.diversityHistogram(df,
      Seq(col("nat"), col("seg")), col("sens"))
      .collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L &&
      got(0).getLong(2) == 3L, "two homogeneous classes holding 3 rows")
    assert(got(1).getLong(0) == 2L && got(1).getLong(1) == 1L &&
      got(1).getLong(2) == 4L)
  }

  test("diversityHistogram: null sensitive values do not count as a " +
    "diversity value (all-null class lands at diversity 0)") {
    val d = Seq((1L, "A", "x"), (1L, "A", null.asInstanceOf[String]),
      (2L, "A", null.asInstanceOf[String]))
      .toDF("nat", "seg", "sens")
    val got = Privacy.diversityHistogram(d,
      Seq(col("nat"), col("seg")), col("sens")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((0L, 1L, 1L), (1L, 1L, 2L)))
  }

  test("dpCounts: released = clamped floor(n + Laplace(1/eps) + 1/2) " +
      "under the seeded inverse CDF; exact count absent; salt matters") {
    val d = (1 to 40).map(i => (i.toLong, if (i <= 30) "a" else "b"))
      .toDF("id", "g")
    val out = Privacy.dpCounts(d, Seq("g"), epsilon = 0.5, secretSalt = "s1")
    assert(out.columns.toSeq == Seq("g", "released_count", "epsilon"))
    val got = out.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the mechanism by hand from the same md5 seed
    def released(g: String, n: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1:$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / math.pow(16, 12)
      val t = u - 0.5
      val noise = -math.signum(t) * math.log(1 - 2 * math.abs(t)) / 0.5
      math.max(0L, math.floor(n + noise + 0.5).toLong)
    }
    assert(got("a") == released("a", 30L))
    assert(got("b") == released("b", 10L))
    // a different salt is a different (fresh-budget) release
    val got2 = Privacy.dpCounts(d, Seq("g"), 0.5, "s2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got != got2 || got("a") != got2("a") || got("b") != got2("b"))
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(d, Seq("g"), epsilon = 0.0, secretSalt = "s")
    }
  }

  test("dpCounts: noise magnitude tracks 1/epsilon and the clamp floors " +
      "small groups at zero") {
    // one singleton group whose seeded u is in the noisy-negative half
    // for some salt: scan salts until the released count clamps to 0 at
    // a tiny epsilon (huge noise) — proves the clamp path executes
    val d = Seq((1L, "only")).toDF("id", "g")
    val clamped = (1 to 20).exists { k =>
      Privacy.dpCounts(d, Seq("g"), epsilon = 0.01, secretSalt = s"c$k")
        .collect()(0).getLong(1) == 0L
    }
    assert(clamped)
  }

  test("dpCountsFromClasses: the standing-census release — merged " +
      "disjoint-batch partials release exactly the whole-data counts " +
      "(noise seeds on the key, counts are additive)") {
    val d = (1 to 60).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", if (i % 2 == 0) "x" else "y"))
      .toDF("id", "g1", "g2")
    val whole = Privacy.dpCounts(d, Seq("g1", "g2"), 0.5, "mc1")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val quasi = Seq(col("g1"), col("g2"))
    val merged = Privacy.dpCountsFromClasses(
        Privacy.mergeClasses(
          Privacy.equivalenceClasses(d.filter($"id" <= 30), quasi)
            .unionByName(
              Privacy.equivalenceClasses(d.filter($"id" > 30), quasi)),
          quasi),
        Seq("g1", "g2"), 0.5, "mc1")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(merged == whole)
  }

  test("dpTopK: Gumbel scores replay by hand; no count leaves; big " +
      "count gaps survive the noise, epsilon scales the scramble") {
    val d = ((1 to 100).map(i => (i.toLong, "big")) ++
      (1 to 3).map(i => (100L + i, "tiny")) ++
      (1 to 2).map(i => (200L + i, "mini"))).toDF("id", "g")
    val out = Privacy.dpTopK(d, "g", k = 2, epsilon = 1.0, secretSalt = "t1")
    assert(out.columns.toSeq == Seq("rank", "g", "epsilon"),
      "no count column may leave")
    // replay: score = n + 2/eps * (-ln(-ln u)) from the same md5 seed
    def score(g: String, n: Long, eps: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t1:$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / math.pow(16, 12)
      n + (2.0 / eps) * (-math.log(-math.log(u)))
    }
    val expected = Seq("big" -> score("big", 100, 1.0),
      "tiny" -> score("tiny", 3, 1.0), "mini" -> score("mini", 2, 1.0))
      .sortBy(-_._2).map(_._1).take(2)
    val got = out.collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    assert(got == expected)
    // a 97-count gap is ~25 Gumbel scales at eps=1: "big" must win
    assert(got.head == "big")
    intercept[IllegalArgumentException] {
      Privacy.dpTopK(d, "g", k = 0, epsilon = 1.0, secretSalt = "t1")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpTopK(d, "g", k = 1, epsilon = -1.0, secretSalt = "t1")
    }
  }

  test("randomizedResponse + rrPrevalence: seeded flips replay by hand, " +
      "NULLs carry no evidence, debias recovers the rate") {
    val d = (1 to 200).map(i =>
        (i.toLong, if (i % 10 == 0) None else Some(i % 4 == 0)))
      .toDF("id", "truth")
    val rep = Privacy.randomizedResponse(d, "id", col("truth"),
      flipProb = 0.25, secretSalt = "rr")
    val rows = rep.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
      .toMap
    def flips(i: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rr:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(hex, 16) + 0.5) / math.pow(16, 12) < 0.25
    }
    (1 to 200).foreach { i =>
      val expected =
        if (i % 10 == 0) None
        else Some(if (flips(i)) !(i % 4 == 0) else i % 4 == 0)
      assert(rows(i.toLong) == expected, s"id $i")
    }
    // census: NULL reports excluded; pi_hat = (rate − p)/(1 − 2p)
    val prev = Privacy.rrPrevalence(
      rep.withColumn("g", lit("all")), Seq("g"), 0.25).collect()(0)
    val n = prev.getLong(1)
    val yes = prev.getLong(2)
    assert(n == 180L) // 20 NULL rows carry no evidence
    val expectedPi = BigDecimal((yes.toDouble / n - 0.25) / 0.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(prev.getDouble(3) == expectedPi)
    // the debiased estimate lands near the true 25% long before the
    // reported raw rate does (which sits near .25·.75 + .75·.25 ≈ 0.375)
    assert(math.abs(prev.getDouble(3) - 0.25) < 0.25)
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(d, "id", col("truth"), 0.5, "rr")
    }
  }

  // plain-Scala replay of the Acklam probit with the engine's exact
  // operation order — the reference the seeded Gaussian noise is
  // checked against, branch by branch
  private def probitRef(u: Double): Double = {
    def tl(q: Double): Double = {
      val num = (((((-7.784894002430293e-3) * q + (-3.223964580411365e-1))
        * q + (-2.400758277161838e0)) * q + (-2.549732539343734e0))
        * q + 4.374664141464968e0) * q + 2.938163982698783e0
      val den = (((7.784695709041462e-3 * q + 3.224671290700398e-1)
        * q + 2.445134137142996e0) * q + 3.754408661907416e0) * q + 1.0
      num / den
    }
    if (u < 0.02425) tl(math.sqrt(-2.0 * math.log(u)))
    else if (u > 0.97575) -tl(math.sqrt(-2.0 * math.log(1.0 - u)))
    else {
      val q = u - 0.5; val r = q * q
      val num = (((((-3.969683028665376e1 * r + 2.209460984245205e2)
        * r + (-2.759285104469687e2)) * r + 1.383577518672690e2)
        * r + (-3.066479806614716e1)) * r + 2.506628277459239e0) * q
      val den = (((((-5.447609879822406e1 * r + 1.615858368580409e2)
        * r + (-1.556989798598866e2)) * r + 6.680131188771972e1)
        * r + (-1.328068155288572e1)) * r) + 1.0
      num / den
    }
  }

  private def uniformOf(salt: String, key: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    (java.lang.Long.parseLong(hex, 16) + 0.5) / math.pow(16, 12)
  }

  test("dpCountsGaussian: released = clamped floor(n + sigma*probit(u) " +
      "+ 1/2) replayed by hand across BOTH probit tails and the " +
      "central region; parameter bounds enforced") {
    // scan keys until the seeded uniform lands in each probit branch,
    // so all three rational approximations provably execute
    val lower = (1 to 999).map(i => s"lo$i")
      .find(k => uniformOf("gs1", k) < 0.02425).get
    val upper = (1 to 999).map(i => s"hi$i")
      .find(k => uniformOf("gs1", k) > 0.97575).get
    val mid = (1 to 999).map(i => s"md$i")
      .find(k => { val u = uniformOf("gs1", k); u >= 0.3 && u <= 0.7 }).get
    val rows = Seq(lower -> 40, upper -> 25, mid -> 10).flatMap {
      case (g, n) => (1 to n).map(i => (g.hashCode * 1000L + i, g))
    }
    val d = rows.toDF("id", "g")
    val out = Privacy.dpCountsGaussian(d, Seq("g"),
      epsilon = 0.5, delta = 1e-6, secretSalt = "gs1")
    assert(out.columns.toSeq ==
      Seq("g", "released_count", "epsilon", "delta"))
    val got = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sigma = Privacy.gaussianSigma(0.5, 1e-6)
    def released(g: String, n: Long): Long =
      math.max(0L,
        math.floor(n + sigma * probitRef(uniformOf("gs1", g)) + 0.5).toLong)
    assert(got(lower) == released(lower, 40L), s"lower tail ($lower)")
    assert(got(upper) == released(upper, 25L), s"upper tail ($upper)")
    assert(got(mid) == released(mid, 10L), s"central ($mid)")
    // sigma for (0.5, 1e-6): sqrt(2·ln(1.25e6))/0.5 ≈ 10.6 — the noise
    // is material, so at least one release differs from its true count
    assert(Seq(lower -> 40L, upper -> 25L, mid -> 10L)
      .exists { case (g, n) => got(g) != n })
    intercept[IllegalArgumentException] {
      Privacy.dpCountsGaussian(d, Seq("g"), 1.5, 1e-6, "gs1")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpCountsGaussian(d, Seq("g"), 0.5, 0.0, "gs1")
    }
  }

  test("dpCountsGaussianFromClasses: the standing Gaussian census — " +
      "merged disjoint-batch partials release exactly the whole-data " +
      "counts") {
    val d = (1 to 60).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", if (i % 2 == 0) "x" else "y"))
      .toDF("id", "g1", "g2")
    val whole = Privacy.dpCountsGaussian(d, Seq("g1", "g2"),
        0.5, 1e-6, "gm1")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val quasi = Seq(col("g1"), col("g2"))
    val merged = Privacy.dpCountsGaussianFromClasses(
        Privacy.mergeClasses(
          Privacy.equivalenceClasses(d.filter($"id" <= 30), quasi)
            .unionByName(
              Privacy.equivalenceClasses(d.filter($"id" > 30), quasi)),
          quasi),
        Seq("g1", "g2"), 0.5, 1e-6, "gm1")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(merged == whole)
  }

  test("dpCountsZcdpFromClasses: the standing zCDP census — merged " +
      "disjoint-batch partials release exactly the whole-data counts, " +
      "with the rho/epsilon/delta budget columns attached") {
    val d = (1 to 60).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", if (i % 2 == 0) "x" else "y"))
      .toDF("id", "g1", "g2")
    val whole = Privacy.dpCountsZcdp(d, Seq("g1", "g2"),
        rho = 0.125, delta = 1e-6, secretSalt = "zm1")
    assert(whole.columns.toSeq ==
      Seq("g1", "g2", "released_count", "rho", "epsilon", "delta"))
    val wholeSet = whole
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet
    val quasi = Seq(col("g1"), col("g2"))
    val merged = Privacy.dpCountsZcdpFromClasses(
        Privacy.mergeClasses(
          Privacy.equivalenceClasses(d.filter($"id" <= 30), quasi)
            .unionByName(
              Privacy.equivalenceClasses(d.filter($"id" > 30), quasi)),
          quasi),
        Seq("g1", "g2"), rho = 0.125, delta = 1e-6, secretSalt = "zm1")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSet
    assert(merged == wholeSet)
    assert(wholeSet.forall { case (_, _, _, rho, eps, delta) =>
      rho == 0.125 && delta == 1e-6 &&
        eps == Privacy.zcdpEpsilon(0.125, 1e-6)
    })
  }

  test("composeBudget: basic = (sum eps, sum delta); advanced = DRV'10 " +
      "sqrt(2 ln(1/d') sum eps^2) + sum eps(e^eps - 1), hand-computed; " +
      "slack validated") {
    val rel = Seq(("r1", 0.25, 1e-6), ("r2", 0.5, 1e-6), ("r3", 0.75, 0.0))
      .toDF("release", "eps", "delta")
    val got = Privacy.composeBudget(rel, "eps", "delta", deltaSlack = 1e-6)
      .collect()(0)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 3L)
    assert(got.getDouble(1) == 1.5)
    assert(got.getDouble(2) == r6(2e-6))
    val eps = Seq(0.25, 0.5, 0.75)
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s2 = eps.map(e => r12(e * e)).sum
    val lin = eps.map(e => r12(e * (math.exp(e) - 1.0))).sum
    val adv = math.sqrt(2.0 * math.log(1.0 / 1e-6) * s2) + lin
    assert(math.abs(got.getDouble(3) - adv) < 1e-6, s"$got vs $adv")
    assert(got.getDouble(4) == r6(2e-6 + 1e-6))
    // advanced beats basic once the schedule is long enough: 100 small
    // releases at eps=0.05 — basic spends 5.0, advanced ~2.9
    val many = (1 to 100).map(i => (s"r$i", 0.05, 1e-7))
      .toDF("release", "eps", "delta")
    val m = Privacy.composeBudget(many, "eps", "delta", 1e-6).collect()(0)
    assert(m.getDouble(3) < m.getDouble(1),
      s"advanced ${m.getDouble(3)} must undercut basic ${m.getDouble(1)}")
    intercept[IllegalArgumentException] {
      Privacy.composeBudget(rel, "eps", "delta", deltaSlack = 0.0)
    }
  }

  test("zcdpSigma / zcdpEpsilon: the Bun & Steinke closed forms, " +
      "hand-checked, with guards") {
    assert(Privacy.zcdpSigma(0.125) == 2.0) // 1/sqrt(2*0.125) exactly
    assert(Privacy.zcdpSigma(0.5) == 1.0)
    val eps = Privacy.zcdpEpsilon(0.125, 1e-6)
    val want = 0.125 + 2.0 * math.sqrt(0.125 * math.log(1e6))
    assert(eps == want, s"$eps vs $want")
    // zCDP covers the regime the Dwork & Roth bound excludes: a rho
    // whose conversion lands past epsilon = 1 is still valid input
    assert(Privacy.zcdpEpsilon(1.0, 1e-6) > 1.0)
    intercept[IllegalArgumentException] { Privacy.zcdpSigma(0.0) }
    intercept[IllegalArgumentException] { Privacy.zcdpEpsilon(0.125, 0.0) }
    intercept[IllegalArgumentException] { Privacy.zcdpEpsilon(-1.0, 1e-6) }
    // and the Dwork & Roth calibration now refuses epsilon = 1.0 (the
    // cited theorem is stated on the OPEN interval)
    intercept[IllegalArgumentException] { Privacy.gaussianSigma(1.0, 1e-6) }
  }

  test("dpCountsZcdp: the seeded release replayed by hand from the md5 " +
      "seed at sigma = 1/sqrt(2 rho), both budget currencies attached") {
    val rows = Seq("a" -> 40, "b" -> 25, "c" -> 10).flatMap {
      case (g, n) => (1 to n).map(i => (g.hashCode * 1000L + i, g))
    }
    val d = rows.toDF("id", "g")
    val out = Privacy.dpCountsZcdp(d, Seq("g"),
      rho = 0.125, delta = 1e-6, secretSalt = "zc1")
    assert(out.columns.toSeq ==
      Seq("g", "released_count", "rho", "epsilon", "delta"))
    val got = out.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val sigma = Privacy.zcdpSigma(0.125)
    def released(g: String, n: Long): Long =
      math.max(0L,
        math.floor(n + sigma * probitRef(uniformOf("zc1", g)) + 0.5).toLong)
    Seq("a" -> 40L, "b" -> 25L, "c" -> 10L).foreach { case (g, n) =>
      val (rc, rho, eps, del) = got(g)
      assert(rc == released(g, n), s"group $g")
      assert(rho == 0.125 && del == 1e-6)
      assert(eps == Privacy.zcdpEpsilon(0.125, 1e-6))
    }
    intercept[IllegalArgumentException] {
      Privacy.dpCountsZcdp(d, Seq("g"), 0.0, 1e-6, "zc1")
    }
  }

  test("rdpAccount: per-order RDP hand-computed for a gaussian+laplace " +
      "ledger, Prop-3 conversion, best flag on the grid minimum") {
    val rel = Seq(("g1", "gaussian", 2.0), ("l1", "laplace", 0.5))
      .toDF("release", "mechanism", "scale")
    val orders = Seq(1.5, 2.0, 3.0, 4.0, 8.0, 16.0, 32.0, 64.0)
    val got = Privacy.rdpAccount(rel, "mechanism", "scale", delta = 1e-6)
      .collect()
    assert(got.map(_.getDouble(0)).toSeq == orders)
    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def gaussTerm(a: Double) = a / (2.0 * 2.0 * 2.0)
    def lapTerm(a: Double, b: Double) = (1.0 / (a - 1.0)) *
      math.log((a * math.exp((a - 1.0) / b) +
        (a - 1.0) * math.exp(-a / b)) / (2.0 * a - 1.0))
    val conv = orders.map { a =>
      val rdp = r(gaussTerm(a), 12) + r(lapTerm(a, 0.5), 12)
      a -> (rdp, rdp + math.log(1e6) / (a - 1.0))
    }.toMap
    val bestConv = conv.values.map(v => r(v._2, 12)).min
    got.foreach { row =>
      val a = row.getDouble(0)
      assert(row.getDouble(1) == r(conv(a)._1, 6), s"rdp at alpha=$a")
      assert(row.getDouble(2) == r(conv(a)._2, 6), s"conv at alpha=$a")
      assert(row.getBoolean(3) == (r(conv(a)._2, 12) == bestConv),
        s"is_best at alpha=$a")
    }
    assert(got.count(_.getBoolean(3)) >= 1)

    // all-gaussian ledger: RDP is linear in alpha (alpha * sum rho) and
    // the grid minimum lands within a hair of the zCDP closed form
    val rhos = Seq(0.01, 0.02, 0.04)
    val gs = rhos.zipWithIndex
      .map { case (rho, i) => (s"g$i", "gaussian", Privacy.zcdpSigma(rho)) }
      .toDF("release", "mechanism", "scale")
    val g = Privacy.rdpAccount(gs, "mechanism", "scale", delta = 1e-6)
      .collect()
    val sumRho = rhos.sum
    g.foreach { row =>
      assert(math.abs(row.getDouble(1) - row.getDouble(0) * sumRho) < 1e-5,
        s"linear-in-alpha at ${row.getDouble(0)}")
    }
    val best = g.filter(_.getBoolean(3)).map(_.getDouble(2)).min
    val closed = Privacy.zcdpEpsilon(sumRho, 1e-6)
    assert(best >= closed - 1e-6, "grid cannot beat the continuous optimum")
    assert(best <= closed * 1.25, s"grid min $best far from zCDP $closed")

    intercept[IllegalArgumentException] {
      Privacy.rdpAccount(rel, "mechanism", "scale", 1e-6, Seq(1.0, 2.0))
    }
    intercept[IllegalArgumentException] {
      Privacy.rdpAccount(rel, "mechanism", "scale", 0.0)
    }
    val bad = Seq(("x", "cauchy", 1.0)).toDF("release", "mechanism", "scale")
    val e = intercept[Exception] {
      Privacy.rdpAccount(bad, "mechanism", "scale", 1e-6).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("rdpAccount"),
      s"unexpected: ${e.getMessage}")
  }

  test("sgmRdpAccount: hand-computed alpha=2 closed form; q=1 degenerates " +
      "to the full-data Gaussian curve; q<1 amplifies (strictly below " +
      "full-data at every order); additive composition; grid-min flag") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val one = Seq((0.01, 1.5)).toDF("q_samp", "sigma")
    val out = Privacy.sgmRdpAccount(one, "q_samp", "sigma", delta = 1e-6)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(out.map(_._1).toSeq == Seq(2.0, 3.0, 4.0, 8.0, 16.0, 32.0))
    // alpha = 2 by independent arithmetic: the j-sum telescopes to
    // ln(1 + q^2 (e^{1/sigma^2} - 1)) because j in {0,1} has zero
    // Gaussian exponent and the binomial terms sum to 1 - q^2
    val eps2 = math.log(1.0 + 0.01 * 0.01 *
      (math.exp(1.0 / (1.5 * 1.5)) - 1.0))
    assert(out(0)._2 == r6(eps2), s"${out(0)._2} vs $eps2")
    // q < 1 amplifies: strictly below the full-data alpha/(2 sigma^2)
    out.foreach { case (a, eps, _, _) =>
      assert(eps < a / (2.0 * 1.5 * 1.5), s"order $a not amplified")
    }
    // q -> 1 (vanishing subsampling): the curve approaches the
    // full-data Gaussian alpha/(2 sigma^2) from below. (q = 1 itself is
    // outside the (0,1) contract: ln(1-q) = -inf makes the j = alpha
    // term 0 * -inf = NaN.)
    val full = Privacy.sgmRdpAccount(
        Seq((1.0 - 1e-9, 1.5)).toDF("q_samp", "sigma"),
        "q_samp", "sigma", 1e-6)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    Seq(2, 3, 4, 8, 16, 32).foreach { a =>
      val want = a / (2.0 * 1.5 * 1.5)
      // released values are 6-dp rounded, so compare by tolerance only
      assert(math.abs(full(a.toDouble) - want) < 1e-3,
        s"q->1 order $a: ${full(a.toDouble)} vs $want")
    }
    // additive composition: two identical releases double the curve
    val two = Seq((0.01, 1.5), (0.01, 1.5)).toDF("q_samp", "sigma")
    val comp = Privacy.sgmRdpAccount(two, "q_samp", "sigma", 1e-6)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(comp(2.0) == r6(r12(eps2) * 2), s"${comp(2.0)}")
    // exactly one best flag, on the grid minimum of the converted curve
    assert(out.count(_._4) >= 1)
    val minConv = out.map(_._3).min
    assert(out.filter(_._4).forall(_._3 == minConv))
    // guards
    intercept[IllegalArgumentException] {
      Privacy.sgmRdpAccount(one, "q_samp", "sigma", 0.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.sgmRdpAccount(one, "q_samp", "sigma", 1e-6, orders = Seq(1))
    }
  }
}
