package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends GraftSpec {
  import spark.implicits._

  test("agreementWeights: textbook log-likelihood ratios; inverted or " +
    "degenerate m/u rejected") {
    val (wa, wd) = RecordLinkage.agreementWeights(0.9, 0.1)
    assert(math.abs(wa - math.log(9.0)) < 1e-12)
    assert(math.abs(wd - math.log(0.1 / 0.9)) < 1e-12)
    intercept[IllegalArgumentException] {
      RecordLinkage.agreementWeights(0.1, 0.9) } // inverted
    intercept[IllegalArgumentException] {
      RecordLinkage.agreementWeights(1.0, 0.5) } // m = 1 → wd undefined
  }

  test("score: agreement adds, disagreement subtracts, NULL agreement " +
    "contributes zero; fold order is declaration order") {
    val df = Seq(
      (1L, Some(true), Some(true)),
      (2L, Some(true), Some(false)),
      (3L, Option.empty[Boolean], Some(true))
    ).toDF("id", "f1", "f2")
    val fields = Seq(
      (col("f1"), 0.9, 0.1), // wa=ln9≈2.197, wd=ln(1/9)≈-2.197
      (col("f2"), 0.8, 0.2)) // wa=ln4≈1.386, wd=ln(.2/.8)≈-1.386
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = df.select(col("id"),
        RecordLinkage.score(fields).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == r6(math.log(9.0) + math.log(4.0)))
    assert(got(2L) == r6(math.log(9.0) + math.log(0.2 / 0.8)))
    assert(got(3L) == r6(0.0 + math.log(4.0)))
  }

  test("bestLinks: keeps each left record's single best candidate at or " +
    "above threshold; score ties break to the smaller right id") {
    val cands = Seq(
      // a=1: two candidates, second agrees on both fields → wins
      (1L, 10L, true, false), (1L, 11L, true, true),
      // a=2: both candidates identical agreement → tie, smaller b wins
      (2L, 21L, true, true), (2L, 20L, true, true),
      // a=3: only sub-threshold candidates → absent from output
      (3L, 30L, false, false)
    ).toDF("a_id", "b_id", "f1", "f2")
    val fields = Seq((col("f1"), 0.9, 0.1), (col("f2"), 0.8, 0.2))
    val got = RecordLinkage.bestLinks(cands, "a_id", "b_id", fields,
        threshold = 3.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 11L)
    assert(got(2L)._1 == 20L)
    assert(got(1L)._2 == got(2L)._2) // both full-agreement scores
  }

  test("soundex: the NARA reference vectors, including the H/W " +
    "transparency and first-letter-collapse edges") {
    import spark.implicits._
    val vectors = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // H-transparent merge
      "Tymczak" -> "T522",                        // vowel separates
      "Pfister" -> "P236",                        // P,F collapse
      "Honeyman" -> "H555",                       // H/W first letter
      "Wu" -> "W000", "a" -> "A000",
      "o'Brien-123" -> "O165")                    // non-letters strip
    val got = vectors.map(_._1).toDF("name")
      .select(col("name"), RecordLinkage.soundex(col("name")).as("sx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (n, want) =>
      assert(got(n) == want, s"soundex($n) = ${got(n)}, want $want") }
    val empty = Seq("123", "").toDF("name")
      .select(RecordLinkage.soundex(col("name"))).collect()
    assert(empty.forall(_.isNullAt(0)), "letterless names → NULL")
  }

  test("phoneticBlocks: like-sounding names share a block; counts and " +
    "distinct forms are per block") {
    import spark.implicits._
    val df = Seq("Robert", "Rupert", "Robert", "Tymczak").toDF("n")
    val got = RecordLinkage.phoneticBlocks(df, col("n"))
      .orderBy("block").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("R163", 3L, 2L), ("T522", 1L, 1L)))
  }

  test("blockingCovers: the q157 key pair covers every threshold-4 " +
    "state, incl. the NULL-name branch; weaker schemes are rejected") {
    val fields = Seq(
      (col("n"), 0.95, 0.001), // name:    wa≈6.856, wd≈-2.995
      (col("s"), 0.9, 0.2),    // segment: wa≈1.504, wd≈-2.079
      (col("b"), 0.9, 0.01))   // balance: wa≈4.500, wd≈-2.293
    // the shipped scheme: (name) ∪ (balance)
    assert(RecordLinkage.blockingCovers(fields, 4.0, Seq(Set(0), Set(2))))
    // name alone misses the NULL-name + balance-agree state (score 4.5)
    assert(!RecordLinkage.blockingCovers(fields, 4.0, Seq(Set(0))))
    // balance alone misses name+seg agree with balance DISAGREE (6.067)
    assert(!RecordLinkage.blockingCovers(fields, 4.0, Seq(Set(2))))
    // a key on every field only covers all-agree — rejected too
    assert(!RecordLinkage.blockingCovers(fields, 4.0, Seq(Set(0, 1, 2))))
    // raising the threshold above any reachable score → vacuously true
    assert(RecordLinkage.blockingCovers(fields, 20.0, Seq(Set(1))))
  }

  test("q157 union blocking is output-identical to the unblocked " +
    "nation join (coverage proof, checked end-to-end)") {
    val sfDir = "/root/testdata/sf0.01"
    val blocked = graft.SparkEntry.queries("q157_record_linkage")(
      spark, sfDir).collect().map(_.toSeq).toSeq
    // reference: same fields/threshold over ALL nation-blocked pairs
    val c = graft.Tables(spark, sfDir, "customer")
    val a = c.select(col("c_custkey").as("a_id"),
      col("c_nationkey").as("a_nat"), col("c_name").as("a_name"),
      col("c_mktsegment").as("a_seg"), col("c_acctbal").as("a_bal"))
    val b = c.filter(pmod(col("c_custkey"), lit(2)) === 0)
      .select(col("c_custkey").as("b_id"),
        col("c_nationkey").as("b_nat"),
        when(pmod(col("c_custkey"), lit(9)) === 0,
          concat(col("c_name"), lit("x")))
          .otherwise(col("c_name")).as("b_name"),
        when(pmod(col("c_custkey"), lit(7)) === 0, lit("ZZZ"))
          .otherwise(col("c_mktsegment")).as("b_seg"),
        when(pmod(col("c_custkey"), lit(5)) === 0,
          col("c_acctbal") + 0.5)
          .otherwise(col("c_acctbal")).as("b_bal"))
    val fields = Seq(
      (lower(col("a_name")) === lower(col("b_name")), 0.95, 0.001),
      (col("a_seg") === col("b_seg"), 0.9, 0.2),
      (abs(col("a_bal") - col("b_bal")) < 0.005, 0.9, 0.01))
    val reference = RecordLinkage.bestLinks(
        a.join(b, col("a_nat") === col("b_nat")),
        "a_id", "b_id", fields, threshold = 4.0)
      .orderBy(col("a_id").asc).collect().map(_.toSeq).toSeq
    assert(reference.nonEmpty)
    assert(blocked == reference)
  }
}
