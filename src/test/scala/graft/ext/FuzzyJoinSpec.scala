package graft.ext

import graft.GraftSpec

class FuzzyJoinSpec extends GraftSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("matches a small-edit pair and reports the exact distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val edited = base.replace("quick", "qulck") // 1 substitution
    val out = FuzzyJoin.editDistancePairs(docs(1L -> base, 2L -> edited))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L)))
  }

  test("an edit inside block 1 is still caught via block 2") {
    // first 16 chars differ (edit in region 1), chars 17-32 identical
    val a = "AAAAAAAAAAAAAAAAcommon middle part shared tail text here"
    val b = "BAAAAAAAAAAAAAAAcommon middle part shared tail text here"
    val out = FuzzyJoin.editDistancePairs(docs(1L -> a.toLowerCase,
      2L -> b.toLowerCase))
    assert(out.count() == 1)
  }

  test("pairs beyond maxDist are filtered; unrelated texts never pair") {
    val out = FuzzyJoin.editDistancePairs(docs(
      1L -> "completely different text with nothing shared at all",
      2L -> "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"))
    assert(out.count() == 0)
  }

  test("a pair blocked by both passes is emitted once") {
    val s = "identical head of sixty four characters padded out to length!!"
    val out = FuzzyJoin.editDistancePairs(docs(1L -> s, 2L -> s))
    assert(out.count() == 1)
  }

  test("short heads skip the suffix block instead of hot-bucketing") {
    // both < 32 chars: only block 1 applies; different prefixes → no pair
    val out = FuzzyJoin.editDistancePairs(docs(
      1L -> "short one", 2L -> "other tiny"))
    assert(out.count() == 0)
  }

  test("indexed probe over the index's own docs ≡ self-contained pairs; " +
    "index ∪ append ≡ rebuild") {
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val self = pairs(FuzzyJoin.editDistancePairs(d))
    val full = FuzzyJoin.buildFuzzyIndex(d)
    assert(pairs(FuzzyJoin.editDistancePairsIndexed(d, full)) == self)
    // append law: block rows are per-doc-local, so a split build unions
    // to the full index
    val part1 = FuzzyJoin.buildFuzzyIndex(d.filter($"doc_id" < 250))
    val part2 = FuzzyJoin.buildFuzzyIndex(d.filter($"doc_id" >= 250))
    assert(pairs(FuzzyJoin.editDistancePairsIndexed(
      d, part1.unionByName(part2))) == self)
  }

  test("the screen direction is id-order-independent: a LOW-id probe " +
    "against a high-id index still pairs") {
    val corpus = docs(100L -> "the quick brown fox jumps over the lazy dog")
    val probe = docs(1L -> "the quick brown fox jumps over the lazy dot")
    val idx = FuzzyJoin.buildFuzzyIndex(corpus)
    val out = FuzzyJoin.editDistancePairsIndexed(probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L)))
  }

  test("matches the declared query against sf0.001 brute force") {
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = FuzzyJoin.editDistancePairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference over the same heads, candidate recall modulo
    // the documented two-region blocking bound: every blocked pair the
    // operator emits must be a true ≤-maxDist pair
    import org.apache.spark.sql.functions._
    val heads = d.filter(col("text").isNotNull)
      .select(col("doc_id"), lower(substring(col("text"), 1, 64)).as("h"))
    val all = heads.as("a").join(heads.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .filter(levenshtein(col("a.h"), col("b.h")) <= 10)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(all), "blocked pairs must all be true pairs")
    // on the harness fixtures the two-pass blocks achieve full recall
    assert(got == all, s"missed ${all.diff(got).size} of ${all.size}")
  }

  test("jaroWinklerPairs: transposed-word pair scores above the " +
    "threshold once, ordered a<b; unrelated same-block pair drops") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dgo tonight"),
      (3L, "the quick brown cat zzz yyy xxx www vvv uuu ttt sss"))
      .toDF("doc_id", "text")
    val got = FuzzyJoin.jaroWinklerPairs(docs, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1, got.mkString(","))
    assert(got.head._1 == 1L && got.head._2 == 2L)
    assert(got.head._3 > 0.9 && got.head._3 < 1.0)
    intercept[IllegalArgumentException] {
      FuzzyJoin.jaroWinklerPairs(docs, minSim = 0.0)
    }
  }
}
