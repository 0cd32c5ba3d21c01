package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class ContaminationSpec extends GraftSpec {
  import spark.implicits._

  // 10-word docs → 6 distinct 5-gram shingles each (all words distinct)
  private val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  // shares the first 9 words with benchText → shingles 1..5 of 6 overlap
  private val partialText = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
  private val cleanText = "one two three four five six seven eight nine ten"

  test("contamination: exact overlap fractions against the benchmark set") {
    val corpus = Seq(
      (1L, benchText),   // fully contained in the benchmark → 6/6
      (2L, partialText), // 5 of its 6 shingles are benchmark shingles
      (3L, cleanText),   // no overlap
      (4L, "too few words here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")

    val r = Contamination.contamination(corpus, bench, "doc_id", "text")
      .collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_shingles"), x.getAs[Long]("n_contaminated"),
          x.getAs[Double]("contamination")))
      .toMap
    assert(r(1L) == (6L, 6L, 1.0))
    assert(r(2L) == (6L, 5L, 5.0 / 6.0))
    assert(r(3L) == (6L, 0L, 0.0))
    assert(!r.contains(4L)) // <5 tokens → no shingles → absent, not 0/0
  }

  test("bloom-pruned path: identical exact output to the broadcast-join path") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val direct = Contamination.contamination(corpus, bench, "doc_id", "text")
    val bloom = Contamination.contaminationBloom(corpus, bench, "doc_id", "text")
    assert(direct.count() > 0)
    assert(bloom.count() == direct.count(), "bloom path dropped/added docs")
    assert(direct.unionAll(bloom).distinct().count() == direct.count(),
      "bloom path diverged from the exact path on some doc")
    // the subquery carrier is catalog-free: repeated calls must leave NO
    // per-call temp view behind (the r13 advice — the old
    // graft_bloom_carrier_N views accumulated for the session's lifetime)
    assert(!spark.catalog.listTables().collect()
        .exists(_.name.startsWith("graft_bloom_carrier")),
      "bloom carrier leaked a temp view into the session catalog")
  }

  test("bloom prune keeps per-doc totals: a clean doc still reports all shingles") {
    val corpus = Seq((1L, cleanText), (2L, partialText)).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val r = Contamination.contaminationBloom(corpus, bench, "doc_id", "text")
      .collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_shingles"), x.getAs[Long]("n_contaminated")))
      .toMap
    assert(r(1L) == (6L, 0L)) // zero bloom hits must not drop the doc
    assert(r(2L) == (6L, 5L))
  }

  test("plan: benchmark side broadcasts; corpus never joins all-pairs") {
    val corpus = (1L to 50L).map(i => (i, s"$cleanText word$i")).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val p = Contamination.contamination(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("multiContamination: per-benchmark attribution on one denominator; " +
    "clean pairs absent") {
    val corpus = Seq(
      (1L, benchText),   // fully in bench A; 5/6 of it also in bench B
      (2L, partialText), // 5/6 in A, 6/6 in B (B IS partialText)
      (3L, cleanText)
    ).toDF("doc_id", "text")
    val benches = Seq(("A", benchText), ("B", partialText))
      .toDF("bench", "text")
    val r = Contamination.multiContamination(
        corpus, benches, "doc_id", "text", "bench")
      .collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("bench")) ->
        ((x.getAs[Long]("n_shingles"), x.getAs[Long]("n_contaminated"),
          x.getAs[Double]("contamination"))))
      .toMap
    assert(r((1L, "A")) == ((6L, 6L, 1.0)))
    assert(r((1L, "B")) == ((6L, 5L, 5.0 / 6.0)))
    assert(r((2L, "A")) == ((6L, 5L, 5.0 / 6.0)))
    assert(r((2L, "B")) == ((6L, 6L, 1.0)))
    assert(!r.keySet.exists(_._1 == 3L)) // clean doc: no rows at all
  }

  test("multiContamination with a single benchmark equals the hit rows " +
    "of the single-benchmark screen") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val single = Contamination.contamination(corpus, bench, "doc_id", "text")
      .filter(col("n_contaminated") > 0)
      .select("doc_id", "n_shingles", "n_contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val multi = Contamination.multiContamination(corpus,
        bench.select(lit("only").as("bench"), col("text")),
        "doc_id", "text", "bench")
      .select("doc_id", "n_shingles", "n_contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(multi == single)
    assert(multi.nonEmpty)
  }
}
