package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class DedupSpec extends GraftSpec {
  import spark.implicits._

  // doc 1 ~ doc 2 (one word changed of 12 → high shingle overlap),
  // doc 3 unrelated, doc 4 too short for 3-shingles, doc 5 == doc 1 exactly.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "the quick brown fox jumps over the lazy cat near the river"),
    (3L, "completely different words about spark catalyst codegen and shuffles"),
    (4L, "two words"),
    (5L, "the quick brown fox jumps over the lazy dog near the river")
  ).toDF("doc_id", "text")

  test("shingles: distinct word n-grams; short text yields empty set") {
    val r = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
    assert(r(1L).length == 10) // 12 tokens → 10 trigrams, all distinct here
    assert(r(1L).contains("the quick brown"))
    assert(r(4L).isEmpty)
  }

  test("near-dup pair detected; unrelated pair absent; exact dup jaccard = 1") {
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0)
    assert(pairs((1L, 5L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("dedup keeps least id of each group and is idempotent") {
    val survivors = Dedup.dedup(docs, "doc_id", "text", threshold = 0.5)
    val ids = survivors.select("doc_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 3L, 4L))) // 2 and 5 collapse into 1
    val again = Dedup.dedup(survivors, "doc_id", "text", threshold = 0.5)
    assert(again.select("doc_id").as[Long].collect().sorted.sameElements(ids))
  }

  test("skew guard: m identical docs cost 1 LSH row, not m²/2 candidates") {
    // 100 byte-identical docs plus two distinct ones. Without the
    // exact-dup collapse every band bucket holds all 100 and the self-join
    // emits 4950 candidate pairs; with it, LSH sees one representative per
    // distinct text, so the candidate stage must produce ZERO pairs (the
    // three texts share no shingles) while the OUTPUT still restores all
    // 4950 member pairs at jaccard exactly 1.
    val docs = (1L to 100L).map(i => (i, "the same boilerplate page body repeated verbatim across the crawl")) ++
      Seq((101L, "one unrelated document about catalyst optimizer internals here"),
          (102L, "another unrelated document describing shuffle partitioning strategy"))
    val df = docs.toDF("doc_id", "text")

    val reps = Dedup.representatives(df, "doc_id", "text")
    assert(reps.count() == 3)
    val shReps = reps.select($"id".as("doc_id"), Dedup.shingles($"text").as("sh"))
    assert(Dedup.candidatePairs(shReps, "doc_id", "sh").count() == 0)

    val out = Dedup.nearDuplicatePairs(df, "doc_id", "text", threshold = 0.6)
    assert(out.count() == 100L * 99L / 2L)
    assert(out.filter($"jaccard" =!= 1.0).count() == 0)
    // cross-group restoration: every member of the identical group pairs
    // with a near-dup of the representative, not only with the rep itself
    val docs2 = df.union(Seq(
      (103L, "the same boilerplate page body repeated verbatim across the crawl!")).toDF("doc_id", "text"))
    val out2 = Dedup.nearDuplicatePairs(docs2, "doc_id", "text", threshold = 0.5)
    assert(out2.filter($"b_id" === 103L).count() == 100) // 103 ~ every clone
  }

  test("materialize: parquet spill mode yields identical pairs and cleans up") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat_spec").toString
    val local = Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(_.toSeq).toSet
    spark.conf.set("spark.graft.materialize", "parquet")
    spark.conf.set("spark.graft.materialize.dir", dir)
    try {
      val spilled = Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
      assert(spilled.collect().map(_.toSeq).toSet == local)
      assert(new java.io.File(dir).listFiles().nonEmpty) // cuts actually spilled
      Materialize.release(spark)
      assert(new java.io.File(dir).listFiles().isEmpty)  // release deletes spills
    } finally {
      spark.conf.set("spark.graft.materialize", "local")
      spark.conf.unset("spark.graft.materialize.dir")
    }
  }

  test("candidate generation never cross-joins: pair count bounded by bands") {
    // 3 unrelated docs share no shingles — with no bucket collision there
    // must be zero candidates (probabilistic but astronomically safe).
    val distinctDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "red orange yellow green blue indigo violet")
    ).toDF("doc_id", "text")
    val sh = distinctDocs.select($"doc_id", Dedup.shingles($"text").as("sh"))
    assert(Dedup.candidatePairs(sh, "doc_id", "sh").count() == 0)
  }
}
