package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

class LmScoreSpec extends GraftSpec {
  import spark.implicits._

  // ref "a b a c": c12 = {ab:1, ba:1, ac:1}, c1 = {a:2, b:1}, V = 3
  private def refLm = LmScore.train(
    Seq((0L, "a b a c")).toDF("doc_id", "text"), "text")

  test("train derives contexts from bigrams and counts vocab at all positions") {
    val lm = refLm
    val bi = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("a", "c") -> 1L))
    val cx = lm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cx == Map("a" -> 2L, "b" -> 1L))
    // "c" appears only as a successor — vocab must still include it
    assert(lm.vocabSize == 3L)
  }

  test("score: hand-computed add-one probabilities, unseen words and contexts") {
    val docs = Seq(
      (1L, "a b"),    // p(b|a) = (1+1)/(2+3) = 0.4
      (2L, "a z"),    // unseen successor: (0+1)/(2+3) = 0.2
      (3L, "z q"),    // unseen context:   (0+1)/(0+3) = 1/3
      (4L, "a b a"),  // mean of -ln 0.4 and -ln 0.5
      (5L, "x"),      // single token: no bigrams → absent
      (6L, "")        // tokenless → absent
    ).toDF("doc_id", "text")
    val got = LmScore.score(docs, "doc_id", "text", refLm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> ((1L, 0.916291)),
      2L -> ((1L, 1.609438)),
      3L -> ((1L, 1.098612)),
      4L -> ((2L, 0.804719))))
  }

  test("screen keeps low-NLL docs, drops high-NLL and evidence-free docs") {
    val docs = Seq(
      (1L, "a b"), (2L, "a z"), (3L, "z q"), (4L, "a b a"), (5L, "x")
    ).toDF("doc_id", "text")
    val kept = LmScore.screen(docs, "doc_id", "text", refLm, maxNll = 1.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("reference text scores lower than shuffled-vocabulary junk on the fixture") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val lm = LmScore.train(docs.filter(col("source") === "src0"), "text")
    val scored = LmScore.score(docs, "doc_id", "text", lm)
    val refAvg = scored.join(docs.filter(col("source") === "src0"), Seq("doc_id"))
      .agg(avg("nll")).head().getDouble(0)
    // junk: reverse each word (mostly unseen vocab) — same lengths
    val junk = docs.limit(50).select(col("doc_id"),
      concat_ws(" ", transform(split(col("text"), " "), w => reverse(w))).as("text"))
    val junkAvg = LmScore.score(junk, "doc_id", "text", lm)
      .agg(avg("nll")).head().getDouble(0)
    assert(refAvg < junkAvg,
      s"reference nll $refAvg should beat junk nll $junkAvg")
  }

  test("saved model round-trips: loaded scores equal in-memory scores") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val lm = LmScore.train(docs.filter(col("source") === "src0"), "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    LmScore.saveModel(lm, dir)
    val loaded = LmScore.loadModel(spark, dir)
    assert(loaded.vocabSize == lm.vocabSize)
    def scores(m: LmScore.BigramLm) =
      LmScore.score(docs, "doc_id", "text", m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(scores(loaded) == scores(lm))
  }

  test("classify: label = argmin rounded NLL, ties to the smallest label") {
    val docs = Seq(
      (1L, "a b a b"),   // clearly model A's distribution
      (2L, "x y x y"),   // clearly model B's
      (3L, "q r")        // unseen by both → identical scores → tie → "A"
    ).toDF("doc_id", "text")
    val mA = LmScore.train(Seq((0L, "a b a b a b")).toDF("doc_id", "text"), "text")
    val mB = LmScore.train(Seq((0L, "x y x y x y")).toDF("doc_id", "text"), "text")
    val got = LmScore.classify(docs, "doc_id", "text", Map("B" -> mB, "A" -> mA))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "A", 2L -> "B", 3L -> "A"))
  }

  test("classify recovers the training source for in-distribution docs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    def lmOf(src: String) =
      LmScore.train(docs.filter(col("source") === src), "text")
    val got = LmScore.classify(docs, "doc_id", "text",
        Map("src0" -> lmOf("src0"), "src1" -> lmOf("src1")))
      .join(docs.select("doc_id", "source"), "doc_id")
    // perfect separation isn't expected on near-uniform synthetic text;
    // a model must at least prefer its own training docs on average
    val acc = got.filter(col("source").isin("src0", "src1"))
      .select(avg(when(col("label") === col("source"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    info(f"own-source recovery accuracy: $acc%.2f")
    assert(acc > 0.5)
  }

  test("empty-vocabulary model is rejected loudly") {
    val lm = LmScore.train(Seq((0L, "")).toDF("doc_id", "text"), "text")
    assert(lm.vocabSize == 0L)
    val e = intercept[IllegalArgumentException] {
      LmScore.score(Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", lm)
    }
    assert(e.getMessage.contains("empty-vocabulary"))
  }
}
