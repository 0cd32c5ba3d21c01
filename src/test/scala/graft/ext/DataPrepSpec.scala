package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class DataPrepSpec extends GraftSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val goodDup = "the quick brown fox jumps over the lazy cat near the river bank today"
  private val spam = Seq.fill(30)("buy now").mkString(" ") // one bigram 30×
  private val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val other = "completely different words about spark catalyst codegen and shuffles here"

  test("prepare: dedups, filters spam, decontaminates, quotas, packs") {
    val docs = Seq(
      (1L, good, "en"),
      (2L, goodDup, "en"),   // near-dup of 1 → dropped by the dedup stage
      (3L, spam, "en"),      // top bigram "buy now" ×30, dupWordFrac ≈ 0.97 → filtered
      (4L, benchText, "en"), // fully contaminated vs bench → dropped
      (5L, other, "es")
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")

    val out = DataPrep.prepare(docs, bench,
      config = DataPrep.Config(
        dedupThreshold = 0.5, minQuality = 0.1, maxDupWordFrac = 0.5,
        contaminationCap = 0.5, perStratumQuota = Some(10),
        contextLen = 10L, shards = 2))
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("lang"), r.getAs[Long]("rk"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"))).toMap

    assert(rows.keySet == Set(1L, 5L))
    assert(rows(1L)._2 == 1L && rows(5L)._2 == 1L)  // rank 1 in each stratum
    assert(rows(1L)._3 == 1L && rows(5L)._3 == 1L)  // shard = id % 2, both odd
    assert(rows(1L)._4 == 14L)                      // token count carried
    // same shard, packed sequentially: doc 1 opens bin 0; its 14 tokens
    // push doc 5's start past the 10-token context → bin 1
    assert(rows(1L)._5 == 0L && rows(5L)._5 == 1L)
  }

  test("prepare: the optional LM gate drops out-of-distribution docs, " +
    "leaves everything else identical") {
    val docs = Seq(
      (1L, good, "en"),
      (5L, other, "es"),
      // junk the surface filters pass but a reference LM rejects:
      // plausible lengths, unseen vocabulary
      (9L, "zxq wvu tsr qpo nml kji hgf edc bax zyw vut srq pon mlk", "en")
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    // model trained on the in-distribution docs only
    val lm = LmScore.train(Seq((0L, good), (1L, other)).toDF("doc_id", "text"), "text")
    val base = DataPrep.Config(minQuality = 0.1, contextLen = 10L, shards = 2)

    val without = DataPrep.prepare(docs, bench, config = base)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(without == Seq(1L, 5L, 9L)) // surface filters pass the junk

    val nll9 = LmScore.score(docs, "doc_id", "text", lm)
      .filter(col("doc_id") === 9L).head().getDouble(2)
    val nllGood = LmScore.score(docs, "doc_id", "text", lm)
      .filter(col("doc_id") === 1L).head().getDouble(2)
    assert(nllGood < nll9)
    val cap = (nllGood + nll9) / 2
    val withLm = DataPrep.prepare(docs, bench,
        config = base.copy(lmFilter = Some((lm, cap))))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(withLm == Seq(1L, 5L))
  }

  test("buildEpoch: same (rates, salt) is byte-identical; a new salt " +
    "re-permutes without resampling") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    def epoch(salt: String) = DataPrep.buildEpoch(docs, "doc_id", "text",
        "source", rates = Map("src0" -> 1.0, "src1" -> 0.5),
        defaultRate = 0.2, salt = salt, contextLen = 256L, shards = 4)
      .select("doc_id", "shard", "tok_offset", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val e1a = epoch("epoch1"); val e1b = epoch("epoch1"); val e2 = epoch("epoch2")
    assert(e1a.toSeq.sorted == e1b.toSeq.sorted)        // reproducible
    val ids1 = e1a.map(_._1).toSet; val ids2 = e2.map(_._1).toSet
    assert(ids1 == ids2)                                // same sampled set
    // shard layout is id-derived → stable across salts; the ORDER inside
    // each shard (hence offsets) changes
    assert(e1a.map(x => x._1 -> x._2).toMap == e2.map(x => x._1 -> x._2).toMap)
    assert(e1a.map(x => x._1 -> x._3).toMap != e2.map(x => x._1 -> x._3).toMap)
    // each shard's stream is gapless: offsets are a prefix sum
    val byShard = e1a.groupBy(_._2)
    byShard.values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 == 0L)
    }
  }

  test("prepare: a contaminated canonical survivor cannot take its clean near-dup down") {
    // X (least id) embeds the benchmark text verbatim → contaminated above
    // the cap; Y is X with one benchmark word changed → its 5-gram overlap
    // collapses (every gram through that position differs) while its
    // trigram Jaccard with X stays ≥ 0.6. Were dedup to run FIRST, Y would
    // be suppressed as X's duplicate and X then dropped as contaminated —
    // the whole group gone. Decontamination-before-dedup ships Y.
    val benchWords = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tail = "river bank sunset horizon meadow forest"
    val docs = Seq(
      (1L, s"$benchWords $tail", "en"),
      (2L, s"${benchWords.replace("epsilon", "zulu")} $tail", "en")
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((100L, benchWords)).toDF("doc_id", "text")

    val out = DataPrep.prepare(docs, bench,
        config = DataPrep.Config(
          dedupThreshold = 0.6, minQuality = 0.0, maxDupWordFrac = 1.0,
          maxTopBigram = 100L, contaminationCap = 0.4,
          contextLen = 100L, shards = 2))
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(2L), s"clean near-dup lost: $out")
  }

  test("prepare: maskEmails scrubs text before any downstream stage sees it") {
    val docs = Seq(
      (1L, s"$good write to someone@example.com for details", "en")
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = DataPrep.prepare(docs, bench,
      config = DataPrep.Config(maskEmails = true,
        minQuality = 0.0, maxDupWordFrac = 1.0, maxTopBigram = 100L,
        contextLen = 100L, shards = 2))
    val text = out.collect()(0).getAs[String]("text")
    assert(text.contains("<email>") && !text.contains("someone@example.com"))
  }

  test("prepare: the boilerplate stage strips BEFORE every stat — a doc " +
    "whose template padding would fail the repetition gate survives " +
    "once stripped") {
    // each doc: unique content line + the same 12-line nav block; with
    // the template in place dupWordFrac ≈ 1 → the repetition gate would
    // kill every doc. Stripped first, content is clean and passes.
    val nav = (1 to 12).map(i => "nav menu item here").mkString("\n")
    val docs = (1L to 6L)
      .map(i => (i, s"${(1 to 9).map(j => s"w$i-$j").mkString(" ")}\n$nav", "en"))
      .toDF("doc_id", "text", "lang")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val cfg = DataPrep.Config(maxDupWordFrac = 0.5, minQuality = 0.0,
      contextLen = 100L, shards = 2,
      boilerplate = Some(("lang", 4L)))
    val out = DataPrep.prepare(docs, bench, config = cfg)
    assert(out.count() == 6L, "stripped docs must pass the repetition gate")
    // the packed text the corpus ships carries NO template line
    assert(out.filter(col("text").contains("nav menu")).count() == 0L)
    // and without the stage, the template rightly kills everything —
    // proving the ordering is doing the work
    assert(DataPrep.prepare(docs, bench,
      config = cfg.copy(boilerplate = None)).count() == 0L)
  }

  test("prepare: per-stratum quota bounds the output deterministically") {
    // per-doc texts share NO tokens (a common template would make them
    // genuine near-dups at trigram level and dedup would rightly collapse
    // them — this test is about the quota, not the dedup)
    val docs = (1L to 40L)
      .map(i => (i, (1 to 8).map(j => s"w$i-$j").mkString(" "),
        if (i % 2 == 0) "en" else "es"))
      .toDF("doc_id", "text", "lang")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val cfg = DataPrep.Config(perStratumQuota = Some(3), contextLen = 10L, shards = 2)

    val a = DataPrep.prepare(docs, bench, config = cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a.size == 6) // 3 per language
    // reproducible on a reshuffled input — the whole point of hash order
    val b = DataPrep.prepare(docs.repartition(7), bench, config = cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("filterFunnel: first-fail attribution, cumulative survivors, " +
      "NULL rule value = fail, rules with zero marginal removals") {
    val docs = Seq(
      (1L, Some(10), true),  // passes both
      (2L, Some(1), true),   // fails rule 1 only
      (3L, Some(1), false),  // fails 1 AND 2 → booked against 1
      (4L, Some(10), false), // fails rule 2 only
      (5L, None, true)       // NULL rule-1 value → fails 1
    ).toDF("id", "n", "flag")
    val out = DataPrep.filterFunnel(docs, Seq(
        "n_at_least_5" -> (col("n") >= 5),
        "flag_set" -> col("flag"),
        "always_true" -> lit(true)))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, "n_at_least_5", 3L, 2L),  // ids 2,3,5 fail here → 2 remain
      (2L, "flag_set", 1L, 1L),      // id 4 → 1 remains
      (3L, "always_true", 0L, 1L)))  // dead-weight rule: marginal 0
    // sum of marginals + final survivors == corpus
    assert(out.map(_._3).sum + out.last._4 == 5L)
  }

  test("filterFunnel: one corpus aggregation, window only over the " +
      "rules-sized census") {
    val docs = (1 to 50).map(i => (i.toLong, i)).toDF("id", "n")
    val out = DataPrep.filterFunnel(docs,
      Seq("r1" -> (col("n") % 2 === 0), "r2" -> (col("n") > 10)))
    val plan = out.queryExecution.executedPlan.toString
    // the corpus contributes exactly one partial+final aggregate pair
    // (the census); everything after is rules-sized
    assert(plan.contains("HashAggregate"))
    assert(out.collect().map(_.getLong(2)).sum == 25L + 5L) // odds; ≤10 evens
    require(DataPrep.filterFunnel(docs, Seq("r" -> lit(true)))
      .collect().head.getLong(3) == 50L)
    intercept[IllegalArgumentException] {
      DataPrep.filterFunnel(docs, Seq.empty)
    }
  }

  test("mergeFunnels: disjoint-shard censuses fold to the whole-corpus " +
      "funnel (marginals and survivors are both additive)") {
    val docs = (1 to 60).map(i => (i.toLong, i)).toDF("id", "n")
    val rules = Seq("r1" -> (col("n") % 3 =!= 0), "r2" -> (col("n") > 6))
    val whole = DataPrep.filterFunnel(docs, rules)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val merged = DataPrep.mergeFunnels(
        DataPrep.filterFunnel(docs.filter(col("id") % 2 === 0), rules)
          .unionByName(
            DataPrep.filterFunnel(docs.filter(col("id") % 2 === 1), rules)))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(merged == whole)
  }
}
