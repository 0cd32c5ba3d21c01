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

  test("shingles: surrounding whitespace is invisible — no phantom boundary shingles") {
    // split on \s+ keeps the empty token a leading/trailing run produces;
    // unfiltered, "a b c d " grows a phantom "c d " shingle and two docs
    // differing only in whitespace stop being exact near-dups
    val r = Seq(
      (1L, "a b c d"),
      (2L, "  a b c d \n"),
      (3L, " \t ") // whitespace-only: zero tokens, zero shingles
    ).toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1).toSet).toMap
    assert(r(1L) == Set("a b c", "b c d"))
    assert(r(2L) == r(1L))
    assert(r(3L).isEmpty)
    val pairs = Dedup.nearDuplicatePairs(
      Seq((1L, "a b c d e f"), (2L, "  a b c d e f \n")).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.9)
      .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Double]("jaccard")))
    assert(pairs.toSeq == Seq((1L, 1.0))) // whitespace twins ARE exact dups
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

  test("dedupTransitive: a chain collapses to one survivor") {
    // 1 ~ 3 and 2 ~ 3 at J = 0.8 (16 shared of 20 trigrams), 1 ≁ 2
    // (J = 14/22 ≈ 0.64 < 0.7). The middle doc has the LARGEST id, so the
    // one-hop rule (drop docs with a smaller-id near-dup) drops only 3 and
    // keeps both endpoints; connected components keep exactly the least id.
    val w = (1 to 24).map(i => f"w$i%02d")
    val chain = Seq(
      (1L, w.slice(0, 20).mkString(" ")),  // tokens w01..w20
      (2L, w.slice(4, 24).mkString(" ")),  // tokens w05..w24 (far end)
      (3L, w.slice(2, 22).mkString(" ")),  // tokens w03..w22 (middle)
      (4L, "entirely unrelated text about broadcast joins and partition pruning")
    ).toDF("doc_id", "text")

    val pairs = Dedup.nearDuplicatePairs(chain, "doc_id", "text", threshold = 0.7)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L), (2L, 3L))) // chain edges only

    val oneHop = Dedup.dedup(chain, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted
    assert(oneHop.sameElements(Array(1L, 2L, 4L))) // per-edge: both endpoints

    val cc = Dedup.dedupTransitive(chain, "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted
    assert(cc.sameElements(Array(1L, 4L))) // one survivor per component
  }

  test("clusterLabels: every row gets its component's min id — exact " +
    "copies inherit the text group's rep, chains collapse, singletons " +
    "and NULL-text rows label themselves") {
    val w = (1 to 24).map(i => f"w$i%02d")
    val docs = Seq(
      (1L, Some(w.slice(0, 20).mkString(" "))), // chain end
      (2L, Some(w.slice(4, 24).mkString(" "))), // chain far end
      (3L, Some(w.slice(2, 22).mkString(" "))), // chain middle
      (4L, Some("entirely unrelated text about broadcast joins here")),
      (5L, Some(w.slice(0, 20).mkString(" "))), // byte-identical to 1
      (6L, Option.empty[String]) // unhashable
    ).toDF("doc_id", "text")
    val got = Dedup.clusterLabels(docs, "doc_id", "text", threshold = 0.7)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L),
      (5L, 1L), (6L, 6L)), got.toString)
  }

  test("dedupIncremental: exact copies and near-dups of the corpus drop; fresh and short docs survive") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      (11L, "completely different words about spark catalyst codegen and shuffles")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // byte-identical to corpus 10 → exact-stage drop
      (20L, "the quick brown fox jumps over the lazy dog near the river"),
      // near-dup of corpus 10 (one word changed) → near-stage drop
      (21L, "the quick brown fox jumps over the lazy cat near the river"),
      // fresh content → survives
      (22L, "a wholly novel document mentioning watermarks state stores and sinks"),
      // batch-internal duplicates of fresh content: BOTH survive —
      // within-batch dedup is dedup()'s job, not the incremental screen's
      (23L, "another new text that resembles nothing in the settled corpus today"),
      (24L, "another new text that resembles nothing in the settled corpus today"),
      // too short to shingle → no near check possible → survives
      (25L, "two words")
    ).toDF("doc_id", "text")

    val out = Dedup.dedupIncremental(batch, corpus, "doc_id", "text",
      threshold = 0.5)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(22L, 23L, 24L, 25L))

    // one-sided: the corpus itself is never touched, and re-screening the
    // survivors is a no-op (idempotent by construction)
    val again = Dedup.dedupIncremental(out, corpus, "doc_id", "text",
      threshold = 0.5)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(22L, 23L, 24L, 25L))
  }

  test("dedupIncrementalIndexed: index-fed screen ≡ self-contained; append ≡ from-scratch rebuild") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      (11L, "completely different words about spark catalyst codegen and shuffles"),
      (12L, "so short") // un-shingleable corpus text: ghash-only index row
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river"), // exact drop
      (21L, "the quick brown fox jumps over the lazy cat near the river"), // near drop
      (22L, "a wholly novel document mentioning watermarks state stores and sinks"),
      (25L, "two words") // un-shingleable fresh text: survives, indexed by hash
    ).toDF("doc_id", "text")

    // the index screens identically to deriving the corpus side in place
    val index = Dedup.buildDedupIndex(corpus, "doc_id", "text")
    val r = Dedup.dedupIncrementalIndexed(batch, index, "doc_id", "text", threshold = 0.5)
    val selfContained = Dedup.dedupIncremental(batch, corpus, "doc_id", "text", threshold = 0.5)
    assert(r.accepted.select("doc_id").as[Long].collect().sorted.toSeq == Seq(22L, 25L))
    assert(selfContained.select("doc_id").as[Long].collect().sorted.toSeq == Seq(22L, 25L))

    // index ∪ indexAppend is EXACTLY a from-scratch build over
    // corpus ∪ accepted — the append loop never diverges from rebuild
    val appended = DedupIndexRows(index) ++ DedupIndexRows(r.indexAppend)
    val rebuilt = DedupIndexRows(Dedup.buildDedupIndex(
      corpus.unionAll(r.accepted), "doc_id", "text"))
    assert(appended == rebuilt)
    // the short fresh text is in the append (hash-only, NULL signature):
    // tomorrow's exact stage must see it
    assert(DedupIndexRows(r.indexAppend)
      .exists { case (_, sh, sig) => sh.isEmpty && sig.isEmpty })

    // screening the same batch against the grown index drops everything —
    // exact copies of what was just accepted never re-enter
    val again = Dedup.dedupIncrementalIndexed(
      batch, index.unionAll(r.indexAppend), "doc_id", "text", threshold = 0.5)
    assert(again.accepted.count() == 0)
  }

  test("dedup index: parquet roundtrip screens identically (the persisted form)") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      (11L, "completely different words about spark catalyst codegen and shuffles")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (21L, "the quick brown fox jumps over the lazy cat near the river"),
      (22L, "a wholly novel document mentioning watermarks state stores and sinks")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
    Dedup.buildDedupIndex(corpus, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val r = Dedup.dedupIncrementalIndexed(
      batch, spark.read.parquet(dir), "doc_id", "text", threshold = 0.5)
    assert(r.accepted.select("doc_id").as[Long].collect().toSeq == Seq(22L))
    // the daily loop: append the accepted rows' index, re-read, re-screen
    r.indexAppend.write.mode("append").parquet(dir)
    val again = Dedup.dedupIncrementalIndexed(
      batch, spark.read.parquet(dir), "doc_id", "text", threshold = 0.5)
    assert(again.accepted.count() == 0)
  }

  test("bucketed band-bucket table: same screen result, corpus side never shuffles") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      (11L, "completely different words about spark catalyst codegen and shuffles"),
      (12L, "a third corpus text mentioning broadcast joins and partition pruning")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (21L, "the quick brown fox jumps over the lazy cat near the river"), // near drop
      (22L, "a wholly novel document mentioning watermarks state stores and sinks")
    ).toDF("doc_id", "text")
    val index = Dedup.buildDedupIndex(corpus, "doc_id", "text")
    try {
      Dedup.stageDedupBuckets(index, "graft_dedup_bk", numBuckets = 4)

      // the pre-bucketed corpus side screens identically
      val viaBuckets = Dedup.dedupIncrementalIndexed(
        batch, index, "doc_id", "text", threshold = 0.5,
        corpusBuckets = Some(spark.table("graft_dedup_bk")))
      assert(viaBuckets.accepted.select("doc_id").as[Long].collect().toSeq
        == Seq(22L))

      // plan shape of the candidate join, broadcast off: exactly ONE hash
      // Exchange (the batch side) — the bucketed corpus scan satisfies the
      // join's partitioning itself, plus the distinct's own exchange
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val bBk = Dedup.bandBuckets(
            index.filter(col("sig").isNotNull), "ghash", "sig", 16, 2)
          .select(col("ghash").as("b_gh"), col("band"), col("bucket"))
        val cBk = spark.table("graft_dedup_bk")
          .select(col("ghash").as("c_gh"), col("band"), col("bucket"))
        val p = Dedup.candidateGhPairs(bBk, cBk)
          .queryExecution.executedPlan.toString
        // band-keyed exchanges only: the distinct's (b_gh, c_gh) exchange
        // is candidate-sized and out of scope here
        val exchanges = "Exchange hashpartitioning\\(band"
          .r.findAllIn(p).size
        assert(exchanges == 1, s"corpus side shuffled:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

      // the maintenance loop's append half: bucket rows of the accepted
      // batch append into the same table (bucket spec verified by Spark),
      // and re-screening the batch against the grown index + grown bucket
      // table drops everything
      val r = Dedup.dedupIncrementalIndexed(
        batch, index, "doc_id", "text", threshold = 0.5)
      Dedup.stageDedupBuckets(r.indexAppend, "graft_dedup_bk",
        numBuckets = 4, append = true)
      val again = Dedup.dedupIncrementalIndexed(
        batch, index.unionAll(r.indexAppend), "doc_id", "text", threshold = 0.5,
        corpusBuckets = Some(spark.table("graft_dedup_bk")))
      assert(again.accepted.count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_dedup_bk")
  }

  test("maintenance loop: 3 append cycles + maintainDedupIndex — screen identical, files bounded") {
    val corpus = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_maint").toString
    def parquetFiles(p: String): Int = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(hp).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }
    try {
      Dedup.buildDedupIndex(corpus.filter(col("doc_id") % 4 === 0), "doc_id", "text")
        .write.mode("overwrite").parquet(dir)
      Dedup.stageDedupBuckets(spark.read.parquet(dir), "graft_maint_bk", numBuckets = 4)
      // three daily cycles: screen, append index rows, append bucket rows
      for (i <- 1 to 3) {
        val r = Dedup.dedupIncrementalIndexed(
          corpus.filter(col("doc_id") % 4 === i), spark.read.parquet(dir),
          "doc_id", "text", threshold = 0.6)
        r.indexAppend.write.mode("append").parquet(dir)
        Dedup.stageDedupBuckets(r.indexAppend, "graft_maint_bk",
          numBuckets = 4, append = true)
      }
      val probe = corpus.filter(col("doc_id") % 97 === 3)
      def screen(): Seq[Long] = Dedup.dedupIncrementalIndexed(
          probe, spark.read.parquet(dir), "doc_id", "text", threshold = 0.6,
          corpusBuckets = Some(spark.table("graft_maint_bk")))
        .accepted.select("doc_id").as[Long].collect().toSeq.sorted
      val before = screen()
      val filesBefore = parquetFiles(dir)
      assert(filesBefore > 1, "appends should have accreted files")

      val stat = Dedup.maintainDedupIndex(spark, dir,
        bucketTable = Some("graft_maint_bk"), numBuckets = 4)
      assert(stat.nonEmpty, "maintenance should have compacted the index dir")
      // toy index is far under one target file — compaction lands on 1
      assert(parquetFiles(dir) == 1, s"index files: ${parquetFiles(dir)}")
      // bucket table re-staged whole: back to ≤ 1 file per bucket
      val tableDir = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_maint_bk"))
        .location.getPath
      assert(parquetFiles(tableDir) <= 4, s"bucket files: ${parquetFiles(tableDir)}")
      // the screen is byte-identical through the swap
      assert(screen() == before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_maint_bk")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("components: labels converge to the component minimum") {
    // two components: a 4-chain 10-11-12-13 (needs >1 round) and a pair
    val pairs = Seq((11L, 10L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("a_id", "b_id")
    val comp = Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("components: a 14-hop chain converges under the default cap, throws under a tight one") {
    // path graph 0-1-2-…-14: node 14 is 14 hops from the component minimum,
    // so min-label propagation needs 14 rounds (+1 to observe the fixpoint).
    val chain = (0L until 14L).map(i => (i, i + 1)).toDF("a_id", "b_id")

    val ok = Dedup.componentsResult(chain) // default maxIters
    assert(ok.converged && ok.residual == 0L)
    assert(ok.rounds >= 14)
    val labels = ok.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 15 && labels.values.forall(_ == 0L))
    assert(Dedup.lastComponentsRounds.get() == ok.rounds)

    // capped run: never silent — componentsResult reports the residual, and
    // its partial labels are conservative (split, never wrongly merged) …
    val capped = Dedup.componentsResult(chain, maxIters = 5)
    assert(!capped.converged && capped.residual > 0L && capped.rounds == 5)
    val partial = capped.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial.forall { case (id, c) => c <= id }) // labels only move down

    // … while the strict entry point throws instead of under-deduping
    val e = intercept[IllegalStateException](Dedup.components(chain, maxIters = 5))
    assert(e.getMessage.contains("did not converge"))
  }

  test("components: a fixpoint reached exactly in the last allowed round converges") {
    // 5-edge path: node 5 is 5 hops from the minimum, so round 5 (the cap)
    // makes the final label move. That is indistinguishable from a capped
    // stop without the probe round — the result must be converged, not a
    // spurious throw.
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val r = Dedup.componentsResult(chain, maxIters = 5)
    assert(r.converged && r.rounds == 5)
    assert(r.labels.collect().map(_.getLong(1)).forall(_ == 0L))
    assert(Dedup.components(chain, maxIters = 5).count() == 6) // no throw
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

  test("repairPreFixShingles: stale persisted rows equal a post-fix rebuild; clean rows untouched") {
    // hand-written PRE-FIX shingle sets: the old shingler kept the empty
    // token a leading/trailing whitespace run produces, so padded texts
    // persisted phantom boundary windows (the extra space inside them)
    val padded = Seq(
      (1L, "alpha beta gamma delta ",
        Seq("alpha beta gamma", "beta gamma delta", "gamma delta ")),
      (2L, " epsilon zeta eta theta",
        Seq(" epsilon zeta", "epsilon zeta eta", "zeta eta theta")),
      (3L, "iota kappa lambda mu", // clean: no padding, no phantoms
        Seq("iota kappa lambda", "kappa lambda mu")),
      (4L, "solo word ", // repaired set empties: below the n-token floor
        Seq("solo word "))
    ).toDF("doc_id", "text", "sh")
    val oldIdx = padded.select(
        md5($"text".cast("binary")).as("ghash"), $"sh")
      .withColumn("sig",
        when(size($"sh") > 0, Dedup.minhashSignature($"sh", 32)))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("ghash", "sh", "sig").collect().map { r =>
        (r.getString(0), r.getSeq[String](1).sorted,
          Option(r.getSeq[Long](2)).map(_.toList))
      }.toSet

    // repairing what the old shingler persisted must land EXACTLY on what
    // the current shingler would build from the same texts — same phantom
    // windows dropped, same re-signed signatures, same empty-set NULL sig
    assert(rows(Dedup.repairPreFixShingles(oldIdx)) ==
      rows(Dedup.buildDedupIndex(padded.select("doc_id", "text"), "doc_id", "text")))
  }

  test("containmentPairs: a quoted paragraph scores ~1 on its side with " +
    "tiny jaccard; hot shingles alone never form a candidate; verify " +
    "is exact on full sets") {
    val quote = "alpha beta gamma delta epsilon zeta"      // 4 shingles
    val long = ("intro words here now " + quote +
      " trailing tail of much longer body text continues onward " +
      "with many extra unique tokens appended further still")
    // docs 3/4 share ONLY a ubiquitous shingle ("the same thing" in
    // every filler doc below) that exceeds maxDf=2 -> no candidate
    val filler = (10L until 16L).map(i =>
      (i, s"the same thing unique$i word$i"))
    val docs = (Seq((1L, quote), (2L, long)) ++ filler)
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.5, n = 3, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set((1L, 2L)), got)
    val (nc, na, nb, cab, cba) = got((1L, 2L))
    assert(na == 4L && nc == 4L && cab == 1.0,
      "every quote shingle appears in the long doc")
    assert(nb > 4L && cba < 0.5, "the long doc is NOT contained")
    // jaccard would have missed this pair at any threshold >= 0.5
    assert(nc.toDouble / (na + nb - nc) < 0.5)
    // orientation: a_id < b_id always
    assert(got.keySet.forall { case (a, b) => a < b })
  }

  test("containment screen laws: probe==index reproduces self-contained " +
    "pairs; index append == rebuild; batch screen never recomputes " +
    "historical pairs") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val long = ("intro words here now " + quote +
      " trailing tail of much longer body text continues onward")
    val older = Seq((1L, quote), (2L, long),
      (3L, "other unrelated stuff entirely here today"))
    val fresh = Seq((10L, "alpha beta gamma delta epsilon zeta pad pad"))
    val all = (older ++ fresh).toDF("doc_id", "text")
    val olderDf = older.toDF("doc_id", "text")
    val freshDf = fresh.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    // law 1: probe == index docs => self-contained pairs, exactly
    val idx = Dedup.buildContainmentIndex(all, "doc_id", "text")
    assert(rows(Dedup.containmentScreenIndexed(all, idx,
        "doc_id", "text", 0.5, maxDf = 2)) ==
      rows(Dedup.containmentPairs(all, "doc_id", "text", 0.5, maxDf = 2)))

    // law 2: per-doc-local postings => append == rebuild
    assert(rows(Dedup.buildContainmentIndex(olderDf, "doc_id", "text")
        .unionByName(Dedup.buildContainmentIndex(freshDf,
          "doc_id", "text"))) ==
      rows(idx))

    // law 3: screening only the fresh batch returns exactly the full
    // run's pairs that involve a fresh doc — no historical (1,2) pair
    val oldIdx = Dedup.buildContainmentIndex(olderDf, "doc_id", "text")
    // maxDf = 3: the quote shingles sit in docs 1, 2 AND 10 (df = 3)
    val screened = rows(Dedup.containmentScreenIndexed(freshDf, oldIdx,
      "doc_id", "text", 0.5, maxDf = 3))
    val full = Dedup.containmentPairs(all, "doc_id", "text", 0.5,
      maxDf = 3)
    assert(screened == rows(full.filter(
      col("a_id") === 10L || col("b_id") === 10L)))
    assert(screened.nonEmpty, "fixture must exercise the screen")
  }

  test("dedupParagraphs: globally-first occurrence survives, rebuilt " +
      "in order; within-doc and cross-doc repeats both removed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A\n\nB\n\nA"),   // trailing A repeats within the doc
      (2L, "B\n\nC"),        // B already seen in doc 1
      (3L, "D"),
      (4L, "A\n\nB")         // every paragraph seen before → ""
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((3L, 2L, "A\n\nB")))
    assert(out(2L) == ((2L, 1L, "C")))
    assert(out(3L) == ((1L, 1L, "D")))
    assert(out(4L) == ((2L, 0L, "")))

    // idempotent: a second pass keeps everything that survived
    val again = Dedup.dedupParagraphs(
        Dedup.dedupParagraphs(docs, "doc_id", "text")
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again == Map(1L -> "A\n\nB", 2L -> "C", 3L -> "D"))

    // repartition-invariant (first = least (id, pos), not arrival order)
    val shuffled = Dedup.dedupParagraphs(
        docs.repartition(5), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(shuffled == out)
  }

  test("paragraph index: merge ≡ from-scratch; indexed screen ≡ " +
      "full-corpus dedup restricted to the batch (history ids first)") {
    import spark.implicits._
    val history = Seq(
      (1L, "A\n\nB"),
      (2L, "B\n\nC")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "C\n\nX\n\nX"),   // C seen in history; X fresh, repeated
      (11L, "X\n\nY"),        // X taken by doc 10; Y fresh
      (12L, "A\n\nB")         // nothing survives
    ).toDF("doc_id", "text")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

    // merge law
    val mergedIdx = Dedup.mergeParagraphIndexes(
      Dedup.buildParagraphIndex(history, "doc_id", "text"),
      Dedup.buildParagraphIndex(batch, "doc_id", "text"))
    val fullIdx = Dedup.buildParagraphIndex(
      history.unionByName(batch), "doc_id", "text")
    assert(mergedIdx.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getInt(2))).toSet ==
      fullIdx.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getInt(2))).toSet)

    // screen law
    val screened = rows(Dedup.dedupParagraphsIndexed(batch,
      Dedup.buildParagraphIndex(history, "doc_id", "text"),
      "doc_id", "text"))
    val full = rows(Dedup.dedupParagraphs(
        history.unionByName(batch), "doc_id", "text")
      .filter(col("doc_id") >= 10L))
    assert(screened == full)
    assert(screened == Set(
      (10L, 3L, 1L, "X"),
      (11L, 2L, 1L, "Y"),
      (12L, 2L, 0L, "")))
  }

  test("graft_shingles equals the HOF twin ELEMENT-FOR-ELEMENT (order " +
      "included) on fuzzed unicode text, whitespace runs, short texts " +
      "and repeated windows, for n = 1..4") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5419)
    val words = Seq("the", "cat", "sat", "\u00e9t\u00e9", "\u4e2d\u6587", "a", "BB",
      "x1", "", " ", "CAT", "Tab\u00dc")
    val ws = Seq(" ", "  ", "\t", "\n", " \t ")
    val texts = (1 to 400).map { i =>
      val k = rnd.nextInt(12)
      val body = (0 to k).map(_ => words(rnd.nextInt(words.size)))
        .mkString(ws(rnd.nextInt(ws.size)))
      if (i % 7 == 0) ws(rnd.nextInt(ws.size)) + body else body
    } ++ Seq("", " ", "one", "one two", "a a a a a a", "A b A b A b",
      "\u4e2d \u6587 \u4e2d \u6587")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    (1 to 4).foreach { n =>
      val got = df.select(col("id"),
          Dedup.shingles(col("text"), n).as("a"),
          Dedup.shinglesHof(col("text"), n).as("b"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)} text=${texts(r.getLong(0).toInt)}: " +
            s"native=${r.getSeq[String](1)} hof=${r.getSeq[String](2)}")
      }
    }
    // null text: both null
    val nulls = Seq((0L, null: String)).toDF("id", "text")
      .select(Dedup.shingles(col("text"), 3).as("a"),
        Dedup.shinglesHof(col("text"), 3).as("b"))
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }
}
