package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

class SpanDedupSpec extends GraftSpec {
  import spark.implicits._

  private val span = 3

  test("tokenWindows emits every 1-based window; short docs emit none") {
    val docs = Seq(
      (1L, "a b c d"),      // windows at pos 1, 2
      (2L, "a b c"),        // exactly one window
      (3L, "a b"),          // shorter than span → none
      (4L, "")              // tokenless → none
    ).toDF("doc_id", "text")
    val wins = SpanDedup.tokenWindows(docs, "doc_id", "text", span)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(wins.count(_._1 == 1L) == 2)
    assert(wins.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(wins.count(_._1 == 2L) == 1)
    assert(!wins.exists(w => w._1 == 3L || w._1 == 4L))
    // identical window text → identical key, across documents
    val k1 = wins.find(w => w._1 == 1L && w._2 == 1L).get._3
    val k2 = wins.find(w => w._1 == 2L).get._3
    assert(k1 == k2) // both are md5("a b c")
  }

  test("duplicatedSpans requires distinct documents, not repeats within one") {
    val docs = Seq(
      (1L, "x y z q x y z"), // "x y z" twice WITHIN doc 1 only
      (2L, "p q r")
    ).toDF("doc_id", "text")
    val dup = SpanDedup.duplicatedSpans(
      SpanDedup.tokenWindows(docs, "doc_id", "text", span), "doc_id", 2)
    assert(dup.count() == 0)
  }

  test("dupSpanStats: overlapping spans union their coverage; clean docs report zeros") {
    // docs 1 and 2 share the 4-token run "a b c d" → two overlapping
    // 3-token windows ("a b c", "b c d") covering 4 positions, not 6
    val docs = Seq(
      (1L, "a b c d x"),
      (2L, "z a b c d"),
      (3L, "u v w u v") // no cross-doc span
    ).toDF("doc_id", "text")
    val got = SpanDedup.dupSpanStats(docs, "doc_id", "text", span, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((5L, 2L, 4L, 0.8)))
    assert(got(2L) == ((5L, 2L, 4L, 0.8)))
    assert(got(3L) == ((5L, 0L, 0L, 0.0)))
  }

  test("removeDupSpans cuts every occurrence, keeps order, empties boilerplate") {
    val docs = Seq(
      (1L, "a b c d x"),    // "a b c d" shared with doc 2 → keeps "x"
      (2L, "z a b c d"),    // → keeps "z"
      (3L, "u v w"),        // clean → unchanged
      (4L, "a b c d")       // nothing but the shared run → empty
    ).toDF("doc_id", "text")
    val got = SpanDedup.removeDupSpans(docs, "doc_id", "text", span, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("x", 1L)))
    assert(got(2L) == (("z", 1L)))
    assert(got(3L) == (("u v w", 3L)))
    assert(got(4L) == (("", 0L)))
  }

  test("stats and removal agree: n_tokens - covered_tokens = n_kept") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val stats = SpanDedup.dupSpanStats(docs, "doc_id", "text", 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(3))).toMap
    val kept = SpanDedup.removeDupSpans(docs, "doc_id", "text", 12)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats == kept)
  }

  test("agrees with a brute-force substring census on the sf0.001 documents") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val L = 12
    val got = SpanDedup.dupSpanStats(docs, "doc_id", "text", L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap

    // JVM-side brute force over the same tokenization
    val raw = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val wins = raw.flatMap { case (id, toks) =>
      (0 to toks.length - L).map(i => (id, i + 1, toks.slice(i, i + L).mkString(" ")))
    }
    val dupKeys = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expect = raw.map { case (id, toks) =>
      val mine = wins.filter(w => w._1 == id && dupKeys(w._3))
      val covered = mine.flatMap(w => w._2 until (w._2 + L)).distinct.size
      id -> ((mine.size.toLong, covered.toLong))
    }.filter(_ => true).toMap
    val expectNonEmpty = expect.filter { case (id, _) => raw.toMap.apply(id).nonEmpty }
    assert(got == expectNonEmpty)
    // the fixture actually exercises the operator: some doc has a dup span
    assert(got.values.exists(_._1 > 0L))
  }

  test("spanNovelty: seen windows come from anywhere in train; short " +
    "candidates emit no row; identical doc scores zero novelty") {
    val train = Seq(
      (1L, "a b c d e"),
      (2L, "p q r s")
    ).toDF("doc_id", "text")
    val cand = Seq(
      (10L, "a b c x y"),   // windows abc(seen) bcx cxy -> novelty 2/3
      (11L, "z z z"),       // window zzz -> novelty 1
      (12L, "a b"),         // < spanLen tokens -> no row
      (13L, "a b c d e")    // identical to train doc 1 -> novelty 0
    ).toDF("doc_id", "text")
    val got = SpanDedup.spanNovelty(cand, train, "doc_id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == Set(10L, 11L, 13L), got)
    assert(got(10L) == ((3L, 1L, 0.666667)), got(10L).toString)
    assert(got(11L) == ((1L, 0L, 1.0)))
    assert(got(13L) == ((3L, 3L, 0.0)))
    // candidate windows never "see" OTHER CANDIDATES' text, only train
    val isolated = SpanDedup.spanNovelty(
      Seq((20L, "z z z z"), (21L, "z z z z")).toDF("doc_id", "text"),
      train, "doc_id", "text", 3)
      .collect().map(_.getDouble(3)).toSeq
    assert(isolated == Seq(1.0, 1.0))
  }
}
