package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

class BpeTrainSpec extends GraftSpec {
  import spark.implicits._

  // reference implementation: classic Sennrich BPE over a word-count map
  private def jvmMerges(words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var syms: Map[Vector[String], Long] = words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "</w>") -> c
    }
    val out = Seq.newBuilder[(String, String)]
    var n = 0
    var go = k > 0
    while (go) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      syms.foreach { case (s, c) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val eligible = counts.filter(_._2 >= 2L)
      if (eligible.isEmpty) go = false
      else {
        val best = eligible.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        n += 1
        syms = syms.map { case (s, c) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == best._1 && s(i + 1) == best._2) {
              b += s(i) + s(i + 1); i += 2
            } else { b += s(i); i += 1 }
          }
          b.result() -> c
        }.groupBy(_._1).map { case (sq, xs) => sq -> xs.map(_._2).sum }
        go = n < k
      }
    }
    out.result()
  }

  private def jvmTokenize(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var s = word.map(_.toString).toVector :+ "</w>"
    merges.foreach { case (l, r) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
        else { b += s(i); i += 1 }
      }
      s = b.result()
    }
    s
  }

  test("learnMerges matches the reference BPE on a hand corpus") {
    // the classic example shape: "low lower lowest newest widest"-style
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest widest widest"),
      (3L, "low newest")
    ).toDF("doc_id", "text")
    val wordCounts = Map(
      "low" -> 4L, "lower" -> 2L, "newest" -> 4L, "widest" -> 2L)
    val expect = jvmMerges(wordCounts, 8)
    val got = BpeTrain.learnMerges(docs, "text", 8).map(m => (m.left, m.right))
    assert(got == expect, s"expect=$expect got=$got")
    assert(got.nonEmpty)
  }

  test("bpeTokenize matches the reference application, merges fold in order") {
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest widest widest")
    ).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, "text", 6)
    val jm = merges.map(m => (m.left, m.right))
    Seq("low", "lowest", "newest", "unseen").foreach { w =>
      val got = docs.sparkSession.range(1)
        .select(BpeTrain.bpeTokenize(lit(w), merges).as("t"))
        .head().getSeq[String](0)
      assert(got == jvmTokenize(w, jm), s"word=$w merges=$jm got=$got")
    }
  }

  test("learnMerges agrees with the reference on the sf0.001 documents (20 merges)") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val wordCounts = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = jvmMerges(wordCounts, 20)
    val got = BpeTrain.learnMerges(docs, "text", 20).map(m => (m.left, m.right))
    assert(got == expect)
    assert(got.size == 20)
  }

  test("repeated-symbol runs merge left-to-right non-overlapping") {
    // "aaaa" under merge (a,a): "aa aa </w>", never the overlapping
    // "a aa a" or a triple
    val merges = Seq(BpeTrain.Merge("a", "a"))
    val got = spark.range(1)
      .select(BpeTrain.bpeTokenize(lit("aaaa"), merges).as("t"))
      .head().getSeq[String](0)
    assert(got == Seq("aa", "aa", "</w>"))
  }

  test("exhausted corpus stops early; zero merges tokenizes to characters") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text") // no pair repeats
    assert(BpeTrain.learnMerges(docs, "text", 5).isEmpty)
    val got = spark.range(1)
      .select(BpeTrain.bpeTokenize(lit("ab"), Seq.empty).as("t"))
      .head().getSeq[String](0)
    assert(got == Seq("a", "b", "</w>"))
  }
}
