package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge learning (Sennrich et al., 2016) — the
 * TRAINED counterpart of [[TextOps.bpeTokens]]'s fixed regex: learn the
 * `numMerges` most frequent adjacent-symbol merges from a corpus, then
 * tokenize any text with them. This is the vocabulary-construction step
 * of a training-data pipeline; the tokenizer the pipeline ships IS this
 * merge list.
 *
 * Distributed shape: the corpus is touched ONCE — word counting is a
 * single explode + hash aggregate, and every training iteration after
 * that runs over the WORD-SHAPE table (distinct word, count), whose size
 * is the vocabulary, not the corpus (the classic BPE trick: a
 * billion-copy word costs one row weighted by its count). Each iteration
 * is one pair-count aggregate over the current symbolization plus a
 * driver-side top-1 collect (the merge pair is metadata, the
 * [[AnnIvf]]-centroid class), then one narrow `regexp_replace`
 * application. The symbol state is lineage-cut per iteration, so
 * iteration i never replays iterations 1..i-1.
 *
 * Determinism: the winning pair orders by (count desc, left asc, right
 * asc); symbols are space-joined, the end-of-word marker is `</w>`, and
 * merges apply left-to-right non-overlapping (regex replace order — the
 * reference semantics: "a a a" under merge (a,a) becomes "aa a").
 */
object BpeTrain {

  /** A learned merge: left symbol + right symbol, in priority order. */
  final case class Merge(left: String, right: String)

  private def spacedChars(word: Column): Column =
    concat(array_join(split(word, ""), " "), lit(" </w>"))

  /** `(a, b)` as the non-overlapping left-to-right merge over a
    * space-joined symbol string — the regex twin of the reference
    * implementation's pair scan. */
  private def applyMergeCol(spaced: Column, m: Merge): Column =
    regexp_replace(spaced,
      "(?<=^| )" + java.util.regex.Pattern.quote(m.left) + " " +
        java.util.regex.Pattern.quote(m.right) + "(?= |$)",
      java.util.regex.Matcher.quoteReplacement(m.left + m.right))

  /** Adjacent symbol pairs of a spaced symbol string as `array<struct>`;
    * built from shifted splits ([[Dedup.shingles]]'s pattern) — no HOF
    * fold in the hot loop. */
  private def pairsOf(spaced: Column): Column = {
    val syms = split(spaced, " ")
    val z = arrays_zip(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))).as("l"),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))).as("r"))
    filter(z, x => x.getField("l").isNotNull && x.getField("r").isNotNull)
  }

  /**
   * Learn `numMerges` merges from `textCol`. Returns the merge list in
   * priority order (possibly shorter when the corpus runs out of
   * repeated pairs). Training state lives in Spark; only word counts are
   * aggregated from the corpus and only the per-iteration winning pair
   * reaches the driver.
   */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be non-negative, got $numMerges")
    // one corpus pass: distinct-word shape table, count-weighted
    var words = Materialize.cut(
      docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .select(spacedChars(col("w")).as("s"), col("cnt")))

    val merges = Seq.newBuilder[Merge]
    var continue = numMerges > 0
    var learned = 0
    while (continue) {
      val top = words
        .select(explode(pairsOf(col("s"))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= 2) // a pair seen once compresses nothing
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) continue = false
      else {
        val m = Merge(top.head.getString(0), top.head.getString(1))
        merges += m
        learned += 1
        words = Materialize.cut(
          words.select(applyMergeCol(col("s"), m).as("s"), col("cnt")))
        continue = learned < numMerges
      }
    }
    merges.result()
  }

  /** Tokenize `text` with a learned merge list: per word, start from
    * characters + `</w>` and fold the merges in priority order — the
    * merge count sizes the (codegen'd) expression chain, never the data.
    * Returns `array<string>` of subword symbols, `</w>` markers kept
    * (downstream vocab counting wants word-final symbols distinct from
    * word-internal ones, the reference convention). */
  def bpeTokenize(text: Column, merges: Seq[Merge]): Column = {
    val perWord = transform(TextOps.tokens(text), w =>
      merges.foldLeft(spacedChars(w))((s, m) => applyMergeCol(s, m)))
    flatten(transform(perWord, s => split(s, " ")))
  }
}
