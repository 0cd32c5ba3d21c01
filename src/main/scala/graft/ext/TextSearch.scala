package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over the document corpus — BM25 (the Robertson /
 * Lucene formulation), the term-based complement to the embedding ANN
 * family: [[Similarity]]/[[AnnIvf]] answer "what is semantically near
 * this vector"; this answers "which documents match these terms" — the
 * other half of a retrieval-augmented pipeline, and the standard
 * first-stage ranker in front of an embedding re-ranker.
 *
 * Relational shape, one aggregation spine: explode tokens → keep query
 * terms only (a literal `isin` filter, so the explode's output shrinks to
 * |matching postings| immediately — the inverted-index access pattern
 * without materializing an index) → per-(doc, term) counts → per-doc
 * score fold. Corpus statistics (N, average doc length) are two scalars
 * collected once at plan time — the [[AnnIvf]] centroid-metadata class —
 * and per-term document frequencies ride through a tiny per-term
 * aggregate joined back on the term key. At 100 TB: one corpus scan, two
 * bounded shuffles (doc-term counts, per-doc fold), df/idf frames sized
 * by |query terms|.
 *
 * Scoring: `idf_t = ln(1 + (N - df_t + 0.5)/(df_t + 0.5))` (Lucene's
 * non-negative variant), `score = Σ_t idf_t · tf/(tf + k1·(1 − b +
 * b·dl/avgdl))`. Documents matching no query term score zero and are
 * omitted (retrieval returns matches, not the corpus).
 */
object TextSearch {

  /**
   * Top-`k` documents for a bag-of-words `query`: `(idCol, matched,
   * score, rank)` — matched distinct query terms, BM25 score (round-6,
   * the engine's float-compare armor), rank by (score desc, id asc).
   * Duplicate query terms count once; query terms are tokenized with the
   * corpus tokenizer, so casing differences cannot desync the match.
   */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "empty query")
    require(k > 0, s"k must be positive, got $k")

    val lengths = docs.select(col(idCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("dl"))
    // corpus stats: two metadata scalars, one pass
    val statsRow = lengths.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
    val n = statsRow.getLong(0)
    if (n == 0L) {
      return docs.filter(lit(false)).select(col(idCol),
        lit(0L).as("matched"), lit(0.0d).as("score"), lit(0L).as("rank"))
    }
    val avgdl = statsRow.getLong(1).toDouble / n

    // postings: the explode shrinks to matching terms immediately
    val postings = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = postings.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency per query term → idf (|terms| rows, broadcast)
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))

    tf.join(broadcast(idf.select("term", "idf")), "term")
      .join(lengths, Seq(idCol))
      .withColumn("_s",
        col("idf") * col("tf") /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched"), round(sum(col("_s")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol).asc)).cast("long"))
  }

  /**
   * Hybrid retrieval — the standard two-stage ranker: [[bm25TopK]]
   * recalls `candidates` documents lexically, then the EXACT cosine of
   * each candidate's embedding against `queryVec` re-ranks to the final
   * `k`. Lexical recall bounds the expensive stage (only `candidates`
   * rows touch embeddings — a point-lookup join at scale); the dense
   * re-rank fixes vocabulary mismatch inside that budget. Candidates
   * without an embedding row rank by NULL sim (last — no evidence
   * doesn't outrank evidence); zero-norm embeddings likewise, the
   * [[Similarity]] convention. Returns `(idCol, score, sim, rank)` —
   * both signals kept, rank by (sim desc, id asc), sims rounded to 6 dp.
   */
  def hybridTopK(
      docs: DataFrame, idCol: String, textCol: String, query: String,
      embeddings: DataFrame, embIdCol: String, embCol: String,
      queryVec: Seq[Float], candidates: Int, k: Int): DataFrame = {
    require(k <= candidates,
      s"final k $k exceeds the candidate budget $candidates")
    val qNorm = {
      var acc = 0.0
      queryVec.foreach(x => acc += x.toDouble * x.toDouble)
      math.sqrt(acc)
    }
    val cands = bm25TopK(docs, idCol, textCol, query, candidates)
      .select(col(idCol), col("score"))
    cands
      .join(embeddings.select(col(embIdCol).as(idCol), col(embCol).as("_e")),
        Seq(idCol), "left")
      .withColumn("sim", round(
        Similarity.nativeDot(col("_e"), typedLit(queryVec)) /
          nullif(Similarity.norm(col("_e")) * lit(qNorm), lit(0.0)), 6))
      .select(col(idCol), col("score"), col("sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc_nulls_last, col(idCol).asc)).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("rank").asc_nulls_last)
  }
}
