package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: marker-word language identification over
 * raw text — count marker-word occurrences per language, return the code
 * with the highest count (ties → first code in declaration order, which
 * is alphabetical), NULL when there are no hits (callers coalesce to
 * "und", preserving the declarative twin's null-propagation shape).
 *
 * Why a custom Expression (the SURVEY.md §4 case, same rationale as
 * [[ClippedOverlap]]): the declarative `langId` chained `filter`/`split`
 * higher-order functions — CodegenFallback, so evaluated once per USE
 * with no subexpression elimination — and its argmax `when` chain
 * references every per-language score and the `greatest` of all of them
 * repeatedly: the tokenize+count pipeline ran ~10× per row. r13's full
 * sf1 sweep measured q23 at 12.5 s for a 50 k-doc count-by-language —
 * 170 µs/row for 5-word-per-language marker counting. This expression
 * is ONE lowercase + one whitespace scan + one hash lookup per token,
 * inside whole-stage codegen.
 *
 * Tokenization is pinned bit-equal to `TextOps.tokens`:
 * `split(lower(text), "\\s+")` with empties removed — `lower` is
 * `UTF8String.toLowerCase` (the same call Spark's `Lower` makes) and
 * Java's `\s` is exactly the six ASCII whitespace chars the manual
 * scanner splits on. Marker words are ASCII and never empty, so
 * skipping empty tokens is equivalent to the declarative filter.
 */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_langid requires a string column, got $t")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_langid"

  override def nullSafeEval(t: Any): Any =
    LangId.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute() returns null for "no hits" — null-out the result slot
    // rather than defineCodeGen's value-only contract
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.functions.LangId$$.MODULE$$.compute($t);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** The marker table — also the single source for
    * `TextOps.langMarkers`, so the expression and the declarative twin
    * (and every oracle generated from the table) can never drift. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "los", "las", "una", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des")
  )

  private val codes: Array[UTF8String] =
    markers.map(c => UTF8String.fromString(c._1)).toArray

  /** marker word → language index, UTF8String-keyed so the scan never
    * allocates a java String per token. Marker sets are disjoint. */
  private val wordLang: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markers.zipWithIndex.foreach { case ((_, ws), i) =>
      ws.foreach(w => m.put(UTF8String.fromString(w), Integer.valueOf(i)))
    }
    m
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Argmax language code of the marker-hit counts, or null when no
    * marker occurs. One toLowerCase, one byte scan. */
  def compute(text: UTF8String): UTF8String = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes // O(n) copy at worst; scan is byte-exact
    val counts = new Array[Int](codes.length)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        val lang = wordLang.get(UTF8String.fromBytes(bytes, start, i - start))
        if (lang != null) counts(lang.intValue) += 1
      }
    }
    var best = 0
    var bestIdx = -1
    var j = 0
    while (j < counts.length) {
      if (counts(j) > best) { best = counts(j); bestIdx = j }
      j += 1
    }
    if (bestIdx < 0) null else codes(bestIdx)
  }
}
