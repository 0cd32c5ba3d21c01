package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (metric, item) candidate inside a [[TopKAggregator]] buffer. */
case class TopKEntry(metric: Long, item: Long)

/**
 * Exact top-k as a MERGEABLE AGGREGATE: a k-bounded buffer with
 * reduce/merge semantics, registered through `functions.udaf` (Spark's
 * documented `Aggregator` extension point — a partial-aggregating
 * ObjectHashAggregate, not a row-scalar black-box UDF).
 *
 * Why this exists next to the window formulation (q12): a
 * `row_number().over(partitionBy(g).orderBy(m))` top-k must shuffle and
 * sort EVERY row of every group to rank them. This aggregate keeps at
 * most k candidates per group per map task, so the shuffle carries
 * ≤ k × tasks rows per group regardless of group size — on a 100 TB
 * fact table with million-row groups, that is the difference between
 * shuffling the table and shuffling kilobytes. Same exact answer
 * (TopKAggSpec proves equality against the window twin on fuzzed data;
 * PlanAuditSpec pins the partial/final ObjectHashAggregate pair).
 *
 * Total order: metric DESC, then item ASC — ties are deterministic, so
 * results hash-match a `ROW_NUMBER() ... ORDER BY cnt DESC, item` oracle.
 *
 * The reference's only ranking surface is full grouped counts
 * (`/root/reference/sree-etl-tdk-glue-job.py:55-68`); SURVEY.md §2.11
 * extension (W2+/A2+).
 */
class TopKAggregator(k: Int)
    extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def order(e: TopKEntry): (Long, Long) = (-e.metric, e.item)

  /** Keep the buffer's size bounded: trim lazily at 4k so each row costs
    * amortized O(1), not a sort; exact because trimming to k can only
    * drop entries that k better candidates already dominate. */
  private def trim(b: Seq[TopKEntry]): Seq[TopKEntry] =
    if (b.lengthCompare(4 * k) <= 0) b else b.sortBy(order).take(k)

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] =
    trim(b :+ a)

  override def merge(b1: Seq[TopKEntry], b2: Seq[TopKEntry]): Seq[TopKEntry] =
    trim(b1 ++ b2)

  override def finish(b: Seq[TopKEntry]): Seq[TopKEntry] =
    b.sortBy(order).take(k)

  override def bufferEncoder: ExpressionEncoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()

  override def outputEncoder: ExpressionEncoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
}
