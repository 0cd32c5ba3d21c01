package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join — for each left row, attach the single right row with
 * the greatest right-time at or before the left row's time within the same
 * key (the "most recent prior observation": last click before a purchase,
 * last config push before an error, last quote before a trade). Spark has
 * no ASOF JOIN operator; the naive formulation — equi-join on key with a
 * `r.ts <= l.ts` residual, then keep the max-per-left-row — materializes
 * every (left, earlier-right) pair before pruning, O(per-key left × right)
 * rows through the shuffle. At 100 TB that pair blowup, not the join
 * itself, is the bottleneck.
 *
 * This operator instead UNIONS the two tagged streams and runs one
 * `last(payload, ignoreNulls)` over a running (unbounded-preceding →
 * current-row) window ordered by (time, side, tie): each right row deposits
 * its payload into the running frame, each left row reads the latest
 * deposit. ONE shuffle by key, a per-partition sort, zero pair
 * materialization — rows through the shuffle are exactly |left| + |right|
 * regardless of how many earlier right rows each left row has. The running
 * frame is evaluated incrementally by WindowExec (O(n) per partition, no
 * per-row frame rescan).
 *
 * Semantics (matched by q53's DuckDB oracle, which computes the same join
 * as a left join + row_number prune):
 *  - inclusive: a right row at exactly the left row's time matches (right
 *    rows sort BEFORE left rows at equal time via the side tag);
 *  - ties among right rows at equal time: the greatest `rightTie` wins;
 *  - left-outer: a left row with no prior right row keeps null payload;
 *  - SQL null semantics: right rows with a null key or time are dropped
 *    (they can satisfy no `ON` clause); left rows with a null key or time
 *    emit with a null match (nulls sort first within the partition, so no
 *    deposit precedes them).
 */
object AsofJoin {

  /**
   * Left columns pass through unchanged; each `rightPayload` column is
   * appended as `asof_<name>`. `rightTie` breaks right-side time ties
   * (greatest wins) and must be one of `rightPayload` if the caller wants
   * to see it. Left and right may be the same DataFrame (self as-of).
   */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTie: String): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightTie, backward = true)

  /**
   * Forward (mirror) as-of: the single right row with the SMALLEST time at
   * or after the left row's time within the key — "next event after": the
   * first error after a deploy, the next restock after a stock-out. Same
   * single-shuffle union-tag shape, with the window ordered by descending
   * time so the running deposit at each left row is the nearest following
   * right row. Tie and null semantics as in [[asofBackward]].
   */
  def asofForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTie: String): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightTie, backward = false)

  private def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTie: String,
      backward: Boolean): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val clash = left.columns.toSet.intersect(rightPayload.map("asof_" + _).toSet)
    require(clash.isEmpty,
      s"left already has column(s) ${clash.mkString(", ")} that the " +
        "asof_-prefixed payload would duplicate; rename before joining")

    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val pStruct = struct(rightPayload.map(right(_)): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val pType = right.select(pStruct).schema.head.dataType
    // the tie column keeps its own type — any orderable column works, and
    // a lossy numeric cast here would corrupt (or, under ANSI, throw on)
    // string ties
    val tieType = right.select(right(rightTie)).schema.head.dataType

    val lhs = left.select(
      left(leftKey).as("_k"), left(leftTime).as("_t"),
      lit(1).as("_side"), lit(null).cast(tieType).as("_tie"),
      lStruct.as("_l"), lit(null).cast(pType).as("_p"))
    val rhs = right
      .filter(right(rightKey).isNotNull && right(rightTime).isNotNull)
      .select(
        right(rightKey).as("_k"), right(rightTime).as("_t"),
        lit(0).as("_side"), right(rightTie).as("_tie"),
        lit(null).cast(lType).as("_l"), pStruct.as("_p"))

    // Rows at equal (_k, _t): right (side 0) before left (side 1), so the
    // deposit is visible to the left row; among rights, ascending _tie so
    // `last` lands on the greatest. Forward direction = the same running
    // scan over descending time: the last deposit seen before a left row
    // is then the SMALLEST right time at or after it.
    val tOrd = if (backward) col("_t").asc_nulls_first
               else col("_t").desc_nulls_first
    val w = Window.partitionBy(col("_k"))
      .orderBy(tOrd, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lhs.unionByName(rhs)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out = leftCols.map(c => col("_l").getField(c).as(c)) ++
      rightPayload.map(c => col("_m").getField(c).as(s"asof_$c"))
    matched.select(out: _*)
  }
}
