package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column ⇄ Expression bridge for graft's expressions that cannot travel
 * through the function registry: [[graft.functions.IvfNearestCellsBc]]
 * (its `Broadcast` handle is a runtime object, not a SQL argument, so
 * `call_function` — the carrier every other graft native expression
 * uses — cannot construct it) and the catalog-free `ScalarSubquery`
 * carrier in [[graft.ext.Contamination]] (built directly on an analyzed
 * plan, so no per-call temp view accumulates in the session catalog).
 *
 * Lives in `org.apache.spark.sql` because the canonical helpers
 * (`classic.ExpressionUtils.column/expression`) are `private[sql]` in
 * Spark 4 — the same placement extension libraries that build typed
 * Columns use. Nothing here adds behavior: both methods delegate
 * verbatim.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
