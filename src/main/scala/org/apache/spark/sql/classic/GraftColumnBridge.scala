package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge: build a [[Column]] from a raw
  * Catalyst [[Expression]] (and back). Needed by expressions whose
  * state cannot ride the function registry's literal arguments — the
  * broadcast-backed quantizer probes
  * ([[graft.functions.NearestCellsBcExpr]]) carry a `Broadcast`
  * handle, which `call_function` cannot express. The standard Spark
  * extension-library pattern: one object in the sql namespace
  * delegating to [[ExpressionUtils]], nothing else. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
