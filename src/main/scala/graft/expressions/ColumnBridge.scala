package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal Expression↔Column bridge for graft's native expressions.
  *
  * Spark 4 hides `classic.ExpressionUtils` behind `private[sql]`; the public
  * alternatives are `call_function` (needs a live session registry — wrong
  * for pure Column-surface functions like `Dedup.simhash64`, which must work
  * on any session without a registration step) or `Column(name)` parsing.
  * This object lives in the `org.apache.spark.sql` package purely to re-open
  * that access for graft's own expression constructors — the established
  * pattern for Spark-native libraries extending Catalyst (e.g. frameless,
  * spark-daria publish the same shim).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
