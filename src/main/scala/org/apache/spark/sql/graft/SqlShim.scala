package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow bridge into Spark's `private[sql]` classic API: Column ⇄ Expression
  * conversion and the session FunctionRegistry. This is the supported way to
  * hand a custom Catalyst Expression to the DataFrame API in Spark 4 (the
  * old `new Column(expr)` constructor is gone); only these three hooks are
  * exposed, nothing else from the internal surface.
  */
object SqlShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  /** Unload every loaded state-store provider NOW. Spark only evicts
    * providers lazily from the maintenance thread after the coordinator
    * deactivates a stopped query's instances, so a rapid sequence of
    * short-lived gate runs stacks each run's full state maps on the heap in
    * the meantime. Streaming queries that are still running are unaffected
    * beyond a state reload from their checkpoint on next access.
    */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
