package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 makes the `Column(Expression)` constructor `private[sql]`
  * (columns wrap `ColumnNode`s so the same API serves Connect and classic);
  * extension libraries shipping their own expressions reach the classic
  * converters from inside the `org.apache.spark.sql` namespace — the
  * supported pattern until an `expression`-to-`Column` public API exists.
  */
package object graftfn {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def asColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression behind a (classic) Column. */
  def asExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Render a (classic) Column's predicate/expression as SQL text — used to
    * inject programmatic filters into SQL templates. Goes through the full
    * ColumnNode → Expression conversion (the lazy `ExpressionUtils`
    * wrapper prints as an unresolvable `columnnodeexpression(...)` call).
    */
  def asSqlText(c: Column): String =
    classic.ColumnNodeToExpressionConverter(c.node).sql

  /** Block until the listener bus has delivered every queued event —
    * dev-tool use only (RehearsalRun reads task-metric accumulations right
    * after an action; the bus is async). `listenerBus` is private[spark],
    * hence the bridge.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register graft's SQL functions on a LIVE session (the
    * `SparkSessionExtensions` route only applies at session construction).
    */
  def registerGraftFunctions(spark: SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }
}
