package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge: Spark 4's `Column` no longer exposes `.expr`
  * publicly (Connect-compatible façade); `ExpressionUtils` does the
  * conversion but is `private[sql]`, so this one-file shim re-exports the
  * two functions the engine needs for registering custom expressions. */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}

/** Registers [[graft.functions.GraftExtensions]]' SQL functions on an
  * ALREADY-BUILT session (the extensions hook only runs at session build
  * time; `sessionState` is `private[sql]`, hence this bridge). Same builder
  * triples as the extensions path — one definition, two wire-ups. */
object FunctionInstaller {
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftExtensions.functions.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
}
