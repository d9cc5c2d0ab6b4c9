package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Catalyst-Expression bridge. Spark 4 made the converters
  * `private[sql]` (`classic.ExpressionUtils` /
  * `ColumnNodeToExpressionConverter`), so this one-file shim lives in the
  * sql namespace to re-export exactly the two conversions the engine
  * needs: they let the SQL function registry reuse the library's
  * Column-composition operators (sampling buckets, tokenizer, language id
  * …) verbatim instead of re-deriving their expression trees by hand.
  * Nothing else from the internal surface is touched.
  *
  * Column→Expression goes through the full node CONVERTER, not the lazy
  * `ExpressionUtils.expression` wrapper: a wrapper inside a function-
  * registry builder's output never gets node-converted by the analyzer
  * (it stays an Unevaluable `ColumnNodeExpression` and codegen fails);
  * the converter emits real catalyst nodes (`UnresolvedFunction` children
  * resolve in the analyzer's next fixed-point pass). */
object ColumnBridge {
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** DataFrame ⇄ LogicalPlan, for the library's custom plan nodes
    * ([[graft.plans.AsofCarry]]): Spark 4 keeps `Dataset.ofRows` and the
    * plan accessor `private[sql]`, so wrapping a custom logical operator
    * around an existing frame needs this same-namespace shim. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
