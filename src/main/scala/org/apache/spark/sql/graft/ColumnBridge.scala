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
}
