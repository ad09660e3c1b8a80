package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.Bridge

/** Column <-> Catalyst Expression bridge for Spark 4.x, where Column no
  * longer wraps an Expression directly.
  */
package object functions {
  def exprToColumn(e: Expression): Column = Bridge.column(e)
  def columnToExpr(c: Column): Expression = Bridge.expression(c)
}
