// Lives in a subpackage of org.apache.spark.sql so it can reach the
// private[sql] Column <-> Expression converters that Spark 4 hides
// (org.apache.spark.sql.classic.ExpressionUtils, columnNodeSupport
// .scala). Only these two one-line forwarders live here; all real
// logic stays in the graft package.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
