// Lives in a subpackage of org.apache.spark.sql so it can reach the
// private[sql] Column <-> Expression converters that Spark 4 hides
// (org.apache.spark.sql.classic.ExpressionUtils, columnNodeSupport
// .scala). Only these two one-line forwarders live here; all real
// logic stays in the graft package.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def plan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Is this conf key registered in the running Spark's SQLConf?
    * (private[sql] there). Version-drift gate: a conf the code sets
    * that Spark no longer knows silently no-ops — the r03 events
    * regression — so ContractSpec asserts every set key is known.
    */
  def isKnownSqlConf(key: String): Boolean =
    org.apache.spark.sql.internal.SQLConf.containsConfigKey(key)

  /** Materialize the driver's StateStoreCoordinator RPC endpoint —
    * batch transformWithState runs on RocksDB, whose snapshot
    * reporter resolves this endpoint by URI; a streaming query
    * creates it as a side effect, a pure-batch session must ask.
    */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .streams.stateStoreCoordinator
}
