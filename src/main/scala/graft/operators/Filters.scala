package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Filter / predicate operators — SURVEY.md §2.3 (F1-F3).
  *
  * The reference's genomic-interval predicates
  * (AbstractBinarySamSource.java:111-157, TraversalOverlapDetector
  * .java:34-59) are range predicates over orderable columns; here they
  * become Catalyst filters pushed to the parquet scan.
  */
object Filters extends QueryModule {

  /** F1: single interval-overlap predicate (BAI span intersection →
    * pushed range filter on the clustered column).
    */
  def filterInterval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .filter($"l_shipdate".between(
        lit("1997-01-01").cast(TimestampType),
        lit("1997-06-30").cast(TimestampType)))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** F2: OR-of-ranges residual predicate (multi-interval
    * OverlapDetector membership, SamSource.java:93-102).
    */
  def filterIntervalMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r1 = $"l_shipdate".between(
      lit("1995-03-01").cast(TimestampType), lit("1995-05-31").cast(TimestampType))
    val r2 = $"l_shipdate".between(
      lit("1999-03-01").cast(TimestampType), lit("1999-05-31").cast(TimestampType))
    T.t(s, dir, "lineitem")
      .filter(r1 || r2)
      .groupBy($"l_linestatus")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_linestatus")
  }

  /** F3: unplaced-unmapped union — interval hits UNION'd with a
    * disjoint sentinel-keyed branch (TraversalOverlapDetector
    * .overlapsAny:48-58 unions unmapped records onto interval results).
    */
  def filterNullUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = T.t(s, dir, "orders")
    val inRange = $"o_orderdate".between(
      lit("1996-01-01").cast(TimestampType), lit("1996-12-31").cast(TimestampType))
    val hits = o.filter(inRange)
    val sentinel = o.filter($"o_orderstatus" === "F" && !inRange)
    hits.union(sentinel)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_interval" -> (filterInterval(_, _)),
    "filter_interval_multi" -> (filterIntervalMulti(_, _)),
    "filter_null_union" -> (filterNullUnion(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "filter_interval" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-06-30'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "filter_interval_multi" ->
      s"""SELECT l_linestatus, COUNT(*) AS cnt, ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1995-03-01' AND TIMESTAMP '1995-05-31'
         |   OR l_shipdate BETWEEN TIMESTAMP '1999-03-01' AND TIMESTAMP '1999-05-31'
         |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "filter_null_union" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt, ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |WHERE (o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31')
         |   OR (o_orderstatus = 'F' AND NOT
         |       (o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'))
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
