package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite / nested-data queries: multi-operator pipelines in one
  * plan (the workloads users actually run on the distributed
  * collections), plus the nested-type round trip the reference's
  * cigar/tags/genotypes data model implies (SURVEY.md §1.2).
  */
object Composite extends QueryModule {

  /** TPC-H Q18 shape: having-filtered aggregate joined back to dims. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = T.t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 150)
    val o = T.t(s, dir, "orders")
    val c = T.t(s, dir, "customer")
    big.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .select($"c_name", $"o_orderkey", $"o_orderdate", $"sum_qty")
      .orderBy($"sum_qty".desc, $"o_orderkey")
      .limit(100)
  }

  /** Nested-type sink round trip (cigar/tags/genotypes analogue):
    * build struct + array + map columns per user, write parquet, read
    * back, and flatten — nested schemas must survive the sink
    * losslessly.
    */
  def sinkNested(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_nested_events")
    T.events(s, dir)
      .groupBy($"user_id")
      .agg(
        struct(count(lit(1)).as("n"),
          dsum($"value", 6).as("total")).as("stats"),
        sort_array(collect_list($"event_id")).as("event_ids"),
        map_from_arrays(array(lit("first"), lit("last")),
          array(min($"event_id"), max($"event_id"))).as("bounds"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .select(
        $"user_id",
        $"stats.n".as("n"),
        $"stats.total".as("total"),
        size($"event_ids").as("n_ids"),
        element_at($"event_ids", 1).as("first_id"),
        element_at($"bounds", "last").as("last_id"))
      .orderBy($"user_id")
  }

  /** Exact interpolated percentiles (rounded — interpolation is the
    * same (lo + frac*(hi-lo)) form on both engines, guarded anyway).
    */
  def aggPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
      .orderBy($"l_returnflag")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_large_orders" -> (q18LargeOrders(_, _)),
    "sink_nested" -> (sinkNested(_, _)),
    "agg_percentile" -> (aggPercentile(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "q18_large_orders" ->
      s"""SELECT c_name, o_orderkey, o_orderdate, sum_qty FROM (
         |  SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150) b
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    "sink_nested" ->
      s"""SELECT user_id, COUNT(*) AS n, ${sqlDsum("value", 6)} AS total,
         |  CAST(COUNT(*) AS INT) AS n_ids,
         |  MIN(event_id) AS first_id, MAX(event_id) AS last_id
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4)
        |    AS p50_qty,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 4)
        |    AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
