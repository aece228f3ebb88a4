package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** TPC-H-shaped analytics battery over the harness fixtures —
  * SURVEY.md §8 round-2 candidate "wider TPC-H query battery".
  *
  * The reference delegates all relational processing to Spark
  * (README.md:195-207); these are the canonical scan→filter→join→agg
  * pipelines its users run on the resulting tables, adapted to the
  * fixture schema (no partsupp; no l_shipmode/l_commitdate — the
  * query SHAPES are preserved: selective conjunct/disjunct pushdown,
  * star joins with dim broadcast, conditional aggregation, scalar
  * subqueries, distinct aggs, top-k).
  *
  * Determinism contract: money sums ride DECIMAL(18,s) (T.dsum);
  * per-row double products cast to DECIMAL before SUM; every query
  * ends in ORDER BY with a unique tiebreak.
  */
object TpchBattery extends QueryModule {

  /** price * (1 - disc) as an exact decimal — both engines multiply
    * DECIMAL(18,2) identically, so partial-agg order can't skew sums.
    */
  private def discPrice(price: Column, disc: Column): Column =
    price.cast(DecimalType(18, 2)) * (lit(1) - disc).cast(DecimalType(18, 2))

  private val sqlDiscPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"

  /** Q1: full pricing summary — the widest partial-agg reduction
    * (8 aggregates, 2 group keys): map-side combine collapses 60k
    * rows to 6 groups before the (tiny) shuffle.
    */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(discPrice($"l_extendedprice", $"l_discount"))
          .cast(DoubleType).as("sum_disc_price"),
        T.davg($"l_quantity").as("avg_qty"),
        T.davg($"l_extendedprice").as("avg_price"),
        T.davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q6: forecasting revenue — pure scan + conjunctive pushed filter
    * + global agg; the plan should be scan(PushedFilters)→partial
    * agg→final agg, no shuffle of data rows.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(sum(($"l_extendedprice".cast(DecimalType(18, 2))) *
        $"l_discount".cast(DecimalType(18, 2)))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Q7 shape: bilateral trade volume — lineitem⋈supplier⋈orders⋈
    * customer with two independent nation references (supplier's vs
    * customer's), grouped by the pair + ship year. Dims broadcast;
    * the only big shuffle is lineitem⋈orders.
    */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val o = T.t(s, dir, "orders")
    val su = T.t(s, dir, "supplier")
    val c = T.t(s, dir, "customer")
    l.join(broadcast(su), $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .filter(($"s_nationkey" === 1 && $"c_nationkey" === 2) ||
        ($"s_nationkey" === 2 && $"c_nationkey" === 1))
      .select($"s_nationkey".as("supp_nation"),
        $"c_nationkey".as("cust_nation"),
        year($"l_shipdate").cast(LongType).as("l_year"),
        discPrice($"l_extendedprice", $"l_discount").as("volume"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum($"volume").cast(DoubleType).as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Q10 shape: returned-item reporting — revenue lost to returns per
    * customer, top 20. Selective returnflag+quarter filter, star join,
    * top-k (TakeOrderedAndProject, no global sort materialization).
    */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem").filter($"l_returnflag" === "R")
    val o = T.t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val c = T.t(s, dir, "customer")
    val n = T.t(s, dir, "nation")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(sum(discPrice($"l_extendedprice", $"l_discount"))
        .cast(DoubleType).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q14 shape: promo revenue share — conditional aggregation over a
    * fact⋈dim join; one-row ratio of two exact decimal sums.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
    val p = T.t(s, dir, "part")
    val dp = discPrice($"l_extendedprice", $"l_discount")
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .agg(
        (lit(100.0) *
          sum(when($"p_type" === "PROMO", dp).otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType) /
          sum(dp).cast(DoubleType)).as("promo_revenue_pct"),
        count(lit(1)).as("n"))
  }

  /** Q16 shape: supplier diversity per part segment — COUNT(DISTINCT)
    * with an exclusion predicate (expands to two-phase distinct agg).
    */
  def q16PartSupp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = T.t(s, dir, "part").filter($"p_brand" =!= "Brand#1")
    T.t(s, dir, "lineitem")
      .join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
      .limit(50)
  }

  /** Q19 shape: disjunctive pushdown — three OR'd brand/size/quantity
    * conjunct groups; Catalyst extracts the common l_partkey join and
    * pushes the disjunction into both scans.
    */
  def q19Discount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val p = T.t(s, dir, "part")
    l.join(broadcast(p), $"l_partkey" === $"p_partkey" && (
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
        $"l_quantity".between(1, 21)) ||
        ($"p_brand" === "Brand#7" && $"p_size".between(1, 30) &&
          $"l_quantity".between(10, 30)) ||
        ($"p_brand" === "Brand#13" && $"p_size".between(1, 50) &&
          $"l_quantity".between(20, 40))))
      .agg(sum(discPrice($"l_extendedprice", $"l_discount"))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Q22 shape: above-average idle customers — scalar subquery
    * (global avg computed once, broadcast as a literal-ish plan) +
    * anti join against orders.
    */
  def q22Global(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
    val avgBal = c.filter($"c_acctbal" > 0.0)
      .agg(T.davg($"c_acctbal", 4).as("a"))
    val o = T.t(s, dir, "orders").select($"o_custkey")
    c.join(broadcast(avgBal))
      .filter($"c_acctbal" > $"a")
      .join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_mktsegment")
  }

  /** Q17 shape: correlated scalar subquery against a per-part
    * aggregate — exercises Catalyst's decorrelation into an
    * aggregate+join (never a per-row loop). The inner avg rides the
    * exact-decimal sum/count so the `<` threshold is bit-identical
    * across engines. Stated in SQL on purpose: this is the raw
    * spark.sql surface a reference user migrates their queries to.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    T.t(s, dir, "lineitem").createOrReplaceTempView("g17_lineitem")
    T.t(s, dir, "part").createOrReplaceTempView("g17_part")
    s.sql(
      """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |             / 7.0, 4) AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM g17_lineitem JOIN g17_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND l_quantity <
        |    (SELECT 0.2 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |            / COUNT(*)
        |     FROM g17_lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** Q4: order-priority checking — orders placed in one quarter with
    * at least one late-shipped line (adapted: the fixture has no
    * l_commitdate/l_receiptdate, so "late" = shipped after the order
    * date). Catalyst decorrelates the EXISTS into a left-semi join on
    * the order key; the quarter window pushes to the orders scan, so
    * the semi join probes only that quarter's keys.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    T.t(s, dir, "lineitem").createOrReplaceTempView("g4_lineitem")
    T.t(s, dir, "orders").createOrReplaceTempView("g4_orders")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM g4_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM g4_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** Q21/Q4 shape: EXISTS + NOT EXISTS double correlation — Catalyst
    * plans a semi join and an anti join on the order key; the date
    * predicate correlates on BOTH tables' columns so it must stay in
    * the semi-join condition, not get pushed as a scan filter.
    */
  def q21Exists(s: SparkSession, dir: String): DataFrame = {
    T.t(s, dir, "lineitem").createOrReplaceTempView("g21_lineitem")
    T.t(s, dir, "orders").createOrReplaceTempView("g21_orders")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS cnt
        |FROM g21_orders
        |WHERE EXISTS (SELECT 1 FROM g21_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |  AND NOT EXISTS (SELECT 1 FROM g21_lineitem
        |                  WHERE l_orderkey = o_orderkey
        |                    AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (q1Pricing(_, _)),
    "q4_order_priority" -> (q4OrderPriority(_, _)),
    "q6_forecast" -> (q6Forecast(_, _)),
    "q7_volume" -> (q7Volume(_, _)),
    "q10_returns" -> (q10Returns(_, _)),
    "q14_promo" -> (q14Promo(_, _)),
    "q16_partsupp" -> (q16PartSupp(_, _)),
    "q17_small_qty" -> (q17SmallQty(_, _)),
    "q19_discount" -> (q19Discount(_, _)),
    "q21_exists" -> (q21Exists(_, _)),
    "q22_global" -> (q22Global(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($sqlDiscPrice) AS DOUBLE) AS sum_disc_price,
         |  ${T.sqlDavg("l_quantity")} AS avg_qty,
         |  ${T.sqlDavg("l_extendedprice")} AS avg_price,
         |  ${T.sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_volume" ->
      s"""SELECT s_nationkey AS supp_nation, c_nationkey AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(SUM($sqlDiscPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS cnt
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE (s_nationkey = 1 AND c_nationkey = 2)
         |   OR (s_nationkey = 2 AND c_nationkey = 1)
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returns" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM($sqlDiscPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-10-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo" ->
      s"""SELECT 100.0 *
         |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $sqlDiscPrice
         |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
         |  CAST(SUM($sqlDiscPrice) AS DOUBLE) AS promo_revenue_pct,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q16_partsupp" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50""".stripMargin,
    "q19_discount" ->
      s"""SELECT CAST(SUM($sqlDiscPrice) AS DOUBLE) AS revenue, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 21)
         |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 30
         |       AND l_quantity BETWEEN 10 AND 30)
         |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 50
         |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q22_global" ->
      s"""SELECT c_mktsegment, COUNT(*) AS numcust,
         |  ${sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${T.sqlDavg("c_acctbal", 4)}
         |                   FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q17_small_qty" ->
      """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |             / 7.0, 4) AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND l_quantity <
        |    (SELECT 0.2 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |            / COUNT(*)
        |     FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q21_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey
        |                    AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
