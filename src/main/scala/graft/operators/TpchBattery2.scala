package graft.operators

import graft.{QueryModule, T}
import graft.T.sqlDsum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** The remaining TPC-H query shapes (Q2/3/5/8/9/11/12/13/15/18/20),
  * completing the 22-query battery started in [[TpchBattery]].
  *
  * Same rationale as TpchBattery: the reference delegates relational
  * processing to Spark (/root/reference/README.md:195-207); this is
  * the downstream surface its users run. Shapes are adapted to the
  * fixture schema — no partsupp table, so the (l_partkey, l_suppkey)
  * projection of lineitem plays its role; no l_shipmode/commitdate,
  * so a categorical/date column of the same cardinality stands in.
  * The PLAN shapes are the point: correlated min (Q2), top-k over a
  * fact join (Q3/Q18), same-key co-partner join (Q5), market-share
  * conditional ratio (Q8), multi-dim profit rollup (Q9), global
  * scalar-subquery threshold (Q11), outer-join histogram (Q13),
  * argmax-by-scalar-subquery (Q15), semi join on an aggregated
  * subquery (Q20).
  *
  * Determinism contract (same as TpchBattery): money math rides
  * DECIMAL(18,2) into exact sums, cast to DOUBLE only at the end;
  * every query ends in ORDER BY with a unique tiebreak or a
  * full-key sort.
  */
object TpchBattery2 extends QueryModule {

  private def discPrice(price: Column, disc: Column): Column =
    price.cast(DecimalType(18, 2)) * (lit(1) - disc).cast(DecimalType(18, 2))

  private val sqlDiscPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"

  /** Q2 shape: min-cost supplier — correlated MIN over the candidate
    * set, planned as agg + self-join on (partkey, min_bal). The
    * distinct (partkey, suppkey) projection of lineitem is the
    * fixture's partsupp; dims broadcast, the distinct is the only
    * big shuffle.
    */
  def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ps = T.t(s, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey").distinct()
    val su = T.t(s, dir, "supplier")
    val n = T.t(s, dir, "nation")
    val r = T.t(s, dir, "region").filter($"r_name" === "EUROPE")
    val p = T.t(s, dir, "part")
      .filter($"p_size" <= 15 && $"p_type" === "LARGE")
    val cand = ps
      .join(broadcast(su.join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .select($"p_partkey", $"p_name", $"s_name", $"s_acctbal", $"n_name")
    val minBal = cand.groupBy($"p_partkey".as("mk"))
      .agg(min($"s_acctbal").as("min_bal"))
    cand.join(minBal, $"p_partkey" === $"mk" && $"s_acctbal" === $"min_bal")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  /** Q3 shape: shipping-priority top-k — segment dim filter, disjoint
    * date ranges on both fact tables (pushed to both scans), top 10
    * via TakeOrderedAndProject.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val o = T.t(s, dir, "orders")
      .filter($"o_orderdate" < lit("1997-06-01").cast("timestamp"))
    val l = T.t(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1997-06-01").cast("timestamp"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(discPrice($"l_extendedprice", $"l_discount"))
        .cast(DoubleType).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** Q5 shape: local-supplier volume — the classic same-nation
    * co-partner join (c_nationkey = s_nationkey rides the join
    * condition, not a post-filter), region dim chain broadcast.
    */
  def q5Local(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val o = T.t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val c = T.t(s, dir, "customer")
    val su = T.t(s, dir, "supplier")
    val n = T.t(s, dir, "nation")
    val r = T.t(s, dir, "region").filter($"r_name" === "ASIA")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(su), $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(discPrice($"l_extendedprice", $"l_discount"))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("cnt"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Q8 shape: national market share — two-level dim chain on the
    * customer side restricts the market; the share is a conditional
    * ratio over the supplier's nation, one exact decimal sum each.
    */
  def q8Share(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val p = T.t(s, dir, "part").filter($"p_type" === "ECONOMY")
    val o = T.t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val c = T.t(s, dir, "customer")
    val su = T.t(s, dir, "supplier")
    val n1 = T.t(s, dir, "nation")
    val r = T.t(s, dir, "region").filter($"r_name" === "AMERICA")
    val dp = discPrice($"l_extendedprice", $"l_discount")
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(su), $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy(year($"o_orderdate").cast(LongType).as("o_year"))
      .agg((sum(when($"s_nationkey" === 3, dp)
        .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType) /
        sum(dp).cast(DoubleType)).as("mkt_share"),
        count(lit(1)).as("n"))
      .orderBy($"o_year")
  }

  /** Q9 shape: product-type profit — LIKE-filtered part dim, profit =
    * revenue − cost where both terms are exact decimal sums and the
    * 0.1 cost factor is applied once on the final DOUBLE (identical
    * expression tree in the oracle, so bit-identical results).
    */
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val p = T.t(s, dir, "part").filter($"p_name".like("%widget%"))
    val su = T.t(s, dir, "supplier")
    val n = T.t(s, dir, "nation")
    val cost = $"p_retailprice".cast(DecimalType(18, 2)) *
      $"l_quantity".cast(DecimalType(18, 2))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(su), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"l_shipdate").cast(LongType).as("o_year"))
      .agg((sum(discPrice($"l_extendedprice", $"l_discount")).cast(DoubleType) -
        lit(0.1) * sum(cost).cast(DoubleType)).as("sum_profit"),
        count(lit(1)).as("n"))
      .orderBy($"n_name", $"o_year")
  }

  /** Q11 shape: important-stock threshold — per-key value vs a global
    * scalar-subquery fraction of the total; the global agg broadcasts
    * as a one-row join, the per-key agg is the only data shuffle.
    */
  def q11Stock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val value = l.groupBy($"l_partkey")
      .agg(T.dsum($"l_extendedprice").as("value"))
    val threshold = l.agg((T.dsum($"l_extendedprice") * 0.0006).as("thr"))
    value.join(broadcast(threshold))
      .filter($"value" > $"thr")
      .select($"l_partkey", $"value")
      .orderBy($"value".desc, $"l_partkey")
  }

  /** Q12 shape: priority-by-category conditional counts — the date
    * range and category IN-list push to the lineitem scan; the join
    * carries only the priority column.
    */
  def q12Priority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
      .filter($"l_returnflag".isin("A", "R") &&
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
    val o = T.t(s, dir, "orders")
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  /** Q13 shape: customer order-count distribution — LEFT join with a
    * non-trivial join-side predicate (must stay in the join condition,
    * not become a scan filter, or empty customers vanish), then a
    * second aggregation over the first's output.
    */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
    val o = T.t(s, dir, "orders")
    c.join(o, $"c_custkey" === $"o_custkey" &&
      $"o_orderpriority" =!= "4-NOT SPECIFIED", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Q15 shape: top supplier — argmax by scalar subquery; the revenue
    * agg is computed once and reused for both the max and the
    * equality probe (self-join on the aggregated view, not a rescan).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = T.t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(discPrice($"l_extendedprice", $"l_discount"))
        .cast(DoubleType).as("total_revenue"))
    val maxRev = rev.agg(max($"total_revenue").as("max_rev"))
    T.t(s, dir, "supplier")
      .join(rev, $"s_suppkey" === $"l_suppkey")
      .join(broadcast(maxRev))
      .filter($"total_revenue" === $"max_rev")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** Q18 shape: large-volume customers — the HAVING pre-aggregation
    * shrinks the fact to qualifying orderkeys BEFORE the joins (the
    * canonical aggregate-then-join rewrite), then top-100.
    */
  def q18Volume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = T.t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 180.0)
    T.t(s, dir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(T.t(s, dir, "customer"), $"c_custkey" === $"o_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** Q20 shape: promotion-eligible suppliers — IN over an aggregated
    * HAVING subquery plans as agg → distinct keys → LEFT SEMI join;
    * the supplier side stays tiny so the semi join broadcasts.
    */
  def q20Promotion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qualifying = T.t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(T.t(s, dir, "part").filter($"p_name".like("red%"))),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum($"l_quantity").as("q"))
      .filter($"q" > 45.0)
      .select($"l_suppkey")
    T.t(s, dir, "supplier")
      .join(broadcast(T.t(s, dir, "nation").filter($"n_regionkey" === 2)),
        $"s_nationkey" === $"n_nationkey")
      .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_name", $"s_acctbal")
      .orderBy($"s_name")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_mincost" -> (q2MinCost(_, _)),
    "q3_shipping" -> (q3Shipping(_, _)),
    "q5_local" -> (q5Local(_, _)),
    "q8_share" -> (q8Share(_, _)),
    "q9_profit" -> (q9Profit(_, _)),
    "q11_stock" -> (q11Stock(_, _)),
    "q12_priority" -> (q12Priority(_, _)),
    "q13_custdist" -> (q13CustDist(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q18_volume" -> (q18Volume(_, _)),
    "q20_promotion" -> (q20Promotion(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "q2_mincost" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |cand AS (SELECT p_partkey, p_name, s_name, s_acctbal, n_name FROM ps
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_size <= 15 AND p_type = 'LARGE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name FROM cand c
        |WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
        |                   WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q3_shipping" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  CAST(SUM($sqlDiscPrice) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01'
         |  AND l_shipdate > TIMESTAMP '1997-06-01'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local" ->
      s"""SELECT n_name, CAST(SUM($sqlDiscPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS cnt
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q8_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(SUM(CASE WHEN s_nationkey = 3 THEN $sqlDiscPrice
         |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
         |  CAST(SUM($sqlDiscPrice) AS DOUBLE) AS mkt_share,
         |  COUNT(*) AS n
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_profit" ->
      s"""SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
         |  CAST(SUM($sqlDiscPrice) AS DOUBLE)
         |  - 0.1 * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) *
         |                   CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_profit,
         |  COUNT(*) AS n
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_stock" ->
      s"""WITH v AS (SELECT l_partkey, ${sqlDsum("l_extendedprice")} AS value
         |           FROM lineitem GROUP BY 1)
         |SELECT l_partkey, value FROM v
         |WHERE value > (SELECT ${sqlDsum("l_extendedprice")} * 0.0006
         |               FROM lineitem)
         |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A','R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    CAST(SUM($sqlDiscPrice) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q18_volume" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 180.0) big
        |JOIN orders ON o_orderkey = big.l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q20_promotion" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 2
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 45.0)
        |ORDER BY s_name""".stripMargin)
}
