package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sorts, limits, clustering, set operations — SURVEY.md §2.7-2.8.
  *
  * The reference never sorts; it preserves and declares order
  * (README.md:148-167). The new engine both preserves order where the
  * contract needs it (sortWithinPartitions over range partitions) and
  * offers the full sort/top-k/set surface the reference delegates to
  * Spark.
  */
object SortsSets extends QueryModule {

  /** Global total-order sort: range-partitioned sample-based sort, the
    * scalable replacement for coordinate-sorted single files.
    */
  def sortGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .select($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
  }

  /** Order-preservation contract (README.md:148-161): range-partition
    * by key then sort within partitions — partition i's rows all
    * precede partition i+1's, reproducing disq's file-order semantics
    * without a single-point global sort.
    */
  def sortWithin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .repartitionByRange(8, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey", $"l_linenumber")
  }

  /** Top-k = TakeOrderedAndProject: per-partition heap + driver merge
    * of k, never a full global sort.
    */
  def topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }

  /** GROUPED top-k via the bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]): top-3 orders by price per
    * priority. Unlike `row_number() <= k` (full shuffle + sort of
    * every row) the map-side partial reduces each group to ≤k rows
    * per input partition BEFORE the exchange — shuffle volume
    * O(k·partitions·groups), the per-group analogue of
    * TakeOrderedAndProject. OperatorSpec pins result equality with
    * the window form and partition-count invariance; the plan gate
    * pins partial ObjectHashAggregate + no Window.
    */
  def topkGrouped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(graft.functions.TopKAgg.top_k_rows(
        struct($"o_totalprice", $"o_orderkey"), 3).as("top"))
      .select($"o_orderpriority", explode($"top").as("r"))
      .select($"o_orderpriority",
        $"r.o_totalprice".as("o_totalprice"),
        $"r.o_orderkey".as("o_orderkey"))
      .orderBy($"o_orderpriority", $"o_totalprice".desc,
        $"o_orderkey".desc)
  }

  /** Range clustering (coordinate-clustered layout,
    * repartitionByRange on the interval column) surfaced as a
    * per-month rollup of the clustered key.
    */
  def clusterRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .repartitionByRange(8, $"l_shipdate")
      .groupBy(date_trunc("month", $"l_shipdate").as("month"))
      .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"month")
  }

  /** Skyline (Pareto frontier) under strict dominance: parts where no
    * other part is BOTH strictly cheaper and strictly larger. Computed
    * as a running-max window over the price order — dominated(p) ⇔
    * max{size : price < p.price} > p.size — in TWO phases: a
    * partition-local pass (window keyed by spark_partition_id, fully
    * parallel) prunes everything locally dominated, then the exact
    * global window runs over the tiny survivor set. Strict dominance
    * is transitive, so a local eliminator is itself dominated only by
    * another survivor — the two-phase result equals the global
    * skyline, without ever sorting the full table into one partition.
    * Price is compared in exact DECIMAL cents (a double*100 cast can
    * round the wrong way at tie points — drift contract).
    */
  def sortSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val p = T.t(s, dir, "part")
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .withColumn("cents",
        ($"p_retailprice".cast(DecimalType(12, 2)) * 100).cast("long"))
    val localW = Window.partitionBy(spark_partition_id())
      .orderBy($"cents").rangeBetween(Window.unboundedPreceding, -1)
    val globalW = Window.orderBy($"cents")
      .rangeBetween(Window.unboundedPreceding, -1)
    def undominated(df: DataFrame,
        w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      df.withColumn("best", max($"p_size").over(w))
        .filter($"best".isNull || $"best" <= $"p_size")
        .drop("best")
    undominated(undominated(p, localW), globalW)
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .orderBy($"p_partkey")
  }

  /** UNION ALL of two disjoint scans (Iterators.concat of interval
    * hits + unmapped, AbstractBinarySamSource.java:153-154).
    */
  def setUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val hi = l.filter($"l_quantity" > 45)
      .select($"l_returnflag", $"l_quantity")
    val lo = l.filter($"l_quantity" < 5)
      .select($"l_returnflag", $"l_quantity")
    hi.union(lo)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** INTERSECT (distinct semantics on both engines). */
  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = T.t(s, dir, "lineitem")
      .filter($"l_quantity" > 48).select($"l_partkey".as("key"))
    val b = T.t(s, dir, "part")
      .filter($"p_size" > 40).select($"p_partkey".as("key"))
    a.intersect(b).orderBy($"key")
  }

  /** EXCEPT (distinct semantics on both engines). */
  def setExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = T.t(s, dir, "part")
      .filter($"p_size" > 40).select($"p_partkey".as("key"))
    val b = T.t(s, dir, "lineitem")
      .filter($"l_quantity" > 48).select($"l_partkey".as("key"))
    a.except(b).orderBy($"key")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_global" -> (sortGlobal(_, _)),
    "sort_within" -> (sortWithin(_, _)),
    "topk" -> (topk(_, _)),
    "topk_grouped" -> (topkGrouped(_, _)),
    "cluster_range" -> (clusterRange(_, _)),
    "sort_skyline" -> (sortSkyline(_, _)),
    "set_union" -> (setUnion(_, _)),
    "set_intersect" -> (setIntersect(_, _)),
    "set_except" -> (setExcept(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "sort_global" ->
      """SELECT l_shipdate, l_orderkey, l_linenumber, l_quantity
        |FROM lineitem ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "sort_within" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "topk_grouped" ->
      """SELECT o_orderpriority, o_totalprice, o_orderkey FROM (
        |  SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey DESC""".stripMargin,
    "topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "cluster_range" ->
      s"""SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
         |  COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1 ORDER BY month""".stripMargin,
    "sort_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice < p.p_retailprice
        |    AND q.p_size > p.p_size)
        |ORDER BY p_partkey""".stripMargin,
    "set_union" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM (
         |  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_quantity > 45
         |  UNION ALL
         |  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_quantity < 5
         |) u GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_intersect" ->
      """SELECT l_partkey AS key FROM lineitem WHERE l_quantity > 48
        |INTERSECT
        |SELECT p_partkey AS key FROM part WHERE p_size > 40
        |ORDER BY key""".stripMargin,
    "set_except" ->
      """SELECT p_partkey AS key FROM part WHERE p_size > 40
        |EXCEPT
        |SELECT l_partkey AS key FROM lineitem WHERE l_quantity > 48
        |ORDER BY key""".stripMargin)
}
