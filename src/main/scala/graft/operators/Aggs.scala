package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators — SURVEY.md §2.5.
  *
  * The reference's only aggregation is distributed index construction:
  * per-partition partials merged on the driver (IndexFileMerger
  * .java:62-102) — exactly Spark's partial/final hash-aggregate split,
  * which every groupBy below gets automatically (map-side combine, no
  * raw-row shuffle).
  */
object Aggs extends QueryModule {

  /** A6: record count (the reference's universal test oracle,
    * HtsjdkReadsRddTest.java:141-156).
    */
  def aggCount(s: SparkSession, dir: String): DataFrame =
    T.t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** Hash aggregate with the full accumulator set; avg expressed as
    * exact decimal sum / count for cross-engine determinism.
    */
  def aggGroupby(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("cnt"),
        dsum($"l_quantity").as("sum_qty"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"))
      .orderBy($"l_returnflag")
  }

  /** Exact per-group MODE with a deterministic tiebreak (highest
    * count, then smallest value — Spark's builtin `mode` leaves ties
    * undefined, which kills cross-engine hashing). Two-level
    * aggregate: (group, value) counts map-side combine, then argmax
    * as max(struct(cnt, -value)) — the same hash-agg-not-window shape
    * that sped up graph_labelprop. Cost O(distinct values), no sort.
    */
  def aggMode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_quantity".cast("long").as("q"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"l_returnflag")
      .agg(max(struct($"c", (-$"q").as("nq"))).as("m"))
      .select($"l_returnflag", (-$"m.nq").as("mode_qty"),
        $"m.c".as("mode_cnt"))
      .orderBy($"l_returnflag")
  }

  /** Exact distinct counts (expand + two-phase agg under the hood). */
  def aggDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_orderkey").as("n_orders"))
  }

  /** HLL++ relative standard deviation used by aggApproxDistinct. */
  val ApproxRsd = 0.02

  /** HLL++ approximate distinct, ORACLE-GATED: DuckDB's
    * approx_count_distinct is a different sketch, so the raw
    * estimates can never hash-match — instead the query emits the
    * EXACT distinct counts (cross-checked against DuckDB's
    * COUNT(DISTINCT)) plus booleans asserting the HLL estimate lands
    * within 2·rsd of exact. The oracle expects `true`: an
    * out-of-bound sketch flips the boolean and fails the hash
    * compare, so the error bound itself is driver-gated (the
    * reference's count-oracle discipline,
    * HtsjdkReadsRddTest.java:141-156, applied to a sketch).
    */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // two single-pass aggregates + a 1x1 cross join: mixing
    // countDistinct with the HLL aggregates in ONE agg makes the
    // planner expand every input row per distinct group (measured
    // ~5x slower than the two clean passes)
    val approx = T.t(s, dir, "lineitem")
      .agg(
        approx_count_distinct($"l_partkey", ApproxRsd).as("ap"),
        approx_count_distinct($"l_orderkey", ApproxRsd).as("ao"))
    val exact = T.t(s, dir, "lineitem")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_orderkey").as("n_orders"))
    exact.crossJoin(approx)
      .select($"n_parts", $"n_orders",
        (abs($"ap" - $"n_parts") <= $"n_parts" * (2 * ApproxRsd))
          .as("parts_within_2rsd"),
        (abs($"ao" - $"n_orders") <= $"n_orders" * (2 * ApproxRsd))
          .as("orders_within_2rsd"))
  }

  /** EXACT distinct count via bitmap partial aggregation — the
    * roaring-bitmap-style two-level distinct that scales where
    * `COUNT(DISTINCT)`'s expand does not: keys map to (bucket, bit
    * position), each (group, bucket) aggregates a fixed-size bitmap
    * map-side (bitmap_construct_agg), and the per-bucket popcounts
    * sum — every shuffle row is one bitmap, not one key occurrence.
    * Same answer as COUNT(DISTINCT), which is the oracle.
    */
  def aggBitmapDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.events(s, dir)
      .select($"event_type",
        expr("bitmap_bucket_number(user_id)").as("bkt"),
        expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy($"event_type", $"bkt")
      .agg(expr("bitmap_count(bitmap_construct_agg(pos))").as("c"))
      .groupBy($"event_type")
      .agg(sum($"c").as("n_users"))
      .orderBy($"event_type")
  }

  /** MERGEABLE distinct-count sketches — Apache DataSketches HLL via
    * hll_sketch_agg/hll_union_agg: per-shard sketches built
    * independently (the per-part partial index), unioned WITHOUT
    * touching the data again (the driver-merge pattern,
    * IndexFileMerger.java:62-102, as an algebraic aggregate), then
    * estimated. Like agg_approx_distinct, the emitted row is the
    * EXACT count plus an in-bound boolean (default lgK=12 ⇒ rsd
    * ≈1.6%; 3·rsd bound), so the sketch's error is itself
    * driver-gated against DuckDB's exact count.
    */
  def aggHllUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = T.t(s, dir, "lineitem")
    val est = li.withColumn("shard", pmod($"l_orderkey", lit(4)))
      .groupBy($"shard")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = li.agg(countDistinct($"l_partkey").as("n_parts"))
    exact.crossJoin(est)
      .select($"n_parts",
        (abs($"est" - $"n_parts") <= $"n_parts" * 0.05).as("within_5pct"))
  }

  /** Aggregate PUSHDOWN to the parquet footers: COUNT/MIN/MAX
    * answered from file METADATA — zero data pages read, cost
    * O(files) not O(rows) — the reference's "the index answers the
    * count" discipline (count oracles against .sbi record counts,
    * HtsjdkReadsRddTest.java:141-156) as a Catalyst capability. Needs
    * the V2 parquet source (`useV1SourceList` cleared for parquet)
    * plus `parquet.aggregatePushdown`; both are scoped to the read
    * resolution and restored. PlanQualitySpec asserts the plan
    * carries PushedAggregation and no row-level scan.
    */
  /** Scoped V2-parquet + aggregate-pushdown confs. Session-global
    * V2-parquet would change every scan in the suite (and lose
    * bucketed-scan support), so the scope is narrow — and because
    * pushdown is decided at OPTIMIZATION time, anything that must see
    * it has to PLAN (or run) inside `body`, not after (the
    * fresh-QueryExecution trap ADVICE.md flagged on the interval
    * confs).
    */
  private[graft] def withV2ParquetPushdown[A](s: SparkSession)(body: => A): A = {
    val pushKey = "spark.sql.parquet.aggregatePushdown"
    val v1Key = "spark.sql.sources.useV1SourceList"
    val prevPush = s.conf.getOption(pushKey)
    val prevV1 = s.conf.getOption(v1Key)
    s.conf.set(pushKey, "true")
    s.conf.set(v1Key,
      prevV1.getOrElse("avro,csv,json,kafka,orc,parquet,text")
        .split(",").filterNot(_.trim == "parquet").mkString(","))
    try body finally {
      prevPush match {
        case Some(v) => s.conf.set(pushKey, v); case None => s.conf.unset(pushKey)
      }
      prevV1 match {
        case Some(v) => s.conf.set(v1Key, v); case None => s.conf.unset(v1Key)
      }
    }
  }

  /** The whole-table stats query, unresolved — planned by the caller
    * inside (query/gate) or outside (never pushes) the conf scope.
    */
  private[graft] def pushdownAggDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .agg(
        expr("count(*)").as("cnt"),
        min($"l_orderkey").as("min_key"),
        max($"l_orderkey").as("max_key"))
  }

  def aggPushdownStats(s: SparkSession, dir: String): DataFrame = {
    // the metadata lookup EXECUTES inside the scope (one row, one
    // collect — the operator IS a footer read); the returned local
    // DataFrame re-plans safely anywhere
    val (rows, schema) = withV2ParquetPushdown(s) {
      val df = pushdownAggDf(s, dir)
      (df.collect(), df.schema)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** UNPIVOT/melt — wide measures to long (variable, value) rows,
    * the inverse of agg_pivot: a zero-shuffle Expand over the
    * aggregated table (each input row emits one row per measure).
    */
  def aggUnpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        dsum($"l_quantity").as("qty"),
        dsum($"l_extendedprice").as("price"),
        dsum($"l_discount", 4).as("disc"))
      .unpivot(Array($"l_returnflag"),
        Array($"qty", $"price", $"disc"), "measure", "val")
      .orderBy($"l_returnflag", $"measure")
  }

  /** Grouping-sets rollup; NULLS FIRST pinned on both engines. */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Explicit GROUPING SETS (the general form rollup/cube sugar
    * over): an asymmetric set list — both keys, each key alone, and
    * the grand total — with grouping() flags disambiguating real
    * NULL keys from collapsed ones. Plans as a single Expand + hash
    * agg (one pass over the fact table, not one scan per set).
    */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    T.t(s, dir, "lineitem").createOrReplaceTempView("ga_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM ga_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status,
        |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** Full cube over the two flag columns. */
  def aggCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** A1-A5: zone-map build — the SBI/BAI index analogue
    * (HeaderlessBamOutputFormat.java:111-130): per-zone min/max/count
    * over the clustering key. Zones here are deterministic key ranges
    * so the DuckDB oracle can check exactly; the per-partition variant
    * (spark_partition_id) is exercised in tests.
    */
  def aggZonemap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .groupBy(floor($"l_orderkey" / 1000L).cast(LongType).as("zone"))
      .agg(
        min($"l_shipdate").as("min_ship"),
        max($"l_shipdate").as("max_ship"),
        count(lit(1)).as("cnt"))
      .orderBy($"zone")
  }

  /** Moment-based stats from exact decimal sums (deterministic
    * stddev: sqrt((n*Σx² − (Σx)²) / n²) on identical doubles).
    */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sx = sum($"l_quantity".cast(DecimalType(18, 2))).cast(DoubleType)
    val sx2 = sum(($"l_quantity".cast(DecimalType(18, 2)) *
      $"l_quantity".cast(DecimalType(18, 2)))).cast(DoubleType)
    val n = count(lit(1))
    T.t(s, dir, "lineitem")
      .groupBy($"l_linestatus")
      .agg(
        n.as("cnt"),
        sx.as("sum_qty"),
        round(sqrt(sx2 / n - (sx / n) * (sx / n)), 6).as("stddev_pop_qty"))
      .orderBy($"l_linestatus")
  }

  /** Salted two-phase aggregation — the skew pattern: key ⊕ salt
    * partial agg spreads a hot key over N reducers, then the final
    * agg drops the salt. (Spark's partial/final split already does
    * map-side combine; explicit salting additionally splits a hot
    * key's REDUCE work, which matters when one key dominates.)
    */
  def aggSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val salted = T.t(s, dir, "lineitem")
      .withColumn("salt", pmod(crc32($"l_orderkey".cast("string")), lit(16)))
      .groupBy($"l_returnflag", $"salt")
      .agg(count(lit(1)).as("c"),
        sum($"l_quantity".cast(DecimalType(18, 2))).as("q"))
    salted.groupBy($"l_returnflag")
      .agg(sum($"c").as("cnt"), sum($"q").cast(DoubleType).as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** Pivot: long→wide reshape with per-cell aggregates (explicit
    * pivot values so the plan skips the distinct-discovery job).
    */
  def aggPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .withColumnRenamed("F", "n_f")
      .withColumnRenamed("O", "n_o")
      .na.fill(0L, Seq("n_f", "n_o"))
      .orderBy($"l_returnflag")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pivot" -> (aggPivot(_, _)),
    "agg_salted" -> (aggSalted(_, _)),
    "agg_count" -> (aggCount(_, _)),
    "agg_groupby" -> (aggGroupby(_, _)),
    "agg_mode" -> (aggMode(_, _)),
    "agg_distinct" -> (aggDistinct(_, _)),
    "agg_approx_distinct" -> (aggApproxDistinct(_, _)),
    "agg_bitmap_distinct" -> (aggBitmapDistinct(_, _)),
    "agg_unpivot" -> (aggUnpivot(_, _)),
    "agg_pushdown_stats" -> (aggPushdownStats(_, _)),
    "agg_hll_union" -> (aggHllUnion(_, _)),
    "agg_rollup" -> (aggRollup(_, _)),
    "agg_grouping_sets" -> (aggGroupingSets(_, _)),
    "agg_cube" -> (aggCube(_, _)),
    "agg_zonemap" -> (aggZonemap(_, _)),
    "agg_stats" -> (aggStats(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status,
        |  l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_count" -> "SELECT COUNT(*) AS cnt FROM lineitem",
    "agg_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  true AS parts_within_2rsd, true AS orders_within_2rsd
        |FROM lineitem""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_pushdown_stats" ->
      """SELECT COUNT(*) AS cnt, MIN(l_orderkey) AS min_key,
        |  MAX(l_orderkey) AS max_key
        |FROM lineitem""".stripMargin,
    "agg_unpivot" ->
      s"""WITH w AS (
         |  SELECT l_returnflag,
         |    ${sqlDsum("l_quantity")} AS qty,
         |    ${sqlDsum("l_extendedprice")} AS price,
         |    ${sqlDsum("l_discount", 4)} AS disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, measure, val FROM (
         |  SELECT l_returnflag, 'qty' AS measure, qty AS val FROM w
         |  UNION ALL
         |  SELECT l_returnflag, 'price', price FROM w
         |  UNION ALL
         |  SELECT l_returnflag, 'disc', disc FROM w)
         |ORDER BY l_returnflag, measure""".stripMargin,
    "agg_hll_union" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts, true AS within_5pct
        |FROM lineitem""".stripMargin,
    "agg_salted" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_pivot" ->
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_groupby" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  MIN(l_extendedprice) AS min_price,
         |  MAX(l_extendedprice) AS max_price,
         |  ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """WITH cells AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |ranked AS (
        |  SELECT l_returnflag, q, c,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY c DESC, q) AS rk
        |  FROM cells)
        |SELECT l_returnflag, q AS mode_qty, c AS mode_cnt
        |FROM ranked WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    "agg_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_zonemap" ->
      """SELECT CAST(floor(l_orderkey / 1000) AS BIGINT) AS zone,
        |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY zone""".stripMargin,
    "agg_stats" ->
      s"""SELECT l_linestatus, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  round(sqrt(
         |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
         |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         |    - (${sqlDsum("l_quantity")} / COUNT(*))
         |      * (${sqlDsum("l_quantity")} / COUNT(*))), 6)
         |    AS stddev_pop_qty
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
}
