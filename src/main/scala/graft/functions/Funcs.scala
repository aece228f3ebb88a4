package graft.functions

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface — SURVEY.md §2.9.
  *
  * The reference leans on htsjdk record methods (flag-bit tests,
  * cigar decode, tag maps — BamRecordGuesser.java:174-234); the new
  * engine exposes the codegen'd built-in function families instead.
  * Everything here stays inside whole-stage codegen — no UDFs.
  */
object Funcs extends QueryModule {

  /** String family: substring/upper/length/concat/trim/lpad. */
  def fnString(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "customer")
      .select(
        $"c_custkey",
        upper($"c_mktsegment").as("seg_up"),
        substring($"c_name", 1, 8).as("name_pfx"),
        length($"c_name").as("name_len"),
        concat_ws("-", $"c_mktsegment", $"c_custkey").as("tag"),
        lpad($"c_custkey".cast(StringType), 10, "0").as("key_pad"))
      .orderBy($"c_custkey")
  }

  /** Flag-bitfield ops (SAMFlag.isSet → & / >> on int columns). */
  def fnFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        ($"l_linenumber".bitwiseAND(3)).as("flag_lo"),
        shiftright($"l_orderkey", 2).as("key_shift"),
        ($"l_linenumber".bitwiseAND(1) =!= 0).as("is_odd"))
      .filter($"l_orderkey" % 997 === 0)
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Math family; transcendentals rounded (libm vs Math ulp drift). */
  def fnMath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "orders")
      .select(
        $"o_orderkey",
        abs($"o_totalprice" - 100000.0).as("abs_dev"),
        round($"o_totalprice", -2).as("price_100"),
        round(log($"o_totalprice"), 6).as("ln_price"),
        round(sqrt($"o_totalprice"), 6).as("sqrt_price"),
        round(pow($"o_totalprice", lit(0.25)), 6).as("price_q"))
      .filter($"o_orderkey" % 499 === 0)
      .orderBy($"o_orderkey")
  }

  /** Date/time family (genomic intervals generalized to temporal). */
  def fnDate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        datediff($"o_orderdate", lit("1995-01-01").cast(DateType)).as("days_since"),
        last_day($"o_orderdate").as("month_end"),
        date_trunc("quarter", $"o_orderdate").as("qtr"))
      .filter($"o_orderkey" % 499 === 0)
      .orderBy($"o_orderkey")
  }

  /** Array family over tokenized text (cigar-ops analogue). */
  def fnArray(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    T.t(s, dir, "documents")
      .select(
        $"doc_id",
        size(toks).as("n_toks"),
        size(array_distinct(toks)).as("n_uniq"),
        element_at(toks, 1).as("first_tok"),
        array_contains(toks, "spark").as("has_spark"))
      .orderBy($"doc_id")
  }

  /** Higher-order lambda functions — the codegen-friendly array
    * pipeline surface (filter/transform/aggregate/exists/zip_with)
    * that replaces per-row UDFs: every lambda stays inside Catalyst,
    * so the whole projection is one whole-stage-codegen span over the
    * scan. (The engine's own operators lean on these — sign-LSH
    * bucketing, int8 quantization — this query pins the user-facing
    * surface.)
    */
  def fnLambda(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    T.t(s, dir, "documents")
      .select(
        $"doc_id",
        size(filter(toks, t => length(t) > 4)).as("n_long"),
        aggregate(transform(toks, t => length(t).cast(LongType)),
          lit(0L), (a, x) => a + x).as("len_sum"),
        exists(toks, t => t === "the").as("has_the"),
        forall(toks, t => length(t) < 30).as("all_short"),
        array_max(zip_with(toks, reverse(toks),
          (a, b) => length(a) + length(b))).as("max_pairlen"))
      .orderBy($"doc_id")
  }

  /** Error-safe arithmetic/cast family (`try_*`) — the expression-
    * level counterpart of the source-level stringency modes (F5):
    * divide-by-zero, numeric overflow, and unparseable casts yield
    * NULL instead of failing the job — on a 100 TB input, one bad
    * row must never kill the query. Oracle mirrors each null rule
    * with explicit CASE/TRY_CAST.
    */
  def fnTry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "orders")
      .filter($"o_orderkey" % 499 === 0)
      .select(
        $"o_orderkey",
        expr("try_divide(o_totalprice, o_orderkey % 3)").as("div3"),
        expr("try_cast(o_orderpriority AS INT)").as("prio_num"),
        expr("try_add(9223372036854775807L, o_orderkey)").as("ovf"),
        expr("try_multiply(4611686018427387904L, o_orderkey % 3)").as("mul_ovf"))
      .orderBy($"o_orderkey")
  }

  /** Map family (tags / INFO analogue): parse the JSON props into a
    * MapType and extract through it.
    */
  def fnMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = from_json($"props", MapType(StringType, IntegerType))
    T.events(s, dir)
      .select(
        $"event_id",
        element_at(m, "k").as("k_val"),
        size(map_keys(m)).as("n_keys"))
      .orderBy($"event_id")
  }

  /** Conditional family: CASE WHEN / coalesce / nullif. */
  def fnCond(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "customer")
      .select(
        $"c_custkey",
        when($"c_acctbal" < 0, "neg")
          .when($"c_acctbal" < 5000, "mid")
          .otherwise("high").as("bal_band"),
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("OTHER"))
          .as("seg_or_other"))
      .orderBy($"c_custkey")
  }

  /** JSON family over events.props (VCF INFO analogue). */
  def fnJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = get_json_object($"props", "$.k").cast(IntegerType)
    T.events(s, dir)
      .groupBy((k % 10).as("k_bucket"))
      .agg(count(lit(1)).as("cnt"), dsum($"value", 6).as("sum_value"))
      .orderBy($"k_bucket")
  }

  /** Null semantics: nullif-generated nulls through count/count(col),
    * null-safe equality, and coalesce chains — SQL three-valued logic
    * parity (Spark <=> ≡ DuckDB IS NOT DISTINCT FROM).
    */
  def fnNulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seg = nullif($"c_mktsegment", lit("BUILDING"))
    T.t(s, dir, "customer")
      .select($"c_custkey", seg.as("seg"), $"c_nationkey")
      .groupBy($"c_nationkey")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"seg").as("n_nonnull"),
        count(when($"seg".isNull, 1)).as("n_null"),
        count(when($"seg" <=> lit(null), 1)).as("n_nullsafe_eq"))
      .orderBy($"c_nationkey")
  }

  /** Raw-SQL front door with a correlated scalar subquery — the
    * engine's spark.sql surface over registered views (decorrelated
    * by Catalyst into a join, not a per-row loop).
    */
  def sqlScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    T.t(s, dir, "orders").createOrReplaceTempView("g_orders")
    T.t(s, dir, "customer").createOrReplaceTempView("g_customer")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT MAX(o_totalprice) FROM g_orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM g_customer
        |WHERE c_custkey % 7 = 0
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4's native WITH RECURSIVE, executed as a
    * UnionLoop): every customer key walks the implicit decimal-trim
    * tree parent(k) = k DIV 10 up to root 0 — an iterative hierarchy
    * traversal expressed declaratively, each recursion step a
    * distributed join-free map over the previous frontier. Depth is
    * data-dependent (digit count), which a fixed self-join chain
    * cannot express. The aggregate pins the full closure.
    */
  def sqlRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    val df = sqlRecursiveCteScoped(s, dir)
    // the result is a ~10-row aggregate: rebuild it on the caller's
    // session so downstream code never holds the scoped one
    s.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)
  }

  /** The recursive plan on its SCOPED session, pre-collect — the
    * UnionLoop plan PlanQualitySpec pins lives here (the public query
    * above re-materializes the tiny aggregate on the caller's
    * session, so its own plan is a LocalRelation by design).
    */
  private[graft] def sqlRecursiveCteScoped(s: SparkSession,
      dir: String): DataFrame = {
    // Spark guards UnionLoop with spark.sql.cteRecursionRowLimit
    // (1M accumulated rows by default); the walk emits
    // ~|customer| x digit-count rows, which clears 1M past sf0.5 —
    // scale the guard in an ISOLATED child session (same pattern as
    // withRuntimeBloomFilter: the parent session's conf is never
    // touched). A production job sizes this conf with its data.
    val scoped = s.newSession()
    scoped.conf.set("spark.sql.cteRecursionRowLimit", "2000000000")
    T.t(scoped, dir, "customer").createOrReplaceTempView("g_customer")
    scoped.sql(
      """WITH RECURSIVE walk(c_custkey, node, depth) AS (
        |  SELECT c_custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
        |  FROM g_customer
        |  UNION ALL
        |  SELECT c_custkey, node DIV 10, depth + 1 FROM walk WHERE node > 0)
        |SELECT CAST(depth AS INT) AS depth, COUNT(*) AS cnt,
        |  CAST(SUM(c_custkey) AS BIGINT) AS key_sum
        |FROM walk WHERE node = 0
        |GROUP BY depth ORDER BY depth""".stripMargin)
  }

  /** Generator/UDTF family via explode: token table from the text
    * column (one row per distinct doc token).
    */
  def fnExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "documents")
      .select($"doc_id",
        explode(array_distinct(split($"text", " "))).as("tok"))
      .orderBy($"doc_id", $"tok")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_explode" -> (fnExplode(_, _)),
    "fn_nulls" -> (fnNulls(_, _)),
    "sql_scalar_subquery" -> (sqlScalarSubquery(_, _)),
    "sql_recursive_cte" -> (sqlRecursiveCte(_, _)),
    "fn_string" -> (fnString(_, _)),
    "fn_flags" -> (fnFlags(_, _)),
    "fn_math" -> (fnMath(_, _)),
    "fn_date" -> (fnDate(_, _)),
    "fn_array" -> (fnArray(_, _)),
    "fn_lambda" -> (fnLambda(_, _)),
    "fn_try" -> (fnTry(_, _)),
    "fn_map" -> (fnMap(_, _)),
    "fn_cond" -> (fnCond(_, _)),
    "fn_json" -> (fnJson(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "fn_explode" ->
      """SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |FROM documents ORDER BY doc_id, tok""".stripMargin,
    "fn_nulls" ->
      """SELECT c_nationkey, COUNT(*) AS n_rows,
        |  COUNT(nullif(c_mktsegment, 'BUILDING')) AS n_nonnull,
        |  COUNT(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL
        |             THEN 1 END) AS n_null,
        |  COUNT(CASE WHEN nullif(c_mktsegment, 'BUILDING')
        |             IS NOT DISTINCT FROM NULL THEN 1 END) AS n_nullsafe_eq
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE walk(c_custkey, node, depth) AS (
        |  SELECT c_custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, node // 10, depth + 1 FROM walk WHERE node > 0)
        |SELECT CAST(depth AS INT) AS depth, COUNT(*) AS cnt,
        |  CAST(SUM(c_custkey) AS BIGINT) AS key_sum
        |FROM walk WHERE node = 0
        |GROUP BY depth ORDER BY depth""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT MAX(o_totalprice) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer WHERE c_custkey % 7 = 0
        |ORDER BY c_custkey""".stripMargin,
    "fn_string" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_up,
        |  substring(c_name, 1, 8) AS name_pfx,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tag,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_flags" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_linenumber & 3 AS flag_lo,
        |  l_orderkey >> 2 AS key_shift,
        |  (l_linenumber & 1) <> 0 AS is_odd
        |FROM lineitem WHERE l_orderkey % 997 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_math" ->
      """SELECT o_orderkey,
        |  abs(o_totalprice - 100000.0) AS abs_dev,
        |  round(o_totalprice, -2) AS price_100,
        |  round(ln(o_totalprice), 6) AS ln_price,
        |  round(sqrt(o_totalprice), 6) AS sqrt_price,
        |  round(pow(o_totalprice, 0.25), 6) AS price_q
        |FROM orders WHERE o_orderkey % 499 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    AS days_since,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr
        |FROM orders WHERE o_orderkey % 499 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
        |  string_split(text, ' ')[1] AS first_tok,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_try" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |       ELSE o_totalprice / (o_orderkey % 3) END AS div3,
        |  TRY_CAST(o_orderpriority AS INT) AS prio_num,
        |  CASE WHEN o_orderkey = 0 THEN 9223372036854775807
        |       ELSE CAST(NULL AS BIGINT) END AS ovf,
        |  CASE o_orderkey % 3 WHEN 0 THEN 0
        |       WHEN 1 THEN 4611686018427387904 ELSE NULL END AS mul_ovf
        |FROM orders WHERE o_orderkey % 499 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "fn_lambda" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> len(x) > 4)) AS INT) AS n_long,
        |  CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT)
        |    AS len_sum,
        |  list_contains(toks, 'the') AS has_the,
        |  len(list_filter(toks, x -> len(x) >= 30)) = 0 AS all_short,
        |  CAST(list_max([len(toks[i]) + len(toks[len(toks) + 1 - i])
        |    FOR i IN generate_series(1, len(toks))]) AS INT) AS max_pairlen
        |FROM t ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        |  1 AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_cond" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS bal_band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_json" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INT) % 10 AS k_bucket,
         |  COUNT(*) AS cnt, ${sqlDsum("value", 6)} AS sum_value
         |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin)
}
