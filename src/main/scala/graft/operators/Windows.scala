package graft.operators

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window functions — SURVEY.md §2.6.
  *
  * The reference's one window-shaped semantic is the 1-row lag inside
  * the BAI writer (HeaderlessBamOutputFormat.java:104-118); the full
  * surface (ranking / analytic / framed aggregates) is what users of
  * the distributed collections run.
  */
object Windows extends QueryModule {

  /** RUNNING DISTINCT COUNT per partition — the window Spark has no
    * builtin for (count(distinct) over a running frame is
    * unsupported), expressed exactly with the first-occurrence trick:
    * row_number over (user, event_type) marks each type's first
    * arrival, and the running sum of those flags over the event-time
    * order is the distinct-so-far count. Two window passes over ONE
    * partitioning (user_id) — no distinct state, no O(frame²)
    * rescans; at 100 TB this is two in-partition sorts, nothing more.
    * Output: per user, the time-to-breadth curve's final point plus
    * when each new type arrived (rolled to a census for a stable
    * small result).
    */
  def winRunningDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firstSeen = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    val timeline = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    T.events(s, dir)
      .withColumn("first_of_type",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .withColumn("types_so_far", sum($"first_of_type").over(timeline))
      // census: how many events were observed at each breadth level
      .groupBy($"types_so_far")
      .agg(count(lit(1)).as("n_events"),
        count_distinct($"user_id").as("n_users"))
      .orderBy($"types_so_far")
  }

  /** Ranking trio. row_number gets a fully unique ordering
    * (deterministic); rank/dense_rank run on the quantity alone so
    * ties are visible yet results stay deterministic.
    */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val full = Window.partitionBy($"l_returnflag")
      .orderBy($"l_quantity".desc, $"l_orderkey", $"l_linenumber")
    val byQty = Window.partitionBy($"l_returnflag").orderBy($"l_quantity".desc)
    // row_number + filter FIRST: Spark's WindowGroupLimit pushes the
    // top-5-per-group limit below the shuffle (per-partition partial
    // limit), so the full table never sorts inside the 3 low-
    // cardinality group partitions. rank/dense_rank over the
    // survivors are IDENTICAL to ranking the full table for these
    // rows: every row with strictly greater quantity precedes a
    // survivor in the row_number order and therefore also survives.
    T.t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .withColumn("rn", row_number().over(full))
      .filter($"rn" <= 5)
      .withColumn("rnk", rank().over(byQty))
      .withColumn("drnk", dense_rank().over(byQty))
      .orderBy($"l_returnflag", $"rn")
  }

  /** Analytic lag/lead over per-user event streams (the BAI
    * previous-record lag generalized).
    */
  def winLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    T.events(s, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .drop("ts")
      .orderBy($"user_id", $"event_id")
  }

  /** ROWS frame: trailing-4 running sum per user (exact decimal). */
  def winFrameRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-3, 0)
    T.events(s, dir)
      .select($"user_id", $"event_id", $"value", $"ts")
      .withColumn("run_sum",
        sum($"value".cast(DecimalType(18, 6))).over(w).cast(DoubleType))
      .drop("ts")
      .orderBy($"user_id", $"event_id")
  }

  /** RANGE frame over a numeric ordering: orders within 100.0 below
    * the current total price, per priority class (partitioned so the
    * sort distributes; an unpartitioned RANGE window would serialize
    * onto one task at scale).
    */
  def winFrameRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice").rangeBetween(-100L, 0L)
    T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .withColumn("near_cnt", count(lit(1)).over(w))
      .withColumn("near_sum",
        sum($"o_totalprice".cast(DecimalType(18, 2))).over(w).cast(DoubleType))
      .orderBy($"o_orderkey")
  }

  /** Distribution functions: ntile buckets, percent_rank, cume_dist
    * ((rank-1)/(n-1) and rank/n are exact int ratios — identical
    * doubles on both engines).
    */
  def winDistribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy($"o_orderkey")
  }

  /** Positional value functions: first/last/nth over an explicit
    * full-partition frame, plus the IGNORE NULLS variant (last
    * non-null click per user — the gap-fill primitive) — the frame
    * must be stated UNBOUNDED..UNBOUNDED: last_value over the default
    * frame is the current row on both engines, a classic silent-wrong
    * default this query pins instead of tripping over.
    */
  def winNth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.events(s, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("first_ev", first($"event_type").over(w))
      .withColumn("last_ev", last($"event_type").over(w))
      .withColumn("third_ev", nth_value($"event_type", 3).over(w))
      .withColumn("last_click",
        last(when($"event_type" === "click", $"event_id"),
          ignoreNulls = true).over(w))
      .drop("ts")
      .orderBy($"user_id", $"event_id")
  }

  /** Batch sessionization — the gap-based session assignment every
    * clickstream/telemetry pipeline runs (the batch twin of
    * stream_session's session_window): a session break is a gap of
    * more than 8 hours since the user's previous event; the break
    * flags' running sum IS the session index (the classic
    * lag → flag → cumulative-sum idiom, two windows over ONE
    * per-user shuffle — Catalyst reuses the partitioning, no second
    * exchange). Durations in whole seconds (both engines floor to
    * the second before differencing, per the T.events truncation
    * contract).
    */
  def winSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    T.events(s, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("brk",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 28800L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"brk").over(w))
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
        min($"event_id").as("first_event"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts")))
          .as("dur_sec"))
      .orderBy($"user_id", $"session_idx")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_sessionize" -> (winSessionize(_, _)),
    "win_nth" -> (winNth(_, _)),
    "win_distribution" -> (winDistribution(_, _)),
    "win_rank" -> (winRank(_, _)),
    "win_running_distinct" -> (winRunningDistinct(_, _)),
    "win_lag" -> (winLag(_, _)),
    "win_frame_rows" -> (winFrameRows(_, _)),
    "win_frame_range" -> (winFrameRange(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "win_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('second', lag(ts) OVER w, ts) > 28800
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |x AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS session_idx
        |  FROM g)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event,
        |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur_sec
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "win_nth" ->
      """SELECT user_id, event_id, event_type,
        |  first_value(event_type) OVER w AS first_ev,
        |  last_value(event_type) OVER w AS last_ev,
        |  nth_value(event_type, 3) OVER w AS third_ev,
        |  last_value(CASE WHEN event_type = 'click' THEN event_id END
        |             IGNORE NULLS) OVER w AS last_click
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_distribution" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "win_running_distinct" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ROW_NUMBER() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) = 1
        |      THEN 1 ELSE 0 END AS first_of_type
        |  FROM events),
        |running AS (
        |  SELECT user_id,
        |    CAST(SUM(first_of_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS types_so_far
        |  FROM flagged)
        |SELECT types_so_far, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM running GROUP BY types_so_far ORDER BY types_so_far""".stripMargin,
    "win_rank" ->
      """SELECT * FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn,
        |    rank() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity DESC) AS drnk
        |  FROM lineitem) t
        |WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin,
    "win_lag" ->
      """SELECT user_id, event_id, event_type,
        |  lag(event_type, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lead(event_type, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "win_frame_rows" ->
      """SELECT user_id, event_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "win_frame_range" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  COUNT(*) OVER w AS near_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS near_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin)
}
