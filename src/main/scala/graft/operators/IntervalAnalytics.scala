package graft.operators

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed interval analytics — the data-scale complement of the
  * driver-side canonicalization in [[Intervals]] (SURVEY.md §2.3 F4,
  * reference `BoundedTraversalUtil.java:35-51`).
  *
  * The reference canonicalizes a HANDFUL of query intervals on the
  * driver before pushing them as predicates. At 100 TB the intervals
  * themselves are data (read alignments, feature tracks, session
  * spans), so the same three primitives every interval toolkit ships
  * (merge / coverage depth / closest — bedtools merge, genomecov,
  * closest) must run as distributed plans:
  *
  *  - each query shuffles ONCE on the grouping key (the genomic
  *    "contig" analogue) and does all interval logic inside the
  *    partition via window functions — no global sort, no
  *    interval-to-interval join, no per-base explode;
  *  - per-group state is O(breakpoints in the group), the same bound
  *    a single-node sweep-line pays, but sharded across executors;
  *  - at 1000 executors the plan shape is unchanged: group count
  *    (users/contigs) is the parallelism, per-group timelines spill
  *    to disk if oversized (sort-based window), nothing collects.
  *
  * Fixture: intervals derived from `events` — [start, start + dur]
  * closed second ranges with a deterministic per-event duration
  * (`event_id mod 14400`, ≤4 h), one timeline per user. Mean
  * inter-event gap (~10 h) vs mean duration (~2 h) gives a real mix
  * of overlapping runs and isolated islands.
  */
object IntervalAnalytics extends QueryModule {

  /** Derived closed intervals [start_s, end_s], one per event. */
  private def ivs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.events(s, dir).select(
      $"user_id",
      $"event_id",
      unix_timestamp($"ts").as("start_s"),
      (unix_timestamp($"ts") + pmod($"event_id", lit(14400L))).as("end_s"))
  }

  // epoch_us//1e6 truncates like Spark's unix_timestamp; DuckDB's
  // CAST(epoch(ts) AS BIGINT) ROUNDS half-up and drifts on events
  // with fractional seconds ≥ .5
  private val ivSql =
    """SELECT user_id, event_id,
      |  epoch_us(ts) // 1000000 AS start_s,
      |  epoch_us(ts) // 1000000 + event_id % 14400 AS end_s
      |FROM events""".stripMargin

  /** Merge overlapping-or-adjacent intervals per user (bedtools
    * merge, book-ended included): a row opens a new island iff its
    * start clears the running max end of everything sorted before it
    * by MORE than one — the same adjacency contract as the
    * driver-side [[Intervals.normalize]], property-tested equal in
    * IntervalSpec — and the running sum of open flags is the island
    * id. ONE
    * exchange on user_id; both windows and the final aggregate reuse
    * the same (user_id, start_s, end_s, event_id) in-partition sort.
    */
  def intervalMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"start_s", $"end_s", $"event_id")
    val cummaxEnd = max($"end_s")
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    ivs(s, dir)
      .withColumn("opens",
        when($"start_s" > coalesce(cummaxEnd + 1L, lit(Long.MinValue)),
          1L).otherwise(0L))
      .withColumn("island",
        sum($"opens").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"island")
      .agg(
        min($"start_s").as("ivl_start"),
        max($"end_s").as("ivl_end"),
        count(lit(1)).as("n_merged"))
      .orderBy($"user_id", $"island")
  }

  /** The merge pipeline as oracle SQL (shared by closest's targets). */
  private def mergeSql(src: String): String =
    s"""w AS (
       |  SELECT user_id, event_id, start_s, end_s,
       |    CASE WHEN start_s > COALESCE(MAX(end_s) OVER (
       |        PARTITION BY user_id ORDER BY start_s, end_s, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1,
       |        -9223372036854775807 - 1)
       |      THEN 1 ELSE 0 END AS opens
       |  FROM $src),
       |isl AS (
       |  SELECT user_id, start_s, end_s,
       |    CAST(SUM(opens) OVER (
       |      PARTITION BY user_id ORDER BY start_s, end_s, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS island
       |  FROM w),
       |merged AS (
       |  SELECT user_id, island, MIN(start_s) AS ivl_start,
       |    MAX(end_s) AS ivl_end, COUNT(*) AS n_merged
       |  FROM isl GROUP BY user_id, island)""".stripMargin

  /** Coverage depth per user (bedtools genomecov without the per-base
    * explode): each closed interval becomes two breakpoint deltas
    * (+1 at start, −1 one past end), deltas at the same breakpoint
    * collapse in an aggregate, and a running sum over the per-user
    * breakpoint order is the depth between consecutive breakpoints.
    * Output: max concurrent depth + total covered seconds per user.
    *
    * ONE exchange: the explicit `repartition(user_id)` is the only
    * shuffle — `hash(user_id)` clusters every `(user_id, pos)` group
    * AND every window partition, so the tie-collapse aggregate, both
    * windows, and the final per-user rollup all execute in-partition
    * (Catalyst's subset rule: HashPartitioning(a) satisfies
    * ClusteredDistribution(a, b)). The alternative — letting the
    * collapse groupBy shuffle on (user_id, pos) — map-side combines
    * but then re-shuffles for the window; at 100 TB one pass over 2
    * rows/interval beats two passes over nearly as many (breakpoint
    * ties are rare in real timelines).
    */
  def intervalCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = ivs(s, dir)
    val deltas = iv.select($"user_id", $"start_s".as("pos"), lit(1L).as("d"))
      .unionAll(iv.select($"user_id", ($"end_s" + 1L).as("pos"),
        lit(-1L).as("d")))
      .repartition($"user_id")
      .groupBy($"user_id", $"pos").agg(sum($"d").as("d"))
    val w = Window.partitionBy($"user_id").orderBy($"pos")
    deltas
      .withColumn("depth",
        sum($"d").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_pos", lead($"pos", 1).over(w))
      .groupBy($"user_id")
      .agg(
        max($"depth").as("max_depth"),
        sum(when($"depth" > 0 && $"next_pos".isNotNull,
          $"next_pos" - $"pos").otherwise(0L)).as("covered_s"))
      .orderBy($"user_id")
  }

  /** Complement of the merged islands (bedtools complement): the
    * uncovered gaps BETWEEN islands per user — lead(island start)
    * against each island's end over the same single-exchange window
    * layout as the merge. Bounded by the user's own activity span (no
    * global domain edges), so every gap is interior: gap_start =
    * prev island end + 1, gap_end = next island start − 1.
    */
  def intervalGaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"start_s", $"end_s", $"event_id")
    val cummaxEnd = max($"end_s")
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val wi = Window.partitionBy($"user_id").orderBy($"island")
    ivs(s, dir)
      .withColumn("opens",
        when($"start_s" > coalesce(cummaxEnd + 1L, lit(Long.MinValue)),
          1L).otherwise(0L))
      .withColumn("island",
        sum($"opens").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"island")
      .agg(min($"start_s").as("ivl_start"), max($"end_s").as("ivl_end"))
      .withColumn("next_start", lead($"ivl_start", 1).over(wi))
      .filter($"next_start".isNotNull)
      .select($"user_id", ($"ivl_end" + 1L).as("gap_start"),
        ($"next_start" - 1L).as("gap_end"))
      .orderBy($"user_id", $"gap_start")
  }

  /** Closest merged island for every purchase event (bedtools
    * closest): targets are the MERGED islands of all non-purchase
    * activity — disjoint by construction, so per query point the
    * nearest is either the last island starting at-or-before it or
    * the first one after. Expressed as the sorted-neighbor trick: one
    * tagged union, one window pass (islands sort before queries on
    * position ties), `last(..., ignoreNulls)` carries the preceding
    * island's end forward, `first(..., ignoreNulls)` over the
    * following frame fetches the next island's start. Distance 0
    * inside an island. No join at all — the as-of shape.
    */
  def intervalClosest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tagged = T.events(s, dir).select(
      $"user_id", $"event_id", $"event_type",
      unix_timestamp($"ts").as("start_s"),
      (unix_timestamp($"ts") + pmod($"event_id", lit(14400L))).as("end_s"))
    val targets = tagged.filter($"event_type" =!= "purchase")
    // merged islands of the target set (intervalMerge core, inlined
    // so the island build and the probe share one session)
    val w = Window.partitionBy($"user_id")
      .orderBy($"start_s", $"end_s", $"event_id")
    val cummaxEnd = max($"end_s")
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = targets
      .withColumn("opens",
        when($"start_s" > coalesce(cummaxEnd + 1L, lit(Long.MinValue)),
          1L).otherwise(0L))
      .withColumn("island",
        sum($"opens").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"island")
      .agg(min($"start_s").as("pos"), max($"end_s").as("iend"))
      .select($"user_id", $"pos", $"iend", lit(0).as("tag"),
        lit(null).cast("long").as("qid"))
    val queries = tagged.filter($"event_type" === "purchase")
      .select($"user_id", $"start_s".as("pos"),
        lit(null).cast("long").as("iend"), lit(1).as("tag"),
        $"event_id".as("qid"))
    val ws = Window.partitionBy($"user_id").orderBy($"pos", $"tag", $"qid")
    val istart = when($"tag" === 0, $"pos")
    val merged = islands.unionAll(queries)
      .withColumn("prev_end", last($"iend", ignoreNulls = true)
        .over(ws.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_start", first(istart, ignoreNulls = true)
        .over(ws.rowsBetween(1, Window.unboundedFollowing)))
    merged.filter($"tag" === 1)
      .select($"user_id", $"qid".as("event_id"),
        when($"prev_end".isNull && $"next_start".isNull,
          lit(null).cast("long"))
          .when($"prev_end".isNull, $"next_start" - $"pos")
          .when($"next_start".isNull,
            greatest($"pos" - $"prev_end", lit(0L)))
          .otherwise(least(greatest($"pos" - $"prev_end", lit(0L)),
            $"next_start" - $"pos")).as("dist_s"))
      .orderBy($"user_id", $"event_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "interval_merge" -> (intervalMerge(_, _)),
      "interval_coverage" -> (intervalCoverage(_, _)),
      "interval_gaps" -> (intervalGaps(_, _)),
      "interval_closest" -> (intervalClosest(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "interval_merge" ->
      s"""WITH iv AS ($ivSql),
         |${mergeSql("iv")}
         |SELECT user_id, island, ivl_start, ivl_end, n_merged
         |FROM merged ORDER BY user_id, island""".stripMargin,
    "interval_coverage" ->
      s"""WITH iv AS ($ivSql),
         |deltas AS (
         |  SELECT user_id, pos, CAST(SUM(d) AS BIGINT) AS d FROM (
         |    SELECT user_id, start_s AS pos, 1 AS d FROM iv
         |    UNION ALL
         |    SELECT user_id, end_s + 1 AS pos, -1 AS d FROM iv)
         |  GROUP BY user_id, pos),
         |sweep AS (
         |  SELECT user_id, pos,
         |    CAST(SUM(d) OVER (PARTITION BY user_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS depth,
         |    LEAD(pos) OVER (PARTITION BY user_id ORDER BY pos) AS next_pos
         |  FROM deltas)
         |SELECT user_id, MAX(depth) AS max_depth,
         |  CAST(SUM(CASE WHEN depth > 0 AND next_pos IS NOT NULL
         |    THEN next_pos - pos ELSE 0 END) AS BIGINT) AS covered_s
         |FROM sweep GROUP BY user_id ORDER BY user_id""".stripMargin,
    "interval_gaps" ->
      s"""WITH iv AS ($ivSql),
         |${mergeSql("iv")},
         |nxt AS (
         |  SELECT user_id, ivl_end,
         |    LEAD(ivl_start) OVER (PARTITION BY user_id ORDER BY island)
         |      AS next_start
         |  FROM merged)
         |SELECT user_id, ivl_end + 1 AS gap_start,
         |  next_start - 1 AS gap_end
         |FROM nxt WHERE next_start IS NOT NULL
         |ORDER BY user_id, gap_start""".stripMargin,
    "interval_closest" ->
      s"""WITH iv0 AS (
         |  SELECT user_id, event_id, event_type,
         |    epoch_us(ts) // 1000000 AS start_s,
         |    epoch_us(ts) // 1000000 + event_id % 14400 AS end_s
         |  FROM events),
         |tgt AS (SELECT * FROM iv0 WHERE event_type <> 'purchase'),
         |${mergeSql("tgt")},
         |pts AS (
         |  SELECT m.user_id, m.ivl_start AS pos, m.ivl_end AS iend,
         |    0 AS tag, CAST(NULL AS BIGINT) AS qid
         |  FROM merged m
         |  UNION ALL
         |  SELECT user_id, start_s AS pos,
         |    CAST(NULL AS BIGINT) AS iend, 1 AS tag, event_id AS qid
         |  FROM iv0 WHERE event_type = 'purchase'),
         |nbr AS (
         |  SELECT user_id, pos, tag, qid,
         |    LAST_VALUE(iend IGNORE NULLS) OVER (
         |      PARTITION BY user_id ORDER BY pos, tag, qid
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_end,
         |    FIRST_VALUE(CASE WHEN tag = 0 THEN pos END IGNORE NULLS) OVER (
         |      PARTITION BY user_id ORDER BY pos, tag, qid
         |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_start
         |  FROM pts)
         |SELECT user_id, qid AS event_id,
         |  CASE
         |    WHEN prev_end IS NULL AND next_start IS NULL
         |      THEN CAST(NULL AS BIGINT)
         |    WHEN prev_end IS NULL THEN next_start - pos
         |    WHEN next_start IS NULL THEN GREATEST(pos - prev_end, 0)
         |    ELSE LEAST(GREATEST(pos - prev_end, 0), next_start - pos)
         |  END AS dist_s
         |FROM nbr WHERE tag = 1 ORDER BY user_id, event_id""".stripMargin)
}
