package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Join operators — SURVEY.md §2.4.
  *
  * The reference implements no relational joins; its join-shaped
  * structures are the broadcast interval-list membership test
  * (SamSource.java:79-102 — a broadcast range join) and the read-pair
  * colocation contract (README.md:162-167 — a self group-join on read
  * name). Here is the full join surface a user of the resulting
  * distributed collections relies on, Spark-native: small dims
  * broadcast, big-big shuffles on keys, AQE free to re-plan.
  */
object Joins extends QueryModule {

  /** Broadcast equi-join: fact⋈dim⋈dim with both dims broadcast —
    * the header/interval-list broadcast pattern (BamSink.java:76).
    * No shuffle of the fact side for the joins themselves.
    */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
    val n = T.t(s, dir, "nation")
    val r = T.t(s, dir, "region")
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"r_name")
  }

  /** Big-big equi-join: orders⋈lineitem shuffled on the join key;
    * merge hint pins sort-merge (AQE may still convert to shuffled
    * hash when profitable at scale).
    */
  def joinSortmerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = T.t(s, dir, "orders")
    val l = T.t(s, dir, "lineitem")
    o.hint("merge")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"o_orderpriority")
  }

  /** SALTED equi-join — the explicit hot-key mitigation for when AQE
    * skew splitting isn't enough (one key so hot a single split still
    * stalls, or a pre-AQE engine): the fact side gets a deterministic
    * salt (row-content hash mod S), the build side replicates each
    * row S times via a broadcast range, and the join key becomes
    * (key, salt) — one hot key's rows spread over S reducers. The
    * merge hint forces the shuffle path (at fixture scale the
    * optimizer would broadcast and hide the pattern); salting leaves
    * results identical to the plain join, which is exactly what the
    * oracle checks.
    */
  def joinSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val S = 16
    val l = T.t(s, dir, "lineitem")
      .withColumn("salt",
        pmod(crc32(concat_ws("|", $"l_orderkey", $"l_linenumber")), lit(S)))
    val o = T.t(s, dir, "orders")
      .crossJoin(broadcast(s.range(S).select($"id".cast("int").as("salt"))))
    o.hint("merge")
      .join(l, $"o_orderkey" === $"l_orderkey" && o("salt") === l("salt"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"o_orderpriority")
  }

  /** Interval/range join (the genomics overlap join,
    * AbstractBinarySamSource.java:111-138): fact column vs a small
    * table of [lo,hi) ranges. Small side broadcast → broadcast
    * nested-loop, the right plan when ranges are few; §7 notes the
    * binned-equi-join rewrite for the big-big case.
    */
  def joinInterval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = s.createDataFrame(Seq(
      (0L, 50000L), (50000L, 150000L), (150000L, 300000L), (300000L, 1000000L)))
      .toDF("lo", "hi")
    T.t(s, dir, "orders")
      .join(broadcast(buckets),
        $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"lo")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"lo")
  }

  /** Left-semi: customers having orders (EXISTS). */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
    val o = T.t(s, dir, "orders").select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"c_mktsegment")
  }

  /** Left-anti: customers with no orders (NOT EXISTS). */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
    val o = T.t(s, dir, "orders").select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"c_mktsegment")
  }

  /** NULL-AWARE anti join — SQL `NOT IN` with its three-valued edge:
    * a NULL probe key compares UNKNOWN to everything, so `NOT IN`
    * drops it (where NOT EXISTS keeps it) — the classic silent
    * semantic fork between the two anti-join spellings. Stated as raw
    * SQL so Catalyst plans its dedicated single-column
    * null-aware-anti BroadcastHashJoin instead of a nested loop
    * (plan-gated in PlanQualitySpec). Probe nulls are synthesized
    * with NULLIF (the fixture has none); the build side is null-free,
    * or every row would vanish.
    */
  def joinAntiNullAware(s: SparkSession, dir: String): DataFrame = {
    T.t(s, dir, "customer").createOrReplaceTempView("gna_customer")
    T.t(s, dir, "supplier").createOrReplaceTempView("gna_supplier")
    s.sql(
      """SELECT c_mktsegment, COUNT(*) AS cnt
        |FROM (SELECT c_mktsegment, NULLIF(c_nationkey, 3) AS k
        |      FROM gna_customer)
        |WHERE k NOT IN (SELECT s_nationkey FROM gna_supplier
        |                WHERE s_nationkey >= 10)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** As-of: each order paired with the same customer's immediately
    * preceding order — the nearest-preceding-event join, expressed as
    * a partitioned lag (one shuffle on the partition key, no
    * self-join materialization).
    */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .withColumn("prev_orderkey", lag($"o_orderkey", 1).over(w))
      .orderBy($"o_orderkey")
  }

  /** Bucketed co-located join: both sides pre-bucketed on the join
    * key into catalog tables → the sort-merge join reads bucket i of
    * each side in the same task, NO shuffle exchange in the plan
    * (asserted in OperatorSpec). At 100 TB this converts every
    * recurring fact-fact join on the bucket key into a scan-local
    * merge — the single biggest shuffle saving a warehouse layout can
    * buy. (Requires spark.sql.warehouse.dir; bucket counts must match.)
    */
  /** Bucketed catalog tables (orders, lineitem) for joinBucketed —
    * built once per JVM per sf dir: the warehouse LAYOUT is the
    * precondition a real deployment maintains; the operator under
    * test is the shuffle-free merge join over it.
    */
  private def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    import s.implicits._
    val sfTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val ot = s"orders_b_$sfTag"
    val lt = s"lineitem_b_$sfTag"
    graft.Fixtures.ensure(dir, "bucketed_tables") { _ =>
      // A fresh session's in-memory catalog forgets prior runs' tables
      // but their warehouse directories persist — clear both.
      Seq(ot, lt).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        wh.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(wh, true)
      }
      T.t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
      T.t(s, dir, "lineitem").select($"l_orderkey", $"l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
    }
    (ot, lt)
  }

  override def prepare(s: SparkSession, dir: String): Unit = {
    bucketedTables(s, dir); dppFixture(s, dir); cboTables(s, dir); ()
  }

  def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (ot, lt) = bucketedTables(s, dir)
    // merge hint: at fixture scale the optimizer would broadcast; the
    // bucket payoff being demonstrated is the SMJ-without-exchange.
    s.table(ot).hint("merge").join(s.table(lt), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"o_orderpriority")
  }

  /** Binned interval join — SURVEY.md §7 stretch (a): the overlap
    * theta-join rewritten as an equi-join on bin ids so BOTH sides can
    * be arbitrarily large. Each [lo,hi) range explodes to the bins it
    * covers; each fact row maps to exactly one bin; the equi-join
    * shuffles by bin (AQE handles skewed bins) and a residual filter
    * removes same-bin non-overlaps. This replaces the broadcast
    * nested-loop plan when the ranges side outgrows broadcast.
    */
  def binnedIntervalJoin(fact: DataFrame, factCol: Column,
      ranges: DataFrame, binWidth: Long): DataFrame = {
    // last bin = floor(hi/w), NOT floor((hi-1)/w): the -1 trick only
    // shaves the boundary bin for INTEGER-valued hi — a fractional
    // upper bound (hi=50000.5, fact=50000.2, w=50000) would lose its
    // bin entirely and silently drop matching rows. The occasional
    // extra candidate bin on exact multiples is removed by the
    // residual filter. Empty/inverted ranges ([lo, hi<=lo)) explode
    // to NO bins (Spark sequence runs DESCENDING when stop < start —
    // bogus bins — so gate on hi > lo).
    val binned = ranges
      .filter(col("hi") > col("lo"))
      .withColumn("r_bin",
        explode(sequence(floor(col("lo") / binWidth),
          floor(col("hi") / binWidth))))
    fact.withColumn("f_bin", floor(factCol / binWidth))
      .join(binned, col("f_bin") === col("r_bin") &&
        factCol >= col("lo") && factCol < col("hi"))
      .drop("f_bin", "r_bin")
  }

  /** join_interval semantics through the binned equi-join plan —
    * identical results, shuffle-join physical shape (same oracle).
    */
  def joinIntervalBinned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = s.createDataFrame(Seq(
      (0L, 50000L), (50000L, 150000L), (150000L, 300000L), (300000L, 1000000L)))
      .toDF("lo", "hi")
    binnedIntervalJoin(
      T.t(s, dir, "orders"), $"o_totalprice", buckets, 50000L)
      .groupBy($"lo")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"lo")
  }

  /** Data-adaptive bin width for the binned interval join — the last
    * SURVEY §8 round-2 item. An optimizer rule cannot see value
    * distributions, so the width is chosen the way Spark's own
    * RangePartitioner plans a range exchange: a cheap driver-side
    * sampling pass over the (small relative to the fact side) ranges
    * table. width = p90 range length → ~90% of ranges explode into
    * ≤2-3 bins while a bin never spans more than ~1/p90-quantile of
    * range lengths; skewed bins are AQE's job downstream. One
    * single-pass approxQuantile job; `sampleFraction < 1` bounds even
    * that for huge range tables.
    */
  def adaptiveBinWidth(ranges: DataFrame, lo: Column, hi: Column,
      sampleFraction: Double = 1.0): Long = {
    val lens = ranges.select((hi - lo).cast("double").as("len"))
    val sampled =
      if (sampleFraction < 1.0) lens.sample(withReplacement = false, sampleFraction, 42L)
      else lens
    val q = sampled.stat.approxQuantile("len", Array(0.9), 0.01)
    math.max(1L, q.headOption.getOrElse(1.0).toLong)
  }

  /** binnedIntervalJoin with the width fitted from the data. */
  def autoBinnedIntervalJoin(fact: DataFrame, factCol: Column,
      ranges: DataFrame): DataFrame =
    binnedIntervalJoin(fact, factCol, ranges,
      adaptiveBinWidth(ranges, col("lo"), col("hi")))

  /** join_interval semantics through the adaptively-fitted binned
    * plan — identical results to the manual-width variant (same
    * oracle); the width itself is asserted sane in the rule spec.
    */
  def joinIntervalAdaptive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = s.createDataFrame(Seq(
      (0L, 50000L), (50000L, 150000L), (150000L, 300000L), (300000L, 1000000L)))
      .toDF("lo", "hi")
    autoBinnedIntervalJoin(T.t(s, dir, "orders"), $"o_totalprice", buckets)
      .groupBy($"lo")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"lo")
  }

  /** Scope a bin width to ONE interval join: applies the theta→binned
    * equi rewrite DIRECTLY to the topmost inner join of `joined`'s
    * analyzed plan (skipping BinnedIntervalRule's size gate — calling
    * this is the explicit opt-in) and returns the rewritten
    * DataFrame. No session confs are read or written, so the rewrite
    * is pinned to this join for every later action on the returned
    * DataFrame, nothing leaks into other queries' planning, and two
    * joins with DIFFERENT widths coexist race-free in one session —
    * the fix for the set-conf/plan/unset-conf pattern, which leaked a
    * forced width into concurrent queries and stopped applying the
    * moment the query was re-planned after the unset. The TOPMOST
    * inner join is the one and only target: if the rewrite cannot
    * handle it (no range bounds, existing equi key) the plan is
    * returned unchanged — the width is never silently attached to a
    * DIFFERENT, deeper join whose value domain it was not fitted
    * for. (Strategy-hinted joins are skipped in the descent: a hint
    * is an explicit user instruction, not a rewrite candidate.)
    */
  def withBinWidth(joined: DataFrame, width: Long): DataFrame = {
    // width 0 divides bins to NULL (non-ANSI) and a negative width
    // inverts bin monotonicity — either silently EMPTIES the join
    require(width > 0, s"withBinWidth: width must be positive, got $width")
    import org.apache.spark.sql.catalyst.plans.Inner
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LogicalPlan}
    import org.apache.spark.sql.graftbridge.Bridge
    val analyzed = Bridge.analyzed(joined)
    if (!analyzed.exists(_.isInstanceOf[LJoin]))
      throw new IllegalArgumentException(
        "withBinWidth: no join found in plan:\n" + analyzed)
    var done = false
    val rewritten = analyzed.transformDown {
      case j @ LJoin(left, right, Inner, Some(cond), hint)
          if !done && graft.plans.BinnedIntervalRewrite.noStrategyHint(hint) =>
        // the first non-hinted inner join decides: rewritten or
        // returned unchanged — never keep descending and attach the
        // width to a deeper join it was not fitted for
        done = true
        graft.plans.BinnedIntervalRewrite
          .rewrite(j, left, right, cond, width.toDouble)
          .getOrElse(j)
    }
    Bridge.ofRows(joined.sparkSession, rewritten)
  }

  /** join_interval semantics as a PLAIN theta join — no broadcast
    * hint, no manual binning — relying on the BinnedIntervalRule
    * optimizer rewrite (plans/BinnedIntervalRule.scala) to turn it
    * into the binned equi-join automatically. The width rides on a
    * per-join tag (`withBinWidth`), which also stands in for the
    * both-sides-over-broadcast-threshold stats gate that fires at
    * real scale; width in domain units of o_totalprice.
    */
  def joinIntervalAuto(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val buckets = s.createDataFrame(Seq(
      (0L, 50000L), (50000L, 150000L), (150000L, 300000L), (300000L, 1000000L)))
      .toDF("lo", "hi")
    val joined = withBinWidth(
      T.t(s, dir, "orders")
        .join(buckets, $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi"),
      50000L)
    joined
      .groupBy($"lo")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"lo")
  }

  /** Multi-way star join (TPC-H Q5 shape): fact ⋈ fact ⋈ dim ⋈ dim ⋈
    * dim — Catalyst reorders and broadcasts the dims; the only big
    * shuffle is lineitem⋈orders on the order key.
    */
  def joinMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = T.t(s, dir, "lineitem")
    val o = T.t(s, dir, "orders")
    val c = T.t(s, dir, "customer")
    val n = T.t(s, dir, "nation")
    val r = T.t(s, dir, "region")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        count(lit(1)).as("cnt"),
        sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1) - $"l_discount").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("revenue"))
      .orderBy($"r_name", $"n_name")
  }

  /** Left outer join: every customer, order stats where present —
    * null aggregation semantics on the unmatched side.
    */
  def joinOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
    val o = T.t(s, dir, "orders")
    c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(
        count($"o_orderkey").as("n_orders"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("total"))
      .orderBy($"c_custkey")
  }

  /** Full outer join between two disjoint-ish aggregates — both
    * unmatched sides materialize nulls.
    */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hi = T.t(s, dir, "lineitem").filter($"l_quantity" > 49)
      .groupBy($"l_partkey".as("pk")).agg(count(lit(1)).as("n_hi"))
    val lo = T.t(s, dir, "lineitem").filter($"l_quantity" < 2)
      .groupBy($"l_partkey".as("pk2")).agg(count(lit(1)).as("n_lo"))
    hi.join(lo, $"pk" === $"pk2", "full_outer")
      .select(
        coalesce($"pk", $"pk2").as("partkey"),
        coalesce($"n_hi", lit(0L)).as("n_hi"),
        coalesce($"n_lo", lit(0L)).as("n_lo"))
      .orderBy($"partkey")
  }

  /** Read-pair colocation analogue (README.md:162-167): self
    * group-join on the shared key — all lines of an order land in one
    * group/partition.
    */
  def pairsGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(
        count(lit(1)).as("n_items"),
        min($"l_linenumber").as("first_line"),
        max($"l_linenumber").as("last_line"),
        dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_orderkey")
  }

  /** DYNAMIC PARTITION PRUNING: the fact side is a hive-partitioned
    * layout and the join key IS the partition column — Catalyst
    * injects the dim side's build keys as a plan-time partition
    * filter (`dynamicpruning` subquery), so fact partitions no dim
    * row references are never READ, not just filtered after the scan.
    * At 100 TB this is the difference between scanning two partition
    * directories and scanning the table. PlanQualitySpec asserts the
    * scan's PartitionFilters carry the dynamicpruning subquery.
    */
  private def dppFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "events_dpp") { out =>
      import s.implicits._
      T.events(s, dir)
        .select($"event_id", $"user_id", $"value", $"event_type")
        .write.mode("overwrite").partitionBy("event_type").parquet(s"$out/fact")
      // the dim must be a SOURCE-backed relation: a literal local dim
      // gets its filter constant-folded away (ConvertToLocalRelation)
      // before the PartitionPruning rule looks for the selective
      // predicate that arms DPP
      s.createDataFrame(Seq(("click", 1), ("purchase", 5), ("view", -1)))
        .toDF("event_type", "weight")
        .write.mode("overwrite").parquet(s"$out/dim")
    }

  def joinDpp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = dppFixture(s, dir)
    val fact = s.read.parquet(s"$out/fact")
    // the selective dim-side predicate is what arms the DPP rule
    // (an unfiltered dim is assumed to reference every partition)
    val dim = s.read.parquet(s"$out/dim").filter($"weight" > 0)
    fact.join(dim, "event_type")
      .groupBy($"event_type", $"weight")
      .agg(count(lit(1)).as("cnt"), dsum($"value" * $"weight", 6).as("wsum"))
      .orderBy($"event_type")
  }

  /** NULL-SAFE equi join (`<=>` / IS NOT DISTINCT FROM): null keys
    * match EACH OTHER instead of dropping out — the semantics ETL
    * needs when the join key itself carries "unknown" as a value.
    * Still a hash-partitionable equality, so the physical plan is the
    * same shuffle/broadcast equi-join as `=` (null-safe equality is a
    * valid partitioning key), not a theta join. Nation 5 is nulled on
    * BOTH sides to exercise the null-matches-null row.
    */
  def joinNullSafe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
      .select(nullif($"c_nationkey", lit(5)).as("nk"), $"c_acctbal")
    val n = T.t(s, dir, "nation")
      .select(nullif($"n_nationkey", lit(5)).as("nk"), $"n_name")
    c.join(n, c("nk") <=> n("nk"))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("cnt"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"n_name")
  }

  /** LATERAL correlated subquery — top-2 orders PER customer stated
    * as the user would write it (a per-row dependent subquery with
    * ORDER BY + LIMIT), decorrelated by Catalyst into a window
    * rank over one join rather than a per-row re-execution. The
    * per-group-top-k operator surface through SQL, complementing the
    * DataFrame topk/WindowGroupLimit forms.
    */
  def joinLateral(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "customer").createOrReplaceTempView("customer_v")
    T.t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql("""
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer_v c
      JOIN LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders_v o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2) o
      WHERE c.c_custkey <= 100
      ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey""")
  }

  /** SCD-2 temporal dimension join: facts join the dimension VERSION
    * whose validity interval covers the fact's event date — the
    * slowly-changing-dimension lookup every warehouse runs. The
    * surrogate-key equi-join carries the shuffle (co-partitioned on
    * custkey); the validity-range predicate rides as a residual
    * filter inside the same join, so no interval machinery and no
    * extra exchange — the right plan because SCD lookups always have
    * the natural key, unlike pure interval joins (J-int). Dimension
    * versions are derived deterministically (three epochs per
    * customer with a custkey-dependent middle boundary, so version
    * choice actually varies per key).
    */
  def joinScd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer").select($"c_custkey")
    // epoch boundary shifts by key: 1994-01-01 + (custkey % 365) days
    val dim = c.select($"c_custkey".as("d_custkey"),
        expr("date_add(date'1994-01-01', cast(c_custkey % 365 as int))")
          .as("mid"))
      .select($"d_custkey", explode(array(
        struct(lit("v1").as("ver"), to_date(lit("1992-01-01")).as("from"),
          $"mid".as("to")),
        struct(lit("v2").as("ver"), $"mid".as("from"),
          to_date(lit("1997-01-01")).as("to")),
        struct(lit("v3").as("ver"), to_date(lit("1997-01-01")).as("from"),
          to_date(lit("1999-12-31")).as("to")))).as("w"))
      .select($"d_custkey", $"w.ver", $"w.from", $"w.to")
    val o = T.t(s, dir, "orders")
      .select($"o_custkey", $"o_orderdate", $"o_totalprice")
    o.join(dim, $"o_custkey" === $"d_custkey" &&
        $"o_orderdate" >= $"from" && $"o_orderdate" < $"to")
      .groupBy($"ver")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"ver")
  }

  /** SQL join-strategy HINTS: `/*+ MERGE(n) */` forces a sort-merge
    * join where the planner (and AQE) would broadcast the 25-row
    * nation side — the escape hatch for when the optimizer's
    * size-based choice is wrong (mis-estimated stats, a "small" side
    * that explodes after a UDF, a broadcast OOM at 1000 executors).
    * PlanQualitySpec pins that the hint is actually honored
    * (SortMergeJoin present, no BroadcastHashJoin); the result is
    * hint-invariant, which the oracle states.
    */
  def sqlHints(s: SparkSession, dir: String): DataFrame = {
    T.t(s, dir, "customer").createOrReplaceTempView("g_cust_hint")
    T.t(s, dir, "nation").createOrReplaceTempView("g_nat_hint")
    s.sql(
      """SELECT /*+ MERGE(n) */ n.n_name, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_bal
        |FROM g_cust_hint c JOIN g_nat_hint n
        |  ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  /** Entity resolution: BLOCKED fuzzy self-match — the classic
    * block-then-compare shape. Candidate pairs form only inside a
    * blocking key (name prefix: everything but the last two digits),
    * so the comparison space is Σ block², never n²; within a block,
    * pairs survive at Levenshtein distance ≤ 1 (Spark's codegen'd
    * native expression — DuckDB's levenshtein agrees on unit-cost
    * edit distance). At 100 TB the blocking join is one shuffle on
    * the block key; a hot block salts like any skewed join. Output is
    * the per-nation candidate-pair census.
    */
  def erMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = T.t(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey",
        substring($"c_name", 1, 16).as("blk"))
    // thresholded levenshtein (3-arg, Spark 3.5+): the banded DP
    // early-exits past the bound — O(len·k) per comparison instead of
    // O(len²), on every blocked pair; returns -1 past the threshold,
    // so `>= 0` is exactly the old `<= 1` pair set
    c.as("a").join(c.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.c_custkey") < col("b.c_custkey") &&
          levenshtein(col("a.c_name"), col("b.c_name"), 1) >= 0)
      .groupBy(col("a.c_nationkey").as("c_nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"c_nationkey")
  }

  /** Scoped runtime-bloom-filter confs: the feature is on by default
    * upstream but gated behind a 10 GB application-side scan
    * threshold, so at fixture scale the injection never fires —
    * scoping the threshold to 0 here exercises the real 100 TB plan
    * (where lineitem clears 10 GB on its own) without perturbing any
    * other query in the shared session. Same fresh-QueryExecution
    * discipline as `withV2ParquetPushdown`: anything that must SEE
    * the injected filter has to plan inside `body`.
    */
  private[graft] def withRuntimeBloomFilter[A](s: SparkSession)(body: SparkSession => A): A = {
    val pairs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "10KB",
      // injection targets SHUFFLE joins; at fixture scale the dim
      // would broadcast and the probe would never plant
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // ISOLATED child session: same SparkContext, shared catalog, OWN
    // SQLConf — the confs set here are invisible to every other query
    // in flight in the parent session. (The previous set/run/unset
    // pattern on the shared session was exactly the concurrency leak
    // withBinWidth's scaladoc documents.)
    val scoped = s.newSession()
    pairs.foreach { case (k, v) => scoped.conf.set(k, v) }
    body(scoped)
  }

  /** The unresolved plan: selective dim filter (one quarter, one
    * priority → ~1% of orders) against the full fact scan — the shape
    * where Catalyst's `InjectRuntimeFilter` builds a Bloom filter
    * from the filtered creation side and plants
    * `bloom_filter_might_contain(l_orderkey)` INSIDE the fact scan's
    * filters: fact rows that cannot join die map-side, before the
    * shuffle — at 100 TB that's the difference between shuffling the
    * whole fact table and shuffling ~1% of it. No join hint: the
    * scoped `autoBroadcastJoinThreshold=-1` pins the shuffle join
    * (injection targets shuffle joins; a broadcast application side
    * would get the same pruning from the hash join itself).
    */
  private[graft] def runtimeFilterDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = T.t(s, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT" &&
        $"o_orderdate" >= "1995-01-01" && $"o_orderdate" < "1995-04-01")
    val l = T.t(s, dir, "lineitem")
    o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** Runtime (bloom) filter join — executes inside the conf scope
    * (the result is the small per-shipmode rollup, so the collect is
    * of the ANSWER, not the data); PlanQualitySpec pins the injected
    * `bloom_filter_might_contain` in the optimized plan.
    */
  def joinRuntimeFilter(s: SparkSession, dir: String): DataFrame = {
    val (rows, schema) = withRuntimeBloomFilter(s) { scoped =>
      val df = runtimeFilterDf(scoped, dir)
      (df.collect(), df.schema)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** ANALYZE'd catalog tables for the CBO query — the statistics a
    * real deployment maintains (`ANALYZE TABLE ... FOR ALL COLUMNS`:
    * row counts + per-column min/max/ndv in the metastore).
    */
  private def cboTables(s: SparkSession, dir: String): (String, String) = {
    val sfTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val ot = s"orders_cbo_$sfTag"
    val lt = s"lineitem_cbo_$sfTag"
    graft.Fixtures.ensure(dir, "cbo_tables") { _ =>
      // fresh session catalog, persistent warehouse dir: clear both
      Seq(ot, lt).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        wh.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(wh, true)
      }
      T.t(s, dir, "orders").write.mode("overwrite").saveAsTable(ot)
      T.t(s, dir, "lineitem").write.mode("overwrite").saveAsTable(lt)
      s.sql(s"ANALYZE TABLE $ot COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql(s"ANALYZE TABLE $lt COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    (ot, lt)
  }

  /** Scoped cost-based-optimizer confs. The tiny broadcast threshold
    * is the pivot of the demonstration: the UNFILTERED orders table
    * sits above it (file-size estimate — no broadcast without
    * stats), while CBO's FilterEstimation over the column min/max
    * puts the date-filtered side well below it (≈2% selectivity ×
    * rowCount × avg row width) — the stats, not the files, pick the
    * broadcast. Same scope discipline as the runtime-filter confs.
    */
  private[graft] def withCbo[A](s: SparkSession)(body: SparkSession => A): A = {
    val pairs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096")
    // ISOLATED child session: same SparkContext, shared catalog, OWN
    // SQLConf — the confs set here are invisible to every other query
    // in flight in the parent session. (The previous set/run/unset
    // pattern on the shared session was exactly the concurrency leak
    // withBinWidth's scaladoc documents.)
    val scoped = s.newSession()
    pairs.foreach { case (k, v) => scoped.conf.set(k, v) }
    body(scoped)
  }

  private[graft] def cboDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (ot, lt) = cboTables(s, dir)
    s.table(ot)
      .filter($"o_totalprice" < 5000.0)
      .join(s.table(lt), $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** Cost-based join planning as an operator query — catalog
    * statistics (the warehouse's ANALYZE output) inform the physical
    * join choice; the answer is plan-independent and oracled.
    * PlanQualitySpec pins the flip: broadcast WITH stats+CBO,
    * shuffle join without.
    */
  def joinCboStats(s: SparkSession, dir: String): DataFrame = {
    val (rows, schema) = withCbo(s) { scoped =>
      val df = cboDf(scoped, dir)
      (df.collect(), df.schema)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Scoped AQE skew-join confs. Upstream defaults target 256 MB+
    * shuffle partitions, so fixture-scale skew never trips them;
    * scoping the thresholds down exercises the REAL 100 TB mechanism
    * (OptimizeSkewedJoin splitting the hot partition into
    * per-split join tasks) on local data. `forceOptimizeSkewedJoin`
    * keeps the split live even though the downstream aggregate
    * re-shuffles — exactly the "big skewed join feeding a rollup"
    * shape where the split pays for the extra exchange many times
    * over. Broadcast is pinned off: a broadcast join has no shuffle
    * to skew, and at 100 TB neither side fits the threshold anyway.
    */
  private[graft] def withSkewAqe[A](s: SparkSession)(body: SparkSession => A): A = {
    val pairs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // ISOLATED child session: same SparkContext, shared catalog, OWN
    // SQLConf — the confs set here are invisible to every other query
    // in flight in the parent session. (The previous set/run/unset
    // pattern on the shared session was exactly the concurrency leak
    // withBinWidth's scaladoc documents.)
    val scoped = s.newSession()
    pairs.foreach { case (k, v) => scoped.conf.set(k, v) }
    body(scoped)
  }

  /** The unresolved skewed-join plan: 80% of lineitem lands on one
    * derived key (the Zipfian hot-key shape — one user, one URL, one
    * empty-string key dominating a web-scale join), equi-joined to a
    * 997-row dim and rolled up. The ANSWER is plan-independent; what
    * the scoped confs change is the physical shape (hot partition
    * split across tasks instead of one straggler).
    */
  private[graft] def skewAqeDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Skew-split's minimum unit is ONE MAPPER's output: AQE divides a
    // hot reduce partition along mapper boundaries, so a hot partition
    // fed by a single map task cannot split at all. At 100 TB the scan
    // provides thousands of mappers for free; the sf fixture is a
    // single parquet row group (= one map task), so spread the fact
    // side over 16 map tasks first — fixture-scale scaffolding for
    // the mechanism under test, not part of the operator.
    val l = T.t(s, dir, "lineitem")
      .repartition(16)
      .withColumn("kk",
        when($"l_orderkey" % 10 < 8, 0L).otherwise($"l_orderkey" % 997))
    val dim = s.range(0, 997).toDF("k")
      .withColumn("label", ($"k" % 7).cast("long"))
    l.join(dim, $"kk" === $"k")
      .groupBy($"label")
      .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"),
        dsum($"l_discount", 4).as("sum_disc"),
        dsum($"l_tax", 4).as("sum_tax"))
      .orderBy($"label")
  }

  /** AQE skew-join as a first-class operator query — the runtime
    * answer to hot keys (vs `join_salted`, the rewrite-time answer):
    * AQE measures the built shuffle, finds the hot partition, and
    * splits it into advisory-sized slices each joined against a
    * replicated copy of the other side's matching partition. Executes
    * inside the conf scope (the collect is of the 7-row rollup);
    * PlanQualitySpec pins the split (`isSkew=true` reader) in the
    * adaptive plan.
    */
  def joinSkewAqe(s: SparkSession, dir: String): DataFrame = {
    val (rows, schema) = withSkewAqe(s) { scoped =>
      val df = skewAqeDf(scoped, dir)
      (df.collect(), df.schema)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_aqe" -> (joinSkewAqe(_, _)),
    "er_match" -> (erMatch(_, _)),
    "join_cbo_stats" -> (joinCboStats(_, _)),
    "join_runtime_filter" -> (joinRuntimeFilter(_, _)),
    "sql_hints" -> (sqlHints(_, _)),
    "join_scd" -> (joinScd(_, _)),
    "join_null_safe" -> (joinNullSafe(_, _)),
    "join_dpp" -> (joinDpp(_, _)),
    "join_lateral" -> (joinLateral(_, _)),
    "join_broadcast" -> (joinBroadcast(_, _)),
    "join_sortmerge" -> (joinSortmerge(_, _)),
    "join_salted" -> (joinSalted(_, _)),
    "join_bucketed" -> (joinBucketed(_, _)),
    "join_multi" -> (joinMulti(_, _)),
    "join_interval" -> (joinInterval(_, _)),
    "join_interval_binned" -> (joinIntervalBinned(_, _)),
    "join_interval_adaptive" -> (joinIntervalAdaptive(_, _)),
    "join_interval_auto" -> (joinIntervalAuto(_, _)),
    "join_semi" -> (joinSemi(_, _)),
    "join_anti" -> (joinAnti(_, _)),
    "join_anti_null_aware" -> (joinAntiNullAware(_, _)),
    "join_outer" -> (joinOuter(_, _)),
    "join_full_outer" -> (joinFullOuter(_, _)),
    "join_asof" -> (joinAsof(_, _)),
    "pairs_group" -> (pairsGroup(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "join_skew_aqe" ->
      s"""WITH l AS (
         |  SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
         |              ELSE l_orderkey % 997 END AS kk,
         |    l_quantity, l_extendedprice, l_discount, l_tax
         |  FROM lineitem),
         |dim AS (SELECT range AS k, range % 7 AS label FROM range(0, 997))
         |SELECT label, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_price,
         |  ${sqlDsum("l_discount", 4)} AS sum_disc,
         |  ${sqlDsum("l_tax", 4)} AS sum_tax
         |FROM l JOIN dim ON kk = k
         |GROUP BY label ORDER BY label""".stripMargin,
    "join_cbo_stats" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_totalprice < 5000.0
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "join_runtime_filter" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |  AND o_orderdate >= DATE '1995-01-01'
         |  AND o_orderdate < DATE '1995-04-01'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "join_scd" ->
      s"""WITH mid AS (
         |  SELECT c_custkey,
         |    DATE '1994-01-01' + CAST(c_custkey % 365 AS INT) AS mid
         |  FROM customer),
         |dim AS (
         |  SELECT c_custkey AS d_custkey, 'v1' AS ver,
         |    DATE '1992-01-01' AS f, mid AS t FROM mid
         |  UNION ALL
         |  SELECT c_custkey, 'v2', mid, DATE '1997-01-01' FROM mid
         |  UNION ALL
         |  SELECT c_custkey, 'v3', DATE '1997-01-01', DATE '1999-12-31'
         |  FROM mid)
         |SELECT ver, COUNT(*) AS cnt, ${sqlDsum("o_totalprice")} AS total
         |FROM orders JOIN dim ON o_custkey = d_custkey
         |  AND o_orderdate >= f AND o_orderdate < t
         |GROUP BY ver ORDER BY ver""".stripMargin,
    "sql_hints" ->
      s"""SELECT n_name, COUNT(*) AS cnt, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "er_match" ->
      """SELECT a.c_nationkey, COUNT(*) AS n_pairs
        |FROM customer a JOIN customer b
        |  ON substring(a.c_name, 1, 16) = substring(b.c_name, 1, 16)
        | AND a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1
        |GROUP BY a.c_nationkey ORDER BY a.c_nationkey""".stripMargin,
    "join_dpp" ->
      s"""WITH dim(event_type, weight) AS (VALUES ('click', 1), ('purchase', 5))
         |SELECT event_type, weight, COUNT(*) AS cnt,
         |  ${sqlDsum("value * weight", 6)} AS wsum
         |FROM events JOIN dim USING (event_type)
         |GROUP BY event_type, weight ORDER BY event_type""".stripMargin,
    "join_null_safe" ->
      s"""WITH c AS (SELECT nullif(c_nationkey, 5) AS nk, c_acctbal
         |           FROM customer),
         |n AS (SELECT nullif(n_nationkey, 5) AS nk, n_name FROM nation)
         |SELECT n_name, COUNT(*) AS cnt, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) o ON true
        |WHERE c.c_custkey <= 100
        |ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "join_broadcast" ->
      s"""SELECT r_name, COUNT(*) AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_sortmerge" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // salting must not change the join result — same oracle as the
    // plain equi-join
    "join_salted" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_interval" ->
      s"""SELECT CAST(lo AS BIGINT) AS lo, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES (0, 50000), (50000, 150000), (150000, 300000),
         |             (300000, 1000000)) AS b(lo, hi)
         |  ON o_totalprice >= b.lo AND o_totalprice < b.hi
         |GROUP BY lo ORDER BY lo""".stripMargin,
    "join_multi" ->
      """SELECT r_name, n_name, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_bucketed" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_interval_binned" ->
      s"""SELECT CAST(lo AS BIGINT) AS lo, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES (0, 50000), (50000, 150000), (150000, 300000),
         |             (300000, 1000000)) AS b(lo, hi)
         |  ON o_totalprice >= b.lo AND o_totalprice < b.hi
         |GROUP BY lo ORDER BY lo""".stripMargin,
    "join_interval_adaptive" ->
      s"""SELECT CAST(lo AS BIGINT) AS lo, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES (0, 50000), (50000, 150000), (150000, 300000),
         |             (300000, 1000000)) AS b(lo, hi)
         |  ON o_totalprice >= b.lo AND o_totalprice < b.hi
         |GROUP BY lo ORDER BY lo""".stripMargin,
    "join_interval_auto" ->
      s"""SELECT CAST(lo AS BIGINT) AS lo, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES (0, 50000), (50000, 150000), (150000, 300000),
         |             (300000, 1000000)) AS b(lo, hi)
         |  ON o_totalprice >= b.lo AND o_totalprice < b.hi
         |GROUP BY lo ORDER BY lo""".stripMargin,
    "join_semi" ->
      s"""SELECT c_mktsegment, COUNT(*) AS cnt, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer
         |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_outer" ->
      s"""SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
         |  coalesce(${sqlDsum("o_totalprice")}, 0.0) AS total
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT coalesce(pk, pk2) AS partkey,
        |  coalesce(n_hi, 0) AS n_hi, coalesce(n_lo, 0) AS n_lo
        |FROM (SELECT l_partkey AS pk, COUNT(*) AS n_hi FROM lineitem
        |      WHERE l_quantity > 49 GROUP BY 1) h
        |FULL OUTER JOIN
        |     (SELECT l_partkey AS pk2, COUNT(*) AS n_lo FROM lineitem
        |      WHERE l_quantity < 2 GROUP BY 1) l
        |  ON pk = pk2
        |ORDER BY partkey""".stripMargin,
    "join_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_anti_null_aware" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt
        |FROM (SELECT c_mktsegment, NULLIF(c_nationkey, 3) AS k
        |      FROM customer)
        |WHERE k NOT IN (SELECT s_nationkey FROM supplier
        |                WHERE s_nationkey >= 10)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_asof" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  lag(o_orderkey, 1) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |    AS prev_orderkey
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "pairs_group" ->
      s"""SELECT l_orderkey, COUNT(*) AS n_items,
         |  MIN(l_linenumber) AS first_line, MAX(l_linenumber) AS last_line,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
}
