package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BinnedIntervalRule

/** plans/BinnedIntervalRule — the big-big interval-join auto-rewrite.
  * Checks (a) the fired rewrite produces an equi-join physical plan,
  * (b) results are identical to the un-rewritten theta join including
  * boundary values, (c) the gates (width unset, strategy hint,
  * existing equi key, small sides) leave the plan alone.
  */
class BinnedIntervalRuleSpec extends AnyFunSuite with BeforeAndAfterEach {
  private lazy val s = SparkTestSession.spark
  import s.implicits._

  override def afterEach(): Unit = {
    s.conf.unset(BinnedIntervalRule.WidthConf)
    s.conf.unset(BinnedIntervalRule.ForceConf)
  }

  // facts hit range boundaries exactly: 0, 10, 20, ... incl. lo==f, hi==f
  private def fact: DataFrame =
    s.range(0, 500).select(($"id" * lit(1.0)).as("v"), $"id".as(("fid")))
  private def ranges: DataFrame = s.createDataFrame(Seq(
    (0.0, 10.0), (10.0, 100.0), (95.0, 105.0), (400.0, 400.0), (450.0, 449.0)))
    .toDF("lo", "hi")

  private def thetaJoin: DataFrame =
    fact.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
      .orderBy($"fid", $"lo")

  test("forced rewrite yields an equi-join plan, not nested-loop") {
    s.conf.set(BinnedIntervalRule.WidthConf, "16")
    s.conf.set(BinnedIntervalRule.ForceConf, "true")
    val plan = thetaJoin.queryExecution.executedPlan.toString
    // equi keys now exist: planner picks a hash/merge EQUI join on the
    // bin ids (broadcast-hash here only because the exploded ranges
    // side is tiny; at scale it shuffles both sides by bin). For these
    // LITERAL ranges the optimizer even proves the guarded overflow
    // union branch empty and removes it statically — no nested loop
    // anywhere in the plan.
    assert(plan.contains("HashJoin [__graft_fbin") ||
      plan.contains("SortMergeJoin [__graft_fbin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("rewritten results == naive theta-join results (boundaries incl.)") {
    val expected = thetaJoin.collect().toSeq // no conf set: naive plan
    s.conf.set(BinnedIntervalRule.WidthConf, "16")
    s.conf.set(BinnedIntervalRule.ForceConf, "true")
    val got = thetaJoin.collect().toSeq
    assert(got == expected)
    // sanity: overlapping ranges double-match, empty/inverted match none
    assert(expected.count(_.getDouble(0) == 99.0) == 2)
    assert(!expected.exists(r => r.getDouble(2) == 400.0 || r.getDouble(2) == 450.0))
  }

  test("no width conf -> no rewrite") {
    val plan = thetaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("size gate: small sides stay broadcast nested-loop without force") {
    s.conf.set(BinnedIntervalRule.WidthConf, "16")
    val plan = thetaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("user broadcast hint wins over the rewrite") {
    s.conf.set(BinnedIntervalRule.WidthConf, "16")
    s.conf.set(BinnedIntervalRule.ForceConf, "true")
    val df = fact.join(broadcast(ranges), $"v" >= $"lo" && $"v" < $"hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("existing cross-side equi key -> no rewrite needed") {
    s.conf.set(BinnedIntervalRule.WidthConf, "16")
    s.conf.set(BinnedIntervalRule.ForceConf, "true")
    val keyedRanges = ranges.withColumn("k", floor($"lo" / 100))
    val df = fact.withColumn("fk", floor($"v" / 100))
      .join(keyedRanges, $"fk" === $"k" && $"v" >= $"lo" && $"v" < $"hi")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_fbin"), plan)
  }

  test("scale smoke: 500k facts x 20k ranges via the rewrite, checked arithmetically") {
    // A broadcast nested loop here is 10^10 comparisons; the rewrite
    // makes it an equi-join on ~50k bin rows. Expected match count is
    // closed-form: fact f matches range i iff i*10 <= f < i*10+15,
    // i.e. i in [ceil((f-14)/10), floor(f/10)] clipped to [0, 20000).
    s.conf.set(BinnedIntervalRule.WidthConf, "64")
    s.conf.set(BinnedIntervalRule.ForceConf, "true")
    val facts = s.range(0, 500000).select($"id".cast("double").as("v"))
    val ranges = s.range(0, 20000).select(
      ($"id" * 10.0).as("lo"), ($"id" * 10.0 + 15.0).as("hi"))
    val joined = facts.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_fbin"), plan)
    val got = joined.count()
    val expected = s.range(0, 500000).select(
      (least(floor($"id" / 10), lit(19999L)) -
        greatest(ceil(($"id" - 14) / lit(10.0)), lit(0L)) + 1).as("n"))
      .agg(sum(when($"n" > 0, $"n").otherwise(0L))).collect()(0).getLong(0)
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("hot bin composes with AQE skew split: rewrite + skew=true in one plan") {
    // 990k of 1M facts land in bin 0 (width 64): after the rewrite the
    // equi-join on __graft_fbin has one giant shuffle partition. The
    // whole point of rewriting theta→equi is that AQE can then split
    // that partition — assert both mechanisms appear in the same
    // executed plan (the 100 TB skew story, end to end).
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s.conf.set(BinnedIntervalRule.WidthConf, "64")
    s.conf.set(BinnedIntervalRule.ForceConf, "true")
    try {
      val facts = s.range(0, 1000000).select(
        when($"id" < 990000, ($"id" % 60).cast("double"))
          .otherwise($"id".cast("double")).as("v"))
      val ranges = s.range(0, 2000).select(
        (lit(100000.0) + $"id" * 10.0).as("lo"),
        (lit(100000.0) + $"id" * 10.0 + 5.0).as("hi"))
      val joined = facts.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
        .agg(count(lit(1)).as("cnt"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_fbin"), plan)
      assert(plan.contains("skew=true"), plan)
    } finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("adaptive width lands near p90 range length; join results unchanged") {
    // 1000 ranges of length 10, plus 10 outliers of length 10000:
    // p90 must pick ~10, not be dragged to the outlier scale
    val ranges = s.range(0, 1000)
      .select(($"id" * 20.0).as("lo"), ($"id" * 20.0 + 10.0).as("hi"))
      .union(s.range(0, 10)
        .select(($"id" * 20000.0).as("lo"), ($"id" * 20000.0 + 10000.0).as("hi")))
    val w = graft.operators.Joins.adaptiveBinWidth(ranges, $"lo", $"hi")
    assert(w >= 10 && w <= 100, s"width=$w")
    // identical join results to a manual-width run
    val fact = s.range(0, 20000).select($"id".cast("double").as("v"))
    val auto = graft.operators.Joins
      .autoBinnedIntervalJoin(fact, $"v", ranges).collect().toSet
    val manual = graft.operators.Joins
      .binnedIntervalJoin(fact, $"v", ranges, 64L).collect().toSet
    assert(auto == manual)
    assert(auto.nonEmpty)
  }

  test("per-join tag: two widths coexist in one session, no confs set") {
    // the de-raced scoping: neither WidthConf nor ForceConf is set;
    // each join carries its own width on the logical node and both
    // rewrites fire independently with their own bin size
    val a = graft.operators.Joins.withBinWidth(
      fact.join(ranges, $"v" >= $"lo" && $"v" < $"hi"), 16L)
    val b = graft.operators.Joins.withBinWidth(
      fact.join(ranges, $"v" >= $"lo" && $"v" < $"hi"), 64L)
    val expected = thetaJoin.collect().toSeq
    def planOf(df: DataFrame) = df.queryExecution.executedPlan.toString
    assert(planOf(a).contains("__graft_fbin"), planOf(a))
    assert(planOf(b).contains("__graft_fbin"), planOf(b))
    // width reaches the plan: /16 vs /64 literals differ per join
    assert(planOf(a).contains("/ 16.0") && planOf(b).contains("/ 64.0"),
      planOf(a) + planOf(b))
    assert(a.orderBy($"fid", $"lo").collect().toSeq == expected)
    assert(b.orderBy($"fid", $"lo").collect().toSeq == expected)
    // the tag survives RE-planning of the same DataFrame (fresh
    // action → fresh QueryExecution), unlike the old conf dance
    assert(a.count() == expected.size)
  }

  test("SQL-ordered bounds (lo <= f AND f < hi) fire the rewrite too") {
    s.conf.set(BinnedIntervalRule.WidthConf, "16")
    s.conf.set(BinnedIntervalRule.ForceConf, "true")
    val df = fact.join(ranges, $"lo" <= $"v" && $"v" < $"hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_fbin"), plan)
    assert(df.orderBy($"fid", $"lo").collect().toSeq ==
      thetaJoin.collect().toSeq)
  }

  test("pathologically inverted range: zero bins generated, fast and exact") {
    // lo=1e9 > hi=0: the old unguarded Sequence would DESCEND through
    // ~62M bins (array-length error / OOM); now unsatisfiable rows are
    // dropped before the Generate
    val withInverted = ranges
      .union(s.createDataFrame(Seq((1000000000.0, 0.0))).toDF("lo", "hi"))
    val df = graft.operators.Joins.withBinWidth(
      fact.join(withInverted, $"v" >= $"lo" && $"v" < $"hi"), 16L)
    assert(df.collect().toSeq.size == thetaJoin.collect().size)
  }

  test("range wider than maxBinsPerRange routes to the exact overflow branch") {
    // one range spans 1e9/width=16 ≈ 6e7 bins — over the 1024 cap the
    // row keeps its theta join in a union branch instead of erroring;
    // results stay exact (every fact matches the wide range once)
    val withWide = ranges
      .union(s.createDataFrame(Seq((-1.0, 1000000000.0))).toDF("lo", "hi"))
    val df = graft.operators.Joins.withBinWidth(
      fact.join(withWide, $"v" >= $"lo" && $"v" < $"hi"), 16L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), plan)
    assert(plan.contains("__graft_fbin"), plan)
    val expected = thetaJoin.collect().size + 500 // wide range matches all
    assert(df.collect().size == expected)
  }

  test("registry query join_interval_auto matches join_interval") {
    val auto = graft.operators.Joins
      .joinIntervalAuto(s, SparkTestSession.SF).collect().toSeq
    val manual = graft.operators.Joins
      .joinInterval(s, SparkTestSession.SF).collect().toSeq
    assert(auto == manual)
  }
}
