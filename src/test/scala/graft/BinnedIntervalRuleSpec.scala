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
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // equi keys now exist: planner picks a hash/merge EQUI join on the
    // bin ids (broadcast-hash here only because the exploded ranges
    // side is tiny; at scale it shuffles both sides by bin)
    assert(plan.contains("HashJoin [__graft_fbin") ||
      plan.contains("SortMergeJoin [__graft_fbin"), plan)
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

  test("registry query join_interval_auto matches join_interval") {
    val auto = graft.operators.Joins
      .joinIntervalAuto(s, SparkTestSession.SF).collect().toSeq
    val manual = graft.operators.Joins
      .joinInterval(s, SparkTestSession.SF).collect().toSeq
    assert(auto == manual)
  }
}
