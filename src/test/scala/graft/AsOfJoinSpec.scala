package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native AsOfJoinExec: planned via the injected strategy, equal to
  * the union-trick formulation, correct on synthetic edges.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  test("native as-of join plans through AsOfJoinExec") {
    val df = streaming.StreamOps.joinAsofNative(spark, SF)
    // AsOfJoinExec prints as "AsOfJoin" (Exec suffix stripped); the
    // logical node never survives to the physical plan string alone.
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin "))
  }

  test("native as-of equals the union-trick result") {
    val native = streaming.StreamOps.joinAsofNative(spark, SF).collect().toSeq
    val union = streaming.StreamOps.joinAsofUnion(spark, SF).collect().toSeq
    assert(native == union)
  }

  test("synthetic edges: no prior match, exact-ts match, tie-break, key gaps") {
    val left = Seq(
      (1L, 100L, 10L), // before any right event -> null
      (1L, 200L, 11L), // exact ts match at 200
      (1L, 250L, 12L), // between -> still 200's row
      (2L, 500L, 13L), // key with no right rows at all -> null
      (3L, 300L, 14L)  // tie at ts 300: two right rows, higher id wins
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 150L, 90L), (1L, 200L, 91L), (1L, 260L, 92L),
      (3L, 300L, 93L), (3L, 300L, 94L),
      (4L, 1L, 95L)    // key never asked for
    ).toDF("rk", "rts", "rid")
    val got = plans.AsOf.join(left, right, "k", "rk", "ts", "rts", Seq("rid"))
      .select($"lid", $"rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got == Set((10L, -1L), (11L, 91L), (12L, 91L), (13L, -1L), (14L, 94L)))
  }

  test("scale smoke: 1M x 100k as-of via the merge exec, checked arithmetically") {
    // left (k = id % 1000, ts = id); right ts for key k = {k, k+1000,
    // ..., k+99000}. The as-of match for left id is therefore
    // min(id, k + 99000) — a closed-form oracle, no reference join.
    // A pairwise join+rank here is ~10^8 candidate pairs; the merge
    // exec streams both sides once per partition.
    val left = spark.range(0, 1000000).select(
      ($"id" % 1000).as("k"), $"id".as("lts"))
    val right = spark.range(0, 100000).select(
      ($"id" % 1000).as("rk"), $"id".as("rts"))
    val joined = plans.AsOf.join(left.toDF(), right.toDF(), "k", "rk", "lts", "rts")
    assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin "))
    val got = joined.agg(sum($"rts")).collect()(0).getLong(0)
    val expected = spark.range(0, 1000000)
      .select(least($"id", $"id" % 1000 + 99000).as("m"))
      .agg(sum($"m")).collect()(0).getLong(0)
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("as-of on empty right side yields all-null matches") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val right = Seq.empty[(Long, Long, Long)].toDF("rk", "rts", "rid")
    val got = plans.AsOf.join(left, right, "k", "rk", "ts", "rts", Seq("rid"))
      .collect()
    assert(got.length == 1 && got(0).isNullAt(5))
  }
}
