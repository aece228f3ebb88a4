package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale smokes for the curation family: synthetic corpora 2-3 orders
  * of magnitude past the fixtures, with closed-form expected results —
  * the "would the plan still be right at 100 TB" check (candidate
  * bounding, no BNLJ, bounded per-task state), not a micro-benchmark.
  */
class CurateScaleSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("packing 1M docs: closed-form pack count and token conservation") {
    val nDocs = 1000000L
    val tokPerDoc = 100L
    val d = spark.range(nDocs).select(
      $"id".as("doc_id"),
      pmod($"id", lit(8)).as("grp"),
      lit(tokPerDoc).as("n"))
    val res = llm.Curate.packCounts(spark, d).localCheckpoint()
    // per group: nDocs/8 docs x 100 toks, starts at multiples of 100;
    // last start = (nDocs/8 - 1) * 100 -> floor(lastStart/512)+1 packs
    val perGrp = nDocs / 8
    val expPacks = (perGrp - 1) * tokPerDoc / 512 + 1
    val got = res.groupBy($"grp")
      .agg(count(lit(1)).as("packs"), sum($"tok_sum").as("toks"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == 8)
    got.foreach { case (g, packs, toks) =>
      assert(packs == expPacks, s"grp $g: $packs packs, expected $expPacks")
      assert(toks == perGrp * tokPerDoc, s"grp $g token loss")
    }
  }

  test("bloom decontamination at 200k docs: planted contamination, exact count") {
    val nDocs = 200000L
    // 3-token texts -> exactly one 3-gram shingle per doc. Benchmark
    // docs 0-4 own shingle "bench word <i>"; every 10th corpus doc
    // reuses one; the rest are unique per id.
    val docs = spark.range(nDocs).select(
      $"id".as("doc_id"),
      when($"id" < 5, concat(lit("bench word "), $"id"))
        .when($"id" % 10 === 0, concat(lit("bench word "), pmod($"id", lit(5))))
        .otherwise(concat(lit("clean word "), $"id")).as("text"))
    val res = llm.Curate.decontamBloomDocs(spark, docs)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
    val contaminated = (5L until nDocs).count(_ % 10 == 0)
    val expected = (nDocs - 5) - contaminated
    assert(res.count() == expected)
  }

  test("count-min heavy hitters at 1M bigrams: planted hot pair only") {
    val nDocs = 500000L
    // 3-token texts -> 2 bigrams per doc; 1% of docs share the hot
    // text, all other bigrams are unique per doc.
    val docs = spark.range(nDocs).select(
      $"id".as("doc_id"),
      when($"id" % 100 === 0, lit("hot pair now"))
        .otherwise(concat(lit("u"), $"id", lit(" v"), $"id", lit(" w"), $"id"))
        .as("text"))
    val res = llm.Curate.heavyHittersDocs(spark, docs)
      .as[(String, Long)].collect().toMap
    // total = 1M bigrams, threshold = 1000; hot bigrams appear
    // nDocs/100 = 5000 times; everything else once
    assert(res == Map("hot_pair" -> 5000L, "pair_now" -> 5000L), res.toString)
  }
}
