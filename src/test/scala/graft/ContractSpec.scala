package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract conformance: every declared query runs, oracle
  * keys align, flagship smoke passes, results are deterministic.
  */
class ContractSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are unique across modules") {
    val all = SparkEntry.modules.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, SF)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  for (name <- Seq("scan_reads", "llm_knn", "stream_session", "win_rank",
    "join_asof_native", "llm_dedup_clusters", "sink_nested", "agg_pivot")) {
    test(s"query $name is deterministic across runs") {
      val a = SparkEntry.queries(name)(spark, SF).collect().toSeq
      val b = SparkEntry.queries(name)(spark, SF).collect().toSeq
      assert(a == b)
    }
  }
}
