package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale smoke for the near-dup pipeline: replicate the corpus 20×
  * (disjoint doc_id ranges, unchanged text), run the MinHash-LSH
  * pipeline, and check that every replica's planted pairs survive.
  * Exercises candidate-bounding behavior at 10k docs / ~1M shingle
  * rows — the shape that must hold at 100 TB, where all-pairs
  * verification is impossible but banding keeps candidates linear.
  */
class DedupScaleSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  test("minhash-LSH pipeline at 20x corpus keeps planted-pair recall") {
    val base = T.t(spark, SF, "documents")
    val replicas = spark.range(20).select($"id".as("rep"))
    val big = base.crossJoin(replicas)
      .select(($"doc_id" + $"rep" * 10000L).as("doc_id"), $"text")
    val out = T.scratch(SF, "documents_20x")
    big.write.mode("overwrite").parquet(out)

    // same pipeline, pointed at the scaled table
    val t = llm.Dedup.shingleRows(spark.read.parquet(out))
    val sigs = llm.Dedup.minhashSigs(t)
    assert(sigs.count() == 20 * base.count())

    val pairs = {
      // reuse the public query against a scratch dir shaped like a
      // sf dir (documents.parquet inside)
      val dir = T.scratch(SF, "documents_20x_dir")
      big.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      llm.Dedup.dedupNear(spark, dir)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    }
    val basePairs = llm.Dedup.ngramJaccard(spark, SF)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(basePairs.nonEmpty)
    // every replica of every planted pair must be found
    (0 until 20).foreach { rep =>
      basePairs.foreach { case (a, b) =>
        val (ra, rb) = (a + rep * 10000L, b + rep * 10000L)
        assert(pairs.contains((ra, rb)), s"missing pair ($ra,$rb) rep=$rep")
      }
    }
    // identical texts across replicas also become (jaccard=1) pairs;
    // candidates stay bounded — sanity-check the result is not an
    // all-pairs explosion (10k docs → ~50M possible pairs)
    assert(pairs.size < 500000, s"candidate blowup: ${pairs.size}")
  }
}
