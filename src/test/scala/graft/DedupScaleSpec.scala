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

  test("embed grid join at 16x corpus: equi-join plan, arithmetically exact") {
    // 8000 vectors -> 32M candidate pairs through the block grid.
    // Replicas are EXACT copies at shifted ids, so the expected pair
    // count is closed-form: every original qualifying pair appears
    // once per replica-pair combination (16^2 ordered -> 136
    // unordered-with-equal allowed), and every vector matches its own
    // 15 other copies (cos=1 >= 0.45): 136*P + C(16,2)*N + 15N ...
    // simpler and robust: count pairs among replicas of the SAME
    // original pair set via the exact predicate on the small table.
    val base = T.t(spark, SF, "embeddings")
      .select($"vec_id", $"embedding")
    val n = base.count()
    val reps = 16
    val big = base.crossJoin(spark.range(reps).select($"id".as("rep")))
      .select(($"vec_id" + $"rep" * 100000L).as("vec_id"), $"embedding")
    val out = T.scratch(SF, "embeddings_16x")
    big.write.mode("overwrite").parquet(out)
    val res = llm.Knn.dedupEmbedOn(spark, out)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    val got = res.count()
    // closed form: P base qualifying pairs x (reps + 2*C(reps,2)) is
    // wrong only if base has exact-duplicate vectors; instead compute
    // the expectation directly: each base pair (a,b), a<b qualifies in
    // all reps^2 (i-rep a, j-rep b) combinations EXCEPT double
    // counting — ids are distinct so ordered-by-id pairs count once
    // each: reps^2 per base pair; self pairs (same base vector, two
    // different reps): C(reps,2) per base vector (cos = 1).
    val basePairs = llm.Knn.dedupEmbed(spark, SF).count()
    val expected = basePairs * reps * reps + n * reps * (reps - 1) / 2
    assert(got == expected, s"got=$got expected=$expected")
  }

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
