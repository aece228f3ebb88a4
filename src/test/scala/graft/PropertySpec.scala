package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties — SURVEY.md §5 oracle #3 (randomized
  * invariants instead of example tests): interval canonicalization
  * laws, SimHashAgg's aggregation algebra (the partial/final split is
  * only correct if update order and buffer partitioning don't change
  * the result), and the partition-count invariance the reference pins
  * with its split-size matrix (HtsjdkReadsRddTest.java:94-110).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.toString)
  }

  test("normalize: disjoint, sorted, coverage-preserving (forAll)") {
    val ivGen = Gen.listOf(for {
      lo <- Gen.chooseNum(-1000L, 1000L)
      len <- Gen.chooseNum(-5L, 100L) // negative lengths = inverted, dropped
    } yield (lo, lo + len))
    check(Prop.forAll(ivGen) { ivs =>
      val norm = operators.Intervals.normalize(ivs)
      val valid = ivs.filter(iv => iv._2 >= iv._1)
      val disjointSorted = norm.sliding(2).forall {
        case Seq((_, h1), (l2, _)) => l2 > h1 + 1
        case _ => true
      }
      def cov(set: Seq[(Long, Long)], x: Long) =
        set.exists { case (l, h) => x >= l && x <= h }
      // probe all boundary±1 points — where merge bugs live
      val pts = valid.flatMap { case (l, h) => Seq(l - 1, l, h, h + 1) }
      disjointSorted && pts.forall(x => cov(valid, x) == cov(norm, x))
    })
  }

  private def simhashOf(groups: Seq[Seq[Long]]): Long = {
    // one buffer per "partition" of rows, merged pairwise — the
    // partial/final aggregation shape
    val agg = functions.SimHashAgg(BoundReference(0, LongType, nullable = true))
    val bufs = groups.map { g =>
      val b = agg.createAggregationBuffer()
      g.foreach(h => agg.update(b, new GenericInternalRow(Array[Any](h))))
      b
    }
    val merged = bufs.reduceLeft(agg.merge)
    agg.eval(merged).asInstanceOf[Long]
  }

  test("SimHashAgg: invariant under row order and buffer partitioning") {
    val gen = for {
      hs <- Gen.nonEmptyListOf(Gen.long)
      seed <- Gen.long
    } yield (hs, new scala.util.Random(seed))
    check(Prop.forAll(gen) { case (hs, rnd) =>
      val serial = simhashOf(Seq(hs))
      val shuffled = rnd.shuffle(hs)
      val nSplits = 1 + rnd.nextInt(4)
      val parts = shuffled.grouped(
        math.max(1, shuffled.size / nSplits)).toSeq
      simhashOf(parts) == serial
    })
  }

  test("SimHashAgg: serialize/deserialize round-trips any buffer") {
    val agg = functions.SimHashAgg(BoundReference(0, LongType, nullable = true))
    check(Prop.forAll(Gen.listOfN(64, Gen.chooseNum(-1000000, 1000000))) { vs =>
      val buf = vs.toArray
      agg.deserialize(agg.serialize(buf)).sameElements(buf)
    })
  }

  test("BloomLongAgg: no false negatives under any partial/merge split") {
    // the pruning soundness contract: however rows are partitioned
    // into partial aggregates, the merged Bloom must contain every
    // inserted key — a false negative would make the FileIndex prune
    // a file that holds the looked-up value (wrong results, not just
    // a slow plan)
    val gen = for {
      keys <- Gen.listOf(Gen.chooseNum(-100000L, 100000L))
      cut <- Gen.chooseNum(0, 100)
    } yield (keys, cut)
    check(Prop.forAll(gen) { case (keys, cutPct) =>
      val agg = new graft.sources.BloomLongAgg(1000, 0.01)
      val cut = keys.size * cutPct / 100
      val (a, b) = keys.splitAt(cut)
      val bufA = a.foldLeft(agg.zero)((buf, k) => agg.reduce(buf, ("f", k)))
      val bufB = b.foldLeft(agg.zero)((buf, k) => agg.reduce(buf, ("f", k)))
      val bytes = agg.finish(agg.merge(bufA, bufB))
      val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      keys.forall(bloom.mightContainLong)
    })
  }

  test("partition-count invariance: row count independent of split size") {
    val spark = SparkTestSession.spark
    val path = s"${SparkTestSession.SF}/lineitem.parquet"
    val total = spark.read.parquet(path).count()
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      for (bytes <- Seq(64 * 1024, 1024 * 1024, 128 * 1024 * 1024)) {
        spark.conf.set("spark.sql.files.maxPartitionBytes", bytes.toString)
        val df = spark.read.parquet(path)
        val perPart = df.rdd
          .mapPartitions(it => Iterator.single(it.size.toLong)).collect()
        assert(perPart.sum == total, s"split=$bytes")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }
}
