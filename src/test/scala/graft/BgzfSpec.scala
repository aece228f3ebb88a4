package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BGZF splittable-text source: block framing round trip, split
  * planning, and — the part that is easy to get subtly wrong — the
  * exactly-once line semantics at every placement of line boundaries
  * vs block and split boundaries (fuzzed over randomized layouts,
  * including newline-at-block-edge, empty lines, lines longer than a
  * whole split, and no trailing newline).
  */
class BgzfSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  private val storage = sources.GraftStorage(spark)

  test("round trip: lines -> .bgz shards -> split-parallel read, exactly once") {
    val out = T.scratch(SF, "bgzf_roundtrip")
    val lines = (0 until 5000).map(i => s"line-$i,payload-${"x" * (i % 40)}")
    lines.toDF("value").repartition(4)
      .createOrReplaceTempView("bgzf_in")
    storage.writeBgzfText(spark.table("bgzf_in"), out, blockInput = 1024)
    val back = storage.readBgzfLines(out, targetSplitBytes = 4096)
    val got = back.collect()
    assert(got.length == lines.length)
    assert(got.sorted.toSeq == lines.sorted, "content must round-trip exactly")
    // genuinely split: more partitions than shards
    assert(back.rdd.getNumPartitions > 4,
      s"expected >4 splits, got ${back.rdd.getNumPartitions}")
  }

  test("fuzz: exactly-once lines across 60 randomized block/split layouts") {
    val rnd = new scala.util.Random(42)
    val conf = spark.sparkContext.hadoopConfiguration
    for (trial <- 0 until 60) {
      // random corpus: empty lines, huge lines, newline-dense runs
      val n = 1 + rnd.nextInt(80)
      val lines = (0 until n).map { i =>
        rnd.nextInt(5) match {
          case 0 => ""
          case 1 => "y" * (50 + rnd.nextInt(400)) // line >> block
          case _ => s"t$trial-l$i-" + ("a" * rnd.nextInt(30))
        }
      }
      val trailingNewline = rnd.nextBoolean()
      val text = lines.mkString("\n") + (if (trailingNewline) "\n" else "")
      val dir = new org.apache.hadoop.fs.Path(
        T.scratch(SF, s"bgzf_fuzz"), s"t$trial")
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val blockInput = 8 + rnd.nextInt(64)
      val w = new sources.Bgzf.BlockWriter(
        fs.create(new org.apache.hadoop.fs.Path(dir, "data.bgz"), true),
        blockInput)
      w.write(text.getBytes("UTF-8"))
      w.close()
      val target = 16 + rnd.nextInt(256)
      val got = storage.readBgzfLines(dir.toString, targetSplitBytes = target)
        .collect().toSeq
      // expected: split semantics ignore a trailing newline's empty tail
      val expected = text.split("\n", -1).toSeq match {
        case init :+ "" if text.nonEmpty => init
        case all => all
      }
      assert(got.sorted == expected.sorted,
        s"trial $trial (block=$blockInput split=$target lines=$n " +
          s"trailing=$trailingNewline):\n got=${got.size} want=${expected.size}")
    }
  }

  test("split planning: blocks grouped near target, block-aligned, EOF marker excluded") {
    val dir = new org.apache.hadoop.fs.Path(T.scratch(SF, "bgzf_splits"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val f = new org.apache.hadoop.fs.Path(dir, "data.bgz")
    val w = new sources.Bgzf.BlockWriter(fs.create(f, true), 512)
    w.write(((("z" * 100) + "\n") * 200).getBytes("UTF-8"))
    w.close()
    val len = fs.getFileStatus(f).getLen
    val in = fs.open(f)
    val offsets = try sources.Bgzf.blockOffsets(in, len) finally in.close()
    assert(offsets.nonEmpty)
    // chain is contiguous and stops before the EOF marker
    offsets.sliding(2).foreach {
      case Seq((a, sz), (b, _)) => assert(a + sz == b)
      case _ => ()
    }
    assert(offsets.last._1 + offsets.last._2 == len - 28,
      "EOF marker must not be a data block")
    val splits = sources.Bgzf.splitsOf(f.toString, offsets, len, 256)
    assert(splits.size > 1)
    assert(splits.head.start == 0)
    splits.sliding(2).foreach {
      case Seq(a, b) => assert(a.end == b.start)
      case _ => ()
    }
    assert(splits.last.end == len - 28)
  }

  test("empty input partitions produce no shard; gzip wall vs bgzf splits") {
    val out = T.scratch(SF, "bgzf_orders")
    val o = T.t(spark, SF, "orders")
      .select(concat_ws(",", $"o_orderkey", $"o_orderpriority",
        $"o_totalprice").as("value"))
      .repartition(2)
    storage.writeBgzfText(o, out, blockInput = 2048)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".bgz"))
    assert(files == 2)
    // splittable: a small target yields more tasks than shards, and
    // the parsed table matches the source exactly
    val ds = storage.readBgzfLines(out, targetSplitBytes = 2 * 1024)
    assert(ds.rdd.getNumPartitions > files)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_orderpriority",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    val parsed = spark.read.schema(schema).csv(ds)
    assert(parsed.count() == T.t(spark, SF, "orders").count())
    assert(parsed.agg(sum($"o_orderkey")).head().getLong(0) ==
      T.t(spark, SF, "orders").agg(sum($"o_orderkey")).head().getLong(0))
  }

  test("content sniff: BGZF-under-.gz splits, plain gzip gets file tasks, " +
      "union exactly once") {
    val dir = T.scratch(SF, "gz_sniff")
    val fsPath = new org.apache.hadoop.fs.Path(dir)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsPath, true)
    fs.mkdirs(fsPath)
    val lines = (0 until 4000).map(i => s"row-$i,${i % 7}")
    // half the lines BGZF-framed but renamed to the misleading .gz
    val bgzfTmp = dir + ".btmp"
    lines.take(2000).toDF("value").repartition(1)
      .createOrReplaceTempView("sniff_in")
    storage.writeBgzfText(spark.table("sniff_in"), bgzfTmp,
      blockInput = 1024)
    fs.listStatus(new org.apache.hadoop.fs.Path(bgzfTmp)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".bgz"))
      .foreach { f =>
        fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dir,
          "disguised-" + f.getPath.getName.stripSuffix(".bgz") + ".gz")): Unit
      }
    fs.delete(new org.apache.hadoop.fs.Path(bgzfTmp), true)
    // other half as true plain gzip (unsplittable member)
    val gzOut = new java.io.File(dir, "plain-0.gz")
    val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(
      new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(gzOut)), "UTF-8"))
    lines.drop(2000).foreach(w.println)
    w.close()
    val back = storage.readGzTextSniffed(dir, targetSplitBytes = 4 * 1024)
    assert(back.collect().sorted.toSeq == lines.sorted,
      "mixed dir must union both kinds exactly once")
    // the BGZF half must have split finer than one-task-per-file:
    // 1 disguised shard + 1 plain file but >2 partitions total
    assert(back.rdd.getNumPartitions > 2,
      s"BGZF-under-.gz must split, got ${back.rdd.getNumPartitions} partitions")
  }

  test("sniff rejects plain gzip and accepts BGZF bytes") {
    val bgzf = sources.Bgzf.blockOf("hello".getBytes("UTF-8"), 0, 5)
    val plain = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("hello".getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    def asInput(b: Array[Byte]) = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(b))
    assert(sources.Bgzf.sniffBgzf(asInput(bgzf)))
    assert(!sources.Bgzf.sniffBgzf(asInput(plain)))
    assert(!sources.Bgzf.sniffBgzf(asInput(Array[Byte](1, 2, 3))))
  }
}
