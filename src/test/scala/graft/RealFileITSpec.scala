package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Tag
import org.apache.spark.sql.functions._

/** Marks the multi-GB integration tests; exclude in the fast dev loop
  * with `testOnly -- -l graft.SlowIT`. The default `sbt test` RUNS
  * them — that is the point: the reference's bar includes multi-GB
  * real-file round trips (RealWorldFilesIT.java:45-117, GATK BAMs
  * checked against samtools counts), and a merge/codec path proven
  * only on 5 MB fixtures is not proven.
  */
object SlowIT extends Tag("graft.SlowIT")

/** ≥1 GB single-file sink + BGZF round trips — the scale where raw
  * chunk splicing (`ParquetFileWriter.appendFile`) and the BGZF BSIZE
  * chain walk meet real row-group counts, multi-split reads, and
  * >2^31 byte offsets in a single file.
  *
  * Size is env-tunable (SPARK_GRAFT_IT_ROWS / _LINES) so a dev box
  * can shrink it; defaults hold the ≥1 GB bar the reference sets.
  */
class RealFileITSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val storage = sources.GraftStorage(spark)

  test("1 GB single-file parquet sink: appendFile merge keeps counts, " +
      "content, and global row-group order", SlowIT) {
    // ~40M rows × ~40 B of incompressible payload ≈ 1.5 GB on disk
    val n = sys.env.getOrElse("SPARK_GRAFT_IT_ROWS", "40000000").toLong
    val out = T.scratch("it", "single_1gb.parquet")
    new java.io.File(out).getParentFile.mkdirs()
    // range-partitioned + within-partition-sorted input: the contract
    // under which lexicographic part concatenation = global order
    val df = spark.range(0, n, 1, 64)
      .select($"id",
        md5($"id".cast("string")).as("payload"),
        ($"id" % 97).as("bucket"))
      .repartitionByRange(64, $"id")
      .sortWithinPartitions($"id")
    storage.writeSingleParquet(df, out)

    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    assert(st.isFile, "sink must produce ONE file, not a directory")
    assert(st.getLen >= 1_000_000_000L,
      s"file is ${st.getLen} B — below the 1 GB integration bar; " +
        "raise SPARK_GRAFT_IT_ROWS")

    // content: exact count + order-insensitive aggregates
    val back = spark.read.parquet(out)
    val agg = back.agg(
      count(lit(1)), sum($"id"), min($"id"), max($"id"),
      count(when(md5($"id".cast("string")) =!= $"payload", 1))).head()
    assert(agg.getLong(0) == n)
    assert(agg.getLong(1) == n * (n - 1) / 2)
    assert(agg.getLong(2) == 0L && agg.getLong(3) == n - 1)
    assert(agg.getLong(4) == 0L, "payload corrupted by the merge")

    // ordering: the merged file's row groups must carry
    // non-overlapping, strictly increasing id ranges in PHYSICAL
    // order — the footer is the authority on what appendFile spliced
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(conf, p)
    try {
      val blocks = reader.getFooter.getBlocks
      assert(blocks.size() > 8,
        s"only ${blocks.size()} row groups — not a multi-chunk merge")
      val idIdx = reader.getFooter.getFileMetaData.getSchema
        .getFieldIndex("id")
      var prevMax = Long.MinValue
      (0 until blocks.size()).foreach { i =>
        val stats = blocks.get(i).getColumns.get(idIdx).getStatistics
        val lo = stats.genericGetMin.asInstanceOf[Long]
        val hi = stats.genericGetMax.asInstanceOf[Long]
        assert(lo > prevMax,
          s"row group $i [$lo,$hi] overlaps previous max $prevMax — " +
            "global order lost in the merge")
        assert(lo <= hi)
        prevMax = hi
      }
    } finally reader.close()
    fs.delete(p, false): Unit
  }

  test("1 GB BGZF text round trip: multi-split read is exactly-once " +
      "and complete", SlowIT) {
    // ~15M lines × ~75 B ≈ 1.1 GB uncompressed
    val n = sys.env.getOrElse("SPARK_GRAFT_IT_LINES", "15000000").toLong
    val dir = T.scratch("it", "bgzf_1gb")
    val lines = spark.range(0, n, 1, 32)
      .select(concat_ws("|", $"id",
        md5($"id".cast("string")),
        md5(($"id" + 1).cast("string"))).as("line"))
    storage.writeBgzfText(lines, dir)

    // uncompressed payload must clear the bar even though the codec
    // shrinks it on disk — each line is ~75 B (id + two md5 + seps),
    // and the INPUT size is what the read path has to reassemble
    assert(n * 75 >= 1_000_000_000L,
      "line count below the 1 GB uncompressed bar")

    // force a genuinely multi-split read: 8 MB compressed splits
    val back = storage.readBgzfLines(dir, targetSplitBytes = 8L << 20)
      .map(_.split('|')(0).toLong)
    assert(back.rdd.getNumPartitions > 16,
      "split planning produced too few splits for a >1 GB corpus")
    val agg2 = back.toDF("id").agg(
      count(lit(1)), countDistinct($"id"), min($"id"), max($"id")).head()
    assert(agg2.getLong(0) == n, "lines lost or duplicated across splits")
    assert(agg2.getLong(1) == n, "duplicate line ids — split overlap")
    assert(agg2.getLong(2) == 0L && agg2.getLong(3) == n - 1)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
