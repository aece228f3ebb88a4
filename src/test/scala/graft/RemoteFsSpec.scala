package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftStorage

/** A Hadoop filesystem with a NON-file:// scheme (locally backed, like
  * Hadoop's own test filesystems): every path flowing through it has
  * authority/scheme `graftfs`, so any code that silently assumes
  * `file://` — string-building paths, java.io shortcuts, default-FS
  * resolution — breaks loudly here. The reference proves the same
  * property against MiniDFS (HtsjdkReadsRddHdfsTest); no HDFS
  * test jars ship in this environment, so scheme isolation is the
  * portable equivalent: all IO still goes through the
  * org.apache.hadoop.fs.FileSystem API surface an object store or
  * HDFS would implement.
  */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
  override def getScheme: String = "graftfs"
}

/** GraftStorage's driver-side machinery (footer-pool zone maps,
  * plan-time pruned reads, single-file csv splice, single-file
  * parquet row-group merge) exercised end-to-end on a non-local
  * filesystem scheme.
  */
class RemoteFsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)

  private val storage = GraftStorage(spark)
  private def remote(name: String): String =
    "graftfs://" + T.scratch(SF, name)

  test("writeIndexed + footer zone map + pruned reads work on graftfs://") {
    val out = remote("remote_zonemap")
    val li = T.t(spark, SF, "lineitem")
    storage.writeIndexed(li, out, "l_shipdate", "l_shipdate")
    // footer fast path (driver pool) must handle graftfs paths
    assert(storage.buildZoneMap(out, Seq("l_shipdate")),
      "expected the metadata-only footer path on graftfs")
    val sidecar = spark.read.parquet(s"$out/_zonemap")
    assert(sidecar.agg(sum($"cnt")).collect()(0).getLong(0) == li.count())
    // sidecar records graftfs URIs, and driver-side pruning reads them
    assert(sidecar.select("file").as[String].collect()
      .forall(_.startsWith("graftfs:")), "sidecar must carry scheme'd paths")
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-03-31 00:00:00")
    val expected = li.filter($"l_shipdate".between(lit(lo), lit(hi))).count()
    assert(storage.readIndexed(out, "l_shipdate", lo, hi).count() == expected)
    // plan-time ZoneMapFileIndex pruning over graftfs
    val planned = storage.readPruned(out)
      .filter($"l_shipdate".between(lit(lo), lit(hi)))
    assert(planned.count() == expected)
  }

  test("single-file csv splice works on graftfs://") {
    val out = remote("remote_single") + "/orders.csv"
    val df = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .repartitionByRange(4, $"o_orderkey")
      .sortWithinPartitions($"o_orderkey")
    storage.writeSingleCsv(df, out)
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getFileStatus(new Path(out)).isFile)
    assert(!fs.exists(new Path(out + ".parts")), "temp parts not cleaned")
    val keys = spark.read.option("header", "true").csv(out)
      .select($"o_orderkey".cast("long")).collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted && keys.nonEmpty)
  }

  test("single-file parquet row-group merge works on graftfs://") {
    val out = remote("remote_single_pq") + "/orders.parquet"
    val df = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .repartitionByRange(4, $"o_orderkey")
      .sortWithinPartitions($"o_orderkey")
    storage.writeSingleParquet(df, out)
    val keys = spark.read.parquet(out)
      .select($"o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted)
    assert(keys.size == T.t(spark, SF, "orders").count())
  }

  test("bloom sidecar build + pruned point lookup work on graftfs://") {
    val out = remote("remote_bloom")
    val li = T.t(spark, SF, "lineitem")
    li.repartition(8, $"l_partkey").write.mode("overwrite").parquet(out)
    storage.buildBloomIndex(out, Seq("l_partkey"))
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$out/_bloom")))
    val pruned = storage.readPruned(out).filter($"l_partkey" === 100)
    assert(pruned.count() == li.filter($"l_partkey" === 100).count())
    assert(pruned.count() > 0)
  }

  test("format(\"graft\") round trip works on graftfs://") {
    val out = remote("remote_format")
    T.t(spark, SF, "nation")
      .write.format("graft").mode("overwrite")
      .option("clusterBy", "n_nationkey").option("zone", "n_nationkey")
      .save(out)
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$out/_zonemap")))
    assert(spark.read.format("graft").load(out)
      .filter($"n_nationkey" < 10).count() == 10)
  }

  test("strictSchema footer check works on graftfs://") {
    val out = remote("remote_strict")
    val n = T.t(spark, SF, "nation")
    n.select($"n_nationkey", $"n_name")
      .write.mode("overwrite").parquet(s"$out/batch=1")
    n.select($"n_nationkey", $"n_name", lit(7).as("extra"))
      .write.mode("overwrite").parquet(s"$out/batch=2")
    val ex = intercept[IllegalArgumentException] {
      GraftStorage(spark).strictSchema().read(out)
    }
    assert(ex.getMessage.contains("incompatible file schemas"))
  }
}
