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

  test("S3-style overwriting rename: the fixture really overwrites, " +
    "the default primitive still catches a staged conflict, and a " +
    "registered conditional-put primitive survives concurrent appends") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftows.impl", classOf[OverwritingFileSystem].getName)
    val base = "graftows://" + T.scratch(SF, "ows_commit")
    val fs = new Path(base).getFileSystem(conf)
    fs.delete(new Path(base), true)
    fs.mkdirs(new Path(base))
    // 1. fixture sanity: rename ONTO an existing destination succeeds
    //    and replaces it — exactly the S3 semantics that voids the
    //    HDFS branch's atomicity
    def put(p: Path, s: String): Unit = {
      val o = fs.create(p, true); o.write(s.getBytes("UTF-8")); o.close()
    }
    put(new Path(base, "a"), "first")
    put(new Path(base, "b"), "second")
    assert(fs.rename(new Path(base, "b"), new Path(base, "a")),
      "overwriting FS must accept rename onto an existing destination")
    val in = fs.open(new Path(base, "a"))
    val got = new Array[Byte](6); in.readFully(got); in.close()
    assert(new String(got, "UTF-8") == "second")
    // 2. the default exists+rename primitive still detects a STAGED
    //    conflict (destination already published before this publish)
    val prim = GraftStorage.commitPrimitiveFor(fs)
    put(new Path(base, "dst"), "winner")
    put(new Path(base, "tmp1"), "loser")
    intercept[java.util.ConcurrentModificationException] {
      prim.putIfAbsent(fs, new Path(base, "tmp1"), new Path(base, "dst"))
    }
    assert(!fs.exists(new Path(base, "tmp1")), "loser temp must be cleaned")
    // 3. register a REAL conditional-put for the scheme (this FS is
    //    locally backed, so link(2) provides it — an S3 deployment
    //    would back this with an If-None-Match PUT) and prove the
    //    versioned commit protocol holds under concurrent appends
    GraftStorage.registerCommitPrimitive("graftows",
      GraftStorage.LocalLinkPrimitive)
    try {
      val table = base + "/table"
      val st = GraftStorage(spark)
      st.writeVersioned(Seq((0L, "seed")).toDF("k", "v"), table)
      val writers = 4
      val commitsEach = 3
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until writers).foreach { w =>
        pool.execute { () =>
          try {
            for (c <- 0 until commitsEach)
              st.appendVersionedRetrying(
                Seq((w * 100L + c, s"w$w-c$c")).toDF("k", "v"), table,
                maxRetries = 50)
          } catch { case t: Throwable => errs.add(t) }
        }
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(errs.isEmpty, s"concurrent appends failed: ${errs.peek()}")
      // every commit landed: no silently lost manifest, rows complete
      assert(st.listVersions(table).size == 1 + writers * commitsEach)
      assert(st.readVersioned(table).count() == 1 + writers * commitsEach)
    } finally GraftStorage.registerCommitPrimitive("graftows",
      GraftStorage.RenameIfAbsentPrimitive)
  }

  test("readahead passthrough reaches the scan's per-relation Hadoop " +
      "conf on every read route (S11 prefetch delegation)") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val out = remote("remote_readahead")
    val li = T.t(spark, SF, "nation")
      .select($"n_nationkey", $"n_name")
    li.write.mode("overwrite").parquet(out)
    storage.buildZoneMap(out, Seq("n_nationkey"))
    def relOpts(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      org.apache.spark.sql.graftbridge.Bridge.analyzed(df).collect {
        case l: LogicalRelation =>
          l.relation.asInstanceOf[HadoopFsRelation].options
      }.head
    val rh = storage.readahead(4 * 1024 * 1024)
    // Spark merges relation options into the scan's Hadoop conf
    // (newHadoopConfWithOptions), which is where the cloud
    // connectors read their prefetch knobs from
    for (df <- Seq(rh.read(out), rh.readPruned(out))) {
      val o = relOpts(df)
      assert(o("fs.s3a.readahead.range") == "4194304")
      assert(o("fs.azure.read.request.size") == "4194304")
      assert(o("io.file.buffer.size") == "4194304")
      assert(df.count() == li.count()) // the scan still reads
    }
    // versioned route
    val vt = remote("remote_readahead_v")
    graft.sources.GraftStorage(spark).writeVersioned(li, vt)
    val vdf = rh.readVersioned(vt)
    assert(relOpts(vdf)("fs.s3a.readahead.range") == "4194304")
    assert(vdf.count() == li.count())
    // a handle WITHOUT the option stays clean (per-relation, not
    // session-global)
    assert(!relOpts(storage.read(out)).contains("fs.s3a.readahead.range"))
  }
}

/** RawLocalFileSystem whose rename OVERWRITES an existing destination
  * — the S3-class semantics (copy/PUT replaces silently) that breaks
  * the exists+rename commit branch's atomicity claim.
  */
class OverwritingFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftows:///")
  override def getScheme: String = "graftows"
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst) && !getFileStatus(dst).isDirectory)
      delete(dst, false)
    super.rename(src, dst)
  }
}
