package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** Metadata tables (`#history` / `#files` / `#refs` / `#properties`):
  * the manifest log exposed as queryable SQL tables, served at
  * metadata rate through a LocalScan.
  */
class MetaTablesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  GraftCatalog.register(spark)
  private val st = GraftStorage(spark)

  private def fresh(name: String): String = {
    val out = T.scratch(SF, name)
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    out
  }

  test("#history: one row per commit with inferred operations, " +
    "file/row counts, and maintenance op tags") {
    val out = fresh("meta_history")
    st.writeVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(2), out)                                   // v0
    st.writeVersioned(Seq((3L, "c")).toDF("k", "v"), out,
      append = true)                                          // v1
    st.setTableProperty(out, "delete_mode", "merge-on-read")
    st.setTableProperty(out, "mor_key", "k")
    st.deleteVersionedMor(out, $"k" === 2L, "k")              // v2 DV
    st.compactVersioned(out, 1)                               // v3 tagged
    val h = spark.sql(
      s"SELECT * FROM graft.`$out#history` ORDER BY version")
    val rows = h.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("create", "append", "merge-on-read-delete", "compact"))
    // data_files / delete_files
    assert(rows.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((2L, 0L), (3L, 0L), (3L, 1L), (1L, 0L)))
    // row_count is the PHYSICAL row total (pre-DV at v2, folded at v3)
    assert(rows.map(_.getLong(5)).toSeq == Seq(2L, 3L, 3L, 2L))
    assert(rows.forall(!_.getBoolean(6)), "no WAP stage here")
    // committed_at is a real non-null timestamp on every row
    assert(rows.forall(!_.isNullAt(1)))
  }

  test("#history: wap-stage rows flag audit_pending; publish clears") {
    val out = fresh("meta_history_wap")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    st.wapStage(Seq((2L, "b")).toDF("k", "v"), out, "audit1")
    val staged = spark.sql(
      s"SELECT operation, audit_pending FROM graft.`$out#history` " +
        "ORDER BY version").collect()
    assert(staged.map(_.getString(0)).toSeq == Seq("create", "wap-stage"))
    assert(staged.map(_.getBoolean(1)).toSeq == Seq(false, true))
    st.wapPublish(out, "audit1")
    val pub = spark.sql(
      s"SELECT operation, audit_pending FROM graft.`$out#history` " +
        "ORDER BY version").collect()
    assert(pub.map(_.getString(0)).toSeq ==
      Seq("create", "wap-stage", "wap-publish"))
    // the STAGED version's snapshot carries its W line forever (a
    // time-travel read of v1 is still audit-scoped); the published
    // head is clean
    assert(pub.map(_.getBoolean(1)).toSeq == Seq(false, true, false))
  }

  test("#history distinguishes ADD COLUMNS from a widening ALTER " +
    "COLUMN TYPE, and branch time travel refuses staged writes") {
    import org.apache.spark.sql.types._
    val out = fresh("meta_history_ddl")
    st.writeVersioned(Seq((1, "a")).toDF("k", "v"), out)
    st.writeVersioned(Seq((2, "b")).toDF("k", "v"), out, append = true)
    st.addColumnsVersioned(out, StructType(
      Seq(StructField("w", DoubleType))))
    st.widenColumnVersioned(out, "k", LongType)
    val ops = spark.sql(
      s"SELECT operation FROM graft.`$out#history` ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(ops ==
      Seq("create", "append", "add-columns", "alter-column-type"))
    // a pointer-only branch serves its pinned snapshot by name...
    st.branchVersion(out, "qa", Some(0L))
    assert(spark.sql(
      s"SELECT COUNT(*) AS c FROM graft.`$out` VERSION AS OF 'qa'")
      .head().getLong(0) == 1L)
    // ...but once writes are staged on it, the pointer alone LIES —
    // refuse with guidance instead of silently dropping them
    st.branchAppend(Seq((9L, "z", 0.0)).toDF("k", "v", "w"), out, "qa")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$out` VERSION AS OF 'qa'")
        .collect()
    }
    assert(e.getMessage.contains("staged unpublished writes"),
      e.getMessage)
  }

  test("#files: current snapshot's data files with rows/bytes, DV " +
    "files as kind=delete") {
    val out = fresh("meta_files")
    st.writeVersioned(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(3), out)
    st.setTableProperty(out, "delete_mode", "merge-on-read")
    st.setTableProperty(out, "mor_key", "k")
    st.deleteVersionedMor(out, $"k" === 1L, "k")
    val f = spark.sql(s"SELECT * FROM graft.`$out#files`")
    val data = f.filter($"kind" === "data").collect()
    val dvs = f.filter($"kind" === "delete").collect()
    assert(data.length == 3 && dvs.length == 1)
    // physical rows pre-DV sum to the written count
    assert(data.map(_.getLong(2)).sum == 3L)
    assert(data.forall(_.getLong(3) > 0L), "bytes from file status")
    assert(dvs.forall(_.isNullAt(2)), "DV rows are not tracked")
    // every listed file actually exists
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.collect().foreach(r => assert(fs.exists(new Path(r.getString(0)))))
  }

  test("#refs and #properties list tags/branches and declared props") {
    val out = fresh("meta_refs")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)       // v0
    st.writeVersioned(Seq((2L, "b")).toDF("k", "v"), out,
      append = true)                                            // v1
    st.tagVersion(out, "rel1", Some(0L))
    st.branchVersion(out, "dev")
    val refs = spark.sql(
      s"SELECT name, type, version FROM graft.`$out#refs` ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq == Seq(("dev", "branch", 1L), ("rel1", "tag", 0L)))
    st.setTableProperty(out, "owner", "teamA")
    val props = spark.sql(
      s"SELECT key, value FROM graft.`$out#properties` ORDER BY key")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(props.toSeq == Seq(("owner", "teamA")))
    // SQL time travel BY REF NAME: tags pin audited releases
    assert(spark.sql(
      s"SELECT COUNT(*) AS c FROM graft.`$out` VERSION AS OF 'rel1'")
      .head().getLong(0) == 1L)
    assert(spark.sql(
      s"SELECT COUNT(*) AS c FROM graft.`$out` VERSION AS OF 'dev'")
      .head().getLong(0) == 2L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$out` VERSION AS OF 'nope'")
        .collect()
    }
    assert(e.getMessage.contains("no tag or branch"), e.getMessage)
  }

  test("metadata tables are read-only and unknown kinds stay table " +
    "paths (loud NoSuchTable, not a silent empty result)") {
    val out = fresh("meta_guard")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    // writes refuse at analysis: BATCH_READ is the only capability
    val e1 = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$out#history` VALUES " +
        "(9, NULL, 'x', 0, 0, 0, false)")
    }
    assert(e1.getMessage.toLowerCase.contains("does not support") ||
      e1.getMessage.toLowerCase.contains("unsupported"), e1.getMessage)
    // '#latest' is NOT a metadata kind — it resolves as a data path
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$out#latest`").collect()
    }
    // (Spark then retries the unresolved name as a direct
    // query-on-files, so the surfaced error is the datasource one)
    def notFound(e: Exception): Boolean =
      e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        e.getMessage.toLowerCase.contains("cannot be found") ||
        e.getMessage.contains("UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY")
    assert(notFound(e2), e2.getMessage)
    // metadata of a nonexistent table is equally loud
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`${out}_nope#history`").collect()
    }
    assert(notFound(e3), e3.getMessage)
  }

  test("remove_orphans: crashed-writer droppings retire age-gated; " +
    "manifest-, WAP-, and branch-referenced files all survive") {
    import org.apache.spark.sql.functions.lit
    val out = fresh("orphan_gc")
    st.writeVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), out)
    st.writeVersioned(Seq((3L, "c")).toDF("k", "v"), out,
      append = true)
    st.wapStage(Seq((4L, "d")).toDF("k", "v"), out, "audit9")
    st.branchVersion(out, "dev")
    st.branchAppend(Seq((5L, "e")).toDF("k", "v"), out, "dev")
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
    // a crashed writer's never-published commit dir (stale) ...
    val orphanDir = new Path(out, "data/c9-deadbeef")
    fs.mkdirs(orphanDir)
    Seq("part-00000-junk.parquet", "_SUCCESS").foreach { n =>
      val f = new Path(orphanDir, n)
      val o = fs.create(f, true); o.write(Array[Byte](1, 2, 3)); o.close()
      fs.setTimes(f, old, old)
    }
    fs.setTimes(orphanDir, old, old)
    // ... a crashed publish's temp file ...
    val tmp = new Path(out, "_manifest/.v99.deadbeef.tmp")
    val to = fs.create(tmp, true); to.write(Array[Byte](0)); to.close()
    fs.setTimes(tmp, old, old)
    // age ALL real data older than the cutoff: liveness, not age,
    // must be what protects it
    def ageAll(d: Path): Unit = fs.listStatus(d).foreach { s =>
      if (s.isDirectory) ageAll(s.getPath)
      else fs.setTimes(s.getPath, old, old)
    }
    ageAll(new Path(out, "data"))
    // ... and an IN-FLIGHT writer's staging dir, created fresh AFTER
    // the aging pass (its youth is what must protect it)
    val freshDir = new Path(out, "data/c9-cafef00d")
    fs.mkdirs(freshDir)
    val ff = new Path(freshDir, "part-00000-fresh.parquet")
    val fo = fs.create(ff, true); fo.write(Array[Byte](9)); fo.close()
    val removed = st.removeOrphansVersioned(out,
      olderThanMillis = 24L * 3600 * 1000)
    assert(removed >= 2L, s"expected the orphan + tmp gone, got $removed")
    assert(!fs.exists(new Path(orphanDir, "part-00000-junk.parquet")))
    assert(!fs.exists(orphanDir), "fully-dead dir swept with markers")
    assert(!fs.exists(tmp))
    assert(fs.exists(ff), "fresh staging file must survive the gate")
    // every referenced surface is intact
    assert(st.readVersioned(out).count() == 3)
    st.wapPublish(out, "audit9")
    assert(st.readVersioned(out).count() == 4)
    st.branchPublish(out, "dev")
    assert(st.readVersioned(out).count() == 5)
  }

  test("#history stays metadata-rate: plans as a LocalTableScan, " +
    "zero data-file opens") {
    val out = fresh("meta_plan")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    val df = spark.sql(s"SELECT version FROM graft.`$out#history`")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan)
  }

  test("#history committed_at comes from ONE _manifest listing — " +
    "never a getFileStatus RPC per retained version") {
    spark.sparkContext.hadoopConfiguration.set("fs.graftmeta.impl",
      classOf[MetaCountingFileSystem].getName)
    val out = "graftmeta://" + fresh("meta_one_listing")
    (0 until 6).foreach { i =>
      st.writeVersioned(Seq((i.toLong, s"r$i")).toDF("k", "v"), out,
        append = i > 0)
    }
    // first query warms the entry-resolve cache (reading each
    // manifest's CONTENT once is inherent); the pin is that the
    // mtime column adds ZERO per-version status RPCs on top — the
    // cached re-query must resolve committed_at from one listing
    def history() = spark.sql(
      s"SELECT version, committed_at FROM graft.`$out#history`").collect()
    val rows = history()
    assert(rows.length == 6)
    assert(rows.forall(!_.isNullAt(1)), "every commit gets an mtime")
    MetaCountingFileSystem.manifestStatusCalls.set(0)
    assert(history().length == 6)
    assert(MetaCountingFileSystem.manifestStatusCalls.get() == 0,
      s"#history issued ${MetaCountingFileSystem.manifestStatusCalls.get()} " +
        "per-version getFileStatus RPCs — must resolve mtimes from " +
        "one _manifest listing")
  }

  test("metadata tables refuse past the driver-row ceiling with " +
    "guidance (no silent driver-memory incident)") {
    val out = fresh("meta_gate")
    st.writeVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(2), out)
    spark.conf.set("spark.graft.meta.maxLocalRows", "1")
    try {
      val e = intercept[IllegalStateException] {
        spark.sql(s"SELECT * FROM graft.`$out#files`").collect()
      }
      assert(e.getMessage.contains("maxLocalRows"), e.getMessage)
      st.writeVersioned(Seq((3L, "c")).toDF("k", "v"), out,
        append = true)
      val e2 = intercept[IllegalStateException] {
        spark.sql(s"SELECT * FROM graft.`$out#history`").collect()
      }
      assert(e2.getMessage.contains("maxLocalRows"), e2.getMessage)
    } finally spark.conf.unset("spark.graft.meta.maxLocalRows")
    // back under the ceiling: both serve normally
    assert(spark.sql(s"SELECT * FROM graft.`$out#files`").count() >= 2)
  }

  test("an exact-path data table literally named 't#files' wins over " +
    "metadata dispatch for sibling table 't'") {
    val base = fresh("meta_shadow")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), base)
    val literal = base + "#files"
    st.writeVersioned(Seq((42L, "z"), (43L, "y")).toDF("k", "v"), literal)
    // the literal table's own data, not base's file inventory
    val got = spark.sql(s"SELECT k FROM graft.`$literal` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(42L, 43L))
    // metadata dispatch still works when no literal table shadows it
    assert(spark.sql(s"SELECT * FROM graft.`$base#history`").count() == 1)
  }
}

/** RawLocalFileSystem on its own scheme counting getFileStatus calls
  * that target individual manifest version files — the RPC pattern
  * `#history` must never emit (see the one-listing test above).
  */
class MetaCountingFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftmeta:///")
  override def getScheme: String = "graftmeta"
  // RawLocalFileSystem.listStatus fans out to getFileStatus per child
  // (a local-impl detail, one syscall — NOT a remote RPC): suppress
  // counting inside a listing so the counter models object-store
  // semantics, where one LIST call returns every child's status
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    MetaCountingFileSystem.inListing.set(true)
    try super.listStatus(f)
    finally MetaCountingFileSystem.inListing.set(false)
  }
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    if (!MetaCountingFileSystem.inListing.get() &&
        f.getName.matches("v\\d+") &&
        Option(f.getParent).exists(_.getName == "_manifest"))
      MetaCountingFileSystem.manifestStatusCalls.incrementAndGet(): Unit
    super.getFileStatus(f)
  }
}

object MetaCountingFileSystem {
  val manifestStatusCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val inListing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
}
