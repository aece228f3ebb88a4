package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** Manifest-driven streaming source ([[GraftStreamSource]]): offsets
  * are commit versions, staged (WAP) commits are invisible until
  * published, non-append commits fail loudly (or deliver add-only
  * under ignoreChanges), and admission control bounds commits per
  * micro-batch.
  */
class GraftStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  private val st = GraftStorage(spark)

  private def fresh(name: String): String = {
    val out = T.scratch(SF, name)
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the sink/checkpoint dirs too — stale state from a prior run
    // would alias a replayed offset log onto a fresh table (every
    // suffix any test derives, incl. second-consumer/second-stream)
    Seq(out, out + "_out", out + "_ckpt", out + "_out2",
      out + "_ckpt2", out + "_outd", out + "_ckptd").foreach(p =>
      fs.delete(new Path(p), true))
    out
  }

  private def nation = T.t(spark, SF, "nation")
    .select($"n_nationkey", $"n_name")

  private def drainTo(src: DataFrame, outP: String, ckpt: String): Unit = {
    val q = src.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outP)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("staged (WAP) commits never reach a streaming consumer; " +
      "publish delivers them as the next delta") {
    val src = fresh("gstream_wap")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.filter($"n_nationkey" < 10)
      .repartition(2), src)
    st.wapStage(nation.filter($"n_nationkey" >= 10), src, "night")
    // drain DURING the audit: only the published bootstrap flows
    drainTo(st.streamVersioned(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 10,
      "staged rows leaked to a streaming consumer before publish")
    st.wapPublish(src, "night")
    drainTo(st.streamVersioned(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == nation.count())
    assert(spark.read.parquet(outP)
      .select($"n_nationkey").distinct().count() == nation.count(),
      "publish must deliver each staged row exactly once")
  }

  test("a discarded stage is never emitted") {
    val src = fresh("gstream_discard")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.filter($"n_nationkey" < 10)
      .repartition(2), src)
    drainTo(st.streamVersioned(src), outP, ckpt)
    st.wapStage(nation.filter($"n_nationkey" >= 10), src, "bad")
    st.wapDiscard(src, "bad")
    st.writeVersioned(nation.filter($"n_nationkey" === 10), src,
      append = true)
    drainTo(st.streamVersioned(src), outP, ckpt)
    val got = spark.read.parquet(outP)
    assert(got.count() == 11,
      s"expected 11 rows (10 bootstrap + 1 append), got ${got.count()}")
    assert(got.filter($"n_nationkey" > 10).count() == 0,
      "discarded staged rows were emitted")
  }

  test("a copy-on-write rewrite in the range fails loudly; " +
      "ignoreChanges delivers added files only") {
    val src = fresh("gstream_cow")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.repartition(2), src)
    drainTo(st.streamVersioned(src), outP, ckpt)
    st.deleteVersioned(src, $"n_nationkey" >= 20) // CoW rewrite
    val kType = nation.schema("n_nationkey").dataType
    st.writeVersioned(nation.limit(1).select(
      lit(100).cast(kType).as("n_nationkey"),
      lit("newland").as("n_name")), src, append = true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(st.streamVersioned(src), outP, ckpt)
    }
    assert(e.getMessage.contains("non-append change") ||
      Option(e.getCause).exists(_.getMessage.contains("non-append change")))
    // opting in: only the ADDED file flows, carried rewrites are
    // skipped (Delta's skipChangeCommits contract)
    drainTo(st.streamVersioned(src, ignoreChanges = true), outP, ckpt)
    val got = spark.read.parquet(outP)
    assert(got.filter($"n_nationkey" === 100).count() == 1,
      "the appended row must flow under ignoreChanges")
    assert(got.count() == nation.count() + 1,
      "carried rewrite files must not re-surface")
  }

  test("a merge-on-read snapshot refuses to stream (raw files would " +
      "resurrect DV-deleted rows)") {
    val src = fresh("gstream_mor")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.repartition(2), src)
    st.deleteVersionedMor(src, $"n_nationkey" >= 20, "n_nationkey")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(st.streamVersioned(src), outP, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("deletion vectors")))
  }

  test("bounded catch-up steps only across PUBLISHED versions: " +
      "staged versions are never checkpoint offsets, published " +
      "stages deliver exactly once") {
    val src = fresh("gstream_wap_admission")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.filter($"n_nationkey" < 10)
      .repartition(2), src) // v0 published
    st.wapStage(nation.filter($"n_nationkey" >= 10 &&
      $"n_nationkey" < 15), src, "w1") // v1 staged
    st.wapStage(nation.filter($"n_nationkey" >= 15), src, "w1") // v2
    st.wapPublish(src, "w1") // v3
    st.writeVersioned(nation.limit(0), src, append = true) // v4
    val batches = new AtomicInteger(0)
    val q = spark.readStream.format("graft-stream")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet()
        b.write.mode("append").parquet(outP)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // offsets visited: 0, then 3 (1 and 2 are staged — a checkpoint
    // landing on them would diff the publish out to nothing), then 4
    val got = spark.read.parquet(outP)
    assert(got.count() == nation.count(),
      s"published staged rows lost: ${got.count()}")
    assert(got.select($"n_nationkey").distinct().count() ==
      nation.count(), "duplicate delivery across the publish")
    assert(batches.get() == 2, // v0 batch + v3 batch (v4 empty)
      s"expected 2 non-empty batches, got ${batches.get()}")
  }

  test("a vacuumed checkpoint offset fails with the retention " +
      "guidance, not a generic resolve error") {
    val src = fresh("gstream_vacuumed")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.filter($"n_nationkey" < 10)
      .repartition(2), src)
    drainTo(st.streamVersioned(src), outP, ckpt) // checkpoint at v0
    st.writeVersioned(nation.filter($"n_nationkey" >= 10), src,
      append = true)
    st.vacuumVersioned(src, keepLast = 1) // retires v0
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(st.streamVersioned(src), outP, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("retention must cover consumer")))
  }

  test("maxVersionsPerTrigger=1 drains one commit per micro-batch") {
    val src = fresh("gstream_admission")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.filter($"n_nationkey" % 3 === 0)
      .repartition(2), src)
    st.writeVersioned(nation.filter($"n_nationkey" % 3 === 1)
      .repartition(2), src, append = true)
    st.writeVersioned(nation.filter($"n_nationkey" % 3 === 2)
      .repartition(2), src, append = true)
    val batches = new AtomicInteger(0)
    val q = spark.readStream.format("graft-stream")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet()
        b.write.mode("append").parquet(outP)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.get() == 3,
      s"expected one micro-batch per commit, got ${batches.get()}")
    assert(spark.read.parquet(outP).count() == nation.count())
  }

  test("change feed: initial snapshot as inserts, then per-commit " +
    "delete/insert rows with _commit_version") {
    val src = fresh("gstream_cdf")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    GraftCatalog.register(spark)
    spark.sql(
      s"""CREATE TABLE graft.`$src` (k BIGINT, v STRING) USING graft
         |TBLPROPERTIES ('delete_mode'='merge-on-read','mor_key'='k')
         |""".stripMargin)
    spark.range(0, 20).select($"id".as("k"), lit("a").as("v"))
      .createOrReplaceTempView("gstream_cdf_seed")
    spark.sql(s"INSERT INTO graft.`$src` SELECT * FROM gstream_cdf_seed")
    // batch 1: bootstrap — snapshot as inserts
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val boot = spark.read.parquet(outP)
    assert(boot.count() == 20)
    assert(boot.filter($"_change_type" =!= "insert").count() == 0)
    // commits: a MoR delete, a delta UPDATE, and an append
    spark.sql(s"DELETE FROM graft.`$src` WHERE k % 5 = 0")
    spark.sql(s"UPDATE graft.`$src` SET v = 'u' WHERE k % 5 = 1")
    st.writeVersioned(Seq((100L, "n")).toDF("k", "v"), src,
      append = true)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val all = spark.read.parquet(outP)
    val changes = all.join(boot.select($"k", $"v", $"_change_type"),
      Seq("k", "v", "_change_type"), "left_anti")
    // delete commit: 4 delete rows (k=0,5,10,15)
    assert(changes.filter($"_change_type" === "delete" && $"v" === "a" &&
      $"k" % 5 === 0).count() == 4)
    // update commit: delete pre-image + insert post-image per row
    assert(changes.filter($"_change_type" === "delete" &&
      $"k" % 5 === 1).count() == 4)
    assert(changes.filter($"_change_type" === "insert" &&
      $"v" === "u").count() == 4)
    // append commit: one insert
    assert(changes.filter($"_change_type" === "insert" &&
      $"k" === 100).count() == 1)
    // commit versions are distinct per step and monotone
    val vs = changes.select($"_commit_version").distinct()
      .as[Long].collect().sorted
    assert(vs.length == 3, vs.toSeq)
    // exactly-once across an idle re-drain
    val n = all.count()
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == n)
  }

  test("change feed: a maintenance rewrite (apply_deletes) emits " +
    "ZERO change rows; WAP stages stay invisible until publish") {
    val src = fresh("gstream_cdf_maint")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    GraftCatalog.register(spark)
    spark.sql(
      s"""CREATE TABLE graft.`$src` (k BIGINT, v STRING) USING graft
         |TBLPROPERTIES ('delete_mode'='merge-on-read','mor_key'='k')
         |""".stripMargin)
    spark.range(0, 30).select($"id".as("k"), lit("a").as("v"))
      .createOrReplaceTempView("gstream_cdfm_seed")
    spark.sql(s"INSERT INTO graft.`$src` SELECT * FROM gstream_cdfm_seed")
    spark.sql(s"DELETE FROM graft.`$src` WHERE k < 3")
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val n0 = spark.read.parquet(outP).count()
    // maintenance: apply the DVs — logically nothing changes; the
    // commit op tag makes the step SKIP outright (no diff computed)
    val vApply = st.applyDeletesVersioned(src)
    assert(st.commitOpOf(src, vApply).contains("apply_deletes"))
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == n0,
      "a maintenance rewrite must emit no change rows")
    // compaction likewise
    val vCompact = st.compactVersioned(src, 2)
    assert(st.commitOpOf(src, vCompact).contains("compact"))
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == n0,
      "a compaction must emit no change rows")
    // WAP: staged rows invisible, visible as inserts after publish
    st.wapStage(Seq((200L, "w")).toDF("k", "v"), src, "audit1")
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == n0)
    st.wapPublish(src, "audit1")
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val ins = spark.read.parquet(outP)
      .filter($"k" === 200 && $"_change_type" === "insert")
    assert(ins.count() == 1, "published stage must arrive as insert")
  }

  test("maxFilesPerTrigger splits one giant commit across batches " +
    "— exactly-once, deterministic slices") {
    val src = fresh("gstream_maxfiles")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.repartition(6), src)              // v0: 6 files
    st.writeVersioned(nation.limit(4).repartition(4), src,
      append = true)                                           // v1: 4 files
    drainTo(spark.readStream.format("graft-stream")
      .option("maxFilesPerTrigger", "2").load(src), outP, ckpt)
    val out = spark.read.parquet(outP)
    assert(out.count() == 29, "no loss, no duplicates across slices")
    assert(out.select($"n_nationkey").distinct().count() == 25)
    // the drain really was split: ≥5 offset entries (3 for the
    // 6-file bootstrap, 2 for the 4-file append)
    val fs = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val offsets = fs.listStatus(new Path(ckpt, "offsets"))
      .count(f => !f.getPath.getName.startsWith("."))
    assert(offsets >= 5, s"expected a split drain, got $offsets batches")
    // exactly-once across a follow-up drain
    st.writeVersioned(nation.limit(3), src, append = true)
    drainTo(spark.readStream.format("graft-stream")
      .option("maxFilesPerTrigger", "2").load(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 32)
  }

  test("CDF maxFilesPerTrigger: the bootstrap and a giant append " +
    "drain across batches, still zero-copy, exactly-once") {
    val src = fresh("gstream_cdf_maxfiles")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.repartition(5), src)              // v0: 5 files
    def drainCdf(): Unit = drainTo(
      spark.readStream.format("graft-stream")
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "2").load(src), outP, ckpt)
    drainCdf()
    val boot = spark.read.parquet(outP)
    assert(boot.count() == 25)
    assert(boot.filter($"_change_type" =!= "insert").count() == 0)
    // sliced bootstrap batches all stamp the SAME snapshot version
    assert(boot.select($"_commit_version").distinct().count() == 1)
    val fs = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(ckpt, "offsets"))
      .count(f => !f.getPath.getName.startsWith(".")) >= 3,
      "5 files at cap 2 must take >= 3 batches")
    // zero-copy: slices never materialize under _graft_cdf
    val cdfDir = new Path(ckpt, "sources/0/_graft_cdf")
    assert(!fs.exists(cdfDir) || fs.listStatus(cdfDir).isEmpty)
    // a change-shaped commit (MoR delete) delivers WHOLE; a giant
    // append after it splits again — both exactly-once
    st.deleteVersionedMor(src, $"n_nationkey" < 3, "n_nationkey")
    st.writeVersioned(nation.limit(4).repartition(4), src,
      append = true)
    drainCdf()
    val all = spark.read.parquet(outP)
    assert(all.filter($"_change_type" === "delete").count() == 3)
    assert(all.count() == 25 + 3 + 4)
    // replays of the split ranges are byte-stable: re-drain adds 0
    drainCdf()
    assert(spark.read.parquet(outP).count() == 32)
  }

  test("DV-free CDF bootstrap is ZERO-COPY: served from the table's " +
    "own files, nothing materialized under _graft_cdf") {
    val src = fresh("gstream_cdf_zerocopy")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.repartition(3), src)
    st.writeVersioned(nation.limit(5), src, append = true)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val fs = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cdfDir = new Path(ckpt, "sources/0/_graft_cdf")
    assert(!fs.exists(cdfDir) || fs.listStatus(cdfDir).isEmpty,
      "a DV-free bootstrap must not copy the snapshot into the " +
        "checkpoint — it reads the table's own files")
    val boot = spark.read.parquet(outP)
    assert(boot.count() == 30)
    assert(boot.filter($"_change_type" =!= "insert").count() == 0)
    // one synthesized commit version: the bootstrap's end offset
    val v = st.latestVisibleVersion(src)
    assert(boot.select($"_commit_version").distinct()
      .as[Long].collect().toSeq == Seq(v))
    // the rows are the snapshot, exactly
    assert(boot.select($"n_nationkey", $"n_name")
      .exceptAll(st.readVersioned(src)).count() == 0)
    assert(st.readVersioned(src)
      .exceptAll(boot.select($"n_nationkey", $"n_name")).count() == 0)
    // incremental batches after the zero-copy bootstrap still flow
    st.writeVersioned(nation.limit(2), src, append = true)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 32)
  }

  test("a PURE-APPEND CDF step is ZERO-COPY: the batch reads the " +
    "appended files directly, nothing materialized under _graft_cdf") {
    val src = fresh("gstream_cdf_appendzc")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.repartition(2), src)
    drainTo(st.streamVersionedChanges(src), outP, ckpt) // bootstrap
    val appended = nation.filter($"n_nationkey" < 7)
    st.writeVersioned(appended, src, append = true) // v1: pure append
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val fs = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cdfDir = new Path(ckpt, "sources/0/_graft_cdf")
    assert(!fs.exists(cdfDir) || fs.listStatus(cdfDir).isEmpty,
      "a pure-append step must serve the appended files zero-copy, " +
        "not copy them into the checkpoint")
    val step = spark.read.parquet(outP).filter($"_commit_version" === 1L)
    assert(step.count() == appended.count())
    assert(step.filter($"_change_type" =!= "insert").count() == 0)
    assert(step.select($"n_nationkey", $"n_name")
      .exceptAll(appended.select($"n_nationkey", $"n_name")).count() == 0)
    // a DV step after the zero-copy append still takes the exact
    // materialized diff: deletes surface, nothing is lost
    st.deleteVersionedMor(src, $"n_nationkey" === 3, "n_nationkey")
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val del = spark.read.parquet(outP).filter($"_commit_version" === 2L)
    assert(del.filter($"_change_type" === "delete").count() == 2,
      "both stored copies of the deleted key surface as delete rows")
  }

  test("CDF bootstrap of a DV-carrying snapshot resolves the DVs " +
    "(materialized path): deleted rows never surface") {
    val src = fresh("gstream_cdf_dvboot")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(spark.range(0, 20)
      .select($"id".as("k"), lit("a").as("v")).repartition(2), src)
    st.deleteVersionedMor(src, $"k" < 5, "k")
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val boot = spark.read.parquet(outP)
    assert(boot.count() == 15, "bootstrap must serve LIVE rows only")
    assert(boot.filter($"k" < 5).count() == 0,
      "DV-deleted rows must not surface in the bootstrap")
    assert(boot.filter($"_change_type" =!= "insert").count() == 0)
  }

  test("a CDF batch spanning an ADD COLUMNS widen null-fills " +
    "earlier commits' change rows instead of failing the stream") {
    val src = fresh("gstream_cdf_widen")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v"), src)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    // one batch range holding: a (k,v) append, the widen, a MoR
    // delete, and a (k,v,w) append — schemas drift inside the range
    st.writeVersioned(Seq((4L, "d")).toDF("k", "v"), src,
      append = true)
    st.addColumnsVersioned(src, org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.StringType))))
    st.deleteVersionedMor(src, $"k" === 2L, "k")
    st.writeVersioned(Seq((5L, "e", "W")).toDF("k", "v", "w"), src,
      append = true)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val all = spark.read.option("mergeSchema", "true").parquet(outP)
    assert(all.columns.contains("w"), all.columns.toSeq.toString)
    // pre-widen append arrived with w null
    assert(all.filter($"k" === 4L && $"_change_type" === "insert" &&
      $"w".isNull).count() == 1)
    // the delete pre-image aligned to the widened schema
    assert(all.filter($"k" === 2L && $"_change_type" === "delete")
      .count() == 1)
    // the post-widen append carries its value
    assert(all.filter($"k" === 5L && $"w" === "W").count() == 1)
  }

  test("a RENAME COLUMN mid-stream fails the CDF batch loudly " +
    "instead of null-filling the renamed column") {
    val src = fresh("gstream_cdf_rename")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"),
      src)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    // the stream DataFrame binds its schema at load() — build it
    // BEFORE the rename so the drain runs with the old shape, like a
    // continuously-running consumer would
    val oldShape = st.streamVersionedChanges(src)
    st.renameColumnVersioned(src, "amt", "price")
    st.writeVersioned(Seq((3L, 30.0)).toDF("k", "price"), src,
      append = true)
    val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(oldShape, outP, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("renamed or dropped mid-stream")),
      s"unexpected: ${msgs(e)}")
    // a FRESH stream picks up the new shape and serves everything
    val ckpt2 = src + "_ckpt2"; val outP2 = src + "_out2"
    drainTo(st.streamVersionedChanges(src), outP2, ckpt2)
    val boot = spark.read.parquet(outP2)
    assert(boot.columns.contains("price"))
    assert(boot.count() == 3)
    // a WIDEN mid-stream fails with the same restart guidance (not a
    // parquet type-mismatch stack trace)
    val src2 = fresh("gstream_cdf_widen")
    st.writeVersioned(Seq((1, 10.0)).toDF("k", "amt"), src2) // int key
    drainTo(st.streamVersionedChanges(src2), src2 + "_out",
      src2 + "_ckpt")
    val preWiden = st.streamVersionedChanges(src2)
    st.widenColumnVersioned(src2, "k",
      org.apache.spark.sql.types.LongType): Unit
    st.writeVersioned(Seq((4L, 40.0)).toDF("k", "amt"), src2,
      append = true)
    val e2 = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(preWiden, src2 + "_out", src2 + "_ckpt")
    }
    assert(msgs(e2).exists(_.contains("type(s) changed mid-stream")),
      s"unexpected: ${msgs(e2)}")
  }

  test("change feed housekeeping: spent batch dirs retire at offset " +
    "commit; a vacuumed CDF offset fails with retention guidance") {
    val src = fresh("gstream_cdf_clean")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.repartition(2), src)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    st.writeVersioned(nation.limit(4), src, append = true)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    // planning of the second drain's batch retires the bootstrap
    // dir; at most the FINAL batch's dir may remain (the engine only
    // fires commit(end) when a next batch starts)
    val fs = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cdfDir = new Path(ckpt, "sources/0/_graft_cdf")
    val left =
      if (!fs.exists(cdfDir)) 0 else fs.listStatus(cdfDir).length
    assert(left <= 1,
      s"spent CDF batch dirs must retire, found $left")
    // advance the table twice, vacuum past the consumer's offset
    st.writeVersioned(nation.limit(3), src, append = true)
    st.compactVersioned(src, 1)
    st.writeVersioned(nation.limit(2), src, append = true)
    st.vacuumVersioned(src, keepLast = 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(st.streamVersionedChanges(src), outP, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("retention must cover consumer")),
      s"unexpected: ${msgs(e)}")
  }

  private def msgsOf(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else String.valueOf(t.getMessage) +: msgsOf(t.getCause)

  test("CDF bootstrap of a RENAMEd (column-mapped) table is " +
    "ZERO-COPY: logical columns from the table's own files") {
    val src = fresh("gstream_cdf_mapped_boot")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"),
      src)
    st.renameColumnVersioned(src, "amt", "price")
    st.writeVersioned(Seq((3L, 30.0)).toDF("k", "price"), src,
      append = true)
    // files store the PHYSICAL name 'amt'; the stream must surface
    // 'price' — and without copying one row into the checkpoint
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val fs = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cdfDir = new Path(ckpt, "sources/0/_graft_cdf")
    assert(!fs.exists(cdfDir) || fs.listStatus(cdfDir).isEmpty,
      "a DV-free mapped bootstrap must serve the table's own files — " +
        "zero _graft_cdf bytes")
    val boot = spark.read.parquet(outP)
    assert(boot.columns.toSet ==
      Set("k", "price", "_change_type", "_commit_version"))
    assert(boot.select($"k", $"price").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    assert(boot.filter($"_change_type" =!= "insert").count() == 0)
    // incremental appends after the mapped bootstrap still flow
    st.writeVersioned(Seq((4L, 40.0)).toDF("k", "price"), src,
      append = true)
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 4)
  }

  test("raw-file streaming of a RENAMEd (column-mapped) snapshot: " +
    "logical columns, zero-copy, appends flow; a mid-stream rename " +
    "stays loud") {
    val src = fresh("gstream_raw_mapped")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"),
      src)
    st.renameColumnVersioned(src, "amt", "price")
    // a fresh checkpoint AFTER the rename bootstraps from the
    // table's own (physically-named) files with logical columns —
    // no REORG required
    drainTo(st.streamVersioned(src), outP, ckpt)
    val boot = spark.read.parquet(outP)
    assert(boot.columns.toSet == Set("k", "price"))
    assert(boot.select($"k", $"price").collect().map(r =>
      (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 10.0), (2L, 20.0)))
    // post-rename appends (their files ALSO store 'amt' — writes
    // translate logical->physical) deliver incrementally
    st.writeVersioned(Seq((3L, 30.0)).toDF("k", "price"), src,
      append = true)
    drainTo(st.streamVersioned(src), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 3)
    // the MID-STREAM rename gate stays loud: a running consumer's
    // fixed schema cannot surface the new name
    val oldShape = st.streamVersioned(src)
    st.renameColumnVersioned(src, "price", "cost")
    st.writeVersioned(Seq((4L, 40.0)).toDF("k", "cost"), src,
      append = true)
    val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(oldShape, outP, ckpt)
    }
    assert(msgsOf(e).exists(_.contains("renamed or dropped mid-stream")),
      s"unexpected: ${msgsOf(e)}")
  }

  test("raw-file streaming: a mid-stream ALTER COLUMN TYPE fails at " +
    "PLAN time with restart guidance, not a reader type mismatch") {
    val src = fresh("gstream_raw_widen")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(Seq((1, 10.0)).toDF("k", "amt"), src) // int key
    drainTo(st.streamVersioned(src), outP, ckpt)
    val preWiden = st.streamVersioned(src)
    st.widenColumnVersioned(src, "k",
      org.apache.spark.sql.types.LongType): Unit
    st.writeVersioned(Seq((4L, 40.0)).toDF("k", "amt"), src,
      append = true)
    val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(preWiden, outP, ckpt)
    }
    assert(msgsOf(e).exists(_.contains("type(s) changed mid-stream")),
      s"unexpected: ${msgsOf(e)}")
    // a fresh stream reads the widened snapshot (old narrow files
    // ride the per-file promotion)
    drainTo(st.streamVersioned(src), src + "_out2", src + "_ckpt2")
    assert(spark.read.parquet(src + "_out2").count() == 2)
  }

  test("column-mapped CDF bootstrap under maxFilesPerTrigger: " +
    "sliced batches stay zero-copy with logical columns") {
    val src = fresh("gstream_mapped_sliced")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(spark.range(0, 40)
      .select($"id".as("k"), ($"id" * 1.0).as("amt"))
      .repartition(8), src)
    st.renameColumnVersioned(src, "amt", "price")
    val q = st.streamVersionedChanges(src)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outP)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val fs = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // the same bootstrap SLICED: a second fresh checkpoint with the
    // file cap (8 files / cap 3 -> several v#f batches)
    val ckpt2 = src + "_ckpt2"; val outP2 = src + "_out2"
    val q2 = spark.readStream.format("graft-stream")
      .option("readChangeFeed", "true")
      .option("maxFilesPerTrigger", "3")
      .load(src)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt2)
      .format("parquet").option("path", outP2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // the BOOTSTRAP ranges (b-1_*) must never materialize — the
    // rename commit's own (zero-row) change batch may legitimately
    // strand its dir until the next drain's housekeeping
    for (cp <- Seq(ckpt, ckpt2)) {
      val cdfDir = new Path(cp, "sources/0/_graft_cdf")
      val dirs = if (!fs.exists(cdfDir)) Seq.empty
        else fs.listStatus(cdfDir).toSeq.map(_.getPath.getName)
      assert(!dirs.exists(_.startsWith("b-1_")),
        s"mapped bootstrap under $cp materialized: $dirs")
    }
    for (o <- Seq(outP, outP2)) {
      val got = spark.read.parquet(o)
      assert(got.columns.toSet ==
        Set("k", "price", "_change_type", "_commit_version"))
      assert(got.count() == 40, s"$o: ${got.count()}")
      assert(got.agg(sum($"price")).head().getDouble(0) ==
        (0 until 40).map(_.toDouble).sum)
    }
  }

  test("restarted CDF stream replays PRE-rename commits under the " +
    "new logical names — no silent null-fill of the renamed column") {
    val src = fresh("gstream_cdf_replay_rename")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(Seq((1L, 10.0)).toDF("k", "amt"), src)  // v0
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    // lag: an append lands (v1), then the rename (v2), BEFORE the
    // consumer restarts — the replayed range holds a pre-rename
    // commit whose change rows carry the OLD logical name
    st.writeVersioned(Seq((2L, 20.0), (3L, 30.0)).toDF("k", "amt"),
      src, append = true)                                     // v1
    st.renameColumnVersioned(src, "amt", "price")             // v2
    drainTo(st.streamVersionedChanges(src), outP, ckpt)
    val all = spark.read.option("mergeSchema", "true").parquet(outP)
    assert(all.columns.contains("price"))
    val replayed = all.filter($"k".isin(2L, 3L))
    assert(replayed.count() == 2)
    assert(replayed.filter($"price".isNull).count() == 0,
      "pre-rename change rows must surface under the stream's new " +
        "logical name, not null-fill")
    assert(replayed.agg(sum($"price")).head().getDouble(0) == 50.0)
  }

  test("a logical-name SWAP landing mid-RUN (after the binding " +
    "anchored) fails loudly, never serves swapped values; a restart " +
    "re-anchors to the post-swap semantics") {
    val src = fresh("gstream_swap")
    st.writeVersioned(Seq((1.0, 100.0)).toDF("a", "b"), src) // v0
    // a RUNNING stream: bind the micro-batch stream directly and
    // force the anchor (reader factory) BEFORE the swap — the
    // deterministic stand-in for 'the swap lands between triggers'
    val schema = st.readVersioned(src).schema
    val mbs = new GraftMicroBatchStream(src, schema,
      ignoreChanges = false, maxVersionsPerTrigger = None)
    mbs.createReaderFactory(): Unit // resolves physBinding at v0
    // a->tmp, b->a, tmp->b: the logical name SET and types are
    // unchanged (the name/type gate alone cannot see it), but the
    // stored bindings swapped underneath
    st.renameColumnVersioned(src, "a", "tmp")
    st.renameColumnVersioned(src, "b", "a")
    st.renameColumnVersioned(src, "tmp", "b")
    st.writeVersioned(Seq((2.0, 200.0)).toDF("a", "b"), src,
      append = true)                                          // v4
    val e = intercept[IllegalStateException] {
      mbs.planInputPartitions(mbs.deserializeOffset("0"),
        mbs.deserializeOffset("4"))
    }
    assert(e.getMessage.contains("physical"), e.getMessage)
    // a FRESH stream (restart) re-anchors post-swap and serves the
    // CURRENT logical semantics correctly
    val out2 = src + "_out2"; val ckpt2 = src + "_ckpt2"
    drainTo(st.streamVersioned(src), out2, ckpt2)
    val got = spark.read.parquet(out2)
    // post-swap: logical 'a' is the old 'b' data (100) plus the new
    // row's a=2.0; logical 'b' the old 'a' (1.0) plus b=200.0
    assert(got.agg(sum($"a"), sum($"b")).head() match {
      case r => r.getDouble(0) == 102.0 && r.getDouble(1) == 201.0
    })
  }

  test("ref-pinned streaming: a stream on branch 'audit' sees " +
    "WAP-staged commits that default consumers do not") {
    val src = fresh("gstream_ref")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    val outD = src + "_outd"; val ckptD = src + "_ckptd"
    // fresh() cleans only the canonical suffixes — the second
    // consumer's dirs must reset too or a prior run's offsets alias
    val fs2 = new Path(src).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq(outD, ckptD).foreach(p => fs2.delete(new Path(p), true))
    st.writeVersioned(nation.filter($"n_nationkey" < 10), src) // v0
    st.branchVersion(src, "audit")                             // @ v0
    drainTo(st.streamVersionedRef(src, "audit"), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 10)
    // stage v1 under audit, advance the branch pointer onto it
    val staged = st.wapStage(
      nation.filter($"n_nationkey" >= 10 && $"n_nationkey" < 15),
      src, "night")
    st.branchVersion(src, "audit", Some(staged))
    // the audit stream drains the STAGED commit...
    drainTo(st.streamVersionedRef(src, "audit"), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 15,
      "the ref-pinned stream must deliver the staged commit")
    // ...while a default consumer stays shielded
    drainTo(st.streamVersioned(src), outD, ckptD)
    assert(spark.read.parquet(outD).count() == 10,
      "staged rows leaked to a default streaming consumer")
    // publish: the audit stream sees ZERO new rows (W-line removal
    // carries no file delta); the default consumer catches up
    val pub = st.wapPublish(src, "night")
    st.branchVersion(src, "audit", Some(pub))
    drainTo(st.streamVersionedRef(src, "audit"), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 15)
    drainTo(st.streamVersioned(src), outD, ckptD)
    assert(spark.read.parquet(outD).count() == 15)
  }

  test("ref-pinned streaming: a TAG bounds the drain; a branch with " +
    "staged branch-log writes refuses; unknown refs fail loudly") {
    val src = fresh("gstream_ref_tag")
    val outP = src + "_out"; val ckpt = src + "_ckpt"
    st.writeVersioned(nation.filter($"n_nationkey" < 10), src) // v0
    st.tagVersion(src, "rel1")
    st.writeVersioned(nation.filter($"n_nationkey" >= 10), src,
      append = true)                                           // v1
    // the tag-pinned stream drains UP TO the tag and idles there
    drainTo(st.streamVersionedRef(src, "rel1"), outP, ckpt)
    assert(spark.read.parquet(outP).count() == 10,
      "a tag-pinned stream must not drain past its tag")
    val e = intercept[Exception] {
      st.streamVersionedRef(src, "nope").writeStream
        .format("noop").start().awaitTermination()
    }
    assert(msgsOf(e).exists(_.contains("no tag or branch")),
      s"unexpected: ${msgsOf(e)}")
    // a branch carrying staged branch-log writes refuses (the
    // pointer alone would drop them — batch VERSION AS OF contract)
    st.branchVersion(src, "dev")
    st.branchAppend(nation.limit(1), src, "dev")
    val e2 = intercept[Exception] {
      st.streamVersionedRef(src, "dev").writeStream
        .format("noop").start().awaitTermination()
    }
    assert(msgsOf(e2).exists(_.contains("staged")),
      s"unexpected: ${msgsOf(e2)}")
    st.branchDiscardWrites(src, "dev"): Unit
  }
}
