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
    // would alias a replayed offset log onto a fresh table
    Seq(out, out + "_out", out + "_ckpt").foreach(p =>
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
}
