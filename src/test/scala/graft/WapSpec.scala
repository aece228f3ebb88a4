package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** Named refs (immutable tags / movable branches) and
  * write-audit-publish over the versioned commit log: staged commits
  * are invisible to default readers, block every non-stage commit
  * loudly, publish/discard resolve them metadata-only, and
  * tag-pinned versions survive vacuum past any keepLast horizon.
  */
class WapSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  private val st = GraftStorage(spark)

  private def fresh(name: String): String = {
    val out = T.scratch(SF, name)
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    out
  }

  private def nation = T.t(spark, SF, "nation")
    .select($"n_nationkey", $"n_name", $"n_regionkey")

  test("wap lifecycle: staged commits are invisible by default, " +
      "auditable explicitly, and publish is metadata-only") {
    val out = fresh("wap_life")
    st.writeVersioned(nation.filter($"n_nationkey" < 10), out)
    val preCnt = st.readVersioned(out).count()
    val staged = st.wapStage(
      nation.filter($"n_nationkey" >= 10 && $"n_nationkey" < 20), out,
      "wap1", statsCols = Seq("n_nationkey"))
    assert(staged == 1L)
    // default reads — plain, pruned, catalog-count — all resolve v0
    assert(st.readVersioned(out).count() == preCnt)
    assert(st.readVersionedPruned(out).count() == preCnt)
    assert(st.countVersioned(out) == preCnt)
    assert(st.latestVisibleVersion(out) == 0L)
    // the auditor addresses the staged version explicitly
    assert(st.readVersioned(out, Some(staged)).count() ==
      nation.filter($"n_nationkey" < 20).count())
    // any non-stage commit is rejected while the audit is pending
    val e = intercept[IllegalStateException] {
      st.writeVersioned(nation.limit(1), out, append = true)
    }
    assert(e.getMessage.contains("audit-pending"))
    intercept[IllegalStateException] {
      st.compactVersioned(out, 1)
    }
    // a second stage STACKS under the same id
    val staged2 = st.wapStage(nation.filter($"n_nationkey" >= 20), out,
      "wap1")
    assert(staged2 == 2L)
    assert(st.latestVisibleVersion(out) == 0L)
    // wrong id cannot publish someone else's audit
    intercept[IllegalArgumentException] {
      st.wapPublish(out, "other")
    }
    // ...and a DIFFERENT id cannot stack a stage either: mixed
    // pending ids would wedge the table (nothing could publish OR
    // discard them)
    intercept[IllegalArgumentException] {
      st.wapStage(nation.limit(1), out, "other-id")
    }
    val pub = st.wapPublish(out, "wap1")
    assert(pub == 3L)
    assert(st.readVersioned(out).count() == nation.count())
    assert(st.latestVisibleVersion(out) == pub)
    // post-publish the table accepts commits again
    st.writeVersioned(nation.limit(1), out, append = true)
    assert(st.readVersioned(out).count() == nation.count() + 1)
    // the published manifest carries the staged stats sidecar: the
    // pruned read over the published snapshot still prunes
    assert(st.readVersionedPruned(out)
      .filter($"n_nationkey" === 12).count() ==
      nation.filter($"n_nationkey" === 12).count())
  }

  test("wap discard: the staged commit never becomes visible and the " +
      "table unblocks") {
    val out = fresh("wap_discard")
    st.writeVersioned(nation, out)
    st.wapStage(nation, out, "bad-batch") // a double-load, caught in audit
    assert(st.readVersioned(out).count() == nation.count())
    val v = st.wapDiscard(out, "bad-batch")
    assert(st.latestVisibleVersion(out) == v)
    assert(st.readVersioned(out).count() == nation.count())
    // unblocked: normal commits proceed
    st.writeVersioned(nation.limit(2), out, append = true)
    assert(st.readVersioned(out).count() == nation.count() + 2)
    // the discarded version stays time-travelable until vacuum
    assert(st.readVersioned(out, Some(1L)).count() == 2 * nation.count())
  }

  test("vacuum during a pending audit pins the published snapshot") {
    val out = fresh("wap_vacuum_staged")
    st.writeVersioned(nation.filter($"n_nationkey" < 10), out) // v0
    st.writeVersioned(nation.filter($"n_nationkey" === 10), out,
      append = true) // v1 published head
    st.wapStage(nation.filter($"n_nationkey" > 10), out, "night") // v2
    // keepLast=1 counted over the raw log would keep only the staged
    // v2 and retire v1 — stranding default readers AND wapDiscard
    st.vacuumVersioned(out, keepLast = 1)
    assert(st.listVersions(out).contains(1L),
      "the published snapshot must survive vacuum during an audit")
    assert(st.readVersioned(out).count() == 11)
    val v = st.wapDiscard(out, "night")
    assert(st.readVersioned(out).count() == 11)
    assert(st.latestVisibleVersion(out) == v)
  }

  test("tags are immutable pointers, branches move, and vacuum " +
      "pins ref targets past keepLast") {
    val out = fresh("wap_refs")
    st.writeVersioned(nation.filter($"n_nationkey" < 5), out)
    st.writeVersioned(nation.filter($"n_nationkey" === 5), out,
      append = true)
    st.tagVersion(out, "v0-gold", Some(0L))
    st.branchVersion(out, "audit", Some(1L))
    intercept[IllegalStateException] {
      st.tagVersion(out, "v0-gold", Some(1L)) // tags never move
    }
    st.writeVersioned(nation.filter($"n_nationkey" === 6), out,
      append = true)
    st.branchVersion(out, "audit", Some(2L)) // branches do
    assert(st.resolveRef(out, "v0-gold") == 0L)
    assert(st.resolveRef(out, "audit") == 2L)
    assert(st.readVersionedRef(out, "v0-gold").count() == 5)
    st.writeVersioned(nation.filter($"n_nationkey" === 7), out,
      append = true)
    // vacuum keeps ONLY the last version... plus every ref target
    st.vacuumVersioned(out, keepLast = 1)
    assert(st.listVersions(out) == Seq(0L, 2L, 3L))
    // pinned versions read byte-identically after vacuum
    assert(st.readVersioned(out, Some(0L)).count() == 5)
    assert(st.readVersioned(out, Some(2L)).count() == 7)
    assert(st.readVersioned(out).count() == 8)
    // dropping the tag releases the pin; the next vacuum reclaims
    st.dropRef(out, "v0-gold")
    st.dropRef(out, "audit")
    st.vacuumVersioned(out, keepLast = 1)
    assert(st.listVersions(out) == Seq(3L))
    assert(st.readVersioned(out).count() == 8)
  }

  test("SQL console: CALL graft.tag/branch/wap_publish drive the " +
      "same lifecycle") {
    val out = fresh("wap_sql")
    GraftCatalog.register(spark)
    st.writeVersioned(nation.filter($"n_nationkey" < 20), out)
    st.wapStage(nation.filter($"n_nationkey" >= 20), out, "nightly")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$out`")
      .head().getLong(0) == nation.filter($"n_nationkey" < 20).count())
    val pub = spark.sql(
      s"CALL graft.wap_publish('$out', 'nightly')").head().getLong(0)
    assert(pub == 2L)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$out`")
      .head().getLong(0) == nation.count())
    assert(spark.sql(s"CALL graft.tag('$out', 'rel-1')")
      .head().getLong(0) == pub)
    assert(spark.sql(s"CALL graft.branch('$out', 'main', 0)")
      .head().getLong(0) == 0L)
    assert(st.listRefs(out).map(_._1) == Seq("branch.main", "tag.rel-1"))
    assert(spark.sql(s"CALL graft.drop_ref('$out', 'main')")
      .head().getString(0) == "main")
    assert(st.listRefs(out).map(_._1) == Seq("tag.rel-1"))
  }

  test("writable branch lifecycle: multi-commit stage, audit, " +
    "fast-forward publish byte-identical to serial commits; main " +
    "commits interleave freely") {
    val out = fresh("branch_write_life")
    val serial = fresh("branch_write_serial")
    val a = nation.filter($"n_nationkey" % 3 === 0)
    val b = nation.filter($"n_nationkey" % 3 === 1)
    val c = nation.filter($"n_nationkey" % 3 === 2)
    st.writeVersioned(a.repartition(1), out)
    st.branchVersion(out, "ingest")
    // two branch commits; a concurrent MAIN append between them
    st.branchAppend(b.repartition(1), out, "ingest",
      statsCols = Seq("n_nationkey"))
    val mainRows = nation.filter($"n_nationkey" === 99) // none at SF
      .unionByName(nation.limit(2))
    st.writeVersioned(mainRows.repartition(1), out, append = true)
    st.branchAppend(c.repartition(1), out, "ingest")
    // default readers never see branch rows
    assert(st.readVersioned(out).count() == a.count() + 2)
    // the audit reads base + branch (NOT main's interleaved commit —
    // the branch pointer pins its base)
    val audit = st.readVersionedBranch(out, "ingest")
    assert(audit.count() == a.count() + b.count() + c.count())
    // fast-forward: branch commits land on top of the advanced main
    val head = st.branchPublish(out, "ingest")
    assert(st.listRefs(out).toMap.get("branch.ingest").contains(head))
    val got = st.readVersioned(out)
    assert(got.count() == 25 + 2)
    // byte-identical to serial commits: the same appends done
    // serially resolve to the same manifest SHAPE (same line kinds,
    // same row counts per commit) and the same rows
    st.writeVersioned(a.repartition(1), serial)
    st.writeVersioned(mainRows.repartition(1), serial, append = true)
    st.writeVersioned(b.repartition(1), serial, append = true,
      statsCols = Seq("n_nationkey"))
    st.writeVersioned(c.repartition(1), serial, append = true)
    val sGot = st.readVersioned(serial)
    assert(got.exceptAll(sGot).isEmpty && sGot.exceptAll(got).isEmpty)
    def shape(p: String) = st.manifestEntries(p,
      st.listVersions(p).last).map(l =>
        if (l.contains('\t')) l.takeWhile(_ != '\t') else "FILE")
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(shape(out) == shape(serial),
      s"${shape(out)} vs ${shape(serial)}")
    // the stats sidecar the branch commit built is live after publish
    assert(st.readVersionedPruned(out).filter($"n_nationkey" === 7)
      .count() == 1)
    // vacuum keeps the published files readable
    st.vacuumVersioned(out, keepLast = 1)
    assert(st.readVersioned(out).count() == 27)
  }

  test("writable branch: discard leaves main untouched and removes " +
    "the staged data; WAP-pending main refuses a branch publish") {
    val out = fresh("branch_write_discard")
    st.writeVersioned(nation.repartition(1), out)
    st.branchVersion(out, "dev")
    st.branchAppend(nation.limit(3), out, "dev")
    st.branchAppend(nation.limit(4), out, "dev")
    val headBefore = st.listVersions(out).last
    val discarded = st.branchDiscardWrites(out, "dev")
    assert(discarded == 2L)
    assert(st.listVersions(out).last == headBefore,
      "discard must not publish anything to main")
    assert(st.readVersioned(out).count() == 25)
    // the branch pointer survives as a plain movable ref; its state
    // is back to the base snapshot
    assert(st.readVersionedBranch(out, "dev").count() == 25)
    // staged data dirs were reclaimed
    val fs = new Path(out).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(out, "_branchlog/dev")))
    // a WAP-pending main head refuses the fast-forward loudly
    st.branchAppend(nation.limit(5), out, "dev")
    st.wapStage(nation.limit(1), out, "audit9")
    val e = intercept[IllegalStateException] {
      st.branchPublish(out, "dev")
    }
    assert(e.getMessage.contains("audit-pending"), e.getMessage)
    st.wapDiscard(out, "audit9")
    // after the audit resolves, the branch publishes fine
    st.branchPublish(out, "dev")
    assert(st.readVersioned(out).count() == 30)
  }

  test("branch publish is per-delta atomic: a mid-sequence failure " +
    "keeps published commits safe from retry AND discard") {
    val out = fresh("branch_write_midfail")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    st.branchVersion(out, "dev")
    st.branchAppend(Seq((2L, "b")).toDF("k", "v"), out, "dev") // b0
    st.branchAppend(Seq((3L, "c", "w3")).toDF("k", "v", "w"),
      out, "dev")                                              // b1
    // main evolves `w` with a CONFLICTING type after the staging —
    // b1's type gate must fail its replay, AFTER b0 already landed
    st.addColumnsVersioned(out, org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.IntegerType))))
    val e = intercept[IllegalArgumentException] {
      st.branchPublish(out, "dev")
    }
    assert(e.getMessage.toLowerCase.contains("conflict") ||
      e.getMessage.contains("w"), e.getMessage)
    // b0 landed exactly once and stays readable
    assert(st.readVersioned(out).select($"k").as[Long]
      .collect().toSet == Set(1L, 2L))
    // the log holds ONLY the unpublished suffix: a discard reclaims
    // b1's staged data without touching b0's now-main files
    assert(st.branchDiscardWrites(out, "dev") == 1L)
    assert(st.readVersioned(out).select($"k").as[Long]
      .collect().toSet == Set(1L, 2L),
      "discard after a partial publish must not delete main's files")
  }

  test("dropRef refuses a branch with staged writes, and a leftover " +
    "branch log blocks same-name re-creation (no resurrection)") {
    val out = fresh("branch_drop_staged")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    st.branchVersion(out, "dev")
    st.branchAppend(Seq((2L, "b")).toDF("k", "v"), out, "dev")
    // dropping the pointer would strand the staged delta: refuse
    val e = intercept[IllegalArgumentException] {
      st.dropRef(out, "dev")
    }
    assert(e.getMessage.contains("staged"), e.getMessage)
    // simulate the pre-fix stranding: pointer gone, log left behind
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out, "_refs/branch.dev"), false)
    // re-creating the branch must NOT resurrect the stale delta
    val e2 = intercept[IllegalArgumentException] {
      st.branchVersion(out, "dev")
    }
    assert(e2.getMessage.contains("leftover"), e2.getMessage)
    // after an explicit clean, creation works and sees no stale rows
    fs.delete(new Path(out, "_branchlog/dev"), true)
    st.branchVersion(out, "dev")
    assert(st.branchPendingWrites(out, "dev") == 0L)
    assert(st.readVersionedBranch(out, "dev").count() == 1L)
    // a CLEAN drop reclaims pointer + (empty) log dir in one go
    st.branchAppend(Seq((3L, "c")).toDF("k", "v"), out, "dev")
    st.branchPublish(out, "dev")
    st.dropRef(out, "dev")
    assert(!fs.exists(new Path(out, "_branchlog/dev")))
    assert(st.listRefs(out).isEmpty)
  }

  test("removeOrphans enforces the minimum-age safety floor unless " +
    "explicitly overridden") {
    val out = fresh("orphan_floor")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    val e = intercept[IllegalArgumentException] {
      st.removeOrphansVersioned(out, olderThanMillis = 0L)
    }
    assert(e.getMessage.contains("safety floor"), e.getMessage)
    spark.conf.set("spark.graft.removeOrphans.minAgeMillis", "0")
    try assert(st.removeOrphansVersioned(out, 0L) == 0L)
    finally spark.conf.unset("spark.graft.removeOrphans.minAgeMillis")
  }
}
