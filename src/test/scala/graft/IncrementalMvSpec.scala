package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** Two-table consistency for batch-maintained MVs
  * ([[IncrementalMv]]): the MV's manifest records the exact source
  * version it reflects, staleness is metadata-rate, replays are
  * idempotent, incremental refreshes equal the full aggregate, and
  * non-append-only source history falls back to a recompute instead
  * of silently double-counting.
  */
class IncrementalMvSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  private val st = GraftStorage(spark)
  private val mv = IncrementalMv(spark)

  private def fresh(name: String): String = {
    val out = T.scratch(SF, name)
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    out
  }

  private def src(out: String): Unit = {
    val base = T.t(spark, SF, "orders").select(
      $"o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").as("price"))
    st.writeVersioned(base.filter($"o_orderkey" % 3 === 0)
      .repartition(2), out)
    st.writeVersioned(base.filter($"o_orderkey" % 3 === 1)
      .repartition(2), out, append = true)
    st.writeVersioned(base.filter($"o_orderkey" % 3 === 2)
      .repartition(2), out, append = true)
  }

  private def oracle(srcPath: String, v: Option[Long] = None) =
    st.readVersioned(srcPath, v).groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), sum($"price").as("sum_price"))
      .orderBy($"o_orderstatus")
      .select($"o_orderstatus", $"cnt",
        $"sum_price".cast("decimal(28,2)").as("sum_price"))
      .collect().toSeq

  private def read(mvPath: String) =
    st.readVersioned(mvPath).orderBy($"o_orderstatus")
      .select($"o_orderstatus", $"cnt",
        $"sum_price".cast("decimal(28,2)").as("sum_price"))
      .collect().toSeq

  test("refresh records the reflected source version; staleness and " +
      "idempotent replay follow from the marker") {
    val s = fresh("mv_src"); val m = fresh("mv_mv")
    src(s)
    assert(mv.reflectedVersion(m, s).isEmpty)
    val v0 = mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(mv.reflectedVersion(m, s).contains(2L))
    assert(mv.staleness(m, s).contains(0L))
    assert(read(m) == oracle(s))
    // replay: no new source commits → no new MV commit, same version
    assert(mv.refresh(s, m, Seq("o_orderstatus"), Seq("price")) == v0)
    assert(st.listVersions(m).last == v0)
    // an interleaved source commit makes the MV observably stale —
    // detected from KBs of metadata, no data read
    st.writeVersioned(T.t(spark, SF, "orders").limit(10).select(
      $"o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").as("price")),
      s, append = true)
    assert(mv.staleness(m, s).contains(1L))
  }

  test("incremental refresh (delta files only) equals the full " +
      "aggregate after interleaved appends") {
    val s = fresh("mv_inc_src2"); val m = fresh("mv_inc_mv2")
    val base = T.t(spark, SF, "orders").select(
      $"o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").as("price"))
    st.writeVersioned(base.filter($"o_orderkey" % 4 === 0)
      .repartition(2), s)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    // interleaved ingest commits, then an incremental refresh
    st.writeVersioned(base.filter($"o_orderkey" % 4 === 1)
      .repartition(2), s, append = true)
    st.writeVersioned(base.filter($"o_orderkey" % 4 === 2)
      .repartition(2), s, append = true)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(mv.reflectedVersion(m, s).contains(2L))
    assert(read(m) == oracle(s))
    // a third wave: the canonical types must be stable under
    // repeated merge (decimal SUM widening is re-normalized)
    st.writeVersioned(base.filter($"o_orderkey" % 4 === 3)
      .repartition(2), s, append = true)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(read(m) == oracle(s))
  }

  test("non-append-only source history (CoW delete) falls back to a " +
      "full recompute — never double-counts") {
    val s = fresh("mv_cow_src"); val m = fresh("mv_cow_mv")
    src(s)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    // copy-on-write DELETE rewrites files: the manifest window now
    // REMOVES files, so the delta path would be unsound
    st.deleteVersioned(s, col("o_orderstatus") === "F")
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(read(m) == oracle(s))
    assert(read(m).forall(_.getString(0) != "F"))
  }

  test("merge-on-read delete (D-line drift, file set unchanged) " +
      "forces a full recompute — the delta path would keep counting " +
      "deleted rows") {
    val s = fresh("mv_mor_src"); val m = fresh("mv_mor_mv")
    src(s)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    // MoR delete: adds a deletion vector, removes NO data file
    st.deleteVersionedMor(s, col("o_orderstatus") === "F", "o_orderkey")
    st.writeVersioned(T.t(spark, SF, "orders").limit(7).select(
      $"o_orderkey" + 10000000L as "o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").as("price")),
      s, append = true)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(read(m) == oracle(s))
  }

  test("source vacuum that retires the reflected version forces a " +
      "full recompute instead of failing every future refresh") {
    val s = fresh("mv_vac_src"); val m = fresh("mv_vac_mv")
    src(s) // v0..v2
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price")) // reflects 2
    st.writeVersioned(T.t(spark, SF, "orders").limit(3).select(
      $"o_orderkey" + 30000000L as "o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").as("price")),
      s, append = true) // v3
    st.vacuumVersioned(s, keepLast = 1) // retires v0..v2 manifests
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(read(m) == oracle(s))
    assert(mv.reflectedVersion(m, s).contains(3L))
  }

  test("refresh during a pending WAP stage on the source reflects " +
      "only the published snapshot") {
    val s = fresh("mv_wap_src"); val m = fresh("mv_wap_mv")
    src(s) // v0..v2 published
    st.wapStage(T.t(spark, SF, "orders").limit(9).select(
      $"o_orderkey" + 20000000L as "o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").as("price")),
      s, "audit1")
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    // reflected = the published head, NOT the staged log head
    assert(mv.reflectedVersion(m, s).contains(2L))
    assert(read(m) == oracle(s, Some(2L)))
    assert(mv.staleness(m, s).contains(0L))
    st.wapDiscard(s, "audit1")
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(read(m) == oracle(s))
  }

  test("other sources' markers survive a refresh (multi-source MV)") {
    val s = fresh("mv_multi_src"); val m = fresh("mv_multi_mv")
    src(s)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    // a foreign marker lands on the MV (another maintainer recording
    // its own source version) — content-neutral: the MV table is
    // OWNED by its maintainers, so foreign commits may add markers
    // but must not change rows (the scaladoc contract)
    st.writeVersioned(st.readVersioned(m).limit(0), m, append = true,
      Seq.empty, Seq.empty, Seq.empty, txn = Some("other_app" -> 7L))
    st.writeVersioned(T.t(spark, SF, "orders").limit(5).select(
      $"o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)").as("price")),
      s, append = true)
    mv.refresh(s, m, Seq("o_orderstatus"), Seq("price"))
    assert(read(m) == oracle(s))
    assert(st.txnBatchIds(m, "other_app") == Set(7L),
      "a refresh must carry other apps' markers through its overwrite")
    assert(mv.reflectedVersion(m, s).contains(3L))
  }
}
