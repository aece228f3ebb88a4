package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftStorage}

/** DataSource V2 TableCatalog over the versioned format: SQL SELECT /
  * INSERT / DELETE / UPDATE / MERGE resolve through `` graft.`/p` ``
  * and commit through the same manifest protocol as the Scala API.
  */
class CatalogSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  GraftCatalog.register(spark)
  private val st = GraftStorage(spark)

  private def fresh(name: String): String = {
    val out = T.scratch(SF, name)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    out
  }

  private def seed(name: String, parts: Int = 4): String = {
    val out = fresh(name)
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(parts, $"o_orderkey"), out)
    out
  }

  test("catalog SELECT reads the snapshot; version time travel via readVersioned agrees") {
    val out = seed("cat_select")
    val viaSql =
      spark.sql(s"SELECT count(*) AS c, sum(o_orderkey) AS s FROM graft.`$out`")
        .head()
    val viaApi = st.readVersioned(out)
      .agg(count(lit(1)), sum($"o_orderkey")).head()
    assert(viaSql.getLong(0) == viaApi.getLong(0))
    assert(viaSql.getLong(1) == viaApi.getLong(1))
  }

  test("catalog SELECT pushes filters and prunes columns in the scan") {
    val out = seed("cat_scan_plan")
    val df = spark.sql(
      s"SELECT o_orderkey FROM graft.`$out` WHERE o_orderkey < 100")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(o_orderkey,100)"), plan)
    assert(df.count() ==
      st.readVersioned(out).filter($"o_orderkey" < 100).count())
  }

  test("INSERT INTO appends a version; INSERT OVERWRITE replaces") {
    val out = seed("cat_insert")
    val before = st.readVersioned(out).count()
    spark.sql(
      s"INSERT INTO graft.`$out` VALUES (9000001, 'Z', 1.5), (9000002, 'Z', 2.5)")
    assert(st.listVersions(out) == Seq(0L, 1L))
    assert(st.readVersioned(out).count() == before + 2)
    assert(st.readVersioned(out, Some(0L)).count() == before)
    spark.sql(
      s"INSERT OVERWRITE graft.`$out` VALUES (1, 'O', 1.0)")
    assert(st.readVersioned(out).count() == 1)
    assert(st.readVersioned(out, Some(1L)).count() == before + 2)
  }

  test("DELETE FROM with a translatable predicate is file-granular copy-on-write") {
    val out = seed("cat_delete")
    val v0Files = st.manifestFiles(out, 0L).toSet
    val expect = st.readVersioned(out)
      .filter(!($"o_orderkey" % 10 === 0)).count()
    spark.sql(s"DELETE FROM graft.`$out` WHERE o_orderkey % 10 = 0")
    assert(st.readVersioned(out).count() == expect)
    assert(st.readVersioned(out)
      .filter($"o_orderkey" % 10 === 0).count() == 0)
    // snapshot isolation: v0 still reads pre-delete
    assert(st.readVersioned(out, Some(0L))
      .filter($"o_orderkey" % 10 === 0).count() > 0)
    // the modulo predicate touches every file, so no carry here; a
    // range predicate must carry untouched files verbatim
    val out2 = seed("cat_delete_range", parts = 8)
    val files0 = st.manifestFiles(out2, 0L).toSet
    spark.sql(s"DELETE FROM graft.`$out2` WHERE o_orderkey < 100")
    val files1 = st.manifestFiles(out2, 1L).toSet
    assert(files1.intersect(files0).nonEmpty,
      "untouched files must carry into the new manifest")
    assert(st.readVersioned(out2).filter($"o_orderkey" < 100).count() == 0)
  }

  test("DELETE FROM with an IN-subquery runs the group-based row-level path") {
    val out = seed("cat_delete_subq")
    T.t(spark, SF, "customer").createOrReplaceTempView("cat_cust")
    val doomed = spark.sql(
      "SELECT c_custkey FROM cat_cust WHERE c_mktsegment = 'BUILDING'")
      .as[Long].collect().toSet
    val expect = st.readVersioned(out)
      .filter(!$"o_orderkey".isin(doomed.toSeq: _*)).count()
    spark.sql(
      s"""DELETE FROM graft.`$out`
         |WHERE o_orderkey IN
         |  (SELECT c_custkey FROM cat_cust
         |   WHERE c_mktsegment = 'BUILDING')""".stripMargin)
    assert(st.readVersioned(out).count() == expect)
  }

  test("UPDATE rewrites matching rows in one commit") {
    val out = seed("cat_update")
    val expectTotal = st.readVersioned(out)
      .select(T.dsum(when($"o_orderkey" < 500, $"o_totalprice" * 2)
        .otherwise($"o_totalprice"))).head().getDouble(0)
    spark.sql(
      s"""UPDATE graft.`$out`
         |SET o_totalprice = o_totalprice * 2, o_orderstatus = 'X'
         |WHERE o_orderkey < 500""".stripMargin)
    val got = st.readVersioned(out)
    assert(got.filter($"o_orderkey" < 500 && $"o_orderstatus" =!= "X")
      .count() == 0)
    assert(got.select(T.dsum($"o_totalprice")).head().getDouble(0)
      == expectTotal)
    assert(st.listVersions(out) == Seq(0L, 1L))
  }

  test("UPDATE with stats-in-log elides whole files from the rewrite") {
    val out = fresh("cat_update_pruned")
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    // range-clustered commit WITH per-file stats on the key
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"),
      out, append = false, statsCols = Seq("o_orderkey"))
    val files0 = st.manifestFiles(out, 0L).toSet
    spark.sql(
      s"UPDATE graft.`$out` SET o_orderstatus = 'X' WHERE o_orderkey < 100")
    val files1 = st.manifestFiles(out, 1L).toSet
    val carried = files1.intersect(files0)
    assert(carried.nonEmpty,
      s"zone stats should carry unaffected files; v1=$files1")
    // most of the 8 range files hold keys >= 100 and must be carried
    assert(carried.size >= 6, s"expected >=6 carried, got ${carried.size}")
    assert(st.readVersioned(out)
      .filter($"o_orderkey" < 100 && $"o_orderstatus" =!= "X").count() == 0)
    assert(st.readVersioned(out).count() == base.count())
  }

  test("MERGE INTO upserts: matched update, not-matched insert") {
    val out = seed("cat_merge")
    val base = st.readVersioned(out)
    val nBase = base.count()
    val nMatched = base.filter($"o_orderkey" % 7 === 0).count()
    base.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", lit("M").as("o_orderstatus"),
        ($"o_totalprice" * 3).as("o_totalprice"))
      .union(Seq((8000001L, "N", 1.0), (8000002L, "N", 2.0))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
      .createOrReplaceTempView("cat_merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$out` t
         |USING cat_merge_src s
         |ON t.o_orderkey = s.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = st.readVersioned(out)
    assert(got.count() == nBase + 2)
    assert(got.filter($"o_orderstatus" === "M").count() == nMatched)
    assert(got.filter($"o_orderstatus" === "N").count() == 2)
    // untouched rows unchanged
    assert(got.filter($"o_orderkey" % 7 =!= 0 &&
      $"o_orderkey" < 8000000L && $"o_orderstatus".isin("M", "N"))
      .count() == 0)
  }

  test("CREATE TABLE, INSERT, TRUNCATE, DROP round-trip") {
    val out = fresh("cat_ddl")
    spark.sql(
      s"CREATE TABLE graft.`$out` (k BIGINT, v STRING) USING graft")
    assert(st.listVersions(out) == Seq(0L))
    spark.sql(s"INSERT INTO graft.`$out` VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$out`")
      .head().getLong(0) == 2)
    spark.sql(s"TRUNCATE TABLE graft.`$out`")
    assert(st.readVersioned(out).count() == 0)
    // history intact: the pre-truncate version still reads
    assert(st.readVersioned(out, Some(1L)).count() == 2)
    spark.sql(s"DROP TABLE graft.`$out`")
    assert(st.listVersions(out).isEmpty)
  }

  test("CHECK constraints gate catalog commits too") {
    val out = seed("cat_constraint")
    st.addCheckConstraint(out, "pos_price", "o_totalprice > 0")
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$out` VALUES (9999999, 'Z', -5.0)")
    }
    // the failed commit is invisible
    assert(st.listVersions(out) == Seq(0L))
    assert(st.readVersioned(out).filter($"o_orderkey" === 9999999L)
      .count() == 0)
  }

  test("SQL time travel: VERSION AS OF pins the snapshot, TIMESTAMP " +
    "AS OF resolves by commit instant, and historical snapshots are " +
    "read-only") {
    val out = seed("cat_time_travel")
    val before = st.readVersioned(out).count()
    spark.sql(s"INSERT INTO graft.`$out` VALUES (7000001, 'Z', 1.0)")
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.`$out` VERSION AS OF 0")
      .head().getLong(0) == before)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$out`")
      .head().getLong(0) == before + 1)
    // TIMESTAMP AS OF far future resolves to the latest version
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.`$out` " +
        "TIMESTAMP AS OF '2099-01-01'")
      .head().getLong(0) == before + 1)
    // a historical snapshot refuses modification instead of silently
    // applying it to latest
    val pinned = new graft.sources.GraftVersionedTable(out, Some(0L))
    val e = intercept[IllegalArgumentException] {
      pinned.deleteWhere(Array.empty)
    }
    assert(e.getMessage.contains("time-travel"), e.getMessage)
    intercept[IllegalArgumentException] { pinned.truncateTable() }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$out` VERSION AS OF 99")
    }
  }

  test("ALTER TABLE ADD COLUMNS is a metadata-only commit; other " +
    "alterations are refused") {
    val out = seed("cat_alter")
    val filesBefore = st.manifestFiles(out, 0L).toSet
    spark.sql(s"ALTER TABLE graft.`$out` ADD COLUMNS (note STRING, " +
      "score DOUBLE)")
    assert(st.listVersions(out) == Seq(0L, 1L))
    // zero data movement: the new manifest references the same files
    assert(st.manifestFiles(out, 1L).toSet == filesBefore)
    val got = spark.sql(s"SELECT * FROM graft.`$out`")
    assert(got.columns.toSeq ==
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "note", "score"))
    assert(got.filter(col("note").isNotNull).count() == 0)
    // the evolved schema accepts inserts with the new columns
    spark.sql(s"INSERT INTO graft.`$out` VALUES " +
      "(7500001, 'Z', 1.0, 'hi', 0.5)")
    assert(st.readVersioned(out).filter(col("note") === "hi").count() == 1)
    // v0 still reads with the ORIGINAL shape (time travel unaffected)
    assert(st.readVersioned(out, Some(0L)).columns.length == 3)
    // name collision is refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$out` ADD COLUMNS (note STRING)")
    }
    // RENAME rides column mapping (metadata-only) — supported now
    spark.sql(s"ALTER TABLE graft.`$out` RENAME COLUMN note TO memo")
    assert(spark.sql(s"SELECT * FROM graft.`$out`")
      .columns.contains("memo"))
    // narrowing TYPE change and column reordering stay refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$out` ALTER COLUMN score TYPE FLOAT")
    }
    intercept[Exception] {
      spark.sql(
        s"ALTER TABLE graft.`$out` ALTER COLUMN memo AFTER o_orderkey")
    }
  }

  test("CALL procedures: compact, zorder, restore, vacuum, clone, " +
    "constraints — the maintenance console over the commit protocol") {
    val out = seed("cat_proc", parts = 6)
    val nRows = st.readVersioned(out).count()
    // compact: files shrink, rows identical, version advances
    val v1 = spark.sql(s"CALL graft.compact('$out', target_files => 2)")
      .head().getLong(0)
    assert(v1 == 1L)
    assert(st.manifestFiles(out, 1L).size <= 2)
    assert(st.readVersioned(out).count() == nRows)
    // zorder rewrite is lossless
    val v2 = spark.sql(
      s"CALL graft.optimize_zorder('$out', 'o_orderkey,o_totalprice')")
      .head().getLong(0)
    assert(v2 == 2L && st.readVersioned(out).count() == nRows)
    // restore pins back to v0 as a NEW commit
    val v3 = spark.sql(s"CALL graft.restore('$out', 0)").head().getLong(0)
    assert(v3 == 3L)
    assert(st.manifestFiles(out, 3L).toSet == st.manifestFiles(out, 0L).toSet)
    // clone: zero-copy fork reads identically and diverges
    val fork = fresh("cat_proc_fork")
    spark.sql(s"CALL graft.clone('$out', '$fork')")
    assert(st.readVersioned(fork).count() == nRows)
    // constraints: declared via CALL, gate an insert, dropped via CALL
    spark.sql(s"CALL graft.add_constraint('$out', 'pos', 'o_totalprice > 0')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$out` VALUES (9999998, 'Z', -1.0)")
    }
    spark.sql(s"CALL graft.drop_constraint('$out', 'pos')")
    spark.sql(s"INSERT INTO graft.`$out` VALUES (9999998, 'Z', -1.0)")
    assert(st.readVersioned(out).count() == nRows + 1)
    // vacuum drops files only dead history references
    val dropped = spark.sql(s"CALL graft.vacuum('$out', keep_last => 1)")
      .head().getLong(0)
    assert(dropped > 0, "compact+restore left dead files to vacuum")
    assert(st.readVersioned(out).count() == nRows + 1)
    // unknown procedure is a loud error; the cause lists what exists
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.defragment('$out')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("compact")), msgs(e))
  }

  test("aggregate pushdown: unfiltered COUNT/MIN/MAX answer from the " +
    "manifest as a LocalTableScan — zero data files in the plan") {
    val out = fresh("cat_agg_meta")
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartition(4), out,
      append = false, statsCols = Seq("o_orderkey", "o_orderstatus"))
    val expect = st.readVersioned(out)
      .agg(count(lit(1)), min($"o_orderkey"), max($"o_orderkey"),
        max($"o_orderstatus")).head()
    val q = spark.sql(
      s"""SELECT count(*) AS c, min(o_orderkey) AS mn,
         |  max(o_orderkey) AS mx
         |FROM graft.`$out`""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      plan)
    val r = q.head()
    assert(r.getLong(0) == expect.getLong(0))
    assert(r.getLong(1) == expect.getLong(1))
    assert(r.getLong(2) == expect.getLong(2))
    // string min/max: zone bounds may be truncation-WIDENED binary
    // stats (values not in the data) — MUST fall back to a scan
    val strq = spark.sql(
      s"SELECT max(o_orderstatus) AS ms FROM graft.`$out`")
    assert(!strq.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(strq.head().getString(0) == expect.getString(3))
    // a filter disqualifies the fast path but stays correct
    val filtered = spark.sql(
      s"SELECT count(*) AS c FROM graft.`$out` WHERE o_orderkey < 100")
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(filtered.head().getLong(0) ==
      st.readVersioned(out).filter($"o_orderkey" < 100).count())
    // double min/max: footer stats drop NaN info — MUST scan
    val dbl = spark.sql(
      s"SELECT min(o_totalprice) AS m FROM graft.`$out`")
    assert(!dbl.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(dbl.head().getDouble(0) ==
      st.readVersioned(out).agg(min($"o_totalprice")).head().getDouble(0))
    // SQL INSERT appends files with R lines but NO zone stats:
    // COUNT(*) keeps the metadata answer, MIN/MAX falls back to scan
    spark.sql(s"INSERT INTO graft.`$out` VALUES (9999999, 'Z', 1.0)")
    val c2 = spark.sql(s"SELECT count(*) AS c FROM graft.`$out`")
    assert(c2.queryExecution.executedPlan.toString
      .contains("LocalTableScan"), "R lines cover SQL-inserted files")
    assert(c2.head().getLong(0) == expect.getLong(0) + 1)
    val m2 = spark.sql(s"SELECT max(o_orderkey) AS m FROM graft.`$out`")
    assert(!m2.queryExecution.executedPlan.toString
      .contains("LocalTableScan"), "uncovered files must disable " +
        "zone-stat min/max")
    assert(m2.head().getLong(0) == 9999999L)
  }

  test("runtime V2 filtering: a join's dynamic keys prune fact files " +
    "at runtime via zone stats") {
    val out = fresh("cat_runtime_prune")
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out,
      append = false, statsCols = Seq("o_orderkey"))
    // dim keys live in ONE narrow range of the fact's key space; the
    // 'x' rows are the survivors of a REAL selective filter over a
    // FILE-backed dim (an in-memory dim folds into a LocalRelation,
    // erasing the Filter node DPP requires on the build side)
    val lowKeys = st.readVersioned(out)
      .orderBy($"o_orderkey").limit(10)
      .select($"o_orderkey".as("k")).collect().map(_.getLong(0))
    val dimPath = fresh("cat_rt_dim")
    lowKeys.toSeq.zipWithIndex
      .map { case (k, i) => (k, if (i % 2 == 0) "x" else "y") }
      .toDF("k", "tag").write.parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("cat_rt_dim")
    val q = spark.sql(
      s"""SELECT count(*) AS c
         |FROM graft.`$out` f JOIN cat_rt_dim d ON f.o_orderkey = d.k
         |WHERE d.tag = 'x'""".stripMargin)
    // collect() executes q's OWN QueryExecution (head() would plan a
    // separate limit query, leaving q's plan — inspected below —
    // unexecuted and its runtime filter never fired)
    assert(q.collect().map(_.getLong(0)).toSeq ==
      Seq(lowKeys.length / 2L))
    // descend through AQE wrappers/stages — plain collect stops at
    // stage boundaries (QueryStageExec is a leaf)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case x => x }.flatMap {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => s +: allNodes(s.plan)
        case x => Seq(x)
      }
    val scans = allNodes(q.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.runtimeFilters.nonEmpty => b
    }
    assert(scans.nonEmpty, "no runtime filter planted on the fact scan:\n" +
      q.queryExecution.executedPlan.toString)
    val rfs = scans.head.scan
      .asInstanceOf[org.apache.spark.sql.graftbridge
        .RuntimeFilteredParquetScan]
    val filesRead = rfs.currentFileCount
    assert(filesRead >= 1 && filesRead < 8,
      s"runtime pruning should drop most of the 8 range files; read " +
        s"$filesRead (filter calls=${rfs.filterCalls}, " +
        s"seen=${rfs.seenFilters})")
  }

  test("catalog scans keep size statistics: a small catalog table " +
    "broadcasts in a join") {
    val out = fresh("cat_stats_bcast")
    val dim = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus").limit(50)
    st.writeVersioned(dim, out, append = false,
      statsCols = Seq("o_orderkey"))
    T.t(spark, SF, "lineitem").select($"l_orderkey", $"l_quantity")
      .createOrReplaceTempView("cat_stats_fact")
    val q = spark.sql(
      s"""SELECT count(*) AS c
         |FROM cat_stats_fact f JOIN graft.`$out` d
         |  ON f.l_orderkey = d.o_orderkey""".stripMargin)
    q.collect()
    // the KB-sized catalog side must be the broadcast build side —
    // if the scan hid its statistics the relation would default to
    // sizeInBytes=MAX and plan a sort-merge join
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("string zone bounds compare in UTF-8 order: supplementary-plane " +
    "keys are not falsely elided by DELETE") {
    val out = fresh("cat_utf8_bounds")
    // one file holding U+FFFF and U+1F600: UTF-16 code-unit order
    // says FFFF > 1F600's surrogates, UTF-8 byte order (what parquet
    // used to pick the footer stats) says the opposite — comparing
    // the recorded [min,max] with String.compareTo would put U+FFFF
    // OUTSIDE the bounds and elide the file, silently no-oping the
    // DELETE
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq((1L, "￿"), (2L, emoji)).toDF("k", "s")
    st.writeVersioned(df.coalesce(1), out, append = false,
      statsCols = Seq("s"))
    spark.sql(s"DELETE FROM graft.`$out` WHERE s = '￿'")
    val left = st.readVersioned(out).select($"s").collect().map(_.getString(0))
    assert(left.toSeq == Seq(emoji), left.toSeq)
  }

  test("compactVersioned and optimizeVersioned carry sidecar coverage " +
    "forward: the meta-agg fast path survives maintenance") {
    val out = fresh("cat_compact_stats")
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartition(4), out, append = false,
      statsCols = Seq("o_orderkey"), bloomCols = Seq("o_orderstatus"))
    val expect = st.readVersioned(out)
      .agg(count(lit(1)), max($"o_orderkey")).head()
    st.compactVersioned(out, targetFiles = 2)
    val q = spark.sql(
      s"SELECT count(*) AS c, max(o_orderkey) AS m FROM graft.`$out`")
    assert(q.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "compaction dropped stats-in-log coverage:\n" +
        q.queryExecution.executedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == expect.getLong(0) &&
      r.getLong(1) == expect.getLong(1))
    // bloom-in-log coverage must survive too (B line in the manifest)
    val vs = st.listVersions(out)
    val mf = new org.apache.hadoop.fs.Path(out, s"_manifest/v${vs.last}")
    val fs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val text = {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    assert(text.contains("B\t"), "compaction dropped bloom-in-log:\n" + text)
    // z-order maintenance carries it as well
    st.optimizeVersioned(out, Seq("o_orderkey"), targetFiles = 2)
    val q2 = spark.sql(
      s"SELECT count(*) AS c, max(o_orderkey) AS m FROM graft.`$out`")
    assert(q2.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "z-order dropped stats-in-log coverage")
    assert(q2.head().getLong(1) == expect.getLong(1))
  }

  test("storage-partitioned join: co-partitioned catalog tables join " +
    "and aggregate with zero hash exchanges") {
    val a = fresh("cat_spj_fact")
    val b = fresh("cat_spj_dim")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersionedPartitioned(orders, a, Seq("o_orderstatus"))
    st.writeVersionedPartitioned(
      orders.groupBy($"o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n")),
      b, Seq("o_orderstatus"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(
        s"""SELECT f.o_orderstatus AS st, count(*) AS c,
           |  CAST(sum(d.n) AS BIGINT) AS s
           |FROM graft.`$a` f JOIN graft.`$b` d
           |  ON f.o_orderstatus = d.o_orderstatus
           |GROUP BY f.o_orderstatus
           |ORDER BY st""".stripMargin)
      val rows = q.collect()
      val expect = orders.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(1) * r.getLong(1))).toMap
      assert(rows.length == expect.size)
      rows.foreach { r =>
        val (c, s) = expect(r.getString(0))
        assert(r.getLong(1) == c && r.getLong(2) == s, r)
      }
      // the join AND the groupBy ride the reported key-grouping: the
      // only exchange left is the ORDER BY's range partitioning
      // (AQE prints Initial and Final plans — gate the FINAL one)
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"),
        "storage-partitioned join still shuffles:\n" + plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("partitioned snapshots prune on the partition key from path-" +
    "derived zones and answer partition-col MIN/MAX at manifest rate") {
    val out = fresh("cat_spj_prune")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersionedPartitioned(orders, out, Seq("o_orderstatus"))
    // static partition pruning: one key's files only (collect() so
    // the inspected QueryExecution itself runs)
    val q = spark.sql(
      s"""SELECT CAST(count(o_orderkey) AS BIGINT) AS c
         |FROM graft.`$out` WHERE o_orderstatus = 'F'""".stripMargin)
    assert(q.collect().head.getLong(0) ==
      orders.filter($"o_orderstatus" === "F").count())
    def scannedFiles(d: org.apache.spark.sql.DataFrame): Int = {
      def nodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case x => x }.flatMap {
          case ad: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => nodes(ad.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => s +: nodes(s.plan)
          case x => Seq(x)
        }
      nodes(d.queryExecution.executedPlan).collect {
        case bs: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          bs.inputPartitions.map {
            case k: org.apache.spark.sql.graftbridge.KeyedFilePartition =>
              k.fp.files.map(_.filePath.toString).distinct.size
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.map(_.filePath.toString).distinct.size
            case _ => 0
          }.sum
      }.sum
    }
    val full = spark.sql(
      s"SELECT CAST(sum(o_orderkey) AS BIGINT) AS s FROM graft.`$out`")
    full.collect()
    val (pruned, total) = (scannedFiles(q), scannedFiles(full))
    assert(pruned > 0 && pruned < total,
      s"partition filter did not prune sibling partitions " +
        s"($pruned of $total files)")
    // COUNT(*) stays manifest-rate on partitioned snapshots (R lines)
    val cq = spark.sql(s"SELECT count(*) AS c FROM graft.`$out`")
    assert(cq.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(cq.head().getLong(0) == orders.count())
    // STRING partition-col MIN/MAX is manifest-rate too: path-derived
    // keys are exact values, unlike truncation-widened footer stats
    val mq = spark.sql(
      s"""SELECT min(o_orderstatus) AS mn, max(o_orderstatus) AS mx
         |FROM graft.`$out`""".stripMargin)
    assert(mq.queryExecution.executedPlan.toString
      .contains("LocalTableScan"), mq.queryExecution.executedPlan)
    val em = orders.agg(min($"o_orderstatus"), max($"o_orderstatus")).head()
    val rm = mq.head()
    assert(rm.getString(0) == em.getString(0) &&
      rm.getString(1) == em.getString(1))
  }

  test("runtime filtering on a partitioned scan: a non-co-partitioned " +
    "join's dynamic keys elide sibling partitions' files") {
    val out = fresh("cat_spj_rtprune")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersionedPartitioned(orders, out, Seq("o_orderstatus"))
    val dimPath = fresh("cat_spj_rtdim")
    Seq(("F", "x"), ("O", "y")).toDF("k", "tag").write.parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("cat_spj_rtdim")
    val q = spark.sql(
      s"""SELECT count(*) AS c
         |FROM graft.`$out` f JOIN cat_spj_rtdim d
         |  ON f.o_orderstatus = d.k
         |WHERE d.tag = 'x'""".stripMargin)
    assert(q.collect().head.getLong(0) ==
      orders.filter($"o_orderstatus" === "F").count())
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case x => x }.flatMap {
        case ad: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => nodes(ad.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => s +: nodes(s.plan)
        case x => Seq(x)
      }
    val scans = nodes(q.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.runtimeFilters.nonEmpty => b.scan
    }.collect {
      case k: org.apache.spark.sql.graftbridge.KeyGroupedParquetScan => k
    }
    assert(scans.nonEmpty, "no runtime filter reached the partitioned " +
      "scan:\n" + q.queryExecution.executedPlan.toString)
    val k = scans.head
    assert(k.filterCalls >= 1)
    val total = k.planInputPartitions().collect {
      case p: org.apache.spark.sql.graftbridge.KeyedFilePartition =>
        p.fp.files.length
    }.sum
    val all = st.readVersioned(out).inputFiles.length
    assert(total < all,
      s"runtime keys did not elide sibling partitions ($total of $all)")
  }

  test("SQL partitioned lifecycle: CREATE PARTITIONED BY, INSERT, " +
    "UPDATE, DELETE, TRUNCATE all keep the identity layout alive") {
    val out = fresh("cat_sql_partlife")
    spark.sql(
      s"""CREATE TABLE graft.`$out` (k BIGINT, st STRING, v DOUBLE)
         |USING graft PARTITIONED BY (st)""".stripMargin)
    assert(st.partitionSpec(out, 0L) == Seq("st"))
    T.t(spark, SF, "orders")
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
        $"o_totalprice".as("v"))
      .createOrReplaceTempView("cat_sql_partlife_src")
    spark.sql(s"INSERT INTO graft.`$out` " +
      "SELECT k, st, v FROM cat_sql_partlife_src")
    val orders = spark.table("cat_sql_partlife_src")
    assert(st.readVersioned(out).count() == orders.count())
    // every inserted file is keyed: the key-grouped scan engages, so
    // a self-aggregation on the partition key plans zero hash
    // exchanges
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.sql(
        s"""SELECT st, CAST(count(*) AS BIGINT) AS c
           |FROM graft.`$out` GROUP BY st""".stripMargin)
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"),
        "INSERT INTO lost the identity layout:\n" + plan)
      // UPDATE runs the group-based rewrite — replacement files must
      // come back key-rolled (layout survives)
      spark.sql(s"UPDATE graft.`$out` SET v = v + 1 WHERE k % 10 = 0")
      // DELETE declines the metadata shortcut on partitioned tables
      // and rewrites through the same partition-preserving path
      spark.sql(s"DELETE FROM graft.`$out` WHERE k % 2 = 0")
      val agg2 = spark.sql(
        s"""SELECT st, CAST(count(*) AS BIGINT) AS c
           |FROM graft.`$out` GROUP BY st""".stripMargin)
      val rows = agg2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = orders.filter($"k" % 2 === 1)
        .groupBy($"st").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == expect)
      val plan2 = agg2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan2.contains("Exchange hashpartitioning"),
        "row-level DML de-partitioned the table:\n" + plan2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    // TRUNCATE keeps the spec: the next INSERT is still partitioned
    spark.sql(s"TRUNCATE TABLE graft.`$out`")
    assert(st.readVersioned(out).count() == 0)
    assert(st.partitionSpec(out, st.listVersions(out).last) == Seq("st"))
  }

  test("Scala-API CoW DELETE, MERGE, and compact on a partitioned " +
    "table rewrite in the identity layout") {
    val out = fresh("cat_scala_partdml")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersionedPartitioned(orders, out, Seq("o_orderstatus"))
    def allKeyed(): Boolean =
      st.readVersioned(out).inputFiles.forall(_.contains("__gp_"))
    st.deleteVersioned(out, $"o_orderkey" % 7 === 0)
    assert(allKeyed(), "CoW DELETE de-partitioned the table")
    assert(st.readVersioned(out).count() ==
      orders.filter($"o_orderkey" % 7 =!= 0).count())
    val upd = orders.filter($"o_orderkey" % 7 === 1)
      .withColumn("o_totalprice", $"o_totalprice" + 1)
    st.mergeVersioned(out, upd, "o_orderkey")
    assert(allKeyed(), "MERGE de-partitioned the table")
    st.compactVersioned(out, targetFiles = 2)
    assert(allKeyed(), "compact de-partitioned the table")
    assert(st.partitionSpec(out, st.listVersions(out).last) ==
      Seq("o_orderstatus"))
    // the layout is not just cosmetic: the partition-key aggregation
    // still plans zero hash exchanges after the whole DML sequence
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.sql(
        s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS c
           |FROM graft.`$out` GROUP BY o_orderstatus""".stripMargin)
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("bucketed storage-partitioned join: co-bucketed high-" +
    "cardinality keys join with zero hash exchanges") {
    val a = fresh("cat_spjb_fact")
    val b = fresh("cat_spjb_dim")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val lineagg = T.t(spark, SF, "lineitem")
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_lines"))
    st.writeVersionedPartitioned(orders, a, Seq("bucket(8,o_orderkey)"))
    st.writeVersionedPartitioned(lineagg, b, Seq("bucket(8,l_orderkey)"))
    // the write itself must agree with the V2 graft.bucket function
    // (the dirs came from pmod(hash(col),8); the function is what the
    // planner trusts for transform compatibility)
    val fnCheck = T.t(spark, SF, "orders").limit(100)
      .select($"o_orderkey",
        expr("graft.bucket(8, o_orderkey)").as("f"),
        pmod(hash($"o_orderkey"), lit(8)).as("h"))
      .filter($"f" =!= $"h")
    val fnBad = fnCheck.collect()
    assert(fnBad.isEmpty, fnBad.mkString(", "))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS c,
           |  CAST(sum(d.n_lines) AS BIGINT) AS s
           |FROM graft.`$a` f JOIN graft.`$b` d
           |  ON f.o_orderkey = d.l_orderkey""".stripMargin)
      val r = q.collect().head
      val expect = orders.join(lineagg,
          $"o_orderkey" === $"l_orderkey")
        .agg(count(lit(1)), sum($"n_lines")).head()
      assert(r.getLong(0) == expect.getLong(0) &&
        r.getLong(1) == expect.getLong(1))
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"),
        "co-bucketed join still shuffles:\n" + plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("SQL CREATE TABLE PARTITIONED BY bucket + INSERT keeps the " +
    "bucket layout") {
    val out = fresh("cat_sql_bucketlife")
    spark.sql(
      s"""CREATE TABLE graft.`$out` (k BIGINT, v DOUBLE)
         |USING graft PARTITIONED BY (bucket(4, k))""".stripMargin)
    assert(st.partitionSpec(out, 0L) == Seq("bucket(4,k)"))
    T.t(spark, SF, "orders")
      .select($"o_orderkey".as("k"), $"o_totalprice".as("v"))
      .createOrReplaceTempView("cat_sql_bucketlife_src")
    spark.sql(s"INSERT INTO graft.`$out` " +
      "SELECT k, v FROM cat_sql_bucketlife_src")
    val src = spark.table("cat_sql_bucketlife_src")
    assert(st.readVersioned(out).count() == src.count())
    assert(st.readVersioned(out).inputFiles.forall(_.contains("__gb4_k=")),
      st.readVersioned(out).inputFiles.take(3).mkString(", "))
    // and the values landed in the RIGHT buckets (dir id = bucket fn)
    val misplaced = st.readVersioned(out)
      .withColumn("file", input_file_name())
      .withColumn("dir_id",
        regexp_extract($"file", "__gb4_k=(\\d+)", 1).cast("int"))
      .filter($"dir_id" =!= pmod(hash($"k"), lit(4)))
    val misBad = misplaced.limit(3).collect()
    assert(misBad.isEmpty, misBad.mkString(", "))
  }

  test("temporal transforms: days(ts) SQL lifecycle — UTC-day dirs, " +
    "range pruning from path-derived zones, V2 function parity, NULLs") {
    val out = fresh("cat_tp_days")
    spark.sql(
      s"""CREATE TABLE graft.`$out`
         |  (event_id BIGINT, ts TIMESTAMP, user_id BIGINT)
         |USING graft PARTITIONED BY (days(ts))""".stripMargin)
    assert(st.partitionSpec(out, 0L) == Seq("days(ts)"))
    T.events(spark, SF).select($"event_id", $"ts", $"user_id")
      .createOrReplaceTempView("cat_tp_days_src")
    spark.sql(s"INSERT INTO graft.`$out` " +
      "SELECT event_id, ts, user_id FROM cat_tp_days_src")
    val src = spark.table("cat_tp_days_src")
    assert(st.readVersioned(out).count() == src.count())
    assert(st.readVersioned(out).inputFiles.forall(_.contains("__gtd_ts=")),
      st.readVersioned(out).inputFiles.take(3).mkString(", "))
    // rows landed in the RIGHT day dirs: dir ordinal = the V2
    // graft.days function = UTC floor-div of the raw micros
    val misplaced = st.readVersioned(out)
      .withColumn("file", input_file_name())
      .withColumn("dir_id",
        regexp_extract($"file", "__gtd_ts=(-?\\d+)", 1).cast("int"))
      .filter($"dir_id" =!= expr("graft.days(ts)") ||
        $"dir_id" =!= floor(unix_micros($"ts") / 86400000000L).cast("int"))
    val misBad = misplaced.limit(3).collect()
    assert(misBad.isEmpty, misBad.mkString(", "))
    // a ts-range predicate prunes sibling days at plan time — each
    // partition dir doubles as an exact zone entry, no sidecar built
    def scannedFiles(d: org.apache.spark.sql.DataFrame): Int = {
      def nodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case x => x }.flatMap {
          case ad: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => nodes(ad.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => s +: nodes(s.plan)
          case x => Seq(x)
        }
      nodes(d.queryExecution.executedPlan).collect {
        case bs: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          bs.inputPartitions.map {
            case k: org.apache.spark.sql.graftbridge.KeyedFilePartition =>
              k.fp.files.map(_.filePath.toString).distinct.size
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.map(_.filePath.toString).distinct.size
            case _ => 0
          }.sum
      }.sum
    }
    val q = spark.sql(
      s"""SELECT CAST(count(*) AS BIGINT) AS c FROM graft.`$out`
         |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-12 00:00:00'""".stripMargin)
    val expect = src.filter($"ts" >= lit("2024-01-10").cast("timestamp")
      && $"ts" < lit("2024-01-12").cast("timestamp")).count()
    assert(q.collect().head.getLong(0) == expect)
    val full = spark.sql(
      s"SELECT CAST(sum(event_id) AS BIGINT) AS s FROM graft.`$out`")
    full.collect()
    val (pruned, total) = (scannedFiles(q), scannedFiles(full))
    assert(pruned > 0 && pruned < total,
      s"day-range filter did not prune sibling days ($pruned of $total)")
    // NULL ts lands in the default-partition dir and reads back
    spark.sql(s"INSERT INTO graft.`$out` VALUES (900001, NULL, 7)")
    val back = st.readVersioned(out).filter($"ts".isNull)
    assert(back.count() == 1 &&
      back.head.getLong(0) == 900001L)
    assert(st.readVersioned(out).inputFiles.exists(
      _.contains("__HIVE_DEFAULT_PARTITION__")))
    assert(st.readVersioned(out).count() == src.count() + 1)
  }

  test("temporal transforms: months(date) Scala-API layout, compaction " +
    "keeps it, invalid unit/type combinations fail fast") {
    val out = fresh("cat_tp_months")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderdate".cast("date").as("od"),
        $"o_totalprice")
    st.writeVersionedPartitioned(orders, out, Seq("months(od)"))
    assert(st.readVersioned(out).inputFiles.forall(_.contains("__gtm_od=")),
      st.readVersioned(out).inputFiles.take(3).mkString(", "))
    // dir ordinal = (year-1970)*12 + month-1, from the date itself
    val misplaced = st.readVersioned(out)
      .withColumn("file", input_file_name())
      .withColumn("dir_id",
        regexp_extract($"file", "__gtm_od=(-?\\d+)", 1).cast("int"))
      .filter($"dir_id" =!=
        ((year($"od") - 1970) * 12 + month($"od") - 1))
    val misBad = misplaced.limit(3).collect()
    assert(misBad.isEmpty, misBad.mkString(", "))
    val before = st.readVersioned(out)
      .agg(count(lit(1)), sum($"o_orderkey")).head()
    // compaction must keep the temporal layout (spec + dirs)
    st.compactVersioned(out, 2)
    assert(st.partitionSpec(out, st.listVersions(out).last) ==
      Seq("months(od)"))
    assert(st.readVersioned(out).inputFiles.forall(_.contains("__gtm_od=")))
    val after = st.readVersioned(out)
      .agg(count(lit(1)), sum($"o_orderkey")).head()
    assert(before == after)
    // a months-range predicate prunes from the synthesized zones even
    // though the predicate is on the RAW date column
    val pr = st.readVersioned(out).filter($"od" < lit("1993-01-01"))
      .agg(count(lit(1))).head().getLong(0)
    assert(pr == orders.filter($"od" < lit("1993-01-01")).count())
    // MIN/MAX must NOT answer from the UNIT-WIDE synthesized zones
    // (a month-end bound is a value present in no row) — the meta
    // fast path declines and the real scan answers
    val mq = spark.sql(
      s"SELECT min(od) AS mn, max(od) AS mx FROM graft.`$out`")
    assert(!mq.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "months() zones leaked into the MIN/MAX meta answer")
    val em = orders.agg(min($"od"), max($"od")).head()
    assert(mq.head() == em)
    // a days(DATE) layout IS exact ([d,d]) — manifest-rate MIN/MAX
    val dOut = fresh("cat_tp_days_date")
    st.writeVersionedPartitioned(orders, dOut, Seq("days(od)"))
    val dq = spark.sql(
      s"SELECT min(od) AS mn, max(od) AS mx FROM graft.`$dOut`")
    assert(dq.queryExecution.executedPlan.toString
      .contains("LocalTableScan"), dq.queryExecution.executedPlan)
    assert(dq.head() == em)
    // invalid combos fail at validation, not at write time
    val bad1 = intercept[IllegalArgumentException] {
      st.writeVersionedPartitioned(orders, fresh("cat_tp_bad1"),
        Seq("hours(od)"))
    }
    assert(bad1.getMessage.contains("hours"))
    val bad2 = intercept[IllegalArgumentException] {
      st.writeVersionedPartitioned(
        T.t(spark, SF, "orders"), fresh("cat_tp_bad2"),
        Seq("days(o_orderstatus)"))
    }
    assert(bad2.getMessage.contains("not a valid source type"))
  }

  test("SQL row-level DML on a days(ts) table keeps the temporal " +
    "layout (group rewrites resolve the graft.days distribution)") {
    val out = fresh("cat_tp_dml")
    spark.sql(
      s"""CREATE TABLE graft.`$out`
         |  (event_id BIGINT, ts TIMESTAMP, user_id BIGINT)
         |USING graft PARTITIONED BY (days(ts))""".stripMargin)
    T.events(spark, SF).select($"event_id", $"ts", $"user_id")
      .createOrReplaceTempView("cat_tp_dml_src")
    spark.sql(s"INSERT INTO graft.`$out` " +
      "SELECT event_id, ts, user_id FROM cat_tp_dml_src")
    spark.sql(s"UPDATE graft.`$out` SET user_id = user_id + 1 " +
      "WHERE event_id % 10 = 0")
    spark.sql(s"DELETE FROM graft.`$out` WHERE event_id % 2 = 0")
    assert(st.readVersioned(out).inputFiles.forall(_.contains("__gtd_ts=")),
      st.readVersioned(out).inputFiles.take(3).mkString(", "))
    val src = spark.table("cat_tp_dml_src")
    val expect = src.filter($"event_id" % 2 === 1)
      .withColumn("user_id",
        when($"event_id" % 10 === 0, $"user_id" + 1)
          .otherwise($"user_id"))
      .agg(count(lit(1)), sum($"user_id")).head()
    val got = st.readVersioned(out)
      .agg(count(lit(1)), sum($"user_id")).head()
    assert(got == expect)
    // and the rewritten files are still rightly keyed
    val mis = st.readVersioned(out)
      .withColumn("dir_id", regexp_extract(input_file_name(),
        "__gtd_ts=(-?\\d+)", 1).cast("int"))
      .filter($"dir_id" =!= expr("graft.days(ts)"))
      .limit(3).collect()
    assert(mis.isEmpty, mis.mkString(", "))
    // a one-day DELETE elides every other day's file from the
    // rewrite: the synthesized temporal zones must serve the
    // sources.Filter pruning path (CoW group elision), not only the
    // catalyst plan-time path — untouched files survive UNCHANGED
    val before = st.readVersioned(out).inputFiles.toSet
    spark.sql(s"DELETE FROM graft.`$out` " +
      "WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' " +
      "AND ts < TIMESTAMP '2024-01-21 00:00:00'")
    val after = st.readVersioned(out).inputFiles.toSet
    assert(after.subsetOf(before),
      "a one-day DELETE rewrote untouched days:\n" +
        (after -- before).take(3).mkString("\n"))
    assert((before -- after).forall(_.contains("__gtd_ts=19742")),
      "files outside the deleted day were touched: " +
        (before -- after).filterNot(_.contains("__gtd_ts=19742"))
          .take(3).mkString(", "))
  }

  test("temporal storage-partitioned join: two days(ts) tables join " +
    "with zero hash exchanges") {
    val a = fresh("cat_tp_spj_a")
    val b = fresh("cat_tp_spj_b")
    val ev = T.events(spark, SF).select($"event_id", $"ts", $"user_id")
    st.writeVersionedPartitioned(ev, a, Seq("days(ts)"))
    st.writeVersionedPartitioned(
      ev.groupBy($"ts").agg(count(lit(1)).as("n")), b, Seq("days(ts)"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS c,
           |  CAST(sum(d.n) AS BIGINT) AS s
           |FROM graft.`$a` f JOIN graft.`$b` d ON f.ts = d.ts""".stripMargin)
      val r = q.collect().head
      assert(r.getLong(0) == ev.count() && r.getLong(1) == ev.count())
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"),
        "co-day-partitioned join still shuffles:\n" + plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("sorted tables: the O claim records, survives only re-declared " +
    "appends, and compaction re-enforces it") {
    val out = fresh("cat_sorted_claim")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(orders.repartition(4), out, append = false,
      Seq.empty, Seq.empty, Seq("o_orderkey"))
    assert(st.sortSpec(out, st.listVersions(out).last) ==
      Seq("o_orderkey"))
    // every data file is internally sorted
    def eachFileSorted(): Boolean =
      st.readVersioned(out).inputFiles.forall { f =>
        val keys = spark.read.parquet(f)
          .select($"o_orderkey").collect().map(_.getLong(0))
        keys.sameElements(keys.sorted)
      }
    assert(eachFileSorted())
    // an append that does NOT re-declare the sort drops the claim
    st.writeVersioned(orders.limit(100), out, append = true)
    assert(st.sortSpec(out, st.listVersions(out).last).isEmpty)
    // compaction with a restored claim re-sorts and re-records
    st.writeVersioned(orders, out, append = false, Seq.empty,
      Seq.empty, Seq("o_orderkey"))
    st.compactVersioned(out, 3)
    assert(st.sortSpec(out, st.listVersions(out).last) ==
      Seq("o_orderkey"))
    assert(eachFileSorted())
    // a re-declared append keeps it
    st.writeVersioned(orders.limit(50), out, append = true,
      Seq.empty, Seq.empty, Seq("o_orderkey"))
    assert(st.sortSpec(out, st.listVersions(out).last) ==
      Seq("o_orderkey"))
    // a Scala CoW rewrite does not re-sort — the claim must drop
    st.deleteVersioned(out, $"o_orderkey" % 100 === 0)
    assert(st.sortSpec(out, st.listVersions(out).last).isEmpty)
  }

  test("bucketed+sorted tables: the sort-merge join plans with zero " +
    "exchanges AND zero sorts (scan-reported ordering)") {
    val a = fresh("cat_sms_a")
    val b = fresh("cat_sms_b")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val lineagg = T.t(spark, SF, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n_lines"))
    // ONE task per bucket id (repartition on the bucket id routes
    // every bucket to a single task) → one file per bucket → the
    // key-grouped scan may claim per-partition ordering
    st.writeVersionedPartitioned(
      orders.repartition(8, pmod(hash($"o_orderkey"), lit(8))),
      a, Seq("bucket(8,o_orderkey)"), append = false,
      sortedBy = Seq("o_orderkey"))
    st.writeVersionedPartitioned(
      lineagg.repartition(8, pmod(hash($"l_orderkey"), lit(8))),
      b, Seq("bucket(8,l_orderkey)"), append = false,
      sortedBy = Seq("l_orderkey"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(
        s"""SELECT CAST(count(*) AS BIGINT) AS c,
           |  CAST(sum(d.n_lines) AS BIGINT) AS s
           |FROM graft.`$a` f JOIN graft.`$b` d
           |  ON f.o_orderkey = d.l_orderkey""".stripMargin)
      val r = q.collect().head
      val expect = orders.join(lineagg, $"o_orderkey" === $"l_orderkey")
        .agg(count(lit(1)), sum($"n_lines")).head()
      assert(r.getLong(0) == expect.getLong(0) &&
        r.getLong(1) == expect.getLong(1))
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"),
        "expected a sort-merge join:\n" + plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        "co-bucketed join still shuffles:\n" + plan)
      assert(!plan.contains("Sort ["),
        "scan-reported ordering did not elide the SMJ sorts:\n" + plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("SQL sorted lifecycle: CREATE TBLPROPERTIES sorted_by enforces " +
    "the sort on INSERT and row-level DML; the claim survives them") {
    val out = fresh("cat_sql_sorted")
    spark.sql(
      s"""CREATE TABLE graft.`$out` (k BIGINT, st STRING, v DOUBLE)
         |USING graft PARTITIONED BY (bucket(4, k))
         |TBLPROPERTIES ('sorted_by'='k')""".stripMargin)
    assert(st.sortSpec(out, 0L) == Seq("k"))
    T.t(spark, SF, "orders")
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
        $"o_totalprice".as("v"))
      .createOrReplaceTempView("cat_sql_sorted_src")
    spark.sql(s"INSERT INTO graft.`$out` " +
      "SELECT k, st, v FROM cat_sql_sorted_src")
    def eachFileSorted(): Boolean =
      st.readVersioned(out).inputFiles.forall { f =>
        val keys = spark.read.parquet(f)
          .select($"k").collect().map(_.getLong(0))
        keys.sameElements(keys.sorted)
      }
    assert(st.sortSpec(out, st.listVersions(out).last) == Seq("k"))
    assert(eachFileSorted(), "INSERT INTO wrote unsorted files")
    // DESCRIBE surfaces the claim
    assert(spark.sql(s"DESCRIBE TABLE EXTENDED graft.`$out`")
      .filter($"col_name" === "Table Properties")
      .head.getString(1).contains("sorted_by=k"))
    // row-level DML re-enforces the order on its replacement files
    spark.sql(s"UPDATE graft.`$out` SET v = v + 1 WHERE k % 7 = 0")
    spark.sql(s"DELETE FROM graft.`$out` WHERE k % 2 = 0")
    assert(st.sortSpec(out, st.listVersions(out).last) == Seq("k"))
    assert(eachFileSorted(), "row-level DML wrote unsorted files")
    val src = spark.table("cat_sql_sorted_src")
    assert(st.readVersioned(out).count() ==
      src.filter($"k" % 2 === 1).count())
  }

  test("partition-spec evolution: ALTER changes the layout going " +
    "forward, mixed snapshots read correctly, compaction re-lays") {
    val out = fresh("cat_spec_evolve")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersionedPartitioned(
      orders.filter($"o_orderkey" % 2 === 0), out, Seq("o_orderstatus"))
    // evolve identity → bucket via the CALL procedure
    val v = spark.sql(s"CALL graft.alter_partition_spec(" +
      s"'$out', 'bucket(4,o_orderkey)')").head.getLong(0)
    assert(st.partitionSpec(out, v) == Seq("bucket(4,o_orderkey)"))
    // the next append writes the NEW layout; old files keep theirs
    st.writeVersionedPartitioned(
      orders.filter($"o_orderkey" % 2 === 1), out,
      Seq("bucket(4,o_orderkey)"), append = true)
    val files = st.readVersioned(out).inputFiles
    assert(files.exists(_.contains("__gp_o_orderstatus=")) &&
      files.exists(_.contains("__gb4_o_orderkey=")), files.take(4))
    // the MIXED snapshot reads every row exactly once (plain scan —
    // the key-grouped path must NOT engage on partially-keyed files)
    val got = spark.sql(
      s"""SELECT CAST(count(*) AS BIGINT) AS c,
         |  CAST(sum(o_orderkey) AS BIGINT) AS s
         |FROM graft.`$out`""".stripMargin).head()
    val expect = orders.agg(count(lit(1)), sum($"o_orderkey")).head()
    assert(got.getLong(0) == expect.getLong(0) &&
      got.getLong(1) == expect.getLong(1))
    // each historical version still reads with ITS OWN spec
    assert(st.readVersioned(out, Some(0L)).inputFiles
      .forall(_.contains("__gp_o_orderstatus=")))
    // compaction re-lays the WHOLE table under the new spec → every
    // file keyed again
    st.compactVersioned(out, 2)
    assert(st.readVersioned(out).inputFiles
      .forall(_.contains("__gb4_o_orderkey=")))
    val after = spark.sql(
      s"""SELECT CAST(count(*) AS BIGINT) AS c,
         |  CAST(sum(o_orderkey) AS BIGINT) AS s
         |FROM graft.`$out`""".stripMargin).head()
    assert(after == got)
    // no-op alters fail fast — including cosmetic respellings of the
    // SAME layout (specs compare in canonical parsed form)
    intercept[IllegalArgumentException] {
      st.alterPartitionSpec(out, Seq("bucket(4,o_orderkey)"))
    }
    intercept[IllegalArgumentException] {
      st.alterPartitionSpec(out, Seq("bucket(4, o_orderkey)"))
    }
    st.alterPartitionSpec(out, Seq.empty)
    assert(st.partitionSpec(out, st.listVersions(out).last).isEmpty)
  }

  test("scoped compaction: CALL compact_where rewrites only matching " +
    "days, keeps the layout AND the sort claim, moves zero other bytes") {
    val out = fresh("cat_compact_where")
    val ev = T.events(spark, SF).select($"event_id", $"ts", $"user_id")
    // two appends → two small files per day (the ingest shape)
    st.writeVersionedPartitioned(ev.filter($"event_id" % 2 === 0), out,
      Seq("days(ts)"), append = false, sortedBy = Seq("event_id"))
    st.writeVersionedPartitioned(ev.filter($"event_id" % 2 === 1), out,
      Seq("days(ts)"), append = true, sortedBy = Seq("event_id"))
    val before = st.readVersioned(out).inputFiles.toSet
    val lastDay = "__gtd_ts=19752" // 2024-01-30
    assert(before.count(_.contains(lastDay)) >= 2, "need 2+ files/day")
    spark.sql(s"CALL graft.compact_where(" +
      s"'$out', \"ts >= TIMESTAMP'2024-01-30 00:00:00'\", 1)")
    val after = st.readVersioned(out).inputFiles.toSet
    // every untouched day's files carry VERBATIM (zero bytes moved)
    assert((before -- after).forall(_.contains(lastDay)),
      "untouched days were rewritten: " +
        (before -- after).filterNot(_.contains(lastDay)).take(3))
    assert((after -- before).forall(_.contains(lastDay)),
      "fresh files landed outside the compacted day: " +
        (after -- before).filterNot(_.contains(lastDay)).take(3))
    assert(after.count(_.contains(lastDay)) == 1,
      s"day not compacted to 1 file: ${after.filter(_.contains(lastDay))}")
    // spec + sort claim survive; the fresh file is actually sorted
    val v = st.listVersions(out).last
    assert(st.partitionSpec(out, v) == Seq("days(ts)"))
    assert(st.sortSpec(out, v) == Seq("event_id"))
    val freshFile = (after -- before).head
    val ids = spark.read.parquet(freshFile)
      .select($"event_id").collect().map(_.getLong(0))
    assert(ids.sameElements(ids.sorted), "compacted file is unsorted")
    // and not a row was gained or lost
    assert(st.readVersioned(out)
      .agg(count(lit(1)), sum($"event_id")).head() ==
      ev.agg(count(lit(1)), sum($"event_id")).head())
    // a predicate matching nothing is a no-commit no-op
    val vNow = st.listVersions(out).last
    assert(st.compactVersionedWhere(out,
      $"ts" >= lit("2031-01-01").cast("timestamp")) == vNow)
    assert(st.listVersions(out).last == vNow)
    // an UNPARTITIONED stats-covered table keeps manifest-rate
    // MIN/MAX after a scoped compact (fresh files re-stated — the
    // priorSidecarCoverage invariant of every maintenance rewrite)
    val so = fresh("cat_cw_stats")
    val orders = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_totalprice")
    st.writeVersioned(orders.repartitionByRange(4, $"o_orderkey"), so,
      append = false, Seq("o_orderkey"))
    st.compactVersionedWhere(so, $"o_orderkey" < 100L, 1)
    val mq = spark.sql(
      s"SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx " +
        s"FROM graft.`$so`")
    assert(mq.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "scoped compact lost stats coverage:\n" +
        mq.queryExecution.executedPlan)
    val em = orders.agg(min($"o_orderkey"), max($"o_orderkey")).head()
    assert(mq.head() == em)
  }

  test("row-level SQL refuses merge-on-read snapshots with guidance") {
    val out = seed("cat_mor_refuse")
    st.deleteVersionedMor(out, $"o_orderkey" === 1L, "o_orderkey")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$out` SET o_orderstatus = 'X' " +
        "WHERE o_orderkey = 2")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("deletion vectors")), e)
  }
}
