package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink operators — SURVEY.md §2.10 (K1-K6).
  *
  * The reference's sinks write spec-valid single files (executor parts
  * + driver concat, BamSink.java:64-139) or sharded directories
  * (AnySamSinkMultiple.java:62-93). Spark-native: sharded parquet is
  * the scalable default (K4 ≡ df.write.parquet), single-file is a
  * coalesce(1) commit step, partitioned layout adds hive-style
  * partition pruning the reference never had. Every query writes,
  * re-reads, and aggregates so the oracle checks the full round trip.
  */
object Sinks extends QueryModule {

  /** K4: sharded sink — each partition a standalone file, directory
    * readable as one table (README.md:97-115).
    */
  def sinkSharded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_sharded_lineitem")
    T.t(s, dir, "lineitem")
      .repartition(8, $"l_orderkey")
      .write.mode("overwrite").option("compression", "zstd").parquet(out)
    s.read.parquet(out)
      .groupBy($"l_linestatus")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_linestatus")
  }

  /** K1: single-file sink — order-preserving coalesce(1) write (the
    * reference's header+parts+terminator concat, BamSink.java:96-116),
    * re-read must preserve row order, checked via row_number parity.
    */
  def sinkSingle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_single_orders")
    T.t(s, dir, "orders")
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy($"o_orderkey")
  }

  /** K1 parallel edition: parts written by all executors, driver
    * splices header + parts into ONE csv file in part order
    * (GraftStorage.writeSingleCsv — the BamSink.save shape). Input is
    * range-partitioned and sorted, so the merged file is globally
    * ordered without any coalesce(1) serialization.
    */
  def sinkSingleMerged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val out = T.scratch(dir, "sink_single_merged") + "/orders.csv"
    val df = T.t(s, dir, "orders")
      .filter($"o_orderstatus" === "O")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .repartitionByRange(4, $"o_orderkey")
      .sortWithinPartitions($"o_orderkey")
    graft.sources.GraftStorage(s).writeSingleCsv(df, out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderpriority", StringType),
      StructField("o_totalprice", DoubleType)))
    s.read.option("header", "true").schema(schema).csv(out)
      .orderBy($"o_orderkey")
  }

  /** K1 parallel edition for PARQUET: parts written by all executors,
    * driver merges row groups into ONE parquet file in part order
    * (GraftStorage.writeSingleParquet — BamSink parts+concat for the
    * columnar format). Range-partitioned + sorted input → globally
    * ordered single file, no coalesce(1) anywhere in the plan.
    */
  def sinkSingleParquet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_single_parquet") + "/orders.parquet"
    val df = T.t(s, dir, "orders")
      .filter($"o_orderstatus" === "P")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .repartitionByRange(4, $"o_orderkey")
      .sortWithinPartitions($"o_orderkey")
    graft.sources.GraftStorage(s).writeSingleParquet(df, out)
    s.read.parquet(out).orderBy($"o_orderkey")
  }

  /** K1 single-file BGZF sink — the reference's flagship sink
    * (BamSink.java:64-139): terminator-less BGZF parts written
    * executor-parallel, driver byte-concat + EOF block = ONE
    * spec-valid `.bgz`, plus a merged `_bgzi` block index. The round
    * trip re-reads the single file SPLIT-PARALLEL through the sidecar
    * (no chain walk) and aggregates, so the oracle certifies the
    * whole splice: every line exactly once across part seams.
    */
  def sinkSingleBgzf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types._
    val file = graft.Fixtures.ensure(dir, "sink_single_bgzf") { p =>
      graft.sources.GraftStorage(s).writeSingleBgzf(
        T.t(s, dir, "orders")
          .select(concat_ws(",", $"o_orderkey", $"o_orderpriority",
            $"o_totalprice").as("value"))
          .repartition(4),
        p + "/orders.bgz", blockInput = 4 * 1024)
    } + "/orders.bgz"
    val lines = graft.sources.GraftStorage(s)
      .readBgzfLines(file, targetSplitBytes = 16 * 1024)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderpriority", StringType),
      StructField("o_totalprice", DoubleType)))
    s.read.schema(schema).csv(lines)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  /** Table-maintenance compaction as a checkable round trip: a
    * 16-file sharded write compacted into a few target-size files
    * (GraftStorage.compact — the OPTIMIZE pass), re-read and
    * aggregated so the oracle verifies no rows were lost or
    * duplicated by the rewrite+swap.
    */
  def sinkCompacted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_compacted_orders")
    T.t(s, dir, "orders")
      .repartition(16, $"o_orderkey")
      .write.mode("overwrite").parquet(out)
    val bytes = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(out)).getLength
    graft.sources.GraftStorage(s).compact(out, bytes / 2 + 1)
    s.read.parquet(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** Hive-partitioned sink: partition column becomes directory
    * structure; the re-read filter prunes to one directory (partition
    * pruning — beyond the reference's capabilities, free in Spark).
    */
  def sinkPartitioned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_part_events")
    T.events(s, dir)
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    s.read.parquet(out)
      .filter($"event_type" === "purchase" || $"event_type" === "signup")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), dsum($"value", 6).as("sum_value"))
      .orderBy($"event_type")
  }

  /** K6: overwrite semantics — second write fully replaces the first
    * (README.md:57 "create new or overwrite without warning").
    */
  def sinkOverwrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_overwrite_cust")
    val c = T.t(s, dir, "customer")
    c.write.mode("overwrite").parquet(out)
    c.filter($"c_mktsegment" === "BUILDING")
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .agg(count(lit(1)).as("cnt"), dsum($"c_acctbal").as("sum_bal"))
  }

  /** CDC upsert (MERGE INTO analogue without a table format): updates
    * win on key collision, inserts append — one shuffle-on-key anti
    * join plus a union, then an overwrite. At scale the anti join
    * co-locates with bucketing on the key (join_bucketed shows the
    * shuffle-free layout); the updates side is the small one and
    * broadcasts. Update set: every 7th order re-priced, plus new
    * synthetic keys past the domain.
    */
  def sinkUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_upsert_orders")
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val updates = base.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", lit("X").as("o_orderstatus"),
        ($"o_totalprice" * 2).as("o_totalprice"))
      .union(base.filter($"o_orderkey" % 97 === 0)
        .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice")))
    val merged = updates.union(
      base.join(broadcast(updates.select($"o_orderkey")),
        Seq("o_orderkey"), "left_anti"))
    merged.write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** K-series, versioned: manifest-based snapshot commits with time
    * travel (`GraftStorage.writeVersioned`/`readVersioned`). Commit
    * v0 = full orders, commit v1 = APPEND of the key%10 slice; the
    * query then time-travels to BOTH versions and proves snapshot
    * isolation — v0's numbers, read AFTER v1 committed, are
    * untouched by it (the v0 manifest never sees v1's files).
    */
  /** Zero-copy CLONE (`GraftStorage.cloneVersioned`): shallow-clone
    * the source's snapshot (manifest-only — no data bytes move), then
    * APPEND a delta to the clone. The three summary rows prove the
    * contract: clone@v0 equals the source snapshot, clone@v1 carries
    * the divergent delta, and the source's latest version — read
    * AFTER the clone diverged — is untouched. StorageSpec adds the
    * physical half: the clone dir contains no `data/c0`, only the
    * appended commit.
    */
  def sinkClone(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = T.scratch(dir, "sink_clone_src")
    val dst = T.scratch(dir, "sink_clone_dst")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    st.writeVersioned(base, src)
    st.cloneVersioned(src, dst)
    st.writeVersioned(base.filter($"o_orderkey" % 10 === 0), dst,
      append = true)
    def snap(label: String, path: String, v: Long): DataFrame =
      st.readVersioned(path, Some(v))
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(lit(label).as("snap"), $"cnt", $"total")
    snap("clone_v0", dst, 0)
      .unionByName(snap("clone_v1", dst, 1))
      .unionByName(snap("src_latest", src, 0))
      .orderBy($"snap")
  }

  def sinkVersioned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_orders")
    val st = graft.sources.GraftStorage(s)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    st.writeVersioned(base, out)
    st.writeVersioned(base.filter($"o_orderkey" % 10 === 0), out,
      append = true)
    def snap(v: Long): DataFrame =
      st.readVersioned(out, Some(v))
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(lit(v).as("version"), $"cnt", $"total")
    snap(0).unionByName(snap(1)).orderBy($"version")
  }

  /** CHECK constraints as a commit-protocol gate: a versioned table
    * declares predicates once
    * ([[graft.sources.GraftStorage.addCheckConstraint]]) and every
    * commit that introduces rows validates its OWN files between data
    * write and manifest publish — a violating append aborts
    * invisibly (no manifest, commit dir removed), leaving readers on
    * the prior snapshot. ANSI semantics: NULL passes, only FALSE
    * violates — proven by final_rows including the committed
    * NULL-custkey row. Validation reads only
    * the delta's constraint columns, so the gate costs O(new data),
    * not O(table) — the design that still works when the table is
    * 100 TB and the append is a few GB.
    */
  def sinkVersionedConstraint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_constraint")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    st.writeVersioned(base, out)
    st.addCheckConstraint(out, "positive_price", "o_totalprice > 0")
    st.addCheckConstraint(out, "has_key", "o_orderkey IS NOT NULL")
    // dirty batch: one key violation, two price violations, one row
    // with NULL custkey that must PASS (ANSI: null is not false), one
    // clean row
    val dirty = Seq(
      (Option.empty[Long], Some(1L), 10.0),
      (Some(90000001L), Some(1L), -5.0),
      (Some(90000002L), Some(2L), 0.0),
      (Some(90000003L), Option.empty[Long], 30.0),
      (Some(90000004L), Some(3L), 40.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val rejected =
      try { st.writeVersioned(dirty, out, append = true); Map.empty[String, Long] }
      catch {
        case e: graft.sources.ConstraintViolationException => e.counts
      }
    // clean batch commits fine
    st.writeVersioned(dirty.filter($"o_orderkey".isNotNull &&
      $"o_totalprice" > 0), out, append = true)
    val fin = st.readVersioned(out)
    Seq(
      ("final_rows", fin.count()),
      ("rejected_has_key", rejected.getOrElse("has_key", 0L)),
      ("rejected_positive_price", rejected.getOrElse("positive_price", 0L)),
      ("versions", st.listVersions(out).size.toLong))
      .toDF("metric", "v").orderBy($"metric")
  }

  /** BLOOM-IN-LOG point lookup: commits carry per-file Bloom
    * sidecars as `B` manifest lines, so a point predicate on an
    * UNCLUSTERED column (custkey, while the layout ranges on
    * orderkey — the case min/max stats cannot serve) prunes files at
    * plan time through the snapshot's own log. StorageSpec pins the
    * numFiles reduction; the oracle certifies the surviving rows.
    */
  def sinkVersionedBloom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_bloom")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val o = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    st.writeVersioned(o.repartitionByRange(6, $"o_orderkey"),
      out, append = false, statsCols = Seq("o_orderkey"),
      bloomCols = Seq("o_custkey"))
    st.readVersionedPruned(out)
      .filter($"o_custkey" === 7L)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** CONCURRENT WRITERS under optimistic concurrency: six threads
    * race appends at the same table through
    * `appendVersionedRetrying`'s put-if-absent publish + retry loop.
    * WHICH writer wins each version is scheduler-dependent; the
    * snapshot CONTENT is not — every commit lands exactly once — so
    * the census (rows, exact cents total, version count) is
    * deterministic and oracle-checkable even though the run is a
    * genuine race.
    */
  def sinkVersionedConcurrent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_concurrent")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    st.writeVersioned(base.filter($"o_orderkey" % 7 === 0), out)
    val threads = 6
    val barrier = new java.util.concurrent.CyclicBarrier(threads)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val pool = (1 to threads).map { t =>
      new Thread(() => {
        try {
          barrier.await()
          st.appendVersionedRetrying(
            base.filter($"o_orderkey" % 7 === t), out, maxRetries = 50)
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    if (!errors.isEmpty) throw errors.peek()
    st.readVersioned(out)
      .agg(count(lit(1)).as("n_rows"),
        dsum($"o_totalprice").as("total"))
      .select($"n_rows", $"total",
        lit(st.listVersions(out).size.toLong).as("n_versions"))
  }

  /** RESTORE as a new commit: a bad append is rolled back by
    * republishing the good version's manifest — metadata-only at any
    * table size, history intact (the bad version stays
    * time-travelable until vacuum). The query corrupts the table with
    * a doubled append, restores, and proves latest == v0 while v1
    * still reads as the corrupted snapshot.
    */
  def sinkVersionedRestore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_restore")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
    st.writeVersioned(base, out)
    st.writeVersioned(base, out, append = true) // the bad double-load
    val restored = st.restoreVersioned(out, 0L)
    def cnt(v: Long): DataFrame =
      s.sql(s"SELECT CAST($v AS BIGINT) AS version, cnt " +
        s"FROM graft_count('$out', $v) ")
    cnt(0).unionByName(cnt(1)).unionByName(cnt(restored))
      .orderBy($"version")
  }

  /** WRITE-AUDIT-PUBLISH over the versioned log
    * ([[graft.sources.GraftStorage.wapStage]]): the risky ingest
    * commits as a full data write carrying an audit-pending `W`
    * marker — DEFAULT readers keep resolving the prior published
    * snapshot (`a_pre_publish` row: only the bootstrap half), the
    * auditor reads the staged version EXPLICITLY (`b_audit_staged`:
    * the full table), and `CALL graft.wap_publish` flips visibility
    * with one metadata-only commit (`c_published`) — zero data bytes
    * move at any table size. The reference's temp-parts → validate →
    * splice-publish lifecycle (BamSink.java:82-138) lifted from one
    * file to table commits.
    */
  def sinkVersionedWap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_wap")
    val st = graft.sources.GraftStorage(s)
    graft.sources.GraftCatalog.register(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.filter($"o_orderkey" % 2 === 0), out)
    val staged = st.wapStage(
      base.filter($"o_orderkey" % 2 === 1), out, "batch42")
    def snap(label: String, v: Option[Long]): DataFrame =
      st.readVersioned(out, v)
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(lit(label).as("snap"), $"cnt", $"total")
    // the pre-publish and audit views must MATERIALIZE before the
    // publish flips default resolution
    val pre = snap("a_pre_publish", None).localCheckpoint()
    val audit = snap("b_audit_staged", Some(staged)).localCheckpoint()
    s.sql(s"CALL graft.wap_publish('$out', 'batch42')").collect()
    pre.unionByName(audit)
      .unionByName(snap("c_published", None))
      .orderBy($"snap")
  }

  /** POSITION-DELETE deletion vectors — merge-on-read for KEYLESS
    * tables ([[graft.sources.GraftStorage.deleteVersionedMorPos]]):
    * `delete_mode=merge-on-read` WITHOUT a `mor_key` routes SQL
    * DELETE to a (file, row-position) DV materialized from the
    * scan's `_metadata` columns — O(matched rows) write cost with NO
    * identifier contract, duplicate rows delete exactly as matched
    * (Iceberg's position-delete form; the keyed DV is the equality-
    * delete form). Readers anti-join on (file, position); compaction
    * and apply_deletes fold the DVs away.
    */
  def sqlDeleteMorPos(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sql_delete_mor_pos")
    val st = graft.sources.GraftStorage(s)
    graft.sources.GraftCatalog.register(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    // KEYLESS: (l_orderkey, l_quantity) has genuine duplicates —
    // no column identifies a row, the shape key-based DVs cannot serve
    st.writeVersioned(T.t(s, dir, "lineitem")
      .filter($"l_orderkey" % 7 < 2)
      .select($"l_orderkey", $"l_quantity").repartition(4), out)
    st.setTableProperty(out, "delete_mode", "merge-on-read")
    s.sql(s"DELETE FROM graft.`$out` WHERE l_quantity < 10")
    // the delete was merge-on-read: a DV commit, zero files rewritten
    require(st.hasDeletionVectors(out),
      "keyless MoR DELETE must commit a position DV")
    s.sql(
      s"""SELECT CAST(l_orderkey % 5 AS BIGINT) AS grp,
         |  COUNT(*) AS cnt, ${T.sqlDsum("l_quantity")} AS qty
         |FROM graft.`$out`
         |GROUP BY l_orderkey % 5
         |ORDER BY grp""".stripMargin)
  }

  /** ALTER TABLE RENAME/DROP COLUMN — METADATA-ONLY schema evolution
    * via column mapping ([[graft.sources.GraftStorage
    * .renameColumnVersioned]]): the manifest's `N` line binds logical
    * names to the files' stable physical names, so a rename moves
    * zero bytes at any table size, pre-rename files read correctly
    * under the new name, a drop hides stored data without rewrite,
    * and appends after the rename translate back to the physical
    * schema. Reads through the SQL catalog resolve via the analyzer
    * rule's V1 projected plan; time travel keeps each version's own
    * names (the spec pins that). Iceberg column-ids / Delta
    * name-mapping, expressed over the schema-in-log.
    */
  def sqlAlterRename(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sql_alter_rename")
    val st = graft.sources.GraftStorage(s)
    graft.sources.GraftCatalog.register(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.filter($"o_orderkey" % 2 === 0), out)
    // metadata-only DDL: rename a column, drop another
    s.sql(s"ALTER TABLE graft.`$out` RENAME COLUMN o_totalprice TO price")
    s.sql(s"ALTER TABLE graft.`$out` DROP COLUMN o_orderstatus")
    // appends arrive in the NEW logical schema and translate back to
    // the files' physical names
    st.writeVersioned(T.t(s, dir, "orders")
      .filter($"o_orderkey" % 2 === 1)
      .select($"o_orderkey", ($"o_totalprice" + 1000.0).as("price")),
      out, append = true)
    s.sql(
      s"""SELECT CAST(o_orderkey % 3 AS BIGINT) AS grp,
         |  COUNT(*) AS cnt, ${T.sqlDsum("price")} AS total
         |FROM graft.`$out`
         |GROUP BY o_orderkey % 3
         |ORDER BY grp""".stripMargin)
  }

  /** WRITABLE BRANCH — write-audit-publish at COMMIT-SEQUENCE scale
    * ([[graft.sources.GraftStorage.branchAppend]]): a multi-commit
    * ingest stages on a named branch (additions-only deltas in
    * `_branchlog/`, invisible to default readers), main keeps taking
    * unrelated commits concurrently, the audit reads the BRANCH
    * state, and `branchPublish` fast-forwards the sequence into main
    * — each replayed commit byte-identical to what a serial append
    * would have published. Iceberg's branch-write / Delta's
    * shadow-table pattern; the reference's analogue is the
    * temp-parts → validate → splice publish of BamSink.java:82-138.
    */
  def sinkVersionedBranchWrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_branch_write")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.filter($"o_orderkey" % 3 === 0), out)
    st.branchVersion(out, "ingest")
    // two branch commits…
    st.branchAppend(base.filter($"o_orderkey" % 3 === 1), out, "ingest")
    // …with a CONCURRENT main commit interleaved mid-sequence (no
    // WAP-style table lock: main and the branch advance independently)
    st.writeVersioned(base.filter($"o_orderkey" % 3 === 2 &&
      $"o_orderkey" % 5 === 0), out, append = true)
    st.branchAppend(base.filter($"o_orderkey" % 3 === 2 &&
      $"o_orderkey" % 5 =!= 0), out, "ingest")
    def snap(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(lit(label).as("snap"), $"cnt", $"total")
    // main never saw the branch's rows; the audit sees base + branch
    val preMain = snap("a_main_pre",
      st.readVersioned(out)).localCheckpoint()
    val audit = snap("b_branch_audit",
      st.readVersionedBranch(out, "ingest")).localCheckpoint()
    st.branchPublish(out, "ingest")
    // published = main's own commits + the branch sequence, complete
    preMain.unionByName(audit)
      .unionByName(snap("c_published", st.readVersioned(out)))
      .orderBy($"snap")
  }

  /** Named refs as a SQL read surface: tag the bootstrap snapshot,
    * keep ingesting, and read BOTH worlds in one query —
    * `graft_ref('/t','gold')` resolves the tag's pinned version
    * (pruned read) while the plain read follows the advancing head.
    * A tag is the retention/reproducibility contract: vacuum pins
    * it, and a 100 TB training run can name the exact snapshot it
    * consumed. The `graft_refs` TVF lists the pointers metadata-rate.
    */
  def sqlRefRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sql_ref_read")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base, out, append = false,
      statsCols = Seq("o_orderkey"))
    st.tagVersion(out, "gold")
    st.writeVersioned(base.filter($"o_orderkey" % 7 === 0), out,
      append = true, statsCols = Seq("o_orderkey"))
    val nRefs = s.sql(s"SELECT COUNT(*) FROM graft_refs('$out')")
      .head().getLong(0)
    require(nRefs == 1, s"expected one ref, got $nRefs")
    s.sql(
      s"""SELECT 'a_tag_gold' AS snap, COUNT(*) AS cnt,
         |  ${T.sqlDsum("o_totalprice")} AS total
         |FROM graft_ref('$out', 'gold')
         |UNION ALL
         |SELECT 'b_latest', COUNT(*),
         |  ${T.sqlDsum("o_totalprice")}
         |FROM graft_versioned('$out')
         |ORDER BY snap""".stripMargin)
  }

  /** Metadata-rate COUNT(*): each commit logs its files' footer row
    * counts (`R` manifest lines), so `countVersioned` — and the
    * `graft_count('/t')` TVF — answer from manifest sums without
    * reading a data byte, per version. The query takes the fast path
    * at v0/v1 (all files carry counts) and the scan fallback after a
    * merge-on-read delete, proving both give the same answer — the
    * invariant that makes the fast path trustworthy.
    */
  def sinkVersionedCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_count")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders").select($"o_orderkey", $"o_orderstatus")
    st.writeVersioned(base, out)
    st.writeVersioned(base.filter($"o_orderkey" % 10 === 0), out,
      append = true)
    st.deleteVersionedMor(out, $"o_orderkey" % 100 === 7, "o_orderkey")
    Seq(
      ("v0_meta", st.countVersioned(out, Some(0))),
      ("v1_meta", st.countVersioned(out, Some(1))),
      ("v1_sql", s.sql(s"SELECT * FROM graft_count('$out', 1)")
        .collect()(0).getLong(0)),
      ("v2_mor_scan", st.countVersioned(out, Some(2))))
      .toDF("metric", "cnt").orderBy($"metric")
  }

  /** SCHEMA EVOLUTION through the versioned log: each commit records
    * its own schema as an `H` manifest line, and readers merge the
    * lines by name — KBs of metadata — instead of opening parquet
    * footers (`mergeSchema`'s per-file cost, the wrong shape at 100 TB
    * file counts). An append may add columns; files from
    * pre-evolution commits surface them as NULLs. Time travel keeps
    * each version's OWN schema: v0 reads with 2 columns, latest with
    * 3 — the query proves both widths and the null fill, and the
    * oracle replays the censuses from orders.
    */
  def sinkVersionedEvolve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_evolve")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    st.writeVersioned(base, out)
    // evolved append: adds o_note
    st.writeVersioned(
      T.t(s, dir, "orders")
        .filter($"o_orderkey" % 10 === 0)
        .select($"o_orderkey", $"o_totalprice",
          concat(lit("n"), ($"o_orderkey" % 7).cast("string"))
            .as("o_note")),
      out, append = true)
    def census(v: Long): DataFrame = {
      val df = st.readVersioned(out, Some(v))
      df.agg(count(lit(1)).as("n_rows"),
        lit(df.columns.length.toLong).as("n_cols"),
        (if (df.columns.contains("o_note"))
          count($"o_note") else lit(0L)).as("n_notes"))
        .select(lit(v).as("version"), $"n_rows", $"n_cols", $"n_notes")
    }
    census(0).unionByName(census(1)).orderBy($"version")
  }

  /** SQL time travel — the versioned format surfaced to pure-SQL
    * users through the injected `graft_versioned(path[, version])`
    * table function ([[graft.GraftExtensions]]): version pinning
    * happens at ANALYSIS time by manifest resolve, so each TVF
    * reference is an independent snapshot relation and one statement
    * can join a table to its own past (the audit/drift query shape).
    * The oracle replays both snapshots from orders, certifying that
    * SQL-surface time travel reads exactly what the API surface
    * wrote.
    */
  def sqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sql_time_travel")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
    st.writeVersioned(base, out)
    st.writeVersioned(base.filter($"o_orderkey" % 10 === 0), out,
      append = true)
    s.sql(
      s"""SELECT v1.o_orderpriority,
         |  v1.cnt AS cnt_v1, v0.cnt AS cnt_v0,
         |  v1.total AS total_v1
         |FROM (SELECT o_orderpriority, COUNT(*) AS cnt,
         |        ${T.sqlDsum("o_totalprice")} AS total
         |      FROM graft_versioned('$out', 1)
         |      GROUP BY o_orderpriority) v1
         |JOIN (SELECT o_orderpriority, COUNT(*) AS cnt
         |      FROM graft_versioned('$out', 0)
         |      GROUP BY o_orderpriority) v0
         |  ON v1.o_orderpriority = v0.o_orderpriority
         |ORDER BY v1.o_orderpriority""".stripMargin)
  }

  /** Compaction commit on a versioned table: v0 = 8-file write, v1 =
    * append, v2 = OPTIMIZE (2 files). The query reads v1 and v2 —
    * identical aggregates prove the rewrite lossless; StorageSpec
    * pins the file-count drop and v0/v1 history intactness.
    */
  def sinkVersionedCompact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_compact")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    st.writeVersioned(base.repartition(8), out)
    st.writeVersioned(base.filter($"o_orderkey" % 10 === 0), out,
      append = true)
    st.compactVersioned(out, targetFiles = 2)
    def snap(v: Long): DataFrame =
      st.readVersioned(out, Some(v))
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(lit(v).as("version"), $"cnt", $"total")
    snap(1).unionByName(snap(2)).orderBy($"version")
  }

  /** Row-level DELETE on a versioned table (copy-on-write commit,
    * `GraftStorage.deleteVersioned`). v0 = orders range-clustered into
    * 8 files; the delete predicate (`o_orderkey < 1000`) lives in 1–2
    * of them, so only those are rewritten — the other files carry
    * into v1's manifest verbatim (StorageSpec pins the carried-file
    * count). The query reads BOTH versions: v0 still shows the
    * deleted rows (time travel), v1 shows the survivors.
    */
  def sinkVersionedDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_delete")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    st.deleteVersioned(out, $"o_orderkey" < 1000)
    def snap(v: Long): DataFrame =
      st.readVersioned(out, Some(v))
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(lit(v).as("version"), $"cnt", $"total")
    snap(0).unionByName(snap(1)).orderBy($"version")
  }

  /** DELETE as MERGE-ON-READ (deletion vector): v1 deletes the same
    * slice sink_versioned_delete rewrites, but by committing only the
    * deleted KEYS — every data file carries verbatim (StorageSpec
    * pins the zero-rewrite half), and the reader anti-joins the
    * broadcast DV away. v2 then compacts (REORG APPLY DELETES) and
    * must read identically to v1 — DV applied lazily or materialized
    * is the same snapshot, which is exactly what the oracle checks.
    */
  def sinkVersionedDeleteMor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_delete_mor")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    st.deleteVersionedMor(out, $"o_orderkey" < 1000, "o_orderkey")
    st.compactVersioned(out)
    def snap(v: Long): DataFrame =
      st.readVersioned(out, Some(v))
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
        .select(lit(v).as("version"), $"cnt", $"total")
    snap(0).unionByName(snap(1)).unionByName(snap(2))
      .orderBy($"version")
  }

  /** Manifest-level data skipping (stats-in-log): v0 commits 8
    * range-disjoint files WITH per-file o_orderkey stats, v1 appends
    * a stats-less slice; the pruned snapshot read plans only the
    * files whose recorded [min,max] can match the pushed filter plus
    * (conservatively) every stats-less file. StorageSpec pins the
    * numFiles gate; here the oracle certifies the ANSWER is complete
    * across the stats/stats-less mix — skipping must never change
    * results.
    */
  def sinkVersionedPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_pruned")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out,
      append = false, statsCols = Seq("o_orderkey"))
    st.writeVersioned(base.filter($"o_orderkey" % 10 === 0), out,
      append = true)
    st.readVersionedPruned(out)
      .filter($"o_orderkey" < 1000)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** Row-level UPDATE, same copy-on-write machinery: matching rows get
    * `o_orderstatus = 'X'` and doubled price inside rewritten files;
    * non-matching rows in those files and all untouched files are
    * byte-identical carries. The aggregate over v1 proves exactly the
    * matched slice changed.
    */
  def sinkVersionedUpdate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_update")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    st.updateVersioned(out, $"o_orderkey" < 1000,
      Map("o_orderstatus" -> lit("X"),
        "o_totalprice" -> $"o_totalprice" * 2))
    st.readVersioned(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** MERGE INTO on a versioned table: one copy-on-write commit applies
    * updates (matched keys replaced) and inserts (new keys appended)
    * — the sink_upsert workload, but with snapshot isolation: v0
    * still reads the pre-merge rows, and only files holding matched
    * keys were rewritten.
    */
  def sinkVersionedMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_merge")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    val updates = base.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", lit("X").as("o_orderstatus"),
        ($"o_totalprice" * 2).as("o_totalprice"))
      .union(base.filter($"o_orderkey" % 97 === 0)
        .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice")))
    st.mergeVersioned(out, updates, "o_orderkey")
    st.readVersioned(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** The MERGE-ON-READ upsert (`mergeVersionedMor`): the same merged
    * state as [[sinkVersionedMerge]], reached as ONE O(delta) commit —
    * a deletion vector of the upserted keys plus fresh files, zero
    * pre-existing files rewritten (the CoW variant rewrites every
    * file holding a matched key). The read applies the DV anti join;
    * the sequence rule keeps the commit's own rows alive. The 100 TB
    * CDC-apply shape: write cost tracks the update batch, not the
    * table.
    */
  def sinkVersionedMergeMor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_merge_mor")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    val updates = base.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", lit("X").as("o_orderstatus"),
        ($"o_totalprice" * 2).as("o_totalprice"))
      .union(base.filter($"o_orderkey" % 97 === 0)
        .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice")))
    st.mergeVersionedMor(out, updates, "o_orderkey")
    st.readVersioned(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** CDC over a versioned table: v0 = base orders, v1 = copy-on-write
    * UPDATE (keys < 1000 restatused + repriced), v2 = copy-on-write
    * DELETE (every 50th key). `changesVersioned(0, 2)` reads ONLY the
    * churned files yet equals the global snapshot diff: updates show
    * as delete pre-image + insert post-image, deletes as deletes. The
    * query aggregates the change feed by (change type, status).
    */
  def sinkVersionedChanges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_changes")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    st.updateVersioned(out, $"o_orderkey" < 1000,
      Map("o_orderstatus" -> lit("X"),
        "o_totalprice" -> $"o_totalprice" * 2))
    st.deleteVersioned(out, $"o_orderkey" % 50 === 0)
    st.changesVersioned(out, 0, 2)
      .groupBy($"_change_type", $"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"_change_type", $"o_orderstatus")
  }

  /** VACUUM on a versioned table: after a delete (v1) and a compaction
    * (v2), `vacuumVersioned(keepLast = 1)` physically drops every file
    * only v0/v1 referenced — history is gone, the live snapshot reads
    * byte-identically. The query proves the post-vacuum read intact;
    * StorageSpec pins the file deletions and the failed time travel.
    */
  def sinkVersionedVacuum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_vacuum")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    st.deleteVersioned(out, $"o_orderkey" < 1000)
    st.compactVersioned(out, targetFiles = 2)
    st.vacuumVersioned(out, keepLast = 1)
    st.readVersioned(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** Column MASKING on write — the governance sink: PII columns leave
    * the pipeline as deterministic SHA-256 digests, so the masked
    * table stays joinable/groupable on the digest (same input ⇒ same
    * mask, enforced by the oracle hashing every row) while the
    * cleartext never lands on disk. Pure codegen'd map stage; at
    * 100 TB masking rides the write with zero extra passes.
    */
  def sinkMasked(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_masked")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    T.t(s, dir, "customer")
      .select($"c_custkey", sha2($"c_name", 256).as("name_mask"),
        $"c_mktsegment")
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy($"c_custkey")
  }

  /** CDC-driven INCREMENTAL aggregate maintenance: a summary built
    * over v0 is brought to the v2 state by applying ONLY the change
    * feed — inserts add, deletes subtract (updates arrive as the
    * delete+insert pair, so they net out correctly) — never
    * rescanning the table. Count deltas are ±1 sums; value deltas
    * accumulate in exact DECIMAL so increment-then-cast equals
    * direct-aggregate-then-cast bit-for-bit. At 100 TB this is the
    * MV-refresh path where the fact table is mutable: cost scales
    * with churn (the CDC read), not table size. The oracle aggregates
    * the v2 state directly — incremental ≡ direct is the whole claim.
    */
  def mvCdcRefresh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val out = T.scratch(dir, "mv_cdc_refresh")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    st.writeVersioned(base.repartitionByRange(8, $"o_orderkey"), out)
    val dec = $"o_totalprice".cast(DecimalType(18, 2))
    val mv0 = st.readVersioned(out, Some(0))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt0"), sum(dec).as("tot0"))
    st.updateVersioned(out, $"o_orderkey" < 1000,
      Map("o_orderstatus" -> lit("X"),
        "o_totalprice" -> $"o_totalprice" * 2))
    st.deleteVersioned(out, $"o_orderkey" % 50 === 0)
    val delta = st.changesVersioned(out, 0, 2)
      .withColumn("sgn", when($"_change_type" === "insert", 1L)
        .otherwise(-1L))
      .groupBy($"o_orderstatus")
      .agg(sum($"sgn").as("dcnt"), sum($"sgn" * dec).as("dtot"))
    mv0.join(delta, Seq("o_orderstatus"), "full_outer")
      .select($"o_orderstatus",
        (coalesce($"cnt0", lit(0L)) + coalesce($"dcnt", lit(0L))).as("cnt"),
        (coalesce($"tot0", lit(0).cast(DecimalType(18, 2))) +
          coalesce($"dtot", lit(0).cast(DecimalType(18, 2))))
          .cast("double").as("total"))
      .filter($"cnt" > 0)
      .orderBy($"o_orderstatus")
  }

  /** OPTIMIZE ZORDER on a versioned table: v0 lands orders in a
    * random 8-file layout; `optimizeVersioned` republishes the live
    * snapshot clustered on the interleaved (o_custkey, o_totalprice)
    * z-value. The query reads the optimized snapshot under a 2-D
    * filter — lossless rewrite, and StorageSpec pins that every file
    * now spans a narrow range in BOTH dimensions (the property that
    * makes multi-column pruning work at 100 TB).
    */
  def sinkVersionedZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_versioned_zorder")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    st.writeVersioned(base.repartition(8), out)
    st.optimizeVersioned(out, Seq("o_custkey", "o_totalprice"))
    st.readVersioned(out)
      .filter($"o_custkey" < 300 && $"o_totalprice" < 100000.0)
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
  }

  /** Schema evolution across versioned commits: v1 appends files
    * carrying a column v0 never had (`o_orderpriority`); a mergeSchema
    * time-travel read resolves the union schema with NULLs for the
    * old files — additive evolution with zero rewrites of existing
    * data.
    */
  def sinkSchemaEvolve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_schema_evolve")
    val st = graft.sources.GraftStorage(s)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
    st.writeVersioned(
      base.select($"o_orderkey", $"o_totalprice"), out)
    st.writeVersioned(
      base.filter($"o_orderkey" % 10 === 0)
        .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
          $"o_totalprice", $"o_orderpriority"),
      out, append = true)
    st.readVersioned(out, mergeSchema = true)
      .groupBy(coalesce($"o_orderpriority", lit("-")).as("prio_bucket"))
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"prio_bucket")
      .limit(20)
  }

  /** The registered-sink front door: `df.write.format("graft")` with
    * clusterBy/zone options resolves to `GraftStorage.writeIndexed`
    * (range-clustered files + `_zonemap` sidecar), and the re-read
    * goes back through `format("graft")` so the round trip exercises
    * both halves of the GraftSource registration. The re-read filter
    * prunes files through the sidecar (StorageSpec gates the plan).
    */
  def sinkGraftFormat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sink_graft_format_orders")
    T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .write.format("graft").mode("overwrite")
      .option("clusterBy", "o_orderkey")
      .option("zone", "o_orderkey")
      .save(out)
    s.read.format("graft").load(out)
      .filter($"o_orderkey".between(1000, 3000))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_graft_format" -> (sinkGraftFormat(_, _)),
    "sink_upsert" -> (sinkUpsert(_, _)),
    "sink_clone" -> (sinkClone(_, _)),
    "sink_versioned" -> (sinkVersioned(_, _)),
    "sink_versioned_constraint" -> (sinkVersionedConstraint(_, _)),
    "sink_versioned_evolve" -> (sinkVersionedEvolve(_, _)),
    "sink_versioned_count" -> (sinkVersionedCount(_, _)),
    "sink_versioned_restore" -> (sinkVersionedRestore(_, _)),
    "sink_versioned_wap" -> (sinkVersionedWap(_, _)),
    "sink_versioned_branch_write" -> (sinkVersionedBranchWrite(_, _)),
    "sql_alter_rename" -> (sqlAlterRename(_, _)),
    "sql_delete_mor_pos" -> (sqlDeleteMorPos(_, _)),
    "sink_versioned_bloom" -> (sinkVersionedBloom(_, _)),
    "sink_versioned_concurrent" -> (sinkVersionedConcurrent(_, _)),
    "sql_time_travel" -> (sqlTimeTravel(_, _)),
    "sql_ref_read" -> (sqlRefRead(_, _)),
    "sink_versioned_compact" -> (sinkVersionedCompact(_, _)),
    "sink_versioned_delete" -> (sinkVersionedDelete(_, _)),
    "sink_versioned_delete_mor" -> (sinkVersionedDeleteMor(_, _)),
    "sink_versioned_pruned" -> (sinkVersionedPruned(_, _)),
    "sink_versioned_update" -> (sinkVersionedUpdate(_, _)),
    "sink_versioned_merge" -> (sinkVersionedMerge(_, _)),
    "sink_versioned_merge_mor" -> (sinkVersionedMergeMor(_, _)),
    "sink_versioned_changes" -> (sinkVersionedChanges(_, _)),
    "sink_versioned_vacuum" -> (sinkVersionedVacuum(_, _)),
    "sink_versioned_zorder" -> (sinkVersionedZorder(_, _)),
    "mv_cdc_refresh" -> (mvCdcRefresh(_, _)),
    "sink_masked" -> (sinkMasked(_, _)),
    "sink_schema_evolve" -> (sinkSchemaEvolve(_, _)),
    "sink_sharded" -> (sinkSharded(_, _)),
    "sink_single" -> (sinkSingle(_, _)),
    "sink_single_merged" -> (sinkSingleMerged(_, _)),
    "sink_single_parquet" -> (sinkSingleParquet(_, _)),
    "sink_single_bgzf" -> (sinkSingleBgzf(_, _)),
    "sink_compacted" -> (sinkCompacted(_, _)),
    "sink_partitioned" -> (sinkPartitioned(_, _)),
    "sink_overwrite" -> (sinkOverwrite(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "sink_single_bgzf" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sink_graft_format" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // v1 (= orders + key%10 slice) and its compacted rewrite v2 must
    // aggregate identically
    "sink_versioned_compact" ->
      s"""SELECT version, cnt, total FROM (
         |  SELECT CAST(1 AS BIGINT) AS version, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM (SELECT o_totalprice FROM orders
         |        UNION ALL
         |        SELECT o_totalprice FROM orders WHERE o_orderkey % 10 = 0)
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), COUNT(*),
         |    ${sqlDsum("o_totalprice")}
         |  FROM (SELECT o_totalprice FROM orders
         |        UNION ALL
         |        SELECT o_totalprice FROM orders WHERE o_orderkey % 10 = 0))
         |ORDER BY version""".stripMargin,
    // MERGE = the upsert workload through one copy-on-write commit;
    // the merged state is identical to sink_upsert's
    "sink_versioned_merge" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |upd AS (
         |  SELECT o_orderkey, 'X' AS o_orderstatus,
         |    o_totalprice * 2 AS o_totalprice
         |  FROM base WHERE o_orderkey % 7 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, 'N', 1.0
         |  FROM base WHERE o_orderkey % 97 = 0),
         |merged AS (
         |  SELECT * FROM upd
         |  UNION ALL
         |  SELECT * FROM base
         |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
         |SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // MoR MERGE = the identical upsert state (delta commit, DV read)
    "sink_versioned_merge_mor" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |upd AS (
         |  SELECT o_orderkey, 'X' AS o_orderstatus,
         |    o_totalprice * 2 AS o_totalprice
         |  FROM base WHERE o_orderkey % 7 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, 'N', 1.0
         |  FROM base WHERE o_orderkey % 97 = 0),
         |merged AS (
         |  SELECT * FROM upd
         |  UNION ALL
         |  SELECT * FROM base
         |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
         |SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // change feed = global multiset diff of the v0 and v2 snapshots
    // (updates appear as delete pre-image + insert post-image)
    "sink_versioned_changes" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |v2 AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey < 1000 THEN 'X'
         |         ELSE o_orderstatus END AS o_orderstatus,
         |    CASE WHEN o_orderkey < 1000 THEN o_totalprice * 2
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM base WHERE o_orderkey % 50 <> 0),
         |chg AS (
         |  SELECT *, 'insert' AS _change_type
         |  FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM base)
         |  UNION ALL
         |  SELECT *, 'delete' AS _change_type
         |  FROM (SELECT * FROM base EXCEPT ALL SELECT * FROM v2))
         |SELECT _change_type, o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM chg GROUP BY _change_type, o_orderstatus
         |ORDER BY _change_type, o_orderstatus""".stripMargin,
    // deterministic digest parity: both engines hash every row
    "sink_masked" ->
      """SELECT c_custkey, sha256(c_name) AS name_mask, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // incremental-by-CDC equals the direct aggregate of the v2 state
    "mv_cdc_refresh" ->
      s"""WITH v2 AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey < 1000 THEN 'X'
         |         ELSE o_orderstatus END AS o_orderstatus,
         |    CASE WHEN o_orderkey < 1000 THEN o_totalprice * 2
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM orders WHERE o_orderkey % 50 <> 0)
         |SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM v2 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // z-order optimize is a lossless rewrite: filtered agg unchanged
    "sink_versioned_zorder" ->
      s"""SELECT COUNT(*) AS cnt, ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |WHERE o_custkey < 300 AND o_totalprice < 100000.0""".stripMargin,
    // post-vacuum live snapshot = the delete survivors
    "sink_versioned_vacuum" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders WHERE o_orderkey >= 1000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // v0 = full orders; v1 = copy-on-write delete of o_orderkey < 1000
    "sink_versioned_delete" ->
      s"""SELECT version, cnt, total FROM (
         |  SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders
         |  UNION ALL
         |  SELECT CAST(1 AS BIGINT), COUNT(*),
         |    ${sqlDsum("o_totalprice")}
         |  FROM orders WHERE NOT (o_orderkey < 1000))
         |ORDER BY version""".stripMargin,
    // merge-on-read delete: v1 (DV applied at read) and v2 (compacted)
    // must be the same snapshot
    "sink_versioned_delete_mor" ->
      s"""SELECT version, cnt, total FROM (
         |  SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders
         |  UNION ALL
         |  SELECT CAST(1 AS BIGINT), COUNT(*),
         |    ${sqlDsum("o_totalprice")}
         |  FROM orders WHERE NOT (o_orderkey < 1000)
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), COUNT(*),
         |    ${sqlDsum("o_totalprice")}
         |  FROM orders WHERE NOT (o_orderkey < 1000))
         |ORDER BY version""".stripMargin,
    // stats-in-log pruned read over v0 (full, stats) + v1 append
    // (key%10 slice, no stats)
    "sink_versioned_pruned" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM (
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderkey < 1000
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders
         |  WHERE o_orderkey % 10 = 0 AND o_orderkey < 1000)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // copy-on-write update: matched rows get status X and doubled price
    "sink_versioned_update" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM (
         |  SELECT CASE WHEN o_orderkey < 1000 THEN 'X'
         |              ELSE o_orderstatus END AS o_orderstatus,
         |         CASE WHEN o_orderkey < 1000 THEN o_totalprice * 2
         |              ELSE o_totalprice END AS o_totalprice
         |  FROM orders)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // v0 = (key, price); v1 appends files that also carry o_orderpriority —
    // mergeSchema read NULLs the old files' missing column
    "sink_schema_evolve" ->
      s"""SELECT prio_bucket, cnt, total FROM (
         |  SELECT COALESCE(o_orderpriority, '-') AS prio_bucket,
         |    COUNT(*) AS cnt, ${sqlDsum("o_totalprice")} AS total
         |  FROM (
         |    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
         |    FROM orders
         |    UNION ALL
         |    SELECT o_orderkey + 10000000, o_totalprice, o_orderpriority
         |    FROM orders WHERE o_orderkey % 10 = 0)
         |  GROUP BY 1)
         |ORDER BY prio_bucket LIMIT 20""".stripMargin,
    // v0 = orders, v1 = orders + the key%10 slice appended
    "sink_clone" ->
      s"""SELECT snap, cnt, total FROM (
         |  SELECT 'clone_v0' AS snap, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders
         |  UNION ALL
         |  SELECT 'clone_v1', COUNT(*), ${sqlDsum("o_totalprice")}
         |  FROM (SELECT o_totalprice FROM orders
         |        UNION ALL
         |        SELECT o_totalprice FROM orders WHERE o_orderkey % 10 = 0)
         |  UNION ALL
         |  SELECT 'src_latest', COUNT(*), ${sqlDsum("o_totalprice")}
         |  FROM orders)
         |ORDER BY snap""".stripMargin,
    "sink_versioned_concurrent" ->
      s"""-- the 7 mod-7 slices (v0 + six racing appends) tile orders
         |SELECT COUNT(*) AS n_rows,
         |  ${sqlDsum("o_totalprice")} AS total,
         |  CAST(7 AS BIGINT) AS n_versions
         |FROM orders""".stripMargin,
    "sink_versioned_bloom" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_custkey = 7
        |ORDER BY o_orderkey""".stripMargin,
    "sql_ref_read" ->
      s"""SELECT snap, cnt, total FROM (
         |  SELECT 'a_tag_gold' AS snap, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders
         |  UNION ALL
         |  SELECT 'b_latest', COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM (SELECT o_totalprice FROM orders
         |        UNION ALL
         |        SELECT o_totalprice FROM orders
         |        WHERE o_orderkey % 7 = 0))
         |ORDER BY snap""".stripMargin,
    "sink_versioned_wap" ->
      s"""SELECT snap, cnt, total FROM (
         |  SELECT 'a_pre_publish' AS snap, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders WHERE o_orderkey % 2 = 0
         |  UNION ALL
         |  SELECT 'b_audit_staged', COUNT(*),
         |    ${sqlDsum("o_totalprice")} FROM orders
         |  UNION ALL
         |  SELECT 'c_published', COUNT(*),
         |    ${sqlDsum("o_totalprice")} FROM orders)
         |ORDER BY snap""".stripMargin,
    "sql_delete_mor_pos" ->
      s"""SELECT CAST(l_orderkey % 5 AS BIGINT) AS grp,
         |  COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS qty
         |FROM lineitem
         |WHERE l_orderkey % 7 < 2 AND NOT (l_quantity < 10)
         |GROUP BY l_orderkey % 5
         |ORDER BY grp""".stripMargin,
    "sql_alter_rename" ->
      s"""SELECT CAST(o_orderkey % 3 AS BIGINT) AS grp,
         |  COUNT(*) AS cnt, ${sqlDsum("price")} AS total
         |FROM (
         |  SELECT o_orderkey, o_totalprice AS price FROM orders
         |  WHERE o_orderkey % 2 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_totalprice + 1000.0 FROM orders
         |  WHERE o_orderkey % 2 = 1)
         |GROUP BY o_orderkey % 3
         |ORDER BY grp""".stripMargin,
    "sink_versioned_branch_write" ->
      s"""SELECT snap, cnt, total FROM (
         |  SELECT 'a_main_pre' AS snap, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders WHERE o_orderkey % 3 = 0
         |    OR (o_orderkey % 3 = 2 AND o_orderkey % 5 = 0)
         |  UNION ALL
         |  SELECT 'b_branch_audit', COUNT(*),
         |    ${sqlDsum("o_totalprice")} FROM orders
         |  WHERE o_orderkey % 3 = 0 OR o_orderkey % 3 = 1
         |    OR (o_orderkey % 3 = 2 AND o_orderkey % 5 <> 0)
         |  UNION ALL
         |  SELECT 'c_published', COUNT(*),
         |    ${sqlDsum("o_totalprice")} FROM orders)
         |ORDER BY snap""".stripMargin,
    "sink_versioned_restore" ->
      """SELECT version, cnt FROM (
        |  SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS cnt FROM orders
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 2 * COUNT(*) FROM orders
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), COUNT(*) FROM orders)
        |ORDER BY version""".stripMargin,
    "sink_versioned_count" ->
      """SELECT metric, cnt FROM (
        |  SELECT 'v0_meta' AS metric, COUNT(*) AS cnt FROM orders
        |  UNION ALL
        |  SELECT 'v1_meta',
        |    (SELECT COUNT(*) FROM orders) +
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0)
        |  UNION ALL
        |  SELECT 'v1_sql',
        |    (SELECT COUNT(*) FROM orders) +
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0)
        |  UNION ALL
        |  -- keys =7 (mod 100) are never =0 (mod 10), so each deleted
        |  -- key had exactly one copy in the snapshot
        |  SELECT 'v2_mor_scan',
        |    (SELECT COUNT(*) FROM orders) +
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0) -
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 100 = 7))
        |ORDER BY metric""".stripMargin,
    "sink_versioned_evolve" ->
      """SELECT version, n_rows, n_cols, n_notes FROM (
        |  SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_rows,
        |    CAST(2 AS BIGINT) AS n_cols, CAST(0 AS BIGINT) AS n_notes
        |  FROM orders
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT),
        |    (SELECT COUNT(*) FROM orders) +
        |      (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0),
        |    CAST(3 AS BIGINT),
        |    (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 0))
        |ORDER BY version""".stripMargin,
    "sink_versioned_constraint" ->
      """SELECT metric, v FROM (
        |  -- v0 = orders, rejected dirty batch contributes nothing,
        |  -- v1 = the 2 clean dirty-batch rows (null-custkey row
        |  -- passes ANSI CHECK and the 40.0 row is clean)
        |  SELECT 'final_rows' AS metric, COUNT(*) + 2 AS v FROM orders
        |  UNION ALL SELECT 'rejected_has_key', 1
        |  UNION ALL SELECT 'rejected_positive_price', 2
        |  UNION ALL SELECT 'versions', 2)
        |ORDER BY metric""".stripMargin,
    "sink_versioned" ->
      s"""SELECT version, cnt, total FROM (
         |  SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS cnt,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders
         |  UNION ALL
         |  SELECT CAST(1 AS BIGINT), COUNT(*),
         |    ${sqlDsum("o_totalprice")}
         |  FROM (SELECT o_totalprice FROM orders
         |        UNION ALL
         |        SELECT o_totalprice FROM orders WHERE o_orderkey % 10 = 0))
         |ORDER BY version""".stripMargin,
    "sql_time_travel" ->
      s"""SELECT v1.o_orderpriority,
         |  v1.cnt AS cnt_v1, v0.cnt AS cnt_v0,
         |  v1.total AS total_v1
         |FROM (SELECT o_orderpriority, COUNT(*) AS cnt,
         |        ${sqlDsum("o_totalprice")} AS total
         |      FROM (SELECT o_orderpriority, o_totalprice FROM orders
         |            UNION ALL
         |            SELECT o_orderpriority, o_totalprice FROM orders
         |            WHERE o_orderkey % 10 = 0)
         |      GROUP BY o_orderpriority) v1
         |JOIN (SELECT o_orderpriority, COUNT(*) AS cnt
         |      FROM orders
         |      GROUP BY o_orderpriority) v0
         |  ON v1.o_orderpriority = v0.o_orderpriority
         |ORDER BY v1.o_orderpriority""".stripMargin,
    "sink_upsert" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |upd AS (
         |  SELECT o_orderkey, 'X' AS o_orderstatus,
         |    o_totalprice * 2 AS o_totalprice
         |  FROM base WHERE o_orderkey % 7 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, 'N', 1.0
         |  FROM base WHERE o_orderkey % 97 = 0),
         |merged AS (
         |  SELECT * FROM upd
         |  UNION ALL
         |  SELECT * FROM base
         |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd))
         |SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sink_sharded" ->
      s"""SELECT l_linestatus, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "sink_single" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "sink_single_merged" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' ORDER BY o_orderkey""".stripMargin,
    "sink_single_parquet" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderstatus = 'P' ORDER BY o_orderkey""".stripMargin,
    "sink_compacted" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sink_partitioned" ->
      s"""SELECT event_type, COUNT(*) AS cnt, ${sqlDsum("value", 6)} AS sum_value
         |FROM events WHERE event_type IN ('purchase', 'signup')
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sink_overwrite" ->
      s"""SELECT COUNT(*) AS cnt, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin)
}
