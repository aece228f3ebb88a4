package graft.operators

import graft.{QueryModule, T}
import graft.T.{dsum, sqlDsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan / source operators — SURVEY.md §2.1-2.2 (S1-S10, P1-P4).
  *
  * The reference's splittable scans (BamSource.java:70-215,
  * VcfSource.java:114-150) map to Spark's parquet source: row groups
  * are the splittable container, footer stats replace the .sbi/.tbi
  * index pruning, and Catalyst column pruning replaces lazy decode
  * (AbstractSamSource.java:90). Each query here demonstrates one scan
  * capability with a DuckDB-checkable result.
  */
object Scans extends QueryModule {

  /** S1 flagship: scan → pushed filter → partial+final agg. The disq
    * read path (HtsjdkReadsRddStorage.read, §3.1) in Spark-native
    * form; also the Bench headline (TPC-H Q1 shape).
    */
  def scanReads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1) - $"l_discount").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** S4 analogue: scan rows with a nested/JSON payload column and
    * project typed fields out (VcfSource decode, VcfSource.java:136-148
    * — INFO/genotypes → events.props JSON).
    */
  def scanVariants(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.events(s, dir)
      .filter($"event_type" === "purchase")
      .select(
        $"event_id",
        $"user_id",
        get_json_object($"props", "$.k").cast(IntegerType).as("k_val"))
      .orderBy($"event_id")
  }

  /** S5: directory-of-files scan = ordered UNION ALL of same-schema
    * files (README.md:85-95). Writes a sharded copy then re-reads the
    * directory as one table.
    */
  private def multifileFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "multifile_lineitem") { out =>
      T.t(s, dir, "lineitem")
        .repartition(8)
        .write.mode("overwrite").parquet(out)
    }

  def scanMultifileUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = multifileFixture(s, dir)
    s.read.parquet(out)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** S3: text scan with header skip (SamSource.java:98 filters `@`
    * lines). CSV round-trip: write with header, read it back skipping
    * the header via the csv source.
    */
  private def csvFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "orders_csv") { out =>
      import s.implicits._
      T.t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .write.mode("overwrite").option("header", "true").csv(out)
    }

  def scanTextSkipHeader(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = csvFixture(s, dir)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    s.read.option("header", "true").schema(schema).csv(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** P4: column projection pruned at the scan (lazy decode,
    * AbstractSamSource.java:90 → Catalyst SchemaPruning). The plan's
    * ReadSchema carries only 3 of 11 lineitem columns.
    */
  def projectPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .filter($"l_orderkey" % 500 === 0)
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** S9/S10: index-driven split pruning → parquet row-group stats
    * pruning over data sort-clustered on the predicate column
    * (BamSource.java:99-119 SBI chunk lookup). Writes lineitem
    * range-clustered by l_shipdate, then reads a narrow date range:
    * non-matching row groups are skipped via min/max stats.
    */
  private def clusteredFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "lineitem_clustered") { out =>
      import s.implicits._
      T.t(s, dir, "lineitem")
        .repartitionByRange(16, $"l_shipdate")
        .sortWithinPartitions($"l_shipdate")
        .write.mode("overwrite").parquet(out)
    }

  def pruneByStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = clusteredFixture(s, dir)
    s.read.parquet(out)
      .filter($"l_shipdate".between(
        lit("1996-01-01").cast(TimestampType),
        lit("1996-03-31").cast(TimestampType)))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** S9/S10 index-driven split pruning, made explicit: write lineitem
    * through the zone-map-indexed sink (per-file min/max sidecar — the
    * SBI analogue), read back through the index so the driver plans
    * the scan over only the files overlapping the date range. Same
    * answer as a full scan + filter (pruning is transparent);
    * StorageSpec asserts the file-count reduction.
    */
  private def zonemapFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "lineitem_zonemapped") { out =>
      graft.sources.GraftStorage(s)
        .writeIndexed(T.t(s, dir, "lineitem"), out, "l_shipdate", "l_shipdate")
    }

  def pruneZonemap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = zonemapFixture(s, dir)
    val st = graft.sources.GraftStorage(s)
    st.readIndexed(out, "l_shipdate",
      java.sql.Timestamp.valueOf("1996-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("1996-03-31 00:00:00"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** S9/S10 index-driven split pruning, PLAN-TIME: same zone-map
    * sidecar, but pruning runs inside a custom `FileIndex` fed by the
    * data filters Catalyst pushes to the scan (ZoneMapFileIndex) — the
    * getSplits-time pruning of the reference
    * (TribbleIndexIntervalFilteringTextInputFormat.java:59-92) rather
    * than readIndexed's eager driver collect. The query states ONE
    * plain `.filter`; file pruning and the row filter both derive
    * from it.
    */
  // byte-identical to zonemapFixture (same writeIndexed call), so the
  // plan-time consumers simply share it — a second full sort + write +
  // zonemap pass over lineitem bought nothing
  private def zonemapPlannedFixture(s: SparkSession, dir: String): String =
    zonemapFixture(s, dir)

  def pruneZonemapPlanned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = zonemapPlannedFixture(s, dir)
    val st = graft.sources.GraftStorage(s)
    st.readPruned(out)
      .filter($"l_shipdate".between(
        lit("1997-01-01").cast(TimestampType),
        lit("1997-03-31").cast(TimestampType)))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** DERIVED-expression pruning: `year(l_shipdate) = 1996` against
    * the date-clustered table prunes files through the zone map even
    * though no raw column comparison exists in the query — the
    * FileIndex maps the file's [min,max] through any MONOTONE
    * non-decreasing wrapper (year, trunc, date_trunc, monotone
    * casts) and reuses the bounds logic. The everyday dashboard
    * predicate shape that normally defeats min/max skipping.
    * StorageSpec asserts the file count; same answer as a full scan.
    */
  def pruneZonemapYear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = zonemapPlannedFixture(s, dir)
    graft.sources.GraftStorage(s).readPruned(out)
      .filter(year($"l_shipdate") === 1996)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  private def zorderFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "lineitem_zordered") { out =>
      graft.sources.GraftStorage(s).writeZOrdered(
        T.t(s, dir, "lineitem"), out, Seq("l_shipdate", "l_orderkey"))
    }

  /** S9/S10 pruning in TWO dimensions: lineitem clustered on the
    * z-curve over (l_shipdate, l_orderkey) via
    * `GraftStorage.writeZOrdered`, then read through the plan-time
    * zone-map index with a filter on BOTH columns — either predicate
    * alone already prunes files (StorageSpec asserts the per-
    * dimension file counts), which single-column range clustering
    * cannot do. Same answer as a full scan + filter.
    */
  def pruneZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = zorderFixture(s, dir)
    graft.sources.GraftStorage(s).readPruned(out)
      .filter($"l_shipdate".between(
        lit("1996-01-01").cast(TimestampType),
        lit("1996-06-30").cast(TimestampType)) &&
        $"l_orderkey" < 2000)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** S9/S10 pruning for POINT lookups: lineitem hash-partitioned on
    * l_partkey (each key lives in exactly one file) with a per-file
    * Bloom-filter sidecar (`GraftStorage.buildBloomIndex`) — the
    * key→files index zone maps can't provide on a column the layout
    * isn't range-clustered on. The plan-time FileIndex drops every
    * file whose Bloom rejects the looked-up keys (no false negatives
    * ⇒ still exact); StorageSpec asserts the file-count reduction.
    */
  private def bloomFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "lineitem_bloomed") { out =>
      import s.implicits._
      T.t(s, dir, "lineitem")
        .repartition(16, $"l_partkey")
        .write.mode("overwrite").parquet(out)
      graft.sources.GraftStorage(s).buildBloomIndex(out, Seq("l_partkey"))
    }

  def pruneBloom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = bloomFixture(s, dir)
    graft.sources.GraftStorage(s).readPruned(out)
      .filter($"l_partkey".isin(100, 500, 900))
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_partkey")
  }

  /** Full-text point lookup through a TOKENIZED Bloom sidecar — the
    * inverted-index-lite: `buildTokenBloomIndex` blooms each file's
    * token set; a rare-token search
    * (`array_contains(split(text,' '), w)`) then reads only the files
    * whose Bloom admits `w` (no false negatives ⇒ exact). At 100 TB
    * this is the difference between a full-corpus scan and a handful
    * of files for needle queries; StorageSpec pins the file-count
    * reduction and the lazy sidecar consult.
    */
  private val RareToken = "zzzgraftrarezzz"
  private val RareDoc = (9000001L, s"the $RareToken marker doc")

  private def tokenBloomFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "documents_token_bloomed") { out =>
      import s.implicits._
      T.t(s, dir, "documents")
        .repartition(8)
        .write.mode("overwrite").parquet(out)
      // one extra file carrying the needle — 8 haystack files + 1 hit
      Seq(RareDoc).toDF("doc_id", "text")
        .select($"doc_id", $"text", lit("en").as("lang"),
          lit("planted").as("source"),
          length($"text").cast("long").as("n_chars"))
        .write.mode("append").parquet(out)
      graft.sources.GraftStorage(s).buildTokenBloomIndex(out, Seq("text"))
    }

  def pruneTextTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = tokenBloomFixture(s, dir)
    graft.sources.GraftStorage(s).readPruned(out)
      .filter(array_contains(split($"text", " "), RareToken))
      .select($"doc_id", $"text", $"source")
      .orderBy($"doc_id")
  }

  /** The registered-source front door: `spark.read.format("graft")`
    * resolves the SAME plan as `GraftStorage.readPruned` — vectorized
    * parquet scan under the zone-map FileIndex — through Spark's own
    * source registry (GraftSource via DataSourceRegister), the API
    * shape of the reference's storage builder. Same oracle family as
    * prune_zonemap_planned over a different date range; PlanQualitySpec
    * asserts the file pruning survives the format() indirection.
    */
  def scanGraftFormat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = zonemapPlannedFixture(s, dir)
    s.read.format("graft").load(out)
      .filter($"l_shipdate".between(
        lit("1997-07-01").cast(TimestampType),
        lit("1997-09-30").cast(TimestampType)))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** SQL DDL front door: `CREATE TABLE … USING graft` registers the
    * zonemap-sidecar'd table in the catalog, and plain `spark.sql`
    * SELECTs run against it — the format plugs into Spark's DDL
    * surface via DataSourceRegister (shortName "graft"), so a SQL-only
    * user gets sidecar pruning with no Scala API in sight. ScanSpec
    * gates that the pruned file count through the DDL route matches
    * the programmatic readPruned route.
    */
  def sqlDdlGraft(s: SparkSession, dir: String): DataFrame = {
    val out = zonemapPlannedFixture(s, dir)
    s.sql("DROP TABLE IF EXISTS g_lineitem_ddl")
    s.sql(s"CREATE TABLE g_lineitem_ddl USING graft OPTIONS (path '$out')")
    s.sql(
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_price
        |FROM g_lineitem_ddl
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01'
        |  AND TIMESTAMP '1996-03-31'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** SQL write path: `INSERT INTO` a graft catalog table. The V1
    * relation resolves to the underlying HadoopFsRelation, so Spark
    * plans its native InsertIntoHadoopFsRelationCommand — a fully
    * parallel parquet append into the table directory, with the
    * catalog cache refreshed in the same command. Files appended this
    * way are initially OUTSIDE any `_zonemap` sidecar: the FileIndex
    * keeps unknown files conservatively (results stay exact, pruning
    * power decays) until `buildZoneMap`/`refreshBloomIndex` re-covers
    * them — StorageSpec pins both halves of that contract.
    */
  def sqlInsertGraft(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "sql_insert_graft")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val base = T.t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    base.filter($"o_orderkey" % 2 === 0)
      .write.format("graft").mode("overwrite").save(out)
    base.filter($"o_orderkey" % 2 === 1)
      .createOrReplaceTempView("g_orders_ins_src")
    s.sql("DROP TABLE IF EXISTS g_orders_ins")
    s.sql(s"CREATE TABLE g_orders_ins USING graft OPTIONS (path '$out')")
    s.sql("INSERT INTO g_orders_ins SELECT * FROM g_orders_ins_src")
    s.sql(
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DOUBLE) AS total
        |FROM g_orders_ins
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** F5: validation-stringency gate → csv mode=DROPMALFORMED. Writes
    * good rows + injected garbage lines, reads back dropping the bad
    * ones (HtsjdkReadsRddStorage.java:85-88 LENIENT ≈ drop).
    */
  private def badlinesFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "orders_badlines") { out =>
      import s.implicits._
      val good = T.t(s, dir, "orders")
        .select(concat_ws(",", $"o_orderkey", $"o_totalprice").as("value"))
      val bad = s.createDataset(Seq(
        "not,a,number,row", "garbage", ",,", "x,y", "1e309,nope"))
        .toDF("value")
      good.union(bad).write.mode("overwrite").text(out)
    }

  def parseBadrecords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = badlinesFixture(s, dir)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType)))
    s.read.schema(schema).option("mode", "DROPMALFORMED").csv(out)
      .filter($"o_orderkey".isNotNull && $"o_totalprice".isNotNull)
      .agg(count(lit(1)).as("n_good"), dsum($"o_totalprice").as("total"))
  }

  /** P2: text line → typed record parse (SAMLineParser.parseLine,
    * SamSource.java:82-103): split a formatted string column into
    * typed fields, no UDF — pure codegen'd expressions.
    */
  def parseProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "customer")
      .select(
        $"c_custkey",
        split($"c_name", "#").getItem(0).as("prefix"),
        split($"c_name", "#").getItem(1).cast(LongType).as("parsed_id"),
        (split($"c_name", "#").getItem(1).cast(LongType) === $"c_custkey")
          .as("id_ok"))
      .orderBy($"c_custkey")
  }

  /** S4 codec breadth: JSON-lines source round trip (the pluggable
    * text-codec family — VcfSource's per-line codec decode becomes
    * the built-in json datasource with an explicit schema).
    */
  private def jsonFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "events_json") { out =>
      import s.implicits._
      T.events(s, dir)
        .select($"event_id", $"user_id", $"event_type", $"value")
        .write.mode("overwrite").json(out)
    }

  def scanJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = jsonFixture(s, dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    s.read.schema(schema).json(out)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"), dsum($"value", 6).as("sum_value"))
      .orderBy($"event_type")
  }

  /** S4/K7 compressed-text path: gzip-compressed CSV parts — like the
    * reference's true-gzip VCFs, each file is unsplittable (one task
    * per file), so parallelism = file count; written sharded for that
    * reason.
    */
  private def gzipFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "orders_csv_gz") { out =>
      import s.implicits._
      T.t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .repartition(4)
        .write.mode("overwrite").option("compression", "gzip").csv(out)
    }

  def scanTextGzip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = gzipFixture(s, dir)
    s.read.schema(gzOrdersSchema).csv(out)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  private val gzOrdersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderpriority", StringType),
    StructField("o_totalprice", DoubleType)))

  /** K7 recipe: DECOMPRESS-ONCE ingestion of unsplittable gzip text
    * into splittable parquet (`GraftStorage.ingestGzipText`) — the
    * columnar answer to the reference's BGZF block framing
    * (BGZFEnhancedGzipCodec.java:63-102): instead of making the gzip
    * stream seekable, pay the per-file decompression wall exactly
    * once; every later read splits, prunes columns, and pushes
    * filters. The query aggregates THROUGH the ingested table, so the
    * oracle certifies the whole recipe end-to-end.
    */
  private def gzipIngestFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "orders_gz_ingested") { out =>
      graft.sources.GraftStorage(s)
        .ingestGzipText(gzipFixture(s, dir), out, gzOrdersSchema)
    }

  def ingestGzipParquet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = gzipIngestFixture(s, dir)
    s.read.parquet(out)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  /** S7/S8/K7 — SPLITTABLE compressed text: the same orders lines as
    * the gzip fixture, but framed as BGZF (blocked gzip,
    * `GraftStorage.writeBgzfText`), read back split-parallel through
    * the distributed block-chain index + exactly-once line semantics
    * (`readBgzfLines`) — the reference's defining capability
    * (BGZFCodec.java:54-101, BgzfBlockGuesser) rebuilt Spark-first:
    * one fat shard fans out to as many tasks as the split target
    * allows, where plain .gz pins it to one. 4 KiB blocks so even the
    * sf0.001 fixture demonstrably splits.
    */
  private def bgzfFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "orders_csv_bgzf") { out =>
      import s.implicits._
      graft.sources.GraftStorage(s).writeBgzfText(
        T.t(s, dir, "orders")
          .select(concat_ws(",", $"o_orderkey", $"o_orderpriority",
            $"o_totalprice").as("value"))
          .repartition(4),
        out, blockInput = 4 * 1024)
    }

  def scanTextBgzf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = bgzfFixture(s, dir)
    val lines = graft.sources.GraftStorage(s)
      .readBgzfLines(out, targetSplitBytes = 16 * 1024)
    s.read.schema(gzOrdersSchema).csv(lines)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  /** S7 content-sniffed `.gz` — the reference's
    * BGZFEnhancedGzipCodec.java:63-102 case: BGZF is valid gzip and
    * producers ship it under a misleading `.gz` extension, so the
    * reader must dispatch on CONTENT per file. The fixture is one
    * directory holding BOTH kinds — even-orderkey lines BGZF-framed
    * but renamed `.gz`, odd-orderkey lines true single-member gzip —
    * and `readGzTextSniffed` must split the first kind while giving
    * the second file-grain tasks, with the union covering orders
    * exactly once (the oracle certifies that).
    */
  private def gzSniffFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "orders_gz_mixed") { out =>
      import s.implicits._
      import org.apache.hadoop.fs.Path
      val lines = T.t(s, dir, "orders")
        .select($"o_orderkey",
          concat_ws(",", $"o_orderkey", $"o_orderpriority",
            $"o_totalprice").as("value"))
      val evenTmp = out + ".bgzf_tmp"
      val oddTmp = out + ".gz_tmp"
      graft.sources.GraftStorage(s).writeBgzfText(
        lines.filter($"o_orderkey" % 2 === 0).select($"value")
          .repartition(2),
        evenTmp, blockInput = 4 * 1024)
      lines.filter($"o_orderkey" % 2 === 1).select($"value")
        .repartition(2)
        .write.mode("overwrite").option("compression", "gzip").text(oddTmp)
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new Path(out).getFileSystem(conf)
      // builders must be idempotent ON DISK (ensure dedups per JVM,
      // not across JVMs) — spark part names are unique per run, so
      // renaming into a surviving dir would accumulate duplicates
      fs.delete(new Path(out), true)
      fs.mkdirs(new Path(out))
      def moveIn(tmp: String, suffix: String, rename: String => String): Unit = {
        fs.listStatus(new Path(tmp)).toSeq
          .filter(f => f.isFile && f.getLen > 0 &&
            f.getPath.getName.endsWith(suffix) &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .foreach { f =>
            fs.rename(f.getPath,
              new Path(out, rename(f.getPath.getName))): Unit
          }
        fs.delete(new Path(tmp), true): Unit
      }
      // BGZF shards take the misleading plain-gz name
      moveIn(evenTmp, ".bgz", n => "bgzf-" + n.stripSuffix(".bgz") + ".gz")
      moveIn(oddTmp, ".gz", n => "plain-" + n)
    }

  def scanTextGzSniff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = gzSniffFixture(s, dir)
    val lines = graft.sources.GraftStorage(s)
      .readGzTextSniffed(out, targetSplitBytes = 16 * 1024)
    s.read.schema(gzOrdersSchema).csv(lines)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderpriority")
  }

  /** S4 columnar breadth: ORC source round trip — the second
    * stats-indexed columnar container Spark ships (stripe/row-group
    * min-max indexes play the parquet-footer role). Pushdown +
    * pruning semantics carry over unchanged, which is the point: the
    * engine's operators are container-agnostic the way the
    * reference's are format-dispatched (AnySamSource.java:55-76).
    */
  private def orcFixture(s: SparkSession, dir: String): String =
    graft.Fixtures.ensure(dir, "supplier_orc") { out =>
      import s.implicits._
      T.t(s, dir, "supplier").write.mode("overwrite").orc(out)
    }

  def scanOrc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = orcFixture(s, dir)
    s.read.orc(out)
      .filter($"s_acctbal" > 0)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("cnt"), dsum($"s_acctbal").as("sum_bal"))
      .orderBy($"s_nationkey")
  }

  override def prepare(s: SparkSession, dir: String): Unit = {
    multifileFixture(s, dir); csvFixture(s, dir); clusteredFixture(s, dir)
    zonemapFixture(s, dir); tokenBloomFixture(s, dir)
    badlinesFixture(s, dir); jsonFixture(s, dir); gzipFixture(s, dir)
    zorderFixture(s, dir); orcFixture(s, dir); bloomFixture(s, dir)
    gzipIngestFixture(s, dir); bgzfFixture(s, dir); gzSniffFixture(s, dir)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_reads" -> (scanReads(_, _)),
    "scan_graft_format" -> (scanGraftFormat(_, _)),
    "sql_ddl_graft" -> (sqlDdlGraft(_, _)),
    "sql_insert_graft" -> (sqlInsertGraft(_, _)),
    "scan_json" -> (scanJson(_, _)),
    "scan_orc" -> (scanOrc(_, _)),
    "scan_text_gzip" -> (scanTextGzip(_, _)),
    "ingest_gzip_parquet" -> (ingestGzipParquet(_, _)),
    "scan_text_bgzf" -> (scanTextBgzf(_, _)),
    "scan_text_gz_sniff" -> (scanTextGzSniff(_, _)),
    "parse_project" -> (parseProject(_, _)),
    "scan_variants" -> (scanVariants(_, _)),
    "scan_multifile_union" -> (scanMultifileUnion(_, _)),
    "scan_text_skip_header" -> (scanTextSkipHeader(_, _)),
    "project_prune" -> (projectPrune(_, _)),
    "prune_by_stats" -> (pruneByStats(_, _)),
    "prune_zonemap" -> (pruneZonemap(_, _)),
    "prune_bloom" -> (pruneBloom(_, _)),
    "prune_text_tokens" -> (pruneTextTokens(_, _)),
    "prune_zorder" -> (pruneZorder(_, _)),
    "prune_zonemap_planned" -> (pruneZonemapPlanned(_, _)),
    "prune_zonemap_year" -> (pruneZonemapYear(_, _)),
    "parse_badrecords" -> (parseBadrecords(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "scan_json" ->
      s"""SELECT event_type, COUNT(*) AS cnt, ${sqlDsum("value", 6)} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "scan_text_gzip" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "ingest_gzip_parquet" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "scan_text_bgzf" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "scan_text_gz_sniff" ->
      s"""SELECT o_orderpriority, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "scan_orc" ->
      s"""SELECT s_nationkey, COUNT(*) AS cnt,
         |  ${sqlDsum("s_acctbal")} AS sum_bal
         |FROM supplier WHERE s_acctbal > 0
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "parse_project" ->
      """SELECT c_custkey,
        |  string_split(c_name, '#')[1] AS prefix,
        |  CAST(string_split(c_name, '#')[2] AS BIGINT) AS parsed_id,
        |  CAST(string_split(c_name, '#')[2] AS BIGINT) = c_custkey AS id_ok
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scan_reads" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
         |    AS sum_disc_price,
         |  COUNT(*) AS cnt
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "scan_variants" ->
      """SELECT event_id, user_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "scan_multifile_union" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "scan_text_skip_header" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "project_prune" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_orderkey % 500 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "prune_by_stats" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "prune_zonemap" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "parse_badrecords" ->
      s"""SELECT COUNT(*) AS n_good, ${sqlDsum("o_totalprice")} AS total
         |FROM orders""".stripMargin,
    "prune_zorder" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-06-30'
         |  AND l_orderkey < 2000
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "prune_bloom" ->
      s"""SELECT l_partkey, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem WHERE l_partkey IN (100, 500, 900)
         |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    // the needle lives only in the planted row (base docs can't
    // contain it), so the fixture-independent oracle is the union of
    // the base-table search (provably empty) and the literal plant
    "prune_text_tokens" ->
      s"""SELECT doc_id, text, source FROM (
         |  SELECT doc_id, text, source FROM documents
         |  WHERE list_contains(string_split(text, ' '), '${RareToken}')
         |  UNION ALL
         |  SELECT CAST(${RareDoc._1} AS BIGINT) AS doc_id,
         |    '${RareDoc._2}' AS text, 'planted' AS source)
         |ORDER BY doc_id""".stripMargin,
    "sql_insert_graft" ->
      s"""SELECT o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,
    "sql_ddl_graft" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "scan_graft_format" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1997-07-01' AND TIMESTAMP '1997-09-30'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "prune_zonemap_planned" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-03-31'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "prune_zonemap_year" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE year(l_shipdate) = 1996
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
