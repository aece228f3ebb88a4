package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** ADD COLUMN with DEFAULT — initial-default semantics (Iceberg v3 /
  * Spark EXISTS_DEFAULT): a metadata-only H-line commit after which
  * every stored row that LACKS the column reads the default through
  * the vectorized reader, with zero rewrite. Documented choices:
  * the default keys off column ABSENCE in the stored file (an
  * explicitly stored NULL reads NULL; a post-ADD subset-schema
  * append reads the default — Spark's existence-default contract);
  * TIME TRAVEL to a pre-ADD version shows no column at all (each
  * version owns its schema), never a null-fill.
  */
class DefaultsSpec extends AnyFunSuite {
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

  private def withDefault(name: String, dt: DataType,
      sql: String): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder()
        .putString("CURRENT_DEFAULT", sql)
        .putString("EXISTS_DEFAULT", sql).build())

  test("initial default: pre-ADD files read the default with zero " +
    "rewrite; stored NULLs stay NULL; absent-column appends default") {
    val out = fresh("default_initial")
    st.writeVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(2), out)                                     // v0
    val files0 = st.manifestFiles(out, 0).toSet
    val v1 = st.addColumnsVersioned(out, StructType(Seq(
      withDefault("pri", IntegerType, "7"),
      withDefault("tag", StringType, "'std'"))))
    assert(st.manifestFiles(out, v1).toSet == files0,
      "ADD COLUMN DEFAULT must move zero data files")
    // pre-ADD rows read the defaults (vectorized per-file fill)
    val got = st.readVersioned(out).orderBy($"k")
      .select($"k", $"pri", $"tag").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSeq == Seq((1L, 7, "std"), (2L, 7, "std")))
    // post-ADD append with explicit values incl. a stored NULL
    st.writeVersioned(Seq((3L, "c", java.lang.Integer.valueOf(3), "hot"),
      (4L, "d", null.asInstanceOf[java.lang.Integer], "none"))
      .toDF("k", "v", "pri", "tag"), out, append = true)
    // post-ADD append that OMITS the new columns: the stored file
    // lacks them, so the existence default applies (documented)
    st.writeVersioned(Seq((5L, "e")).toDF("k", "v"), out,
      append = true)
    val all = st.readVersioned(out).orderBy($"k")
      .select($"k", $"pri", $"tag").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getInt(1), r.getString(2)))
    assert(all.toSeq == Seq((1L, 7, "std"), (2L, 7, "std"),
      (3L, 3, "hot"), (4L, null, "none"), (5L, 7, "std")),
      all.toSeq.toString)
    // TIME TRAVEL choice: a pre-ADD version has NO column, not nulls
    assert(!st.readVersioned(out, Some(0L)).columns.contains("pri"))
    // the catalog read path (V2 scan) serves the same defaults
    val viaSql = spark.sql(
      s"SELECT sum(pri) AS s FROM graft.`$out`").head().getLong(0)
    assert(viaSql == 7 + 7 + 3 + 7, s"got $viaSql")
  }

  test("SQL surface: ADD COLUMN ... DEFAULT, INSERT with the DEFAULT " +
    "keyword, and defaults surviving later schema merges") {
    val out = fresh("default_sql")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    spark.sql(s"ALTER TABLE graft.`$out` ADD COLUMN pri INT DEFAULT 5")
    spark.sql(s"INSERT INTO graft.`$out` VALUES (2, 'b', DEFAULT)")
    spark.sql(s"INSERT INTO graft.`$out` VALUES (3, 'c', 9)")
    val got = spark.sql(
      s"SELECT k, pri FROM graft.`$out` ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 5), (2L, 5), (3L, 9)), got.toString)
    // the post-ADD appends published their own H lines WITHOUT the
    // default metadata — the merge must keep the declared default
    assert(st.readVersioned(out).schema("pri")
      .metadata.contains("EXISTS_DEFAULT"),
      "default metadata lost in the H-line merge")
  }

  test("defaults compose with widening: the folded existence value " +
    "re-reads under the widened type") {
    val out = fresh("default_widen")
    st.writeVersioned(Seq((1, "a")).toDF("k", "v"), out)
    st.addColumnsVersioned(out, StructType(Seq(
      withDefault("pri", IntegerType, "7"))))
    st.widenColumnVersioned(out, "pri", LongType)
    val got = st.readVersioned(out).select($"pri").head()
    assert(got.getLong(0) == 7L)
  }

  test("defaults compose with column mapping: renaming a defaulted " +
    "column keeps the fill; mapped tables accept defaulted adds") {
    val out = fresh("default_mapped")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    st.addColumnsVersioned(out, StructType(Seq(
      withDefault("pri", IntegerType, "7"))))
    // rename the DEFAULTED column: the mapping renames the logical
    // name, the H line keeps the physical field + its metadata
    st.renameColumnVersioned(out, "pri", "rank")
    val got = st.readVersioned(out).select($"k", $"rank").head()
    assert(got.getInt(1) == 7, "default lost across the rename")
    // a defaulted ADD on an ALREADY-mapped table
    st.renameColumnVersioned(out, "v", "label")
    st.addColumnsVersioned(out, StructType(Seq(
      withDefault("score", DoubleType, "1.5"))))
    val row = st.readVersioned(out)
      .select($"k", $"label", $"rank", $"score").head()
    assert(row.getString(1) == "a" && row.getInt(2) == 7 &&
      row.getDouble(3) == 1.5)
  }

  test("defaults flow through streaming: a raw-stream bootstrap " +
    "after ADD COLUMN DEFAULT fills pre-ADD files") {
    val out = fresh("default_stream")
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(out + "_out", out + "_ckpt").foreach(p =>
      fs.delete(new Path(p), true))
    st.writeVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), out)
    st.addColumnsVersioned(out, StructType(Seq(
      withDefault("pri", IntegerType, "7"))))
    st.writeVersioned(Seq((3L, "c", java.lang.Integer.valueOf(9)))
      .toDF("k", "v", "pri"), out, append = true)
    val q = st.streamVersioned(out).writeStream
      .option("checkpointLocation", out + "_ckpt")
      .format("parquet").option("path", out + "_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out + "_out").orderBy($"k")
      .select($"k", $"pri").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(streamed == Seq((1L, 7), (2L, 7), (3L, 9)),
      streamed.toString)
  }

  test("CREATE TABLE with DEFAULT columns: declared defaults serve " +
    "the DEFAULT keyword and column-list INSERTs from day one") {
    val out = fresh("default_create")
    spark.sql(s"CREATE TABLE graft.`$out` (k BIGINT, v STRING, " +
      "pri INT DEFAULT 7) USING graft")
    spark.sql(s"INSERT INTO graft.`$out` VALUES (1, 'a', DEFAULT)")
    // column-list INSERT omitting the defaulted column entirely
    spark.sql(s"INSERT INTO graft.`$out` (k, v) VALUES (2, 'b')")
    spark.sql(s"INSERT INTO graft.`$out` VALUES (3, 'c', 9)")
    val got = spark.sql(
      s"SELECT k, pri FROM graft.`$out` ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 7), (2L, 7), (3L, 9)), got.toString)
  }

  test("bad defaults fail the DDL loudly, not every later read") {
    val out = fresh("default_bad")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), out)
    // non-constant
    val e1 = intercept[Exception] {
      st.addColumnsVersioned(out, StructType(Seq(
        withDefault("r", DoubleType, "rand()"))))
    }
    assert(String.valueOf(e1.getMessage).nonEmpty)
    // not castable to the column type
    val e2 = intercept[Exception] {
      st.addColumnsVersioned(out, StructType(Seq(
        withDefault("n", IntegerType, "'not a number'"))))
    }
    assert(String.valueOf(e2.getMessage).nonEmpty)
    // neither bad DDL left a trace
    assert(st.readVersioned(out).columns.toSet == Set("k", "v"))
    assert(st.listVersions(out) == Seq(0L))
  }
}
