package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, GraftStorage}

/** Delta-based row-level SQL on merge-on-read tables
  * ([[graft.sources.GraftMorDeltaOperation]] — DSv2 `SupportsDelta`):
  * UPDATE / MERGE INTO / untranslatable DELETE on a
  * `delete_mode=merge-on-read` table commit ONE deletion vector +
  * fresh rows, zero existing files rewritten; results agree with the
  * copy-on-write answer on every shape.
  */
class MorDeltaSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  GraftCatalog.register(spark)
  private val st = GraftStorage(spark)

  /** All messages down the cause chain (driver commits wrap the
    * writer's exception several layers deep).
    */
  private def messages(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else String.valueOf(t.getMessage) +: messages(t.getCause)

  private def fresh(name: String): String = {
    val out = T.scratch(SF, name)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    out
  }

  /** MoR-mode table seeded from orders (4 files). */
  private def seedMor(name: String, parts: Int = 4): String = {
    val out = fresh(name)
    spark.sql(
      s"""CREATE TABLE graft.`$out`
         |(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
         | o_totalprice DOUBLE)
         |USING graft
         |TBLPROPERTIES ('delete_mode'='merge-on-read',
         |               'mor_key'='o_orderkey')""".stripMargin)
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .repartitionByRange(parts, $"o_orderkey")
    base.createOrReplaceTempView(s"mor_delta_seed_$name")
    spark.sql(
      s"INSERT INTO graft.`$out` SELECT * FROM mor_delta_seed_$name")
    out
  }

  /** Same data, copy-on-write mode — the oracle table. */
  private def seedCow(name: String): String = {
    val out = fresh(name)
    st.writeVersioned(T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .repartitionByRange(4, $"o_orderkey"), out)
    out
  }

  private def snapshotFiles(path: String): Set[String] =
    st.manifestFiles(path, st.listVersions(path).last).toSet

  test("UPDATE on a MoR table is one DV commit: zero files rewritten, " +
    "rows agree with the CoW UPDATE") {
    val mor = seedMor("mordelta_update")
    val cow = seedCow("mordelta_update_cow")
    val before = snapshotFiles(mor)
    val v0 = st.listVersions(mor).last

    val set = "SET o_totalprice = o_totalprice * 2.0"
    val where = "WHERE o_orderkey % 13 = 0"
    spark.sql(s"UPDATE graft.`$mor` $set $where")
    spark.sql(s"UPDATE graft.`$cow` $set $where")

    // exactly one new version; every pre-existing data file carried
    val v1 = st.listVersions(mor).last
    assert(v1 == v0 + 1)
    assert(before.subsetOf(snapshotFiles(mor)),
      "a MoR UPDATE must not rewrite existing files")
    assert(st.hasDeletionVectors(mor), "the commit should carry a DV")

    val got = spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq
    val want = spark.sql(s"SELECT * FROM graft.`$cow` ORDER BY o_orderkey")
      .collect().toSeq
    assert(got == want)
  }

  test("UPDATE SET on the key column is legal on the delta path " +
    "(delete old key + reinsert new row)") {
    val mor = seedMor("mordelta_update_key")
    val cow = seedCow("mordelta_update_key_cow")
    // shift a sparse slice of keys into unoccupied space
    val stmt = "SET o_orderkey = o_orderkey + 90000000 " +
      "WHERE o_orderkey % 17 = 3"
    spark.sql(s"UPDATE graft.`$mor` $stmt")
    spark.sql(s"UPDATE graft.`$cow` $stmt")
    val got = spark.sql(
      s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey, o_custkey")
      .collect().toSeq
    val want = spark.sql(
      s"SELECT * FROM graft.`$cow` ORDER BY o_orderkey, o_custkey")
      .collect().toSeq
    assert(got == want)
  }

  test("MERGE INTO upsert on a MoR table: one commit, no rewrites, " +
    "agrees with the CoW MERGE") {
    val mor = seedMor("mordelta_merge")
    val cow = seedCow("mordelta_merge_cow")
    val before = snapshotFiles(mor)
    // updates for a scattered key slice + brand-new keys
    T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .filter($"o_orderkey" % 11 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 1.0)
      .union(Seq((91000001L, 7L, "Z", 1.5),
        (91000002L, 8L, "Z", 2.5)).toDF(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
      .createOrReplaceTempView("mordelta_merge_src")
    val merge =
      """USING mordelta_merge_src s ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    spark.sql(s"MERGE INTO graft.`$mor` t $merge")
    spark.sql(s"MERGE INTO graft.`$cow` t $merge")
    assert(before.subsetOf(snapshotFiles(mor)),
      "a MoR MERGE must not rewrite existing files")
    val got = spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq
    val want = spark.sql(s"SELECT * FROM graft.`$cow` ORDER BY o_orderkey")
      .collect().toSeq
    assert(got == want)
  }

  test("MERGE WHEN MATCHED DELETE / NOT MATCHED BY SOURCE shapes run " +
    "on the delta path and agree with CoW") {
    val mor = seedMor("mordelta_merge_shapes")
    val cow = seedCow("mordelta_merge_shapes_cow")
    T.t(spark, SF, "orders").select($"o_orderkey")
      .filter($"o_orderkey" % 9 === 0)
      .createOrReplaceTempView("mordelta_shape_src")
    val merge =
      """USING mordelta_shape_src s ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND t.o_totalprice < 50000.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'""".stripMargin
    spark.sql(s"MERGE INTO graft.`$mor` t $merge")
    spark.sql(s"MERGE INTO graft.`$cow` t $merge")
    val got = spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq
    val want = spark.sql(s"SELECT * FROM graft.`$cow` ORDER BY o_orderkey")
      .collect().toSeq
    assert(got == want)
  }

  test("row-level SQL works ON a DV-carrying snapshot (stacked MoR " +
    "generations), sequence-scoped") {
    val mor = seedMor("mordelta_stacked")
    val cow = seedCow("mordelta_stacked_cow")
    // generation 1: MoR delete
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_orderkey % 7 = 0")
    spark.sql(s"DELETE FROM graft.`$cow` WHERE o_orderkey % 7 = 0")
    assert(st.hasDeletionVectors(mor))
    // generation 2: UPDATE on the DV-carrying snapshot — the exact
    // shape the group-based path refuses
    val upd = "SET o_orderstatus = 'X' WHERE o_custkey % 5 = 1"
    spark.sql(s"UPDATE graft.`$mor` $upd")
    spark.sql(s"UPDATE graft.`$cow` $upd")
    // generation 3: MERGE on the stacked snapshot, touching keys that
    // were re-inserted by the UPDATE's fresh files
    T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .filter($"o_custkey" % 5 === 1 && $"o_orderkey" % 3 === 0)
      .withColumn("o_orderstatus", lit("Y"))
      .createOrReplaceTempView("mordelta_stacked_src")
    val merge =
      """USING mordelta_stacked_src s ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    spark.sql(s"MERGE INTO graft.`$mor` t $merge")
    spark.sql(s"MERGE INTO graft.`$cow` t $merge")
    val got = spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq
    val want = spark.sql(s"SELECT * FROM graft.`$cow` ORDER BY o_orderkey")
      .collect().toSeq
    assert(got == want)
    // and both readers agree on the stacked result
    assert(got == st.readVersioned(mor).orderBy($"o_orderkey")
      .collect().toSeq)
  }

  test("DELETE with an IN-subquery (untranslatable predicate) takes " +
    "the delta path: DV only, no files moved") {
    val mor = seedMor("mordelta_del_subq")
    val before = snapshotFiles(mor)
    T.t(spark, SF, "customer").select($"c_custkey")
      .filter($"c_custkey" % 4 === 0)
      .createOrReplaceTempView("mordelta_del_keys")
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_custkey IN " +
      "(SELECT c_custkey FROM mordelta_del_keys)")
    assert(snapshotFiles(mor) == before,
      "a MoR DELETE must carry every data file verbatim")
    assert(st.hasDeletionVectors(mor))
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$mor` " +
      "WHERE o_custkey % 4 = 0").head().getLong(0) == 0L)
    // survivors intact vs the raw first version
    val want = st.readVersioned(mor, Some(st.listVersions(mor).head + 1))
      .filter($"o_custkey" % 4 =!= 0).count()
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$mor`")
      .head().getLong(0) == want)
  }

  test("a command matching nothing commits no new version") {
    val mor = seedMor("mordelta_noop")
    val v = st.listVersions(mor).last
    spark.sql(s"UPDATE graft.`$mor` SET o_orderstatus = 'Q' " +
      "WHERE o_orderkey = -1")
    assert(st.listVersions(mor).last == v,
      "an UPDATE matching no rows must not advance the log")
  }

  test("NULL key in matched rows is refused loudly") {
    val mor = fresh("mordelta_nullkey")
    spark.sql(
      s"""CREATE TABLE graft.`$mor` (k BIGINT, v STRING) USING graft
         |TBLPROPERTIES ('delete_mode'='merge-on-read','mor_key'='k')
         |""".stripMargin)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .createOrReplaceTempView("mordelta_null_seed")
    spark.sql(s"INSERT INTO graft.`$mor` SELECT * FROM mordelta_null_seed")
    // the mor_key column is declared NON-NULL (identifier-field
    // rule), so the SQL surface refuses the NULL at insert time
    val ein = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$mor` SELECT CAST(NULL AS BIGINT), 'n'")
    }
    assert(messages(ein).exists(m =>
      m.toUpperCase.contains("NULL")), s"unexpected: ${messages(ein)}")
    // Scala-API appends enforce the same identifier contract (a
    // stored NULL under a non-null declared column would read back as
    // garbage once codegen elides the null checks)
    import org.apache.spark.sql.types._
    val sneaky = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(null, "n")),
      StructType(Seq(StructField("k", LongType, nullable = true),
        StructField("v", StringType, nullable = true))))
    val v = st.listVersions(mor).last
    val e = intercept[IllegalArgumentException] {
      st.writeVersioned(sneaky, mor, append = true)
    }
    assert(messages(e).exists(_.contains("NULL")),
      s"unexpected error: ${messages(e)}")
    assert(st.listVersions(mor).last == v, "refused append must not land")
    // and an append whose schema LACKS the key column is refused too
    val e2 = intercept[IllegalArgumentException] {
      st.writeVersioned(Seq("x").toDF("v"), mor, append = true)
    }
    assert(messages(e2).exists(_.contains("lacks the key column")),
      s"unexpected error: ${messages(e2)}")
  }

  test("identifier contract on the OVERWRITE path and on the " +
    "property flip: stored NULL keys can never meet a non-null " +
    "declared schema") {
    val mor = fresh("mordelta_nullflip")
    spark.sql(
      s"""CREATE TABLE graft.`$mor` (k BIGINT, v STRING) USING graft
         |TBLPROPERTIES ('delete_mode'='merge-on-read','mor_key'='k')
         |""".stripMargin)
    Seq((1L, "a")).toDF("k", "v")
      .createOrReplaceTempView("mordelta_flip_seed")
    spark.sql(s"INSERT INTO graft.`$mor` SELECT * FROM mordelta_flip_seed")
    import org.apache.spark.sql.types._
    val nulled = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(null, "n")),
      StructType(Seq(StructField("k", LongType, nullable = true),
        StructField("v", StringType, nullable = true))))
    // a Scala OVERWRITE is gated like the append
    val e = intercept[IllegalArgumentException] {
      st.writeVersioned(nulled, mor) // append = false
    }
    assert(messages(e).exists(_.contains("NULL")))
    // and flipping a NULL-carrying COW table into MoR mode refuses
    val cow = fresh("mordelta_flip_cow")
    st.writeVersioned(nulled, cow)
    st.setTableProperty(cow, "delete_mode", "merge-on-read")
    val e2 = intercept[IllegalArgumentException] {
      st.setTableProperty(cow, "mor_key", "k")
    }
    assert(messages(e2).exists(_.contains("NULL")),
      s"unexpected: ${messages(e2)}")
    // a clean table flips fine, in either property order
    val ok = fresh("mordelta_flip_ok")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), ok)
    st.setTableProperty(ok, "mor_key", "k")
    st.setTableProperty(ok, "delete_mode", "merge-on-read")
    spark.sql(s"DELETE FROM graft.`$ok` WHERE k = 1")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$ok`")
      .head().getLong(0) == 0L)
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES flips MoR mode through " +
    "SQL, with the identifier validation") {
    val t = fresh("mordelta_alter_props")
    spark.sql(s"CREATE TABLE graft.`$t` (k BIGINT, v STRING) USING graft")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("mordelta_alter_seed")
    spark.sql(s"INSERT INTO graft.`$t` SELECT * FROM mordelta_alter_seed")
    spark.sql(s"ALTER TABLE graft.`$t` SET TBLPROPERTIES " +
      "('delete_mode'='merge-on-read','mor_key'='k')")
    val before = snapshotFiles(t)
    spark.sql(s"DELETE FROM graft.`$t` WHERE k = 2")
    assert(st.hasDeletionVectors(t), "flip must route DELETE to MoR")
    assert(snapshotFiles(t) == before)
    // UNSET falls back to copy-on-write; existing DVs keep applying
    spark.sql(s"ALTER TABLE graft.`$t` UNSET TBLPROPERTIES " +
      "('delete_mode','mor_key')")
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$t`")
      .head().getLong(0) == 2L)
    st.compactVersioned(t)
    spark.sql(s"DELETE FROM graft.`$t` WHERE k = 3")
    assert(!st.hasDeletionVectors(t),
      "after UNSET a DELETE must take the copy-on-write route")
    // the flip validation rides the SQL route too: a NULL-keyed
    // table refuses merge-on-read
    val bad = fresh("mordelta_alter_bad")
    spark.sql(s"CREATE TABLE graft.`$bad` (k BIGINT, v STRING) USING graft")
    spark.sql(s"INSERT INTO graft.`$bad` SELECT CAST(NULL AS BIGINT), 'n'")
    spark.sql(s"ALTER TABLE graft.`$bad` SET TBLPROPERTIES " +
      "('delete_mode'='merge-on-read')")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$bad` SET TBLPROPERTIES " +
        "('mor_key'='k')")
    }
    assert(messages(e).exists(_.contains("NULL")),
      s"unexpected: ${messages(e)}")
  }

  test("time travel pins pre-DML snapshots; CDC sees the MoR commit " +
    "as a change commit") {
    val mor = seedMor("mordelta_travel")
    val v0 = st.listVersions(mor).last
    val n0 = st.readVersioned(mor, Some(v0)).count()
    spark.sql(s"UPDATE graft.`$mor` SET o_orderstatus = 'T' " +
      "WHERE o_orderkey % 19 = 0")
    // pre-DML version unchanged
    assert(st.readVersioned(mor, Some(v0)).count() == n0)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft_versioned('$mor', $v0) " +
        "WHERE o_orderstatus = 'T'").head().getLong(0) == 0L)
    // row count preserved by an upsert-style UPDATE
    assert(st.readVersioned(mor).count() == n0)
  }

  test("partitioned MoR table: DELETE and UPDATE both take the delta " +
    "path; fresh rows key-roll into the identity layout") {
    val mor = fresh("mordelta_part")
    spark.sql(
      s"""CREATE TABLE graft.`$mor`
         |(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
         |USING graft PARTITIONED BY (o_orderstatus)
         |TBLPROPERTIES ('delete_mode'='merge-on-read',
         |               'mor_key'='o_orderkey')""".stripMargin)
    T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .createOrReplaceTempView("mordelta_part_seed")
    spark.sql(s"INSERT INTO graft.`$mor` SELECT * FROM mordelta_part_seed")
    val before = snapshotFiles(mor)
    // subquery DELETE (hook can't take it) → delta path, files carried
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_orderkey IN " +
      s"(SELECT o_orderkey FROM mordelta_part_seed WHERE o_orderkey % 6 = 0)")
    assert(snapshotFiles(mor) == before)
    assert(st.hasDeletionVectors(mor))
    // UPDATE on the DV-carrying partitioned snapshot: one delta
    // commit, carried files, fresh rows key-rolled into the layout
    spark.sql(s"UPDATE graft.`$mor` SET o_totalprice = 0.0 " +
      "WHERE o_orderkey % 6 = 3")
    val now = snapshotFiles(mor)
    assert(before.subsetOf(now),
      "a partitioned MoR UPDATE must not rewrite existing files")
    val freshFiles = now -- before
    assert(freshFiles.nonEmpty &&
      freshFiles.forall(_.contains("__gp_o_orderstatus=")),
      s"fresh files must land in the identity layout: $freshFiles")
    // the spec line survives the delta commit
    assert(st.partitionSpec(mor, st.listVersions(mor).last).nonEmpty)
    // row-level agreement with the computed expectation
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .filter($"o_orderkey" % 6 =!= 0)
    val want = base.withColumn("o_totalprice",
      when($"o_orderkey" % 6 === 3, 0.0).otherwise($"o_totalprice"))
      .orderBy($"o_orderkey").collect().toSeq
    assert(spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq == want)
    assert(st.readVersioned(mor).orderBy($"o_orderkey")
      .collect().toSeq == want)
  }

  test("MERGE on a partitioned MoR table: inserts spread across " +
    "partitions, every fresh file key-rolled, spec intact") {
    val mor = fresh("mordelta_part_merge")
    spark.sql(
      s"""CREATE TABLE graft.`$mor`
         |(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
         |USING graft PARTITIONED BY (o_orderstatus)
         |TBLPROPERTIES ('delete_mode'='merge-on-read',
         |               'mor_key'='o_orderkey')""".stripMargin)
    T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .createOrReplaceTempView("mordelta_pm_seed")
    spark.sql(s"INSERT INTO graft.`$mor` SELECT * FROM mordelta_pm_seed")
    val before = snapshotFiles(mor)
    // matched updates keep their partition; inserts span partitions
    spark.sql(
      """SELECT o_orderkey, o_orderstatus,
        |  o_totalprice + 5.0 AS o_totalprice
        |FROM mordelta_pm_seed WHERE o_orderkey % 10 = 1
        |UNION ALL
        |SELECT o_orderkey + 95000000, o_orderstatus, 9.99
        |FROM mordelta_pm_seed WHERE o_orderkey % 50 = 2
        |""".stripMargin).createOrReplaceTempView("mordelta_pm_src")
    spark.sql(
      s"""MERGE INTO graft.`$mor` t USING mordelta_pm_src v
         |ON t.o_orderkey = v.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val now = snapshotFiles(mor)
    assert(before.subsetOf(now))
    val freshFiles = now -- before
    assert(freshFiles.forall(_.contains("__gp_o_orderstatus=")),
      s"un-rolled fresh files: ${freshFiles.filterNot(_.contains("__gp_"))}")
    assert(freshFiles.map(f =>
      f.split("__gp_o_orderstatus=")(1).split("/")(0)).size >= 2,
      "inserts should span several partitions")
    // merged state agrees with the computed expectation
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val upd = base.filter($"o_orderkey" % 10 === 1)
      .withColumn("o_totalprice", $"o_totalprice" + 5.0)
      .union(base.filter($"o_orderkey" % 50 === 2)
        .select(($"o_orderkey" + 95000000L).as("o_orderkey"),
          $"o_orderstatus", lit(9.99).as("o_totalprice")))
    val want = upd.union(base.join(upd.select($"o_orderkey"),
      Seq("o_orderkey"), "left_anti"))
      .orderBy($"o_orderkey").collect().toSeq
    assert(spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq == want)
  }

  test("sorted MoR table: the delta UPDATE enforces the sort order " +
    "and keeps the manifest's O claim") {
    val mor = fresh("mordelta_sorted")
    spark.sql(
      s"""CREATE TABLE graft.`$mor` (k BIGINT, v DOUBLE) USING graft
         |TBLPROPERTIES ('delete_mode'='merge-on-read','mor_key'='k',
         |               'sorted_by'='k')""".stripMargin)
    T.t(spark, SF, "orders")
      .select($"o_orderkey".as("k"), $"o_totalprice".as("v"))
      .createOrReplaceTempView("mordelta_sorted_seed")
    spark.sql(s"INSERT INTO graft.`$mor` SELECT * FROM mordelta_sorted_seed")
    assert(st.sortSpec(mor, st.listVersions(mor).last) == Seq("k"))
    spark.sql(s"UPDATE graft.`$mor` SET v = 0.0 WHERE k % 11 = 5")
    // the sort claim survives the delta commit (the write enforced
    // per-file ordering on the fresh rows)
    assert(st.sortSpec(mor, st.listVersions(mor).last) == Seq("k"),
      "delta UPDATE dropped the sort claim")
    // and each fresh file really is internally sorted (diff against
    // the INSERT version, not the empty CREATE version)
    val vs = st.listVersions(mor)
    val freshFiles = st.manifestFiles(mor, vs.last)
      .filterNot(st.manifestFiles(mor, vs(vs.length - 2)).toSet)
    assert(freshFiles.nonEmpty)
    freshFiles.foreach { f =>
      val ks = spark.read.parquet(f)
        .select($"k").collect().map(_.getLong(0)).toSeq
      assert(ks == ks.sorted, s"fresh delta file $f is not sorted by k")
    }
  }

  test("CHECK constraint gates the fresh rows of a MoR UPDATE") {
    val mor = seedMor("mordelta_check")
    st.addCheckConstraint(mor, "price_pos", "o_totalprice >= 0.0")
    val v = st.listVersions(mor).last
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$mor` SET o_totalprice = -1.0 " +
        "WHERE o_orderkey % 23 = 0")
    }
    assert(messages(e).exists(_.toLowerCase.contains("constraint")),
      s"unexpected error: ${messages(e)}")
    assert(st.listVersions(mor).last == v, "refused commit must not land")
  }

  test("apply_deletes rewrites ONLY the affected files and drops " +
    "every D line; re-inserted keys survive (sequence rule)") {
    val mor = seedMor("mordelta_applydel")
    // gen 1: delete a narrow key slice (affects SOME of the 4 files)
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_orderkey < 400")
    // gen 2: upsert re-inserts some of those keys — they must SURVIVE
    spark.sql(
      s"""MERGE INTO graft.`$mor` t USING
         |  (SELECT o_orderkey, 'R' AS o_orderstatus, 1.0 AS o_totalprice,
         |     CAST(1 AS BIGINT) AS o_custkey
         |   FROM mor_delta_seed_mordelta_applydel WHERE o_orderkey < 100)
         |  v ON t.o_orderkey = v.o_orderkey
         |WHEN NOT MATCHED THEN
         |  INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
         |  VALUES (v.o_orderkey, v.o_custkey, v.o_orderstatus,
         |          v.o_totalprice)""".stripMargin)
    assert(st.hasDeletionVectors(mor))
    val before = spark.sql(
      s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey").collect().toSeq
    val filesBefore = snapshotFiles(mor)
    val vNew = st.applyDeletesVersioned(mor)
    assert(vNew == st.listVersions(mor).last)
    assert(!st.hasDeletionVectors(mor), "D lines must be gone")
    // untouched files carried verbatim; something was rewritten, but
    // not everything (the delete touched a key-range slice)
    val filesAfter = snapshotFiles(mor)
    val carried = filesBefore.intersect(filesAfter)
    assert(carried.nonEmpty, "apply_deletes must carry unaffected files")
    assert(filesAfter != filesBefore, "affected files must be rewritten")
    // visible rows unchanged — including the re-inserted keys
    val after = spark.sql(
      s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey").collect().toSeq
    assert(after == before)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.`$mor` " +
      "WHERE o_orderkey < 100 AND o_orderstatus = 'R'")
      .head().getLong(0) > 0, "re-inserted keys lost")
    // the clean snapshot reads single-scan (no anti join)
    val plan = spark.sql(s"SELECT * FROM graft.`$mor`")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("LeftAnti"), plan)
  }

  test("apply_deletes with DVs that delete nothing folds to a " +
    "metadata-only commit; partitioned layout survives the rewrite") {
    // (a) metadata-only: deleteVersionedMor of keys already gone
    val mor = seedMor("mordelta_applydel_meta")
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_orderkey < 300")
    st.applyDeletesVersioned(mor)
    // the earlier DVs are applied; delete the SAME range again — the
    // new DV matches nothing
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_orderkey < 300")
    val filesBefore = snapshotFiles(mor)
    if (st.hasDeletionVectors(mor)) {
      val v0 = st.listVersions(mor).last
      st.applyDeletesVersioned(mor)
      assert(!st.hasDeletionVectors(mor))
      assert(snapshotFiles(mor) == filesBefore,
        "a no-op apply must move zero data files")
      assert(st.listVersions(mor).last == v0 + 1)
    }
    // (b) partitioned: fresh survivor files stay in the identity dirs
    val part = fresh("mordelta_applydel_part")
    spark.sql(
      s"""CREATE TABLE graft.`$part`
         |(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
         |USING graft PARTITIONED BY (o_orderstatus)
         |TBLPROPERTIES ('delete_mode'='merge-on-read',
         |               'mor_key'='o_orderkey')""".stripMargin)
    T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .createOrReplaceTempView("mordelta_adp_seed")
    spark.sql(s"INSERT INTO graft.`$part` SELECT * FROM mordelta_adp_seed")
    spark.sql(s"DELETE FROM graft.`$part` WHERE o_orderkey IN " +
      "(SELECT o_orderkey FROM mordelta_adp_seed WHERE o_orderkey % 4 = 1)")
    val want = spark.sql(
      s"SELECT * FROM graft.`$part` ORDER BY o_orderkey").collect().toSeq
    st.applyDeletesVersioned(part)
    assert(!st.hasDeletionVectors(part))
    assert(st.partitionSpec(part, st.listVersions(part).last).nonEmpty)
    assert(snapshotFiles(part).forall(_.contains("__gp_o_orderstatus=")),
      "survivor files must stay in the identity layout")
    assert(spark.sql(s"SELECT * FROM graft.`$part` ORDER BY o_orderkey")
      .collect().toSeq == want)
  }

  test("CDC over an append-shaped MoR range is O(churn) and equals " +
    "the snapshot diff; identical re-inserts surface as a pair") {
    val mor = seedMor("mordelta_cdc")
    val v0 = st.listVersions(mor).last
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_orderkey % 21 = 6")
    spark.sql(s"UPDATE graft.`$mor` SET o_totalprice = 7.5 " +
      "WHERE o_orderkey % 21 = 9")
    val v2 = st.listVersions(mor).last
    val cols = st.readVersioned(mor).columns.map(col).toIndexedSeq
    val ch = st.changesVersioned(mor, v0, v2)
    // values changed on every touched row, so the O(churn) path must
    // equal the plain snapshot diff exactly (multiset compare)
    val from = st.readVersioned(mor, Some(v0))
    val to = st.readVersioned(mor, Some(v2))
    assert(ch.filter($"_change_type" === "insert").select(cols: _*)
      .exceptAll(to.exceptAll(from)).isEmpty)
    assert(to.exceptAll(from).exceptAll(
      ch.filter($"_change_type" === "insert").select(cols: _*)).isEmpty)
    assert(ch.filter($"_change_type" === "delete").select(cols: _*)
      .exceptAll(from.exceptAll(to)).isEmpty)
    assert(from.exceptAll(to).exceptAll(
      ch.filter($"_change_type" === "delete").select(cols: _*)).isEmpty)
    // the documented CDF deviation: delete + re-insert of IDENTICAL
    // values reports the pair (the row-level change really happened)
    val one = st.readVersioned(mor).filter($"o_orderkey" % 31 === 7)
      .limit(1).collect().head
    val k = one.getLong(one.fieldIndex("o_orderkey"))
    val vPre = st.listVersions(mor).last
    spark.sql(s"DELETE FROM graft.`$mor` WHERE o_orderkey = $k")
    st.readVersioned(mor, Some(vPre)).filter($"o_orderkey" === k)
      .createOrReplaceTempView("mordelta_cdc_reinsert")
    spark.sql(s"INSERT INTO graft.`$mor` " +
      "SELECT * FROM mordelta_cdc_reinsert")
    val pair = st.changesVersioned(mor, vPre, st.listVersions(mor).last)
    assert(pair.filter($"o_orderkey" === k &&
      $"_change_type" === "delete").count() == 1L)
    assert(pair.filter($"o_orderkey" === k &&
      $"_change_type" === "insert").count() == 1L)
  }

  test("compaction folds delta-DML generations back to a clean " +
    "single-scan snapshot") {
    val mor = seedMor("mordelta_compact")
    spark.sql(s"UPDATE graft.`$mor` SET o_orderstatus = 'C' " +
      "WHERE o_orderkey % 8 = 1")
    val want = spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq
    st.compactVersioned(mor)
    assert(!st.hasDeletionVectors(mor))
    assert(spark.sql(s"SELECT * FROM graft.`$mor` ORDER BY o_orderkey")
      .collect().toSeq == want)
  }

  /** Seed a small MoR table (k BIGINT, v DOUBLE) for the race tests. */
  private def seedRace(name: String): String = {
    val out = fresh(name)
    st.writeVersioned(spark.range(0, 100)
      .select($"id".as("k"), ($"id" * 1.0).as("v")).repartition(2), out)
    st.setTableProperty(out, "delete_mode", "merge-on-read")
    st.setTableProperty(out, "mor_key", "k")
    out
  }

  /** Run `UPDATE ... SET v = <gate>(v) + 1 WHERE k < 50` in another
    * thread, execute `interleave` once the update's write tasks are
    * inside the gate (so the table provably advances between the
    * command's snapshot pin and its commit), then release and return
    * the update's outcome.
    */
  private def raceUpdate(table: String,
      interleave: () => Unit): Option[Throwable] =
    race(() => spark.sql(
      s"UPDATE graft.`$table` SET v = mordelta_gate(v) + 1 " +
        "WHERE k < 50"): Unit, interleave)

  /** Run `cmd` in another thread, execute `interleave` once the
    * command's tasks are inside the `mordelta_gate` UDF (so the
    * table provably advances between the command's snapshot pin and
    * its commit), then release and return the command's outcome.
    */
  private def race(cmd: () => Unit,
      interleave: () => Unit): Option[Throwable] = {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    MorDeltaRace.started = new CountDownLatch(1)
    MorDeltaRace.proceed = new CountDownLatch(1)
    val t = new Thread(() => {
      try cmd()
      catch { case e: Throwable => MorDeltaRace.failure = Some(e) }
    })
    MorDeltaRace.failure = None
    t.start()
    assert(MorDeltaRace.started.await(60, TimeUnit.SECONDS),
      "command never reached the gate")
    try interleave()
    finally MorDeltaRace.proceed.countDown()
    t.join(120000)
    assert(!t.isAlive, "command thread hung")
    MorDeltaRace.failure
  }

  test("optimistic rebase: an interleaved DISJOINT append and an " +
    "UPDATE both land, no manual retry") {
    val mor = seedRace("mordelta_rebase_ok")
    spark.udf.register("mordelta_gate", (x: Double) => {
      MorDeltaRace.started.countDown()
      MorDeltaRace.proceed.await(60, java.util.concurrent.TimeUnit.SECONDS)
      x
    })
    val v0 = st.listVersions(mor).last
    val err = raceUpdate(mor, () => {
      st.writeVersioned(Seq((1000L, 7.0)).toDF("k", "v"), mor,
        append = true): Unit
    })
    assert(err.isEmpty, s"update must rebase, got: $err")
    // both commits landed: append + the rebased delta
    assert(st.listVersions(mor).last == v0 + 2)
    val got = st.readVersioned(mor)
    assert(got.count() == 101)
    assert(got.filter($"k" === 1000L && $"v" === 7.0).count() == 1,
      "the interleaved append's row survives the rebased DV")
    assert(got.filter($"k" < 50).agg(sum($"v")).head().getDouble(0) ==
      (0 until 50).map(_ + 1.0).sum, "the update landed")
  }

  test("true conflicts still abort loudly: an interleaved append " +
    "RE-USING a deleted key, and an interleaved compaction") {
    val mor = seedRace("mordelta_rebase_conflict")
    spark.udf.register("mordelta_gate", (x: Double) => {
      MorDeltaRace.started.countDown()
      MorDeltaRace.proceed.await(60, java.util.concurrent.TimeUnit.SECONDS)
      x
    })
    // an appended row whose key the UPDATE deletes: rebasing would
    // delete the fresh row through the sequence rule — must abort
    val v0 = st.listVersions(mor).last
    val err = raceUpdate(mor, () => {
      st.writeVersioned(Seq((10L, 99.0)).toDF("k", "v"), mor,
        append = true): Unit
    })
    assert(err.isDefined, "overlapping append must abort the update")
    assert(messages(err.get).exists(_.contains("conflict")),
      s"unexpected: ${messages(err.get)}")
    // the table holds the append only; the update left no trace
    assert(st.listVersions(mor).last == v0 + 1)
    val got = st.readVersioned(mor)
    assert(got.count() == 101)
    assert(got.filter($"k" === 10L).agg(sum($"v")).head()
      .getDouble(0) == 10.0 + 99.0, "no update applied")
    // an interleaved COMPACTION (files removed) is a true conflict
    val mor2 = seedRace("mordelta_rebase_compact")
    val err2 = raceUpdate(mor2, () => { st.compactVersioned(mor2): Unit })
    assert(err2.isDefined && messages(err2.get)
      .exists(_.contains("conflict")), s"unexpected: $err2")
    assert(st.readVersioned(mor2).filter($"k" < 50)
      .agg(sum($"v")).head().getDouble(0) == (0 until 50).map(_.toDouble).sum)
  }

  test("optimistic rebase on the hook DV DELETE path: an interleaved " +
    "DISJOINT append and a MoR DELETE both land, no manual retry") {
    val mor = seedRace("mordelta_rebase_del_ok")
    spark.udf.register("mordelta_gate", (x: Double) => {
      MorDeltaRace.started.countDown()
      MorDeltaRace.proceed.await(60, java.util.concurrent.TimeUnit.SECONDS)
      x
    })
    val v0 = st.listVersions(mor).last
    val err = race(
      () => st.deleteVersionedMor(mor,
        expr("mordelta_gate(v) >= 0") && $"k" < 50, "k"): Unit,
      () => st.writeVersioned(Seq((1000L, 7.0)).toDF("k", "v"), mor,
        append = true): Unit)
    assert(err.isEmpty, s"the DELETE must rebase, got: $err")
    // both commits landed: append + the rebased DV delete
    assert(st.listVersions(mor).last == v0 + 2)
    val got = st.readVersioned(mor)
    assert(got.count() == 51, "100 - 50 deleted + 1 appended")
    assert(got.filter($"k" === 1000L && $"v" === 7.0).count() == 1,
      "the interleaved append's row survives the rebased DV")
    assert(got.filter($"k" < 50).count() == 0, "the delete landed")
  }

  test("hook DV DELETE: an append RE-USING a deleted key aborts " +
    "loudly; a POSITION delete rebases over any disjoint append") {
    val mor = seedRace("mordelta_rebase_del_conflict")
    spark.udf.register("mordelta_gate", (x: Double) => {
      MorDeltaRace.started.countDown()
      MorDeltaRace.proceed.await(60, java.util.concurrent.TimeUnit.SECONDS)
      x
    })
    val v0 = st.listVersions(mor).last
    val err = race(
      () => st.deleteVersionedMor(mor,
        expr("mordelta_gate(v) >= 0") && $"k" < 50, "k"): Unit,
      () => st.writeVersioned(Seq((10L, 99.0)).toDF("k", "v"), mor,
        append = true): Unit)
    assert(err.isDefined, "overlapping append must abort the delete")
    assert(messages(err.get).exists(_.contains("conflict")),
      s"unexpected: ${messages(err.get)}")
    // the table holds the append only; the delete left no trace
    assert(st.listVersions(mor).last == v0 + 1)
    assert(st.readVersioned(mor).count() == 101)
    // POSITION deletes bind to explicit base files — an interleaved
    // append (even one re-using a "deleted" key) can never overlap,
    // so the rebase lands and the appended row survives in full
    val pos = fresh("mordelta_rebase_pos")
    st.writeVersioned(spark.range(0, 100)
      .select($"id".as("k"), ($"id" * 1.0).as("v")).repartition(2), pos)
    val errP = race(
      () => st.deleteVersionedMorPos(pos,
        expr("mordelta_gate(v) >= 0") && $"k" < 50): Unit,
      () => st.writeVersioned(Seq((10L, 99.0)).toDF("k", "v"), pos,
        append = true): Unit)
    assert(errP.isEmpty, s"the position delete must rebase, got: $errP")
    val gotP = st.readVersioned(pos)
    assert(gotP.count() == 51)
    assert(gotP.filter($"k" === 10L && $"v" === 99.0).count() == 1,
      "the appended row must survive a rebased position delete")
  }

  test("property names are single path segments: a path-shaped or " +
    "all-dots name is refused by SET and UNSET alike") {
    val t = fresh("mordelta_prop_names")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), t)
    // UNSET with a traversal-shaped name must not resolve outside
    // _props (it would delete manifest files after normalization)
    for (bad <- Seq("../_manifest/v0", "..", ".", "a/b")) {
      intercept[IllegalArgumentException] {
        st.removeTableProperty(t, bad)
      }
      intercept[IllegalArgumentException] {
        st.setTableProperty(t, bad, "x")
      }
    }
    // the manifest survived the attempts
    assert(st.readVersioned(t).count() == 1L)
    // legal names still round-trip
    st.setTableProperty(t, "owner.team_1", "graft")
    assert(st.tablePropertiesOf(t).get("owner.team_1").contains("graft"))
    st.removeTableProperty(t, "owner.team_1")
    assert(!st.tablePropertiesOf(t).contains("owner.team_1"))
  }

  test("time travel to a pre-flip version keeps mor_key NULLABLE: " +
    "the flip validated only the current snapshot") {
    val t = fresh("mordelta_preflip_nulls")
    // v0 holds a NULL key — legal, the table is copy-on-write
    st.writeVersioned(
      Seq((Option(1L), "a"), (Option(2L), "b"), (Option.empty[Long], "n"))
        .toDF("k", "v"), t)
    // purge the NULL-keyed row, then flip into merge-on-read
    st.deleteVersioned(t, $"k".isNull)
    st.setTableProperty(t, "delete_mode", "merge-on-read")
    st.setTableProperty(t, "mor_key", "k")
    // current snapshot declares the identifier non-null…
    val cur = spark.sql(s"SELECT * FROM graft.`$t`")
    assert(!cur.schema("k").nullable,
      "current MoR snapshot must declare mor_key non-null")
    // …but the pre-flip snapshot holds a stored NULL: declaring
    // non-null over it is the codegen-reads-garbage hole. It must
    // stay nullable and read the NULL row faithfully.
    val old = spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 0")
    assert(old.schema("k").nullable,
      "pre-flip time travel must not declare non-null over stored NULLs")
    assert(old.filter($"k".isNull).count() == 1L)
    assert(old.count() == 3L)
  }

  test("delta row-level commits restate zone/bloom sidecar coverage " +
    "for their fresh files (no skipping holes until compact)") {
    val t = fresh("mordelta_sidecar_carry")
    val base = T.t(spark, SF, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .repartitionByRange(4, $"o_orderkey")
    st.writeVersioned(base, t, false,
      Seq("o_orderkey"), Seq("o_orderstatus"))
    st.setTableProperty(t, "delete_mode", "merge-on-read")
    st.setTableProperty(t, "mor_key", "o_orderkey")
    val before = snapshotFiles(t)
    spark.sql(s"UPDATE graft.`$t` SET o_totalprice = o_totalprice + 1 " +
      "WHERE o_orderkey % 17 = 3")
    val freshFiles = (snapshotFiles(t) -- before).toSeq
    assert(freshFiles.nonEmpty, "the UPDATE must write fresh files")
    // every fresh file sits in the latest commit dir, and that dir
    // now carries _zonemap + _bloom sidecars covering them
    val commitDirs = freshFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getParent).distinct
    assert(commitDirs.size == 1)
    val cd = commitDirs.head
    val zm = spark.read.parquet(s"$cd/_zonemap")
    assert(zm.columns.contains("o_orderkey__min"),
      s"zonemap must cover the prior stats column: ${zm.columns.toSeq}")
    val zoneFiles = zm.select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0))
        .toUri.getPath).toSet
    val bl = spark.read.parquet(s"$cd/_bloom")
    assert(bl.select("col").distinct().collect()
      .map(_.getString(0)).toSet == Set("o_orderstatus"))
    val bloomFiles = bl.select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0))
        .toUri.getPath).toSet
    for (f <- freshFiles) {
      val key = new org.apache.hadoop.fs.Path(f).toUri.getPath
      assert(zoneFiles.contains(key), s"zonemap misses fresh file $f")
      assert(bloomFiles.contains(key), s"bloom misses fresh file $f")
    }
    // and the content still agrees with a straight read
    assert(st.readVersionedPruned(t).filter($"o_orderkey" % 17 === 3)
      .agg(sum($"o_totalprice")).head().getDouble(0) ==
      st.readVersioned(t).filter($"o_orderkey" % 17 === 3)
        .agg(sum($"o_totalprice")).head().getDouble(0))
  }
}

/** Shared gate for the delta-DML race tests: the UPDATE's write
  * tasks block here so the test can interleave a commit between the
  * command's snapshot pin and its manifest publish, deterministically.
  */
object MorDeltaRace {
  @volatile var started: java.util.concurrent.CountDownLatch = _
  @volatile var proceed: java.util.concurrent.CountDownLatch = _
  @volatile var failure: Option[Throwable] = None
}
