package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** Column mapping (RENAME / DROP COLUMN): metadata-only commits via
  * the manifest's `N` line — files keep their stable physical names,
  * reads project physical→logical, writes translate logical→physical,
  * time travel keeps each version's own names, and a compact resets
  * the mapping by rewriting logical-as-physical.
  */
class MappingSpec extends AnyFunSuite {
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

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else String.valueOf(t.getMessage) +: messages(t.getCause)

  test("RENAME COLUMN is metadata-only: zero data bytes move, " +
    "pre-rename files read correctly, time travel keeps old names") {
    val out = fresh("map_rename")
    st.writeVersioned(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "v", "amt"), out)
    val files0 = st.manifestFiles(out, 0).toSet
    val v1 = st.renameColumnVersioned(out, "amt", "price")
    // zero data movement: same files, one more manifest version
    assert(st.manifestFiles(out, v1).toSet == files0)
    // the new name reads the OLD files' values
    val got = st.readVersioned(out).orderBy($"k")
    assert(got.columns.toSeq == Seq("k", "v", "price"))
    assert(got.select($"price").as[Double].collect().toSeq ==
      Seq(10.0, 20.0))
    // time travel keeps the version's own names
    assert(st.readVersioned(out, Some(0)).columns.toSeq ==
      Seq("k", "v", "amt"))
    // appends arrive in the new logical schema and store the stable
    // physical name — both generations read as one
    st.writeVersioned(Seq((3L, "c", 30.0)).toDF("k", "v", "price"),
      out, append = true)
    assert(st.readVersioned(out).count() == 3)
    assert(st.readVersioned(out).agg(sum($"price")).head().getDouble(0)
      == 60.0)
    // the fresh file physically stores 'amt' (stable physical schema)
    val freshFile = (st.manifestFiles(out,
      st.listVersions(out).last).toSet -- files0).head
    assert(spark.read.parquet(freshFile).columns.contains("amt"))
    // re-using the physical name as a new column is refused loudly
    val e = intercept[Exception] {
      st.writeVersioned(Seq((4L, "d", 40.0, "x"))
        .toDF("k", "v", "price", "amt"), out, append = true)
    }
    assert(messages(e).exists(_.contains("renamed-away")),
      s"unexpected: ${messages(e)}")
    // rename back to the stored name clears the mapping entry
    st.renameColumnVersioned(out, "price", "amt")
    assert(!st.hasColumnMapping(out))
    assert(st.readVersioned(out).columns.toSeq == Seq("k", "v", "amt"))
  }

  test("DROP COLUMN hides stored data without rewrite; compact " +
    "resets the mapping; pruned reads keep working") {
    val out = fresh("map_drop")
    st.writeVersioned(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "v", "amt"), out, false, Seq("k"))
    val files0 = st.manifestFiles(out, 0).toSet
    st.renameColumnVersioned(out, "amt", "price")
    st.dropColumnVersioned(out, "v")
    assert(st.manifestFiles(out,
      st.listVersions(out).last).toSet == files0, "no rewrite")
    assert(st.readVersioned(out).columns.toSeq == Seq("k", "price"))
    // time travel resurrects the dropped column
    assert(st.readVersioned(out, Some(0)).columns.toSeq ==
      Seq("k", "v", "amt"))
    // pruned reads project too (filters push through the aliases)
    val pruned = st.readVersionedPruned(out).filter($"k" === 2L)
    assert(pruned.columns.toSeq == Seq("k", "price"))
    assert(pruned.select($"price").as[Double].head() == 20.0)
    // compact rewrites logical-as-physical and RESETS the mapping
    st.compactVersioned(out)
    assert(!st.hasColumnMapping(out))
    val post = st.readVersioned(out).orderBy($"k")
    assert(post.columns.toSeq == Seq("k", "price"))
    assert(post.agg(sum($"price")).head().getDouble(0) == 30.0)
    // the rewritten files physically store the logical names now
    val f = st.manifestFiles(out, st.listVersions(out).last).head
    assert(spark.read.parquet(f).columns.toSeq == Seq("k", "price"))
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN, catalog reads " +
    "via the analyzer substitution, INSERT translates") {
    val out = fresh("map_sql")
    spark.sql(s"CREATE TABLE graft.`$out` (k BIGINT, v STRING, " +
      "amt DOUBLE) USING graft")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("map_sql_seed")
    spark.sql(s"INSERT INTO graft.`$out` SELECT * FROM map_sql_seed")
    spark.sql(s"ALTER TABLE graft.`$out` RENAME COLUMN amt TO price")
    spark.sql(s"ALTER TABLE graft.`$out` DROP COLUMN v")
    // catalog read resolves through the V1 projected plan
    val got = spark.sql(
      s"SELECT k, price FROM graft.`$out` ORDER BY k").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 10.0), (2L, 20.0)))
    // INSERT INTO in the new schema translates back to stored names
    spark.sql(s"INSERT INTO graft.`$out` SELECT 3L, 30.0")
    assert(spark.sql(s"SELECT SUM(price) AS s FROM graft.`$out`")
      .head().getDouble(0) == 60.0)
    // VERSION AS OF keeps the old names
    val old = spark.sql(s"SELECT * FROM graft.`$out` VERSION AS OF 0")
    assert(old.columns.toSeq == Seq("k", "v", "amt"))
    // the group-based CoW row-level path cannot ride a mapping (it
    // reads/writes physical names under logical attributes) — loud
    // refusal, same as the delta path
    val e3 = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$out` SET price = 0 WHERE k = 1")
    }
    assert(messages(e3).exists(_.contains("column mapping")),
      s"unexpected: ${messages(e3)}")
    // …while a fully-translatable DELETE takes the Scala CoW hook,
    // which handles the mapping
    spark.sql(s"DELETE FROM graft.`$out` WHERE k = 3")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM graft.`$out`")
      .head().getLong(0) == 2L)
  }

  test("merge-on-read interplay: MoR deletes/upserts work on a " +
    "mapped table; CDC spans the rename; streams serve logical " +
    "columns") {
    val out = fresh("map_mor")
    st.writeVersioned(Seq((1L, "a", 10.0), (2L, "b", 20.0),
      (3L, "c", 30.0)).toDF("k", "v", "amt"), out)
    st.setTableProperty(out, "delete_mode", "merge-on-read")
    st.setTableProperty(out, "mor_key", "k")
    val vPre = st.listVersions(out).last
    st.renameColumnVersioned(out, "amt", "price")
    // the rename commit itself is zero change rows
    val renameChanges = st.changesVersioned(out, vPre,
      st.listVersions(out).last)
    assert(renameChanges.count() == 0)
    // MoR delete under the mapping (key untouched by the rename)
    st.deleteVersionedMor(out, $"price" === 20.0, "k")
    assert(st.readVersioned(out).count() == 2)
    assert(st.readVersioned(out).columns.toSeq == Seq("k", "v", "price"))
    // MoR upsert in the new logical schema
    st.mergeVersionedMor(out,
      Seq((3L, "c2", 33.0)).toDF("k", "v", "price"), "k")
    val now = st.readVersioned(out).orderBy($"k").collect()
    assert(now.map(_.getDouble(2)).toSeq == Seq(10.0, 33.0))
    // CDC across the whole history (rename inside the range) surfaces
    // in the TO-version's logical shape
    val ch = st.changesVersioned(out, 0, st.listVersions(out).last)
    assert(ch.columns.contains("price") && !ch.columns.contains("amt"))
    assert(ch.filter($"_change_type" === "delete" && $"k" === 2L)
      .count() == 1)
    // a DV keyed on a RENAMED column still applies (D line physical)
    val out2 = fresh("map_mor_renamed_key")
    st.writeVersioned(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amt"),
      out2)
    st.renameColumnVersioned(out2, "id", "key_id")
    st.deleteVersionedMor(out2, $"key_id" === 1L, "key_id")
    assert(st.readVersioned(out2).select($"key_id").as[Long]
      .collect().toSeq == Seq(2L))
    // raw-file streaming of a mapped snapshot serves LOGICAL columns
    // zero-copy (round 10: the scan requests physical names per
    // file) — no REORG, no refusal…
    val out3 = fresh("map_stream_gate")
    val fs3 = new org.apache.hadoop.fs.Path(out3).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    Seq(out3 + "_out", out3 + "_ckpt").foreach(p =>
      fs3.delete(new org.apache.hadoop.fs.Path(p), true))
    st.writeVersioned(Seq((1L, 10.0)).toDF("id", "amt"), out3)
    st.renameColumnVersioned(out3, "amt", "price")
    val q = st.streamVersioned(out3).writeStream
      .option("checkpointLocation", out3 + "_ckpt")
      .format("parquet").option("path", out3 + "_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out3 + "_out")
    assert(streamed.columns.toSeq == Seq("id", "price"),
      streamed.columns.toSeq.toString)
    assert(streamed.as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0)))
    // …while SQL delta DML still points at REORG
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$out` SET price = 1 WHERE k = 1")
    }
    assert(messages(e2).exists(_.contains("column mapping")),
      s"unexpected: ${messages(e2)}")
  }

  test("refusals: partitioned tables, mor_key, constraints, last " +
    "column, physical-name reuse on ADD COLUMNS") {
    val parted = fresh("map_refuse_part")
    st.writeVersionedPartitioned(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), parted, Seq("v"))
    intercept[IllegalArgumentException] {
      st.renameColumnVersioned(parted, "k", "kk")
    }
    val t = fresh("map_refuse")
    st.writeVersioned(Seq((1L, "a")).toDF("k", "v"), t)
    st.setTableProperty(t, "delete_mode", "merge-on-read")
    st.setTableProperty(t, "mor_key", "k")
    intercept[IllegalArgumentException] {
      st.renameColumnVersioned(t, "k", "kk") // the declared mor_key
    }
    st.removeTableProperty(t, "delete_mode")
    st.removeTableProperty(t, "mor_key")
    st.addCheckConstraint(t, "c1", "k > 0")
    intercept[IllegalArgumentException] {
      st.renameColumnVersioned(t, "v", "w") // constraints present
    }
    st.dropCheckConstraint(t, "c1")
    st.renameColumnVersioned(t, "v", "w")
    // constraints refuse to land ON a mapped table too
    intercept[IllegalArgumentException] {
      st.addCheckConstraint(t, "c2", "k > 0")
    }
    intercept[IllegalArgumentException] {
      st.dropColumnVersioned(t, "nope") // not a column
    }
    st.dropColumnVersioned(t, "w")
    intercept[IllegalArgumentException] {
      st.dropColumnVersioned(t, "k") // last column
    }
    // ADD COLUMNS must not resurrect the dropped physical name
    val e = intercept[Exception] {
      st.addColumnsVersioned(t, org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    }
    assert(messages(e).exists(_.contains("collision")),
      s"unexpected: ${messages(e)}")
  }
}
