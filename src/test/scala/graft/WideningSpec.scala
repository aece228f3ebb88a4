package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, T}

/** Type widening (ALTER COLUMN TYPE): metadata-only H-line commits;
  * immutable stored files re-read under the wider type through the
  * vectorized parquet reader's per-file promotion (int32→long,
  * float→double). The Iceberg type-promotion contract over the graft
  * schema-in-log.
  */
class WideningSpec extends AnyFunSuite {
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

  test("int -> long widen is metadata-only: stored int32 files read " +
    "as long, big appends land, time travel keeps the old type") {
    val out = fresh("widen_int_long")
    st.writeVersioned(Seq((1, "a"), (2, "b")).toDF("v", "s"), out) // int
    val files0 = st.manifestFiles(out, 0).toSet
    val v1 = st.widenColumnVersioned(out, "v", LongType)
    assert(st.manifestFiles(out, v1).toSet == files0,
      "widen must move zero data files")
    val widened = st.readVersioned(out)
    assert(widened.schema("v").dataType == LongType)
    assert(widened.select(sum($"v")).head().getLong(0) == 3L)
    // a value only a long can hold, through the widened schema
    st.writeVersioned(Seq((Int.MaxValue.toLong + 7L, "big"))
      .toDF("v", "s"), out, append = true)
    assert(st.readVersioned(out).select(sum($"v")).head().getLong(0) ==
      3L + Int.MaxValue.toLong + 7L)
    // time travel: version 0 keeps the pre-widen type AND values
    val old = st.readVersioned(out, Some(0L))
    assert(old.schema("v").dataType == IntegerType)
    assert(old.count() == 2)
  }

  test("appending a wider-typed frame widens implicitly (no DDL): " +
    "the H merge takes the wider type") {
    val out = fresh("widen_implicit")
    st.writeVersioned(Seq((1, 1.5f)).toDF("v", "x"), out)
    st.writeVersioned(Seq((2L, 2.5d)).toDF("v", "x"), out,
      append = true)
    val r = st.readVersioned(out)
    assert(r.schema("v").dataType == LongType)
    assert(r.schema("x").dataType == DoubleType)
    assert(r.select(sum($"v")).head().getLong(0) == 3L)
    assert(math.abs(r.select(sum($"x")).head().getDouble(0) - 4.0) < 1e-9)
  }

  test("SQL surface: ALTER TABLE ... ALTER COLUMN ... TYPE BIGINT, " +
    "then catalog reads/DML see the wide type") {
    val out = fresh("widen_sql")
    st.writeVersioned(Seq((1, "a"), (2, "b")).toDF("v", "s"), out)
    spark.sql(s"ALTER TABLE graft.`$out` ALTER COLUMN v TYPE BIGINT")
    val r = spark.sql(s"SELECT SUM(v) AS sv FROM graft.`$out`")
    assert(r.schema("sv").dataType == LongType)
    assert(r.head().getLong(0) == 3L)
    spark.sql(s"INSERT INTO graft.`$out` VALUES " +
      s"(${Int.MaxValue.toLong + 1L}, 'c')")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM graft.`$out` " +
      s"WHERE v > ${Int.MaxValue}").head().getLong(0) == 1L)
  }

  test("decimal precision widening: decimal(12,2) files read under " +
    "decimal(20,2), big-precision appends land, scale change refuses") {
    val out = fresh("widen_decimal")
    st.writeVersioned(Seq((1L, BigDecimal("12345678.25")),
      (2L, BigDecimal("99.75"))).toDF("k", "amt")
      .select($"k", $"amt".cast(DecimalType(12, 2)).as("amt")), out)
    st.widenColumnVersioned(out, "amt", DecimalType(20, 2))
    val r = st.readVersioned(out)
    assert(r.schema("amt").dataType == DecimalType(20, 2))
    assert(r.select(sum($"amt")).head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("12345778.00")) == 0)
    // a value only the wide precision holds
    st.writeVersioned(Seq((3L, BigDecimal("123456789012345678.50")))
      .toDF("k", "amt")
      .select($"k", $"amt".cast(DecimalType(20, 2)).as("amt")), out,
      append = true)
    assert(st.readVersioned(out).count() == 3)
    assert(st.readVersioned(out).select(max($"amt")).head()
      .getDecimal(0).compareTo(
        new java.math.BigDecimal("123456789012345678.50")) == 0)
    // time travel keeps the narrow precision
    assert(st.readVersioned(out, Some(0L)).schema("amt").dataType ==
      DecimalType(12, 2))
    // scale change is NOT a widening
    val e = intercept[IllegalArgumentException] {
      st.widenColumnVersioned(out, "amt", DecimalType(22, 4))
    }
    assert(e.getMessage.contains("not a widening promotion"))
  }

  test("date -> timestamp_ntz widening: stored dates read as their " +
    "midnights, zone stats promote, true timestamps append") {
    val out = fresh("widen_date_ts")
    st.writeVersioned(
      Seq((1L, java.sql.Date.valueOf("2024-03-01")),
        (2L, java.sql.Date.valueOf("2024-03-15"))).toDF("k", "d"),
      out, append = false, statsCols = Seq("d"))
    st.widenColumnVersioned(out, "d", TimestampNTZType)
    val r = st.readVersioned(out).orderBy($"k")
    assert(r.schema("d").dataType == TimestampNTZType)
    assert(r.collect().map(_.getAs[java.time.LocalDateTime](1)).toSeq ==
      Seq(java.time.LocalDateTime.of(2024, 3, 1, 0, 0),
        java.time.LocalDateTime.of(2024, 3, 15, 0, 0)))
    st.writeVersioned(Seq(
      (3L, java.time.LocalDateTime.of(2024, 3, 20, 12, 30)))
      .toDF("k", "d"), out, append = true, statsCols = Seq("d"))
    // pruned read across the date-stats + timestamp-stats generations
    // (exercises the widenValue DATE->LocalDateTime promotion)
    val pruned = st.readVersionedPruned(out)
    assert(pruned.filter(
      $"d" > lit(java.time.LocalDateTime.of(2024, 3, 10, 0, 0)))
      .count() == 2)
    assert(st.readVersioned(out, Some(0L)).schema("d").dataType ==
      DateType)
  }

  test("refusals: narrowing, re-typing, unknown column, partition " +
    "key — all loud, nothing committed") {
    val out = fresh("widen_refuse")
    st.writeVersioned(Seq((1L, "a", 2.0)).toDF("v", "s", "x"), out)
    val before = st.listVersions(out)
    val e1 = intercept[IllegalArgumentException] {
      st.widenColumnVersioned(out, "v", IntegerType) // narrow
    }
    assert(e1.getMessage.contains("not a widening promotion"))
    val e2 = intercept[IllegalArgumentException] {
      st.widenColumnVersioned(out, "s", LongType) // re-type
    }
    assert(e2.getMessage.contains("not a widening promotion"))
    intercept[IllegalArgumentException] {
      st.widenColumnVersioned(out, "nope", LongType)
    }
    assert(st.listVersions(out) == before, "refusals commit nothing")
    // partition-key widening refuses (path-derived values)
    val part = fresh("widen_refuse_part")
    st.writeVersionedPartitioned(
      Seq((1, "a"), (2, "b")).toDF("k", "s"), part, Seq("k"))
    val e4 = intercept[IllegalArgumentException] {
      st.widenColumnVersioned(part, "k", LongType)
    }
    assert(e4.getMessage.contains("partition key"))
    // and a genuinely conflicting append still refuses (the widen
    // lattice must not have loosened the type gate)
    val e5 = intercept[IllegalArgumentException] {
      st.writeVersioned(Seq(("x", "a", 2.0)).toDF("v", "s", "x"), out,
        append = true)
    }
    assert(e5.getMessage.contains("type conflict"))
  }

  test("stats-in-log pruning survives a widen: mixed int/long zone " +
    "sidecars still prune and return exact rows") {
    val out = fresh("widen_prune")
    st.writeVersioned((1 to 1000).map(i => (i, s"r$i")).toDF("v", "s")
      .repartitionByRange(4, $"v"), out,
      append = false, statsCols = Seq("v"))
    st.widenColumnVersioned(out, "v", LongType)
    st.writeVersioned((100001L to 101000L).map(i => (i, s"r$i"))
      .toDF("v", "s").repartitionByRange(4, $"v"), out,
      append = true, statsCols = Seq("v"))
    val pruned = st.readVersionedPruned(out)
    assert(pruned.schema("v").dataType == LongType)
    assert(pruned.filter($"v" > 100500L).count() == 500)
    assert(pruned.filter($"v" > 500L).count() == 1500)
  }

  test("the all-narrow window right after a widen: zone pruning and " +
    "the catalog metadata MIN/MAX promote narrow stats, no CCE") {
    val out = fresh("widen_window")
    st.writeVersioned((1 to 1000).map(i => (i, s"r$i")).toDF("v", "s")
      .repartitionByRange(4, $"v"), out, append = false,
      statsCols = Seq("v"))
    st.widenColumnVersioned(out, "v", LongType)
    // every zone stat is still the NARROW box here — the attribute
    // is already long (this is the window WideningSpec's mixed test
    // cannot catch: no post-widen stats commit exists yet)
    val pruned = st.readVersionedPruned(out)
    assert(pruned.schema("v").dataType == LongType)
    assert(pruned.filter($"v" > 500L).count() == 500)
    val r = spark.sql(
      s"""SELECT MIN(v) AS mn, MAX(v) AS mx, COUNT(*) AS c
         |FROM graft.`$out`""".stripMargin).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((1L, 1000L, 1000L)))
  }

  test("merge-on-read interplay: a DV written against the int key " +
    "still deletes after the key widens to long") {
    val out = fresh("widen_mor")
    st.writeVersioned((1 to 100).map(i => (i, s"r$i")).toDF("k", "s"),
      out)
    st.deleteVersionedMor(out, $"k" <= 10, "k")
    st.widenColumnVersioned(out, "k", LongType)
    val r = st.readVersioned(out)
    assert(r.schema("k").dataType == LongType)
    assert(r.count() == 90)
    assert(r.filter($"k" <= 10L).count() == 0)
    // and a post-widen DV deletes long keys
    st.deleteVersionedMor(out, $"k" > 95L, "k")
    assert(st.readVersioned(out).count() == 85)
  }
}
