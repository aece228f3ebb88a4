package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Columnar-encoding tuning on the parquet sink — the Spark-native
  * counterpart of the reference's CRAM column codecs (CRAM containers
  * pick per-series encodings; parquet picks per-column-chunk
  * encodings). These tests document and pin the knobs a 100 TB
  * deployment would set: dictionary encoding for low-cardinality
  * columns, v2 delta encodings for sorted keys, zstd over snappy for
  * text-heavy data. Each variant must also round-trip losslessly.
  */
class EncodingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  private def dirSize(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(p))
  }

  test("dictionary encoding shrinks low-cardinality string columns") {
    val df = T.t(spark, SF, "lineitem")
      .select($"l_returnflag", $"l_linestatus")
    val on = T.scratch(SF, "enc_dict_on")
    val off = T.scratch(SF, "enc_dict_off")
    // uncompressed isolates the encoding effect from the codec
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "none").parquet(on)
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "none")
      .option("parquet.enable.dictionary", "false").parquet(off)
    assert(spark.read.parquet(on).count() == df.count())
    assert(spark.read.parquet(off).count() == df.count())
    val (sOn, sOff) = (dirSize(on), dirSize(off))
    assert(sOn < sOff / 2, s"dict=$sOn nodict=$sOff")
  }

  test("v2 writer delta-encodes sorted keys smaller than v1 plain") {
    val df = T.t(spark, SF, "lineitem")
      .select($"l_orderkey").orderBy($"l_orderkey")
    val v1 = T.scratch(SF, "enc_v1")
    val v2 = T.scratch(SF, "enc_v2")
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "none")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.writer.version", "v1").parquet(v1)
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "none")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.writer.version", "v2").parquet(v2)
    // v2 round trip is lossless value-wise
    assert(spark.read.parquet(v2).agg(sum($"l_orderkey")).head ==
      spark.read.parquet(v1).agg(sum($"l_orderkey")).head)
    val (s1, s2) = (dirSize(v1), dirSize(v2))
    assert(s2 < (s1 * 8) / 10, s"v1=$s1 v2=$s2")
  }

  test("zstd beats snappy on text-heavy documents") {
    val df = T.t(spark, SF, "documents")
    val sn = T.scratch(SF, "enc_snappy")
    val zs = T.scratch(SF, "enc_zstd")
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "snappy").parquet(sn)
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "zstd").parquet(zs)
    assert(spark.read.parquet(zs).count() == df.count())
    assert(dirSize(zs) < dirSize(sn), s"zstd=${dirSize(zs)} snappy=${dirSize(sn)}")
  }
}
