package graft

import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

/** Structural lint over EVERY oracle SQL body in
  * [[SparkEntry.oracleSql]]: the two documented DuckDB-vs-Spark
  * engine-divergence traps must never enter the board again.
  *
  *  1. DECIMAL→DOUBLE conversion of a sum — `CAST(SUM(x) AS DOUBLE)`
  *     where `x` is not the sanctioned dsum round-trip
  *     (`CAST(x AS DECIMAL(18,s))`). A DECIMAL(38,·) sum past 2^53
  *     converts to double with a one-ulp divergence between Spark's
  *     correctly-rounded `BigDecimal.doubleValue` and DuckDB's
  *     int128 path (the round-9 `sql_alter_widen` hash red). Keep
  *     such comparisons exact-DECIMAL end to end
  *     (`CAST(SUM(x) AS DECIMAL(38,2))` on BOTH engines). The dsum
  *     shape is safe: DECIMAL(18,·) fits int64, whose →double
  *     conversion is correctly rounded in both engines.
  *  2. dsum over FLOAT-DERIVED values — the double→DECIMAL rounding
  *     of exact .xx5 ties diverges (Spark HALF_UP vs DuckDB
  *     half-even), and float-promoted doubles at magnitude ≥ 2^18 DO
  *     land on dyadic .xx5 ties. Oracle float-derived comparisons
  *     with COUNT / MIN / MAX / integer sums instead. Float source
  *     columns are discovered from the test data's own parquet
  *     schemas, not hard-coded.
  */
class OracleLintSpec extends AnyFunSuite {
  import SparkTestSession.spark

  /** Inner expression of each `SUM(` at or after `from`, balanced. */
  private def balancedInner(s: String, openEnd: Int): (String, Int) = {
    var depth = 1
    var i = openEnd
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '(') depth += 1 else if (c == ')') depth -= 1
      i += 1
    }
    (s.substring(openEnd, i - 1), i)
  }

  private def normalized(sql: String): String =
    sql.replaceAll("\\s+", " ").toUpperCase(Locale.ROOT)

  /** Queries whose `CAST(SUM(...) AS DOUBLE)` falls outside the
    * always-safe shape but is MAGNITUDE-BOUNDED at the oracle gate's
    * scale factors — the unscaled decimal sum (value × 10^scale)
    * stays well under 2^53, where DuckDB's int128→double conversion
    * is exact. A NEW high-scale entry must be added here with its
    * bound, or rewritten to scale ≤ 6 / exact-DECIMAL output.
    */
  private val magnitudeBounded: Map[String, String] = Map(
    "typed_agg" -> ("BIGINT round-trip of round(l_quantity*100): " +
      "sum ≈ 3e8 at sf0.1 — far under 2^53"),
    "profile_outliers" -> ("scale 4, per-segment acctbal² sums " +
      "unscaled ≈ 1e15 at sf1; the double only feeds a 2-sd " +
      "threshold for an integer count"),
    "llm_embed_centroids" -> ("scale 7, centroid component sums " +
      "bounded by corpus × |comp| ≈ 1e5 → unscaled ≈ 1e12"),
    "llm_knn_ivf_trained" -> ("scale 12, per-cell component sums " +
      "≤ cell size × 1 ≈ 1e3 → unscaled ≤ 1e15 at oracle SFs"),
    "llm_knn_pq_trained" -> ("scale 15, per-group unit-scale " +
      "component values; green at sf1"),
    "llm_bm25" -> ("scale 9, per-(doc,term) BM25 contribution sums " +
      "≈ 1e1-1e2 → unscaled ≈ 1e11"),
    "llm_bm25_stored" -> ("scale 9, same bound as llm_bm25"),
    "llm_lm_score" -> ("scale 9, per-doc log-prob sums ≈ 1e2-1e3 → " +
      "unscaled ≈ 1e12"))

  /** Trap 1: `CAST(SUM(inner) AS DOUBLE)` outside the safe shape.
    * Safe = the summand is itself a decimal ROUND-TRIP cast
    * (`CAST(x AS DECIMAL(p,s))`, the dsum family) with scale ≤ 6 —
    * headroom 2^53/10^6 ≈ 9e9 on the summed VALUE, generous for
    * every aggregate this corpus produces. A bare decimal-column sum
    * (the round-9 `sql_alter_widen` bug class) always flags; scale
    * > 6 / BIGINT round-trips flag unless magnitude-justified above.
    */
  private def decimalToDoubleHits(sql: String): Seq[String] = {
    val s = normalized(sql)
    val re = "CAST\\s*\\(\\s*SUM\\s*\\(".r
    re.findAllMatchIn(s).flatMap { m =>
      val (inner, end) = balancedInner(s, m.end)
      val after = s.substring(end).trim
      val scales = "AS\\s+DECIMAL\\s*\\(\\s*\\d+\\s*,\\s*(\\d+)\\s*\\)".r
        .findAllMatchIn(inner).map(_.group(1).toInt).toSeq
      val safe = scales.nonEmpty && scales.max <= 6
      if (after.startsWith("AS DOUBLE") && !safe)
        Some(s"CAST(SUM($inner) AS DOUBLE)")
      else None
    }.toSeq
  }

  /** Trap 2: a dsum (`SUM(CAST(... AS DECIMAL ...))`) whose inner
    * expression mentions a float-typed source column.
    */
  private def floatDsumHits(sql: String,
      floatCols: Set[String]): Seq[String] = {
    val s = normalized(sql)
    val re = "SUM\\s*\\(".r
    re.findAllMatchIn(s).flatMap { m =>
      val (inner, _) = balancedInner(s, m.end)
      val decimalCast = "AS\\s+DECIMAL".r.findFirstIn(inner).isDefined
      val floats = floatCols.filter(c =>
        ("\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
          .findFirstIn(inner).isDefined)
      if (decimalCast && floats.nonEmpty)
        Some(s"SUM($inner) touches float column(s) " +
          floats.toSeq.sorted.mkString(", "))
      else None
    }.toSeq
  }

  test("oracle SQL avoids the two engine-divergence traps: no " +
    "decimal->double sum conversion outside the dsum shape, no dsum " +
    "over float-derived values") {
    // float SOURCE columns, discovered from the test data itself
    val dir = SparkTestSession.SF
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val floatCols: Set[String] = fs.listStatus(
        new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
      .flatMap { t =>
        def floatTyped(dt: org.apache.spark.sql.types.DataType): Boolean =
          dt match {
            case org.apache.spark.sql.types.FloatType => true
            case a: org.apache.spark.sql.types.ArrayType =>
              floatTyped(a.elementType)
            case _ => false
          }
        spark.read.parquet(t).schema.fields
          .filter(f => floatTyped(f.dataType)).map(_.name)
      }.map(_.toUpperCase(Locale.ROOT)).toSet
    assert(floatCols.nonEmpty,
      "sanity: the test data is known to carry float columns " +
        "(embeddings.embedding) — an empty set means the discovery " +
        "broke, not that the corpus went float-free")
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        decimalToDoubleHits(sql)
          .filterNot(_ => magnitudeBounded.contains(name)).map(h =>
          s"$name: $h — decimal->double diverges by a ulp past 2^53 " +
            "(Spark BigDecimal.doubleValue vs DuckDB int128); compare " +
            "exact-DECIMAL on both engines, use the dsum shape " +
            "T.sqlDsum (scale <= 6) for double-typed inputs, or add a " +
            "magnitude-bound justification to magnitudeBounded") ++
        floatDsumHits(sql, floatCols).map(h =>
          s"$name: $h — double->DECIMAL tie rounding diverges (Spark " +
            "HALF_UP vs DuckDB half-even) and float-promoted doubles " +
            "land on exact ties; oracle float-derived values with " +
            "COUNT/MIN/MAX/integer sums instead")
    }
    assert(bad.isEmpty, "oracle lint violations:\n" + bad.mkString("\n"))
  }
}
