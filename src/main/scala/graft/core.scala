package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampType}

/** A named bundle of operator queries plus their DuckDB oracle SQL.
  *
  * Every operator in SURVEY.md §2 registers here as a `queries` entry
  * (Spark implementation) and, when ANSI-SQL-expressible, a matching
  * `oracleSql` entry the driver runs in DuckDB over the same parquet
  * tables. Column names MUST match between the two; row output must be
  * deterministic (explicit orderBy / ORDER BY with a unique tiebreak).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]

  /** Build this module's input fixtures (scratch tables some queries
    * re-read) ahead of time. Bench calls it OUTSIDE the timed region
    * so per-query numbers measure the operator, not its test-input
    * creation; queries still build lazily via `Fixtures.ensure` when
    * run standalone.
    */
  def prepare(s: SparkSession, dir: String): Unit = ()
}

/** Build-once-per-JVM registry for query input fixtures. A query that
  * needs a derived input (sharded copy, csv/json/gzip dump, clustered
  * or zone-indexed table, bucketed catalog tables) registers its
  * builder here: the first caller per (sfDir, name) builds, everyone
  * else reuses — so Bench can hoist ALL builds into an untimed
  * prepare phase while Verify/tests keep working with no ordering
  * requirements.
  */
object Fixtures {
  /** One fixture's lazily-run builder. The lazy val's monitor is the
    * per-fixture build lock.
    */
  private final class Cell(thunk: () => String) {
    lazy val value: String = thunk()
  }
  private val built = new java.util.concurrent.ConcurrentHashMap[String, Cell]()

  /** Returns the fixture's scratch path; `build(path)` runs exactly
    * once per JVM per (dir, name) (concurrent callers block until the
    * first build finishes).
    *
    * Two-phase on purpose: `computeIfAbsent` only INSTALLS the cell
    * (no user code inside the map's lock) and the builder runs when
    * the cell is forced OUTSIDE it — a builder that itself calls
    * `ensure` for a sub-fixture (e.g. the gzip-ingest recipe reusing
    * the gzip dump) re-enters the map safely. Running the builder
    * inside computeIfAbsent dies with ConcurrentHashMap's "Recursive
    * update" IllegalStateException whenever the nested insert lands
    * mid-resize — a timing-dependent flake, seen once in a full-suite
    * run.
    */
  def ensure(dir: String, name: String)(build: String => Unit): String = {
    val path = T.scratch(dir, name)
    built.computeIfAbsent(s"$dir::$name",
      _ => new Cell(() => { build(path); path })).value
  }
}

/** Table loaders + determinism helpers shared by all modules. */
object T {

  /** Load one harness parquet table (TESTDATA.md). Plain
    * `spark.read.parquet` so Catalyst pushdown / pruning apply.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table ships with parquet TIMESTAMP(NANOS). How Spark
    * surfaces that column depends on the running version, so dispatch
    * on the LOADED schema rather than assuming one behavior:
    *
    *  - BIGINT (a session that still honors the removed
    *    `spark.sql.legacy.parquet.nanosAsLong` conf): truncate the raw
    *    nanos to a micros timestamp — the same truncation DuckDB's
    *    TIMESTAMP_NS→TIMESTAMP cast performs.
    *  - TIMESTAMP_NTZ (Spark ≥4.1 default for NANOS): cast to the
    *    session-zone TimestampType. All graft sessions pin
    *    `spark.sql.session.timeZone=UTC`, so the cast reinterprets the
    *    wall-clock value at UTC — epoch-identical to the legacy
    *    nanos-div-1000 arithmetic and to DuckDB's cast.
    *  - TIMESTAMP: already what every consumer expects.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Scratch dir for sink round-trip queries — inside the repo target
    * dir (never outside /root/repo), keyed by sf dir so concurrent
    * scale factors don't collide.
    */
  def scratch(dir: String, name: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/root/repo/target/graft-scratch/$sf/$name"
  }

  /** Order-insensitive exact double sum: route through DECIMAL(18,s)
    * and cast back. Spark and DuckDB then produce bit-identical
    * doubles regardless of partial-aggregation order, which plain
    * double sums do not guarantee. DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic average = exact decimal sum / count. DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(*)`.
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** SQL fragment for dsum, to keep oracle strings readable. */
  def sqlDsum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlDavg(x: String, scale: Int = 2): String =
    s"${sqlDsum(x, scale)} / COUNT(*)"
}
