package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's queries/oracles. Each module
  * covers one SURVEY.md §2 family; adding a module here is the single
  * registration step.
  */
object SparkEntry {

  val modules: Seq[QueryModule] = Seq(
    operators.Scans,
    operators.Filters,
    operators.IntervalAnalytics,
    operators.Joins,
    operators.Aggs,
    operators.Windows,
    operators.SortsSets,
    operators.Sinks,
    operators.TypedOps,
    operators.Composite,
    operators.Mv,
    operators.Graph,
    operators.Quality,
    operators.SqlDml,
    operators.TpchBattery,
    operators.TpchBattery2,
    functions.Funcs,
    streaming.StreamOps,
    llm.Dedup,
    llm.Curate,
    llm.Knn,
    llm.TextStats,
    llm.Pipeline,
    llm.Multimodal)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Scans.scanReads(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
