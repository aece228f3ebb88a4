package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * DataSource front door for [[GraftStorage]], giving API parity with
  * the reference's storage builder (HtsjdkReadsRddStorage.java:47-116)
  * through Spark's own source registry instead of a facade object.
  *
  * Deliberately a THIN delegate (SURVEY.md §8d #3): the read path
  * resolves through the exact same plan `GraftStorage.readPruned`
  * builds — the built-in vectorized parquet `FileFormat` under a
  * `ZoneMapFileIndex` when a `_zonemap` sidecar exists, the stock
  * parquet relation otherwise — so the front door CANNOT fork the
  * scan path or lose pushdown/pruning/codegen; it only resolves
  * options and hands back the underlying `HadoopFsRelation`.
  *
  * Read options:
  *   - `zonemap` (default true): plan-time file pruning through the
  *     `_zonemap` sidecar when present.
  *   - `strictSchema` (default false): refuse directories with mixed
  *     file schemas (the reference's mixed-format error,
  *     HtsjdkReadsRddStorage.java:154-158).
  *   - `splitSize`: bytes per input partition
  *     (HtsjdkReadsRddStorage.splitSize).
  *
  * Write options (SaveMode.Overwrite; Append only for the default
  * sharded layout, matching the reference's one-shot write contract):
  *   - `layout`: `sharded` (default) | `single` (one parquet file via
  *     parallel parts + row-group append merge) | `singleCsv`.
  *   - `clusterBy` [+ `zone`, comma-separated]: range-clustered write
  *     with a `_zonemap` sidecar (`GraftStorage.writeIndexed`).
  *   - `zorder` (comma-separated): multi-dimension z-curve clustering
  *     with zone maps on every listed column.
  *   - `partitionBy`: hive-style partition column.
  *   - `rowGroupBytes`: parquet row-group size (index granularity).
  */
final class GraftSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(
      ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = ctx.sparkSession
    // single-path contract (load(a, b, ...) is a FileFormat-source
    // feature the V1 RelationProvider API never sees; a directory
    // union has no single sidecar to consult anyway — read the parent
    // directory instead)
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a path"))
    var st = GraftStorage(spark)
    if (parameters.get("strictSchema").exists(_.toBoolean)) st = st.strictSchema()
    parameters.get("splitSize").foreach(b => st = st.splitSize(b.toLong))
    val useZoneMap = parameters.get("zonemap").forall(_.toBoolean)
    val df = if (useZoneMap) st.readPruned(path) else st.read(path)
    relationOf(df)
  }

  /** The HadoopFsRelation inside a facade-built DataFrame — the write
    * side returns it so `save()` callers can re-read what they wrote.
    */
  private def relationOf(df: DataFrame): BaseRelation =
    org.apache.spark.sql.graftbridge.Bridge.analyzed(df)
      .collect { case l: LogicalRelation => l.relation }
      .headOption
      .getOrElse(throw new IllegalStateException(
        "graft read did not resolve to a file relation"))

  override def createRelation(
      ctx: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val spark = ctx.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft sink requires a path"))
    val layout = parameters.getOrElse("layout", "sharded")
    val clusterBy = parameters.get("clusterBy")
    val zorder = parameters.get("zorder").map(_.split(",").toSeq)
    var st = GraftStorage(spark)
    parameters.get("rowGroupBytes").foreach(b =>
      st = st.indexGranularity(b.toLong))

    // single-FILE outputs have no directory relation to resolve
    // through the zone-map read path; hand back the file's own format
    def readBack(): BaseRelation = layout match {
      case "singleCsv" => relationOf(
        spark.read.option("header", "true").schema(data.schema).csv(path))
      case "single" => relationOf(spark.read.parquet(path))
      case _ => createRelation(ctx, parameters)
    }

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"path already exists: $path")
      case SaveMode.Ignore if exists => return readBack()
      case SaveMode.Append =>
        if (layout != "sharded" || clusterBy.nonEmpty || zorder.nonEmpty)
          throw new IllegalArgumentException(
            "graft sink supports Append only for the plain sharded layout; " +
              "use GraftStorage.appendIndexed for indexed tables")
        data.write.mode("append").parquet(path)
        return readBack()
      case _ => () // Overwrite (default) and first-time writes fall through
    }

    (layout, zorder, clusterBy) match {
      case ("single", _, _) => st.writeSingleParquet(data, path)
      case ("singleCsv", _, _) => st.writeSingleCsv(data, path)
      case ("sharded", Some(zc), _) => st.writeZOrdered(data, path, zc)
      case ("sharded", None, Some(c)) =>
        val zones = parameters.get("zone")
          .map(_.split(",").toSeq).getOrElse(Seq(c))
        st.writeIndexed(data, path, c, zones: _*)
      case ("sharded", None, None) =>
        parameters.get("partitionBy") match {
          case Some(p) => st.write(data, path, PartitionedBy(p))
          case None => st.write(data, path)
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported graft layout: $other")
    }
    // `bloom`: comma-separated columns to point-index after the write
    // — composes with any sharded layout (zone maps answer ranges on
    // the clustering key, Blooms answer equality on these)
    parameters.get("bloom").filter(_ => layout == "sharded").foreach { cols =>
      st.buildBloomIndex(path, cols.split(",").toSeq)
    }
    readBack()
  }
}
