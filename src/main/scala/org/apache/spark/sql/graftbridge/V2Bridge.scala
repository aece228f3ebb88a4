// Lives in a subpackage of org.apache.spark.sql so the DataSource V2
// catalog in graft.sources can reuse Spark's OWN parquet scan/write
// machinery (ParquetScanBuilder, FileFormat.prepareWrite,
// SerializableConfiguration) — all private[sql]/private[spark] from
// the outside. Only thin constructors and two small adapter types
// live here; the catalog/table/commit logic stays in graft.sources.
package org.apache.spark.sql.graftbridge

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** One open parquet part file on an executor (adapter over the
  * private[sql] OutputWriter so graft code never names that type).
  */
trait PartFileWriter {
  def write(row: InternalRow): Unit
  def close(): Unit
  /** Abort: close (best effort) and DELETE the partial file, so a
    * failed/speculative attempt leaves nothing in the commit dir.
    */
  def abort(): Unit
  def path: String
}

/** Executor-side parquet part-file opener, built ON THE DRIVER so
  * `FileFormat.prepareWrite` resolves compression/committer settings
  * from the session once; tasks then open files with only the
  * serialized job conf — the same split the built-in file write path
  * uses (FileFormatWriter), re-expressed for a DSv2 BatchWrite.
  */
final class ParquetTaskWriters(
    @transient spark: SparkSession,
    schema: StructType,
    dir: String) extends Serializable {

  private val (factory, jobConf) = {
    val job = Job.getInstance(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.newHadoopConf())
    val f = new ParquetFileFormat().prepareWrite(spark, job,
      Map.empty, schema)
    (f, new SerializableConfiguration(job.getConfiguration))
  }

  /** Open one part file for (partitionId, taskId). The name carries a
    * fresh UUID so speculative/retried attempts never collide; only
    * files named in commit messages enter the manifest.
    */
  def open(partitionId: Int, taskId: Long): PartFileWriter = {
    val conf = new org.apache.hadoop.conf.Configuration(jobConf.value)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(conf, attempt)
    val uuid = java.util.UUID.randomUUID.toString.take(8)
    val file = s"$dir/part-$partitionId-$uuid${factory.getFileExtension(ctx)}"
    val out = factory.newInstance(file, schema, ctx)
    new PartFileWriter {
      override def write(row: InternalRow): Unit = out.write(row)
      override def close(): Unit = out.close()
      override def abort(): Unit = {
        try out.close() catch { case _: Exception => () }
        val p = new org.apache.hadoop.fs.Path(file)
        try { p.getFileSystem(conf).delete(p, false): Unit }
        catch { case _: Exception => () }
      }
      override def path: String = file
    }
  }
}

object V2Bridge {

  private def classic(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Spark's own vectorized parquet ScanBuilder (pushdown, column
    * pruning, aggregate pushdown) over an EXACT file list served
    * through a [[graft.sources.ZoneMapFileIndex]] — the V2 read path
    * of a graft versioned table: manifest pins the files, stats-in-log
    * prunes them at plan time, the stock parquet scan reads the rest.
    */
  def parquetScanBuilder(
      spark: SparkSession,
      files: Seq[String],
      schema: StructType,
      zones: Map[String, Map[String, (Any, Any)]],
      hasBlooms: Boolean,
      bloomMeta: () => Set[String],
      bloomLoader: Set[String] =>
        Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]])
      : ScanBuilder = {
    val index = new graft.sources.ZoneMapFileIndex(classic(spark),
      files.map(new org.apache.hadoop.fs.Path(_)), Some(schema), zones,
      hasBlooms, bloomMeta, bloomLoader)
    ParquetScanBuilder(classic(spark), index, schema, schema,
      CaseInsensitiveStringMap.empty())
  }

  /** A parquet scan over an exact file list with NOTHING pushed down —
    * the row-level operation's group scan: a copy-on-write rewrite
    * must see EVERY row of the files it will replace, so the only
    * legal use of the command's filters is whole-file elision (done by
    * the caller against manifest stats), never parquet row filtering.
    */
  def parquetFullScan(
      spark: SparkSession,
      files: Seq[String],
      schema: StructType): org.apache.spark.sql.connector.read.Scan = {
    val index = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      classic(spark), files.map(new org.apache.hadoop.fs.Path(_)),
      Map.empty, Some(schema))
    ParquetScanBuilder(classic(spark), index, schema, schema,
      CaseInsensitiveStringMap.empty()).build()
  }

  /** V2 Predicate → V1 Filter (None when the shape has no V1 form). */
  def toV1Filter(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}
