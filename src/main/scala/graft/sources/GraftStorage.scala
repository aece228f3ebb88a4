package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-facing storage facade — the Spark-native counterpart of the
  * reference's `HtsjdkReadsRddStorage` builder
  * (HtsjdkReadsRddStorage.java:47-116 read side, :187-229 write-option
  * resolution): a session-bound handle with declarative read/write
  * options, resolving cardinality and layout the way the reference
  * resolves format/cardinality from options and path shape.
  *
  * Differences by design (SURVEY.md §4): storage format is columnar
  * parquet (splittable containers + stats pruning replace the
  * .sbi/.bai machinery), so `splitSize` maps to
  * spark.sql.files.maxPartitionBytes and index construction
  * disappears into row-group metadata written by the sink.
  */
final case class GraftStorage(
    spark: SparkSession,
    splitSize: Option[Long] = None,
    columns: Seq[String] = Nil) {

  /** splitSize(n) ≈ HtsjdkReadsRddStorage.splitSize — bounds bytes
    * per input partition.
    */
  def splitSize(bytes: Long): GraftStorage = copy(splitSize = Some(bytes))

  /** Projection pushed to the scan (lazy-decode analogue). */
  def select(cols: String*): GraftStorage = copy(columns = cols)

  /** Read a file or directory-of-files as one table
    * (HtsjdkReadsRddStorage.read; directory semantics README.md:85-95).
    */
  def read(path: String): DataFrame = {
    splitSize.foreach(b =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", b.toString))
    val df = spark.read.parquet(path)
    if (columns.nonEmpty) df.select(columns.map(col): _*) else df
  }

  /** Write with disq-style option resolution
    * (HtsjdkReadsRddStorage.java:187-229): cardinality SINGLE →
    * one-file commit; MULTIPLE → sharded dir; optional partition
    * column → hive layout; always overwrite (README.md:57).
    */
  def write(df: DataFrame, path: String, options: WriteOption*): Unit = {
    val single = options.contains(SingleFile)
    val parts = options.collectFirst { case PartitionedBy(c) => c }
    val sorted = options.collectFirst { case SortedBy(cols @ _*) => cols }
    var out = df
    sorted.foreach(cols => out = out.sortWithinPartitions(cols.map(col): _*))
    if (single) out = out.coalesce(1)
    val writer = out.write.mode("overwrite")
    parts match {
      case Some(c) => writer.partitionBy(c).parquet(path)
      case None => writer.parquet(path)
    }
  }
}

sealed trait WriteOption
/** K1: spec-valid single file (coalesce-1 commit). */
case object SingleFile extends WriteOption
/** K4: sharded directory (default). */
case object Sharded extends WriteOption
/** Hive-style partition layout on a column. */
final case class PartitionedBy(column: String) extends WriteOption
/** Order-preservation contract: sort within partitions before write
  * (README.md:148-161).
  */
final case class SortedBy(columns: String*) extends WriteOption
