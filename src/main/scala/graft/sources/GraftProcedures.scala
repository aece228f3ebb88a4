package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance PROCEDURES for the graft catalog — the SQL form
  * of the lakehouse operations the Scala API already ships, via
  * Spark 4's `ProcedureCatalog`/`CALL` machinery:
  *
  * {{{
  *   CALL graft.compact(path => '/t', target_files => 4)
  *   CALL graft.optimize_zorder('/t', 'a,b')
  *   CALL graft.vacuum('/t', keep_last => 2)
  *   CALL graft.restore('/t', 0)
  *   CALL graft.clone('/t', '/fork')
  *   CALL graft.add_constraint('/t', 'pos', 'x > 0')
  *   CALL graft.drop_constraint('/t', 'pos')
  *   CALL graft.alter_partition_spec('/t', 'bucket(8,k)')
  *   CALL graft.compact_where('/t', "ts >= TIMESTAMP'2024-01-29'", 4)
  * }}}
  *
  * Each returns a one-row result (the committed version, or the
  * operation's count) through a `LocalScan`. The reference has no
  * SQL at all; this is the OPTIMIZE/VACUUM/RESTORE console surface
  * of Delta/Iceberg re-expressed over the graft commit protocol.
  */
private[sources] object GraftProcedures {

  private def spark: SparkSession = SparkSession.active

  private final case class Proc(
      procName: String,
      params: Seq[ProcedureParameter],
      outSchema: StructType,
      body: InternalRow => Seq[Any]) extends UnboundProcedure {
    override def name(): String = procName
    override def description(): String =
      s"graft table maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def description(): String = Proc.this.description()
        override def parameters(): Array[ProcedureParameter] =
          params.toArray
        // side-effecting table maintenance — never cache/reorder
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val values = body(input)
          val row = InternalRow.fromSeq(values.map {
            case s: String => UTF8String.fromString(s)
            case other => other
          })
          java.util.Collections.singletonList[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = outSchema
          }).iterator()
        }
      }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def versionOut = StructType(Seq(StructField("version", LongType)))

  private val procs: Map[String, UnboundProcedure] = Seq(
    Proc("compact",
      Seq(in("path", StringType),
        inDefault("target_files", IntegerType, "1")),
      versionOut,
      in => Seq(GraftStorage(spark).compactVersioned(
        in.getUTF8String(0).toString, in.getInt(1)))),
    Proc("optimize_zorder",
      Seq(in("path", StringType), in("cols", StringType),
        inDefault("target_files", IntegerType, "8")),
      versionOut,
      in => Seq(GraftStorage(spark).optimizeVersioned(
        in.getUTF8String(0).toString,
        in.getUTF8String(1).toString.split(",").map(_.trim).toSeq,
        in.getInt(2)))),
    Proc("vacuum",
      Seq(in("path", StringType),
        inDefault("keep_last", IntegerType, "1")),
      StructType(Seq(StructField("deleted_files", LongType))),
      in => Seq(GraftStorage(spark).vacuumVersioned(
        in.getUTF8String(0).toString, in.getInt(1)))),
    Proc("remove_orphans",
      Seq(in("path", StringType),
        inDefault("older_than_hours", IntegerType, "72")),
      StructType(Seq(StructField("deleted_files", LongType))),
      in => Seq(GraftStorage(spark).removeOrphansVersioned(
        in.getUTF8String(0).toString,
        in.getInt(1) * 3600L * 1000L))),
    Proc("restore",
      Seq(in("path", StringType), in("version", LongType)),
      versionOut,
      in => Seq(GraftStorage(spark).restoreVersioned(
        in.getUTF8String(0).toString, in.getLong(1)))),
    Proc("clone",
      Seq(in("src", StringType), in("dst", StringType)),
      versionOut,
      in => Seq(GraftStorage(spark).cloneVersioned(
        in.getUTF8String(0).toString, in.getUTF8String(1).toString))),
    Proc("add_constraint",
      Seq(in("path", StringType), in("name", StringType),
        in("predicate", StringType)),
      StructType(Seq(StructField("name", StringType))),
      in => {
        GraftStorage(spark).addCheckConstraint(
          in.getUTF8String(0).toString, in.getUTF8String(1).toString,
          in.getUTF8String(2).toString)
        Seq(in.getUTF8String(1).toString)
      }),
    Proc("apply_deletes",
      Seq(in("path", StringType)),
      versionOut,
      in => Seq(GraftStorage(spark).applyDeletesVersioned(
        in.getUTF8String(0).toString))),
    Proc("compact_where",
      Seq(in("path", StringType), in("predicate", StringType),
        inDefault("target_files", IntegerType, "1")),
      versionOut,
      in => Seq(GraftStorage(spark).compactVersionedWhere(
        in.getUTF8String(0).toString,
        org.apache.spark.sql.functions.expr(
          in.getUTF8String(1).toString),
        in.getInt(2)))),
    Proc("alter_partition_spec",
      Seq(in("path", StringType), in("spec", StringType)),
      versionOut,
      in => Seq(GraftStorage(spark).alterPartitionSpec(
        in.getUTF8String(0).toString,
        GraftStorage.splitSpecTokens(in.getUTF8String(1).toString)))),
    Proc("drop_constraint",
      Seq(in("path", StringType), in("name", StringType)),
      StructType(Seq(StructField("name", StringType))),
      in => {
        GraftStorage(spark).dropCheckConstraint(
          in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        Seq(in.getUTF8String(1).toString)
      }),
    Proc("tag",
      Seq(in("path", StringType), in("name", StringType),
        inDefault("version", LongType, "-1")),
      versionOut,
      in => {
        val v = in.getLong(2)
        Seq(GraftStorage(spark).tagVersion(
          in.getUTF8String(0).toString, in.getUTF8String(1).toString,
          if (v < 0) None else Some(v)))
      }),
    Proc("branch",
      Seq(in("path", StringType), in("name", StringType),
        inDefault("version", LongType, "-1")),
      versionOut,
      in => {
        val v = in.getLong(2)
        Seq(GraftStorage(spark).branchVersion(
          in.getUTF8String(0).toString, in.getUTF8String(1).toString,
          if (v < 0) None else Some(v)))
      }),
    Proc("drop_ref",
      Seq(in("path", StringType), in("name", StringType)),
      StructType(Seq(StructField("name", StringType))),
      in => {
        GraftStorage(spark).dropRef(
          in.getUTF8String(0).toString, in.getUTF8String(1).toString)
        Seq(in.getUTF8String(1).toString)
      }),
    Proc("wap_publish",
      Seq(in("path", StringType), in("wap_id", StringType)),
      versionOut,
      in => Seq(GraftStorage(spark).wapPublish(
        in.getUTF8String(0).toString, in.getUTF8String(1).toString))),
    Proc("wap_discard",
      Seq(in("path", StringType), in("wap_id", StringType)),
      versionOut,
      in => Seq(GraftStorage(spark).wapDiscard(
        in.getUTF8String(0).toString, in.getUTF8String(1).toString)))
  ).map(p => p.procName -> (p: UnboundProcedure)).toMap

  def names: Seq[String] = procs.keys.toSeq.sorted

  def load(name: String): Option[UnboundProcedure] =
    procs.get(name.toLowerCase(java.util.Locale.ROOT))
}
