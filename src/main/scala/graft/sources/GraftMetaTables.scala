package graft.sources

import java.util.Locale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Queryable METADATA TABLES over a versioned graft table — the
  * Iceberg `table.history`/`table.files` / Delta `DESCRIBE HISTORY`
  * inspection surface, addressed with a `#` suffix on the table path:
  *
  * {{{
  *   SELECT * FROM graft.`/path/to/t#history`     -- one row per commit
  *   SELECT * FROM graft.`/path/to/t#files`       -- current snapshot's files
  *   SELECT * FROM graft.`/path/to/t#refs`        -- tags + branches
  *   SELECT * FROM graft.`/path/to/t#properties`  -- declared TBLPROPERTIES
  * }}}
  *
  * Everything is served at METADATA RATE from the manifest log — no
  * data file is opened: `#history` resolves each version's line list
  * (cached, O(delta) chains), `#files` reads the current manifest's
  * file/DV lines plus `R` row-count lines, `#refs`/`#properties` list
  * the `_refs`/`_props` sidecars. At 10⁵ files and 10⁴ commits these
  * queries stay interactive because the manifest algebra already
  * guarantees resolve-once caching — the same property the reads rely
  * on. Results materialize as a [[LocalScan]] (driver-local rows):
  * table metadata is small by design, and a LocalScan keeps the plan
  * a `LocalTableScan` any downstream join/filter composes with.
  *
  * The reference keeps this information implicit in its index/file
  * layout (SBIIndexMerger / IndexFileMerger.java); a lakehouse
  * migration expects it as queryable tables, so graft ships it the
  * DSv2 way.
  */
private[sources] object GraftMetaTables {

  /** Recognized `#<kind>` suffixes. */
  val Kinds: Set[String] = Set("history", "files", "refs", "properties")

  /** Split `"/path#kind"` into (path, kind); None when the name has
    * no recognized metadata suffix (then it is a plain table path —
    * `#` is legal in a filesystem name, so ONLY the known kinds
    * dispatch here and everything else stays a data-table lookup).
    */
  def split(name: String): Option[(String, String)] = {
    val i = name.lastIndexOf('#')
    if (i <= 0) None
    else {
      val kind = name.substring(i + 1).toLowerCase(Locale.ROOT)
      if (Kinds(kind)) Some((name.substring(0, i), kind)) else None
    }
  }

  def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = true),
      StructField("operation", StringType, nullable = false),
      StructField("data_files", LongType, nullable = false),
      StructField("delete_files", LongType, nullable = false),
      // null when any data file predates row-count manifest lines
      StructField("row_count", LongType, nullable = true),
      StructField("audit_pending", BooleanType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      // physical rows from the commit's R line (pre-DV; null for DVs)
      StructField("rows", LongType, nullable = true),
      StructField("bytes", LongType, nullable = true)))
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case "properties" => StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown graft metadata table kind '$other' " +
        s"(have: ${Kinds.toSeq.sorted.mkString(", ")})")
  }

  def rows(spark: SparkSession, path: String,
      kind: String): Array[InternalRow] = {
    val st = GraftStorage(spark)
    kind match {
      case "history" => historyRows(spark, st, path)
      case "files" => fileRows(spark, st, path)
      case "refs" =>
        st.listRefs(path).map { case (full, v) =>
          val (tpe, name) = full.span(_ != '.')
          InternalRow(UTF8String.fromString(name.drop(1)),
            UTF8String.fromString(tpe), v)
        }.toArray
      case "properties" =>
        st.tablePropertiesOf(path).toSeq.sortBy(_._1).map {
          case (k, v) =>
            InternalRow(UTF8String.fromString(k), UTF8String.fromString(v))
        }.toArray
    }
  }

  private def historyRows(spark: SparkSession, st: GraftStorage,
      path: String): Array[InternalRow] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var prev: Option[Seq[String]] = None
    st.listVersions(path).map { v =>
      val cur = st.manifestEntries(path, v)
      val data = cur.filterNot(_.contains('\t'))
      val dvs = cur.count(_.startsWith("D\t"))
      val rmap = cur.collect { case e if e.startsWith("R\t") =>
        val p = e.split('\t'); p(2) -> p(1).toLong }.toMap
      val rowCount: Any =
        if (data.forall(rmap.contains)) data.map(rmap).sum else null
      val committedAt: Any =
        try fs.getFileStatus(
          new Path(new Path(path), s"_manifest/v$v")).getModificationTime *
          1000L
        catch { case _: java.io.IOException => null }
      val op = st.commitOpOf(path, v).getOrElse(classify(prev, cur))
      prev = Some(cur)
      InternalRow(v, committedAt, UTF8String.fromString(op),
        data.size.toLong, dvs.toLong, rowCount,
        cur.exists(_.startsWith("W\t")))
    }.toArray
  }

  /** Infer a commit's operation from the manifest diff when no
    * maintenance op tag was recorded. Order matters: data-moving
    * classes win over metadata-only ones.
    */
  private def classify(prevOpt: Option[Seq[String]],
      cur: Seq[String]): String = prevOpt match {
    case None => "create"
    case Some(prev) =>
      def data(e: Seq[String]) = e.filterNot(_.contains('\t')).toSet
      def tagged(e: Seq[String], k: String) =
        e.filter(_.startsWith(k + "\t")).toSet
      val added = (data(cur) -- data(prev)).nonEmpty
      val removed = (data(prev) -- data(cur)).nonEmpty
      val dvAdded = (tagged(cur, "D") -- tagged(prev, "D")).nonEmpty
      if ((tagged(cur, "W") -- tagged(prev, "W")).nonEmpty) "wap-stage"
      else if (removed && added) "overwrite"
      else if (removed) "delete"
      else if (dvAdded && added) "merge-on-read-upsert"
      else if (dvAdded) "merge-on-read-delete"
      else if (added) "append"
      else if (tagged(prev, "W").nonEmpty && tagged(cur, "W").isEmpty)
        "wap-publish"
      else if (tagged(cur, "N") != tagged(prev, "N")) "alter-column-mapping"
      else if (tagged(cur, "P") != tagged(prev, "P")) "alter-partition-spec"
      else if (tagged(cur, "H") != tagged(prev, "H")) {
        // a fresh H line re-declaring ONLY existing columns is a
        // widening ALTER COLUMN TYPE; genuinely new names are ADD
        // COLUMNS. An unparseable H payload degrades the LABEL, not
        // the read-only inspection surface.
        import org.apache.spark.sql.types.{DataType, StructType}
        def names(hs: Set[String]): Set[String] = hs.flatMap(h =>
          scala.util.Try(DataType.fromJson(h.drop(2))
            .asInstanceOf[StructType].fieldNames.toSeq)
            .getOrElse(Seq.empty))
        val added = names(tagged(cur, "H") -- tagged(prev, "H"))
        val prior = names(tagged(prev, "H"))
        if (added.nonEmpty && added.forall(prior.contains))
          "alter-column-type"
        else "add-columns"
      }
      else "alter-metadata"
  }

  private def fileRows(spark: SparkSession, st: GraftStorage,
      path: String): Array[InternalRow] = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      st.manifestEntries(path, st.latestVisibleVersion(path))
    val rmap = entries.collect { case e if e.startsWith("R\t") =>
      val p = e.split('\t'); p(2) -> p(1).toLong }.toMap
    val dataFiles = entries.filterNot(_.contains('\t'))
    val dvFiles = entries.collect {
      case e if e.startsWith("D\t") => e.split('\t')(2) }
    // bytes via ONE directory listing per commit dir, not one
    // FileStatus RPC per file — at 10⁵ files on an object store the
    // per-file form is ~an hour of serial HEADs at plan time
    def key(p: String): String = new Path(p).toUri.getPath
    val sizes: Map[String, Long] =
      (dataFiles ++ dvFiles).map(f => new Path(f).getParent)
        .distinct.flatMap { d =>
          try fs.listStatus(d).toSeq.collect {
            case st if st.isFile => key(st.getPath.toString) -> st.getLen
          } catch { case _: java.io.IOException => Seq.empty }
        }.toMap
    def bytesOf(f: String): Any =
      sizes.get(key(f)).fold(null: Any)(identity)
    val dataRows = dataFiles.map { f =>
      InternalRow(UTF8String.fromString(f), UTF8String.fromString("data"),
        rmap.get(f).fold(null: Any)(identity), bytesOf(f))
    }
    val dvRows = dvFiles.map { f =>
      InternalRow(UTF8String.fromString(f), UTF8String.fromString("delete"),
        null, bytesOf(f))
    }
    (dataRows ++ dvRows).toArray
  }
}

/** One metadata table (see [[GraftMetaTables]]): read-only, batch
  * capability only — INSERT/DELETE/stream on `#history` and friends
  * fail at analysis with a capability error, exactly right.
  */
private[sources] final class GraftMetadataTable(
    private val path: String,
    private val kind: String) extends Table with SupportsRead {

  override def name(): String = s"graft.`$path#$kind`"

  override def schema(): StructType = GraftMetaTables.schemaOf(kind)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        // materialized at plan time, driver-local: metadata tables
        // are manifest-sized by construction, never data-sized
        private val data =
          GraftMetaTables.rows(SparkSession.active, path, kind)
        override def rows(): Array[InternalRow] = data
        override def readSchema(): StructType =
          GraftMetaTables.schemaOf(kind)
      }
    }
}
