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

  /** Driver-row ceiling for the LocalScan materialization: metadata
    * tables are manifest-sized by DESIGN (10⁴–10⁵ entries), but a
    * 10⁷-file table's `#files` would be a driver-memory incident —
    * refuse past the gate with guidance instead of OOMing the driver
    * mid-plan. `spark.graft.meta.maxLocalRows` raises it knowingly.
    */
  private def requireLocalSized(spark: SparkSession, what: String,
      n: Long): Unit = {
    val max = spark.conf.getOption("spark.graft.meta.maxLocalRows")
      .map(_.toLong).getOrElse(2000000L)
    if (n > max) throw new IllegalStateException(
      s"$what would materialize $n driver-local rows, over the " +
        s"spark.graft.meta.maxLocalRows ceiling of $max — raise the " +
        "ceiling knowingly (driver memory), or reduce the entry " +
        "count first (compact for #files, vacuum for #history)")
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

  /** Running snapshot view for the O(delta) history walk: the
    * resolved version's data files, DV count, per-file row tallies,
    * and W/N/P/H tag-line sets — advanced incrementally by each
    * version's RAW delta lines, rebuilt from the fully resolved list
    * only at checkpoints, vacuum gaps, and claims the incremental
    * form cannot apply exactly.
    */
  private final class HistState {
    val dataSet = scala.collection.mutable.HashSet[String]()
    val rByFile = scala.collection.mutable.HashMap[String, Long]()
    var dvCount = 0L
    var rMatched = 0L   // data files with an R entry
    var rSumLive = 0L   // sum of R rows over files in dataSet
    val wSet = scala.collection.mutable.HashSet[String]()
    val nSet = scala.collection.mutable.HashSet[String]()
    val pSet = scala.collection.mutable.HashSet[String]()
    val hSet = scala.collection.mutable.LinkedHashSet[String]()

    def rebuild(entries: Seq[String]): Unit = {
      dataSet.clear(); rByFile.clear(); wSet.clear(); nSet.clear()
      pSet.clear(); hSet.clear()
      dvCount = 0L; rMatched = 0L; rSumLive = 0L
      entries.foreach(addLine)
    }

    /** Apply one fresh manifest line (delta addition / checkpoint
      * line). Resolved lists may repeat identical metadata lines
      * across a delta chain — sets dedup them like the old
      * full-list classifier's `.toSet` did.
      */
    def addLine(l: String): Unit =
      if (!l.contains('\t')) {
        if (dataSet.add(l)) rByFile.get(l).foreach { r =>
          rMatched += 1; rSumLive += r
        }
      } else if (l.startsWith("R\t")) {
        val p = l.split('\t')
        val (rows, file) = (p(1).toLong, p(2))
        val had = rByFile.put(file, rows)
        if (dataSet.contains(file)) had match {
          case Some(old) => rSumLive += rows - old
          case None => rMatched += 1; rSumLive += rows
        }
      } else if (l.startsWith("D\t")) dvCount += 1
      else if (l.startsWith("W\t")) { wSet += l; () }
      else if (l.startsWith("N\t")) { nSet += l; () }
      else if (l.startsWith("P\t")) { pSet += l; () }
      else if (l.startsWith("H\t")) { hSet += l; () }

    def rowCount: Any =
      if (rMatched == dataSet.size) rSumLive else null
  }

  private def historyRows(spark: SparkSession, st: GraftStorage,
      path: String): Array[InternalRow] =
    // committed_at for EVERY version from ONE `_manifest/` listing,
    // which ALSO pre-resolves the per-version cache-validation
    // lookups — the per-version getFileStatus form is 10⁴ serial
    // HEADs at plan time on an object store with 10⁴ retained
    // commits (the same per-file-RPC trap the #files bytes column
    // avoids below). The walk itself runs at DELTA rate: each delta
    // commit advances a running state by its raw lines; only
    // checkpoints, vacuum gaps, and inexact removal claims pay a
    // full resolve — the naive per-version full-list diff is
    // O(commits × files), a measured 90 s at 10⁴ commits × 10⁴
    // files (MetaScale), where this walk stays manifest-rate.
    st.withManifestListing(path) { listing =>
      val versions = st.listVersions(path)
      requireLocalSized(spark, s"graft.`$path#history`", versions.size)
      // a commit can land between the listing and listVersions: any
      // version NEWER than the listing snapshot falls back to live
      // per-version lookups (mtime + op tag) — the rare raced tail,
      // never the 10⁴-commit bulk
      val maxListed = listing.keys
        .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
        .maxOption.getOrElse(-1L)
      val fs = new Path(new Path(path), "_manifest")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val state = new HistState
      var prevV = -1L
      versions.map { v =>
        var addedData = false
        var removedData = false
        var dvAdded = false
        var wapAdded = false
        val prevWNonEmpty = state.wSet.nonEmpty
        val prevN = Set.empty[String] ++ state.nSet
        val prevP = Set.empty[String] ++ state.pSet
        val prevH = Set.empty[String] ++ state.hSet
        val raw =
          if (v == prevV + 1) st.rawManifestLines(path, v)
          else Seq.empty
        val deltaShaped = raw.headOption
          .exists(_.startsWith(s"G\tdelta\t$prevV\t"))
        // claims the incremental state applies EXACTLY: whole-kind
        // or prefix claims on tracked metadata kinds, claims on
        // untracked kinds (T/O/S/B). Bare-path (data), R, and
        // narrow D claims fall back to the full resolve.
        val exact = deltaShaped && raw.drop(1).forall { l =>
          !l.startsWith("X\t") || {
            val c = l.drop(2)
            c == "D\t" || c.startsWith("W\t") || c.startsWith("N\t") ||
              c.startsWith("P\t") || c.startsWith("H\t") ||
              c.startsWith("T\t") || c.startsWith("O\t") ||
              c.startsWith("S\t") || c.startsWith("B\t")
          }
        }
        if (exact) {
          raw.drop(1).foreach { l =>
            if (l.startsWith("X\t")) {
              val c = l.drop(2)
              if (c == "D\t") state.dvCount = 0L
              else if (c.startsWith("W\t"))
                state.wSet.filterInPlace(!_.startsWith(c)): Unit
              else if (c.startsWith("N\t"))
                state.nSet.filterInPlace(!_.startsWith(c)): Unit
              else if (c.startsWith("P\t"))
                state.pSet.filterInPlace(!_.startsWith(c)): Unit
              else if (c.startsWith("H\t"))
                state.hSet.filterInPlace(!_.startsWith(c)): Unit
            } else {
              if (!l.contains('\t')) {
                if (!state.dataSet.contains(l)) addedData = true
              } else if (l.startsWith("D\t")) dvAdded = true
              else if (l.startsWith("W\t") && !state.wSet.contains(l))
                wapAdded = true
              state.addLine(l)
            }
          }
        } else {
          // checkpoint / vacuum gap / inexact claim: one full
          // resolve, change booleans by diff against the carried
          // state (D lines are per-file unique, so count growth
          // witnesses fresh DVs exactly as the old set diff did)
          val cur = st.manifestEntries(path, v)
          val curData = scala.collection.mutable.HashSet[String]()
          cur.foreach(l => if (!l.contains('\t')) curData += l)
          addedData = prevV >= 0 && curData.exists(!state.dataSet(_))
          removedData = prevV >= 0 && state.dataSet.exists(!curData(_))
          val curD = cur.filter(_.startsWith("D\t")).toSet
          dvAdded = prevV >= 0 && curD.size > state.dvCount
          val curW = cur.filter(_.startsWith("W\t")).toSet
          wapAdded = prevV >= 0 && curW.exists(!state.wSet(_))
          state.rebuild(cur)
        }
        val committedAt: Any = listing.get(s"v$v")
          .map(_.getModificationTime * 1000L)
          .orElse(if (v <= maxListed) None
            else try Some(fs.getFileStatus(new Path(
              new Path(path), s"_manifest/v$v"))
              .getModificationTime * 1000L)
            catch { case _: java.io.IOException => None })
          .getOrElse(null)
        val op =
          (if (listing.contains(s"v$v.op") || v > maxListed)
            st.commitOpOf(path, v)
           else None).getOrElse {
            if (prevV < 0 && v == versions.head) "create"
            else classifyBools(addedData, removedData, dvAdded,
              wapAdded, prevWNonEmpty, state.wSet.isEmpty,
              prevN != state.nSet, prevP != state.pSet,
              (state.hSet.toSet -- prevH).toSeq, prevH)
          }
        prevV = v
        InternalRow(v, committedAt, UTF8String.fromString(op),
          state.dataSet.size.toLong, state.dvCount, state.rowCount,
          state.wSet.nonEmpty)
      }.toArray
    }

  /** Infer a commit's operation from its change booleans (computed
    * at delta rate, or by set diff at checkpoints). Order matters:
    * data-moving classes win over metadata-only ones — the same
    * decision ladder the original full-list classifier used.
    */
  private def classifyBools(added: Boolean, removed: Boolean,
      dvAdded: Boolean, wapAdded: Boolean, prevWNonEmpty: Boolean,
      curWEmpty: Boolean, nChanged: Boolean, pChanged: Boolean,
      hAddedLines: Seq[String], hPrev: Set[String]): String =
    if (wapAdded) "wap-stage"
    else if (removed && added) "overwrite"
    else if (removed) "delete"
    else if (dvAdded && added) "merge-on-read-upsert"
    else if (dvAdded) "merge-on-read-delete"
    else if (added) "append"
    else if (prevWNonEmpty && curWEmpty) "wap-publish"
    else if (nChanged) "alter-column-mapping"
    else if (pChanged) "alter-partition-spec"
    else if (hAddedLines.nonEmpty) {
      // a fresh H line re-declaring ONLY existing columns is a
      // widening ALTER COLUMN TYPE; genuinely new names are ADD
      // COLUMNS. An unparseable H payload degrades the LABEL, not
      // the read-only inspection surface.
      import org.apache.spark.sql.types.{DataType, StructType}
      def names(hs: Iterable[String]): Set[String] = hs.flatMap(h =>
        scala.util.Try(DataType.fromJson(h.drop(2))
          .asInstanceOf[StructType].fieldNames.toSeq)
          .getOrElse(Seq.empty)).toSet
      val addedNames = names(hAddedLines)
      val prior = names(hPrev)
      if (addedNames.nonEmpty && addedNames.forall(prior.contains))
        "alter-column-type"
      else "add-columns"
    }
    else "alter-metadata"

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
    requireLocalSized(spark, s"graft.`$path#files`",
      dataFiles.size.toLong + dvFiles.size)
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
