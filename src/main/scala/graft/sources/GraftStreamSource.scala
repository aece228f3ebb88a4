package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MANIFEST-DRIVEN streaming source over a versioned table's commit
  * log — `spark.readStream.format("graft-stream").load(path)` (the
  * engine behind [[GraftStorage.streamVersioned]]): offsets are
  * COMMIT VERSIONS, and each micro-batch reads exactly the data
  * files the manifests ADDED in `(start, end]`. This is the Delta/
  * Iceberg streaming-table design, and it closes the two caveats the
  * old file-glob implementation documented:
  *
  *   - WRITE-AUDIT-PUBLISH: `latestOffset` resolves the latest
  *     PUBLISHED version ([[GraftStorage.latestVisibleVersion]]), so
  *     a [[GraftStorage.wapStage]]d commit's files are invisible to
  *     consumers until the audit publishes — a discarded stage is
  *     never emitted (the glob surfaced staged files immediately);
  *   - NON-APPEND commits: a copy-on-write rewrite (files removed in
  *     the range) or deletion-vector drift fails LOUDLY instead of
  *     silently re-surfacing carried rows; `ignoreChanges=true` opts
  *     into add-only delivery across such commits (Delta's
  *     `skipChangeCommits` contract).
  *
  * Offsets live in the consumer's checkpoint — each commit's delta
  * is processed exactly once across restarts. `maxVersionsPerTrigger`
  * bounds how many commits one micro-batch drains (admission
  * control); default is everything pending. At 100 TB the per-batch
  * work is the manifest diff + the delta files — never a listing of
  * the table.
  *
  * Reference analogue: the reference's streaming half does not
  * exist; this is the "subscribe to a lakehouse table" surface the
  * north star requires, driven by the same commit log as every
  * other read.
  */
final class GraftStreamSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-stream requires .load(<versioned table path>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val st = GraftStorage(spark)
    val path = pathOf(options)
    st.readVersioned(path, Some(st.latestVisibleVersion(path))).schema
  }

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStreamTable(
      pathOf(new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] final class GraftStreamTable(
    path: String, tableSchema: StructType) extends Table with SupportsRead {

  override def name(): String = s"graft-stream:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = { () =>
    new Scan {
      override def readSchema(): StructType = tableSchema
      override def description(): String = s"GraftStream $path"
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new GraftMicroBatchStream(path, tableSchema,
          ignoreChanges = Option(options.get("ignoreChanges"))
            .exists(_.toBoolean),
          // bounded by default (Delta defaults maxFilesPerTrigger
          // likewise): an unconsumed 10⁵-commit history must drain
          // as bounded batches, not one mega-batch
          maxVersionsPerTrigger =
            Option(options.get("maxVersionsPerTrigger")).map { v =>
              val n = v.toInt
              require(n > 0,
                s"maxVersionsPerTrigger must be positive, got $n " +
                  "(a non-positive cap would freeze the stream)")
              n
            }.orElse(Some(128)))
    }
  }
}

private[sources] final class GraftMicroBatchStream(
    path: String, schema: StructType, ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Int])
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active
  private def st = GraftStorage(spark)
  private def classic = spark
    .asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  private case class VOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  override def initialOffset(): Offset = VOffset(-1L)
  override def deserializeOffset(json: String): Offset =
    VOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def latestOffset(): Offset =
    VOffset(st.latestVisibleVersion(path))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Trigger.AvailableNow pins the drain target ONCE; batches then
    * advance toward it under admission control instead of collapsing
    * into a single mega-batch (the wrapper Spark applies to sources
    * without this interface ignores per-batch limits).
    */
  @volatile private var availableTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(st.latestVisibleVersion(path))

  private def isPublished(v: Long): Boolean =
    !st.manifestEntries(path, v).exists(_.startsWith("W\t"))

  /** Admission control: at most `maxVersionsPerTrigger` PUBLISHED
    * commits per micro-batch (one batch per commit with the value
    * 1). Offsets only ever take published-version values — a
    * checkpoint landing ON a staged version would seed the next
    * batch's diff from a manifest default readers never saw (staged
    * rows silently lost at publish, discards misread as change
    * commits).
    */
  override def latestOffset(startOffset: Offset, limit: ReadLimit)
      : Offset = {
    val latest = availableTarget
      .getOrElse(st.latestVisibleVersion(path))
    val start = startOffset.asInstanceOf[VOffset].v
    val stepped = maxVersionsPerTrigger match {
      case Some(n) =>
        val pub = st.listVersions(path).iterator
          .filter(v => v > start && v <= latest)
          .filter(isPublished).take(n).toSeq
        if (pub.isEmpty) start else pub.last
      case _ => latest
    }
    VOffset(stepped)
  }

  // Pre-existing STABLE deletion vectors (no drift in the range) are
  // sound to stream across: by the sequence rule
  // (GraftStorage.manifestFilesDvs) a DV deletes only from files
  // committed BEFORE it, so every file a later append adds is live
  // in full — including rows that re-use a previously deleted key.
  // Only DV DRIFT (a delete/upsert inside the range) and MoR INITIAL
  // snapshots need the loud path.
  private def changeError(start: Long, end: Long, what: String) =
    new IllegalStateException(
      s"graft-stream on $path: versions ($start, $end] contain a " +
        s"non-append change ($what). Streaming a rewritten range " +
        "would re-surface or drop rows; set ignoreChanges=true to " +
        "SKIP change commits (their files are not re-delivered), or " +
        "start a fresh checkpoint.")

  /** Files to deliver for `(start, end]`: walk the PUBLISHED
    * versions in the range (audit-pending staged manifests are
    * skipped — their files enter at their PUBLISH commit, and a
    * discarded stage never appears in any published manifest), and
    * collect each append-only step's added files. A step that
    * removed files or drifted deletion vectors is a CHANGE COMMIT:
    * loud error, or skipped entirely under `ignoreChanges` (the
    * skip-change-commits contract — rewritten rows are never
    * re-delivered as duplicates). Falls back to the coarse
    * whole-range diff when vacuum retired an intermediate manifest
    * (same classification, conservatively).
    */
  private def deltaFiles(start: Long, end: Long): Seq[String] = {
    val endFiles = st.manifestFiles(path, end)
    if (start < 0) {
      // initial snapshot: a merge-on-read table cannot stream as a
      // raw file scan — the DV anti-join would be silently skipped
      // and deleted rows re-delivered as live (same refusal as the
      // V1 front door). REORG/compact first.
      require(st.manifestDvs(path, end).isEmpty,
        s"graft-stream on $path: the snapshot carries merge-on-read " +
          "deletion vectors; streaming raw files would resurrect " +
          "deleted rows. Run compactVersioned (REORG) first.")
      return endFiles
    }
    // the CONSUMER's own position must still resolve: if retention
    // did not cover its lag, fail with the actionable message (the
    // generic resolve error reads like corruption)
    try st.manifestFiles(path, start)
    catch {
      case _: IllegalArgumentException =>
        throw new IllegalStateException(
          s"graft-stream on $path: checkpointed version $start was " +
            "vacuumed — table retention must cover consumer lag " +
            "(vacuum keepLast, or pin a tag/branch at or before the " +
            "consumer's offset). Restart with a fresh checkpoint to " +
            "re-read the current snapshot.")
    }
    val fine =
      try {
        val published = (start + 1 to end).filter(v =>
          !st.manifestEntries(path, v).exists(_.startsWith("W\t")))
        var prevSet = st.manifestFiles(path, start).toSet
        var prevDvs = st.manifestDvs(path, start).toSet
        val out = Seq.newBuilder[String]
        published.foreach { v =>
          val cur = st.manifestFiles(path, v)
          val curSet = cur.toSet
          val curDvs = st.manifestDvs(path, v).toSet
          val removed = prevSet.diff(curSet)
          if (removed.isEmpty && curDvs == prevDvs)
            out ++= cur.filterNot(prevSet)
          else if (!ignoreChanges)
            throw changeError(start, end,
              if (removed.nonEmpty)
                s"version $v removed ${removed.size} file(s)"
              else s"version $v drifted deletion vectors")
          prevSet = curSet
          prevDvs = curDvs
        }
        Some(out.result())
      } catch {
        case _: IllegalArgumentException => None // vacuumed interior
      }
    fine match {
      // appends preceding an in-range change commit ARE delivered
      // (their rows were live when committed — the skipChangeCommits
      // contract); a racing vacuum of such a file fails the read
      // loudly, never silently
      case Some(added) => added.distinct
      case None =>
        val endSet = endFiles.toSet
        val startFiles = st.manifestFiles(path, start).toSet
        val removed = startFiles.filterNot(endSet)
        val dvDrift = st.manifestDvs(path, start).toSet !=
          st.manifestDvs(path, end).toSet
        if ((removed.nonEmpty || dvDrift) && !ignoreChanges)
          throw changeError(start, end,
            if (removed.nonEmpty) s"${removed.size} file(s) removed"
            else "deletion-vector drift")
        // coarse precision under ignoreChanges: per-commit skip is
        // impossible without the interior manifests, so deliver the
        // ADDED files (rewrite outputs may re-deliver carried rows —
        // the documented ignoreChanges duplicate caveat; never loss)
        endFiles.filterNot(startFiles)
    }
  }

  private def parquetScanOver(files: Seq[String])
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan = {
    val index = new InMemoryFileIndex(classic,
      files.map(new Path(_)), Map.empty, Some(schema))
    ParquetScanBuilder(classic, index, schema, schema,
      CaseInsensitiveStringMap.empty()).build()
      .asInstanceOf[org.apache.spark.sql.execution.datasources
        .v2.parquet.ParquetScan]
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[VOffset].v
    val e = end.asInstanceOf[VOffset].v
    if (e <= s) return Array.empty
    val files = deltaFiles(s, e)
    if (files.isEmpty) Array.empty
    else parquetScanOver(files).toBatch.planInputPartitions()
  }

  /** Reader factory binds schema + conf, not a file list — one
    * factory serves every batch's partitions.
    */
  override def createReaderFactory(): PartitionReaderFactory =
    parquetScanOver(Seq.empty).toBatch.createReaderFactory()

  override def toString: String = s"GraftMicroBatchStream($path)"
}
