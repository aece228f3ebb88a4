package graft.llm

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque binary payload + typed metadata.
  * Real pipelines put image/audio/video bytes here; the harness has no
  * media fixtures, so payloads are the documents' UTF-8 bytes — the
  * Spark-side plumbing (binary column, typed batch decode, schema) is
  * identical.
  */
case class MmAsset(doc_id: Long, payload: Array[Byte], width: Int, format: String)

/** Features produced by the per-partition "decoder". */
case class MmFeatures(doc_id: Long, byte_len: Int, n_frames: Int,
    first_byte: Int, frame_checksum: Long)

/** One sampled "frame" of an asset (1:N decode output). */
case class MmFrame(doc_id: Long, frame_idx: Int, b: Int)

/** Multimodal-column operators — SURVEY.md §2.11 north star.
  *
  * Decode / feature-extract runs as a typed mapPartitions over the
  * binary column: one iterator per partition, so a real decoder
  * (JNI image lib, audio codec) amortizes init per task, exactly the
  * batch shape a Pandas-UDF/mapInPandas pipeline uses. The media
  * decode itself is STUBBED with a deterministic byte-sampler
  * ("frame" = every 64th byte) — the container ships no media libs —
  * but schema, partitioning and batch flow are real and oracled.
  */
object Multimodal extends QueryModule {

  def assets(s: SparkSession, dir: String) = {
    import s.implicits._
    T.t(s, dir, "documents")
      .select(
        $"doc_id",
        $"text".cast("binary").as("payload"),
        $"n_chars".cast("int").as("width"),
        lit("txt").as("format"))
      .as[MmAsset]
  }

  /** STUB decoder: samples one "frame" byte every 64 bytes. A real
    * implementation would decode the payload and emit per-frame
    * features; the iterator/batch shape would not change.
    */
  private def decodePartition(it: Iterator[MmAsset]): Iterator[MmFeatures] =
    it.map { a =>
      val bytes = a.payload
      var i = 0
      var checksum = 0L
      var frames = 0
      while (i < bytes.length) {
        checksum += (bytes(i) & 0xFF)
        frames += 1
        i += 64
      }
      MmFeatures(a.doc_id, bytes.length, frames,
        if (bytes.nonEmpty) bytes(0) & 0xFF else -1, checksum)
    }

  /** Binary decode + feature extraction through the typed batch path. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .mapPartitions(decodePartition)
      .toDF()
      .orderBy($"doc_id")
  }

  /** 1:N frame extraction — each asset yields one row per sampled
    * frame (the video-frame-table shape): a flat iterator per
    * partition, so frame explosion never materializes per-asset
    * collections.
    */
  def mmFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .mapPartitions(_.flatMap { a =>
        val bytes = a.payload
        Iterator.range(0, bytes.length, 64).map(i =>
          MmFrame(a.doc_id, i / 64, bytes(i) & 0xFF))
      })
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Metadata projection + grouping over the asset schema (typed
    * columns survive around the opaque payload).
    */
  def mmMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir).toDF()
      .groupBy($"format", (floor($"width" / 100) * 100).cast("int").as("width_band"))
      .agg(count(lit(1)).as("cnt"), sum(length($"payload")).as("total_bytes"))
      .orderBy($"format", $"width_band")
  }

  /** Binary-column sink round trip: opaque payloads written to
    * columnar parquet and read back byte-identical (checksummed per
    * row, summarized for the oracle) — the property that lets a
    * 100 TB multimodal table live in the same storage/scan path as
    * its typed metadata.
    */
  def mmRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.scratch(dir, "mm_assets")
    assets(s, dir).toDF().write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .groupBy($"format")
      .agg(count(lit(1)).as("n_assets"),
        sum(length($"payload")).as("total_bytes"),
        countDistinct(md5($"payload")).as("n_distinct"))
      .orderBy($"format")
  }

  /** Exact binary dedup over the payload column: content-hash groupBy
    * with min-id survivor — the asset-level pass a multimodal corpus
    * runs before any expensive decode (hashing bytes is scan-speed;
    * decode is not). Every 50th asset is re-ingested under a new id
    * to plant true duplicates; the query reports each duplicate
    * group's keeper and copy count.
    */
  def mmDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = assets(s, dir).toDF()
    val reingested = a.filter($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + 10000)
    a.union(reingested)
      .groupBy(md5($"payload").as("h"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .filter($"n_copies" >= 2)
      .select($"keeper", $"n_copies")
      .orderBy($"keeper")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_dedup" -> (mmDedup(_, _)),
    "mm_features" -> (mmFeatures(_, _)),
    "mm_frames" -> (mmFrames(_, _)),
    "mm_roundtrip" -> (mmRoundtrip(_, _)),
    "mm_meta" -> (mmMeta(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "mm_dedup" ->
      """WITH a AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 50 = 0)
        |SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM a GROUP BY md5(text) HAVING COUNT(*) >= 2
        |ORDER BY keeper""".stripMargin,
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS byte_len,
        |  CAST(len([i FOR i IN generate_series(1, CAST(len(text) AS BIGINT), 64)]) AS INT)
        |    AS n_frames,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  CAST(list_sum([ascii(substr(text, CAST(i AS INT), 1))
        |    FOR i IN generate_series(1, CAST(len(text) AS BIGINT), 64)]) AS BIGINT)
        |    AS frame_checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id,
        |  unnest([CAST((i - 1) // 64 AS INT)
        |          FOR i IN generate_series(1, CAST(len(text) AS BIGINT), 64)])
        |    AS frame_idx,
        |  unnest([ascii(substr(text, CAST(i AS INT), 1))
        |          FOR i IN generate_series(1, CAST(len(text) AS BIGINT), 64)])
        |    AS b
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_roundtrip" ->
      """SELECT 'txt' AS format, COUNT(*) AS n_assets,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT md5(text)) AS n_distinct
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin,
    "mm_meta" ->
      """SELECT 'txt' AS format,
        |  CAST(floor(n_chars / 100) * 100 AS INT) AS width_band,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1, 2 ORDER BY format, width_band""".stripMargin)
}
