package graft.llm

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline compositions — the operators a
  * 100 TB curation run chains AFTER the primitives in Dedup/TextStats:
  * survivor selection, deterministic sampling, distribution summaries,
  * benchmark decontamination. Each is one declarative plan (no
  * driver-side loops beyond what Dedup.dedupClusters already bounds).
  */
object Pipeline extends QueryModule {

  /** Survivor selection: every document gets a cluster (its near-dup
    * component label, or itself when unpaired — singleton clusters),
    * and each cluster keeps its highest-quality member (quality score
    * from TextStats.quality; ties broken by min doc_id). This is the
    * step that turns pair-finding into an actual dedup decision at
    * scale: one left join against the (tiny) pair-cluster labels + one
    * window argmax partitioned by cluster.
    */
  def dedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = Dedup.dedupClusters(s, dir) // (doc_id, cluster_id), paired docs only
    val q = TextStats.quality(s, dir).select($"doc_id", $"score")
    val all = T.t(s, dir, "documents").select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"cluster_id", $"doc_id"))
      .join(q, "doc_id")
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"score".desc, $"doc_id")
    all
      .withColumn("rn", row_number().over(w))
      .groupBy($"cluster_id")
      .agg(
        min(when($"rn" === 1, $"doc_id")).as("survivor_id"),
        count(lit(1)).as("n_members"))
      .orderBy($"cluster_id")
  }

  /** Deterministic stratified sampling: per-language keep rates
    * applied via a stable key function (doc_id mod), so the sample is
    * reproducible run-to-run and engine-to-engine — the property a
    * training-data pipeline needs for auditability (seeded RNG
    * sampling is Spark-version-dependent). Map-side only: no shuffle
    * except the summary agg.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keepPct = when($"lang" === "en", 20)
      .when($"lang" === "fr", 50)
      .otherwise(80)
    T.t(s, dir, "documents")
      .withColumn("keep", pmod($"doc_id", lit(100)) < keepPct)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_total"),
        count(when($"keep", 1)).as("n_kept"))
      .orderBy($"lang")
  }

  /** Token-count histogram: fixed-width buckets over whitespace token
    * counts — the corpus-shape summary a curation run reports. Single
    * pass, map-side bucket + tiny shuffle.
    */
  def tokenHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "documents")
      .select(floor(size(split($"text", " ")) / 20).cast("long").as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"bucket")
  }

  /** Benchmark decontamination: count 3-gram shingle overlap between
    * every corpus document and a (small) benchmark set — here the
    * first 5 docs stand in for the benchmark. The probe side is
    * distinct shingles broadcast to the corpus scan (the reference's
    * broadcast interval-list membership pattern, SamSource.java:79-102)
    * so the corpus is touched once, no shuffle of corpus rows; a doc
    * with ≥5 shared shingles is flagged contaminated.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one materialization feeds both the probe set and the corpus side
    val shingles = Dedup.shingleRows(T.t(s, dir, "documents")).localCheckpoint()
    val probe = shingles.filter($"doc_id" < 5)
      .select($"tok").distinct()
    shingles.filter($"doc_id" >= 5)
      .join(broadcast(probe), "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter($"n_overlap" >= 5)
      .orderBy($"doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_survivors" -> (dedupSurvivors(_, _)),
    "llm_sample_stratified" -> (sampleStratified(_, _)),
    "llm_token_hist" -> (tokenHist(_, _)),
    "llm_contamination" -> (contamination(_, _)))

  // shared DuckDB fragments: distinct word-3-gram shingles (same CTE
  // the Dedup oracles use) and the TextStats quality score expression
  private val shingleCte =
    """s AS (
      |  SELECT doc_id, unnest([toks[i] || '_' || toks[i+1] || '_' || toks[i+2]
      |      FOR i IN generate_series(1, len(toks)-2)]) AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      |t AS (SELECT DISTINCT doc_id, tok FROM s)""".stripMargin

  private val scoreSql =
    """round(len(list_distinct(string_split(text, ' ')))
      |    * 1.0 / len(string_split(text, ' ')) * 0.5
      |  + least(len(string_split(text, ' ')), 100) / 100.0 * 0.5, 6)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "llm_dedup_survivors" ->
      s"""WITH RECURSIVE $shingleCte,
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |  FROM t a JOIN t b USING (tok) WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN sz sa ON sa.doc_id = doc_a
         |  JOIN sz sb ON sb.doc_id = doc_b
         |  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT src AS doc_id, src AS lbl FROM edges
         |  UNION
         |  SELECT e.dst AS doc_id, r.lbl
         |  FROM reach r JOIN edges e ON e.src = r.doc_id),
         |lbl AS (SELECT doc_id, MIN(lbl) AS cluster_id
         |        FROM reach GROUP BY doc_id),
         |alldocs AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |    $scoreSql AS score
         |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id),
         |ranked AS (
         |  SELECT cluster_id, doc_id,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY score DESC, doc_id) AS rn
         |  FROM alldocs)
         |SELECT cluster_id,
         |  MIN(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
         |  COUNT(*) AS n_members
         |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "llm_sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN doc_id % 100 <
        |    CASE WHEN lang = 'en' THEN 20
        |         WHEN lang = 'fr' THEN 50 ELSE 80 END
        |    THEN 1 END) AS n_kept
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "llm_token_hist" ->
      """SELECT CAST(floor(len(string_split(text, ' ')) / 20) AS BIGINT)
        |    AS bucket,
        |  COUNT(*) AS cnt
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,
    "llm_contamination" ->
      s"""WITH $shingleCte,
         |probe AS (SELECT DISTINCT tok FROM t WHERE doc_id < 5)
         |SELECT doc_id, COUNT(*) AS n_overlap
         |FROM t JOIN probe USING (tok)
         |WHERE doc_id >= 5
         |GROUP BY doc_id HAVING COUNT(*) >= 5
         |ORDER BY doc_id""".stripMargin)
}
