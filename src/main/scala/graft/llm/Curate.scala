package graft.llm

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a 100 TB training-data run needs beyond
  * Dedup/TextStats/Pipeline: sketch-prefiltered decontamination and
  * heavy-hitter mining (Bloom / Count-Min — one tiny driver-side
  * sketch broadcast back as a MAP-SIDE prefilter so the big table's
  * shuffle only carries candidate rows), sequence packing into
  * fixed-token context windows, consistent (engine-reproducible)
  * per-stratum sampling, and PII scrubbing.
  *
  * Exactness contract for the sketch-bounded ops: both sketches are
  * one-sided (a Bloom filter has no false negatives; Count-Min never
  * under-estimates), so the sketch pass can only ADMIT too much, and
  * the exact verify step that follows trims the result to precisely
  * the plain-join / plain-HAVING answer. The DuckDB oracles therefore
  * state the sketch-free semantics and still hash-match.
  *
  * Reference analogue: broadcast index-membership prefilters before
  * the record scan (interval-list membership, SamSource.java:79-102;
  * index-bounded splits, BamSource.java:99-119) — the same
  * "cheap bound first, exact work on survivors" shape.
  */
object Curate extends QueryModule {

  /** Word-bigram rows WITH duplicates: (doc_id, tok). Same native
    * `ngrams` map-stage build as Dedup.shingleRows (see that scaladoc
    * for the rejected window/lambda forms), minus the distinct:
    * frequency ops need multiplicity.
    */
  private def bigramRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.NgramFunctions.ngrams(col("text"), 2)).as("tok"))

  /** Benchmark decontamination, Bloom-bounded: docs sharing ANY
    * 3-gram shingle with the benchmark set (docs 0-4 stand in) are
    * dropped; the query returns the surviving clean corpus.
    *
    * Scale shape: the benchmark shingle set is sketched into a Bloom
    * filter on the driver and broadcast; the corpus shingle stream is
    * filtered map-side BEFORE any shuffle, so only
    * possibly-contaminated rows reach the exact verify join (at fpp
    * 0.01 that is ~1% of clean traffic plus true hits). The verify
    * join against the broadcast probe set removes Bloom false
    * positives — no false negatives exist, so the result equals the
    * sketch-free anti-join the oracle states.
    *
    * The sketch probe is the codegen'd `BloomMightContain` expression
    * (SketchFunctions.scala) — it probes the broadcast filter on raw
    * UTF8String bytes inside WholeStageCodegen, pre-shuffle on the
    * scan side; no Scala UDF anywhere in the plan.
    */
  def decontamBloom(s: SparkSession, dir: String): DataFrame =
    decontamBloomDocs(s, T.t(s, dir, "documents"))

  private[graft] def decontamBloomDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val sh = Dedup.shingleRows(docs).localCheckpoint()
    val probe = sh.filter($"doc_id" < 5).select($"tok").distinct()
    val bloom = probe.stat.bloomFilter("tok", 200000L, 0.01)
    val b = s.sparkContext.broadcast(bloom)
    val flagged = sh.filter($"doc_id" >= 5)
      .filter(graft.functions.SketchFunctions.bloom_might_contain($"tok", b))
      .join(broadcast(probe), "tok") // exact verify: trims Bloom false positives
      .select($"doc_id").distinct()
    docs.select($"doc_id").filter($"doc_id" >= 5)
      .join(flagged, Seq("doc_id"), "left_anti")
      .orderBy($"doc_id")
  }

  /** NEAR-duplicate decontamination (n-gram CONTAINMENT): a corpus doc
    * is flagged against a benchmark doc when it holds ≥ 15% of that
    * benchmark's distinct 3-gram shingles — the asymmetric measure
    * benchmark-leak scanning needs (a long doc QUOTING a short
    * benchmark item has low Jaccard but high containment, exactly the
    * case symmetric near-dup joins miss).
    *
    * Scale shape: the benchmark side is small by definition (eval sets
    * are KBs–MBs), so both the gram join and the size join BROADCAST —
    * the corpus gram stream is filtered map-side against the broadcast
    * benchmark gram set before any shuffle, and the only wide exchange
    * is the (doc, bench) count aggregation over actual matches.
    * Containment ships as floor'd integer ppm (drift contract — no
    * round(double) in hashed output).
    */
  def decontamNear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Dedup.shingleRows(T.t(s, dir, "documents")).localCheckpoint()
    val bench = sh.filter($"doc_id" < 25)
      .withColumnRenamed("doc_id", "bench_id")
    val benchSize = bench.groupBy($"bench_id")
      .agg(count(lit(1)).as("n_bench"))
    sh.filter($"doc_id" >= 25)
      .join(broadcast(bench), "tok")
      .groupBy($"doc_id", $"bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(benchSize), "bench_id")
      .withColumn("cont_ppm", expr("n_shared * 1000000L div n_bench"))
      .filter($"cont_ppm" >= 150000L)
      .select($"doc_id", $"bench_id", $"cont_ppm")
      .orderBy($"doc_id", $"bench_id")
  }

  /** Heavy-hitter mining, Count-Min-bounded: word bigrams whose
    * frequency is at least 1/1000 of all bigram occurrences.
    *
    * Scale shape: one pass builds a mergeable Count-Min sketch
    * (driver holds ~100 KB regardless of corpus size; partial
    * sketches merge associatively) whose totalCount also fixes the
    * threshold without a separate agg job. The broadcast sketch then
    * filters the stream map-side: only tokens whose ESTIMATE reaches
    * the threshold are shuffled for exact counting. Count-Min only
    * over-estimates, so every true heavy hitter survives the
    * prefilter; the exact count + HAVING trims the over-admitted
    * tail — the result is exactly the oracle's GROUP BY/HAVING.
    * (Cormode & Muthukrishnan, J.Alg 55(1), 2005.) The estimate
    * probe is the codegen'd `CmsEstimateCount` expression — no
    * Scala UDF in the plan.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHittersDocs(s, T.t(s, dir, "documents"))

  private[graft] def heavyHittersDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val grams = bigramRows(docs).localCheckpoint()
    val cms = grams.stat.countMinSketch(col("tok"), 0.0002, 0.99, 42)
    val thr = cms.totalCount() / 1000.0
    val b = s.sparkContext.broadcast(cms)
    grams.filter(
      graft.functions.SketchFunctions.cms_estimate($"tok", b) >= thr)
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= thr)
      .orderBy($"n".desc, $"tok")
  }

  /** Sequence packing: concatenate documents in deterministic order
    * and chunk into fixed 512-token context windows — each doc is
    * assigned to the pack where it STARTS (the concat-and-chunk
    * packing LLM pretraining actually uses; docs may straddle pack
    * boundaries). Packing runs independently inside 8 salt groups,
    * the local[·] stand-in for per-partition packing at cluster
    * scale: one narrow shuffle on the group key, then a window
    * cumulative sum — no global sort, no driver state.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    packCounts(s, T.t(s, dir, "documents").select(
      $"doc_id",
      pmod($"doc_id", lit(8)).as("grp"),
      size(split($"text", " ")).cast("long").as("n")))
  }

  /** Packing core over pre-computed (doc_id, grp, n) token counts. */
  private[graft] def packCounts(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"grp").orderBy($"doc_id")
    d.withColumn("start", sum($"n").over(w) - $"n")
      .withColumn("pack", floor($"start" / lit(512.0)))
      .groupBy($"grp", $"pack")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("tok_sum"))
      .orderBy($"grp", $"pack")
  }

  /** Consistent per-stratum sampling: keep the k=5 docs with the
    * smallest md5(doc_id) per language — a deterministic uniform
    * sample that is reproducible run-to-run, engine-to-engine, and
    * STABLE UNDER CORPUS GROWTH (a doc's keep/drop flips only when a
    * smaller-hash doc enters its stratum), which seeded RNG sampling
    * is not. The rank-≤-k filter compiles to WindowGroupLimit, so
    * each map task forwards only its local top-k per stratum.
    */
  def sampleConsistent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    T.t(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"lang", $"doc_id")
      .orderBy($"lang", $"doc_id")
  }

  /** PII scrubbing: redact emails and phone numbers via codegen'd
    * regexp_replace — pure column expressions, scan-speed, no UDFs.
    * The fixture corpus contains no PII, so a contact line is
    * synthesized per doc first (same expression both engines);
    * the scrubbed-text hash proves byte-identical redaction.
    */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+[0-9][0-9-]{5,}"
    val contact = concat(
      $"text", lit(" contact user"), $"doc_id".cast("string"),
      lit("@mail.example.com or call +1-555-"),
      lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"))
    T.t(s, dir, "documents")
      .select(
        $"doc_id",
        size(regexp_extract_all(contact, lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(contact, lit(phoneRe), lit(0))).as("n_phones"),
        md5(regexp_replace(regexp_replace(contact, emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("scrub_hash"))
      .orderBy($"doc_id")
  }

  /** Top distinctive terms per doc, TF-IDF shape with integer-exact
    * ordering (tf desc, document-frequency asc, term asc — the
    * float-free rank of tf·idf): per-doc term counts, a tiny global
    * document-frequency dim joined back BROADCAST, and a rank-≤-3
    * window that compiles to WindowGroupLimit. Two partial-agged
    * shuffles on (doc_id, tok) / (tok); the df table is vocabulary-
    * sized, never corpus-sized.
    */
  def topTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = T.t(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"tok".asc)
    tf.join(broadcast(df), "tok")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"doc_id", $"tok", $"tf", $"df")
      .orderBy($"doc_id", $"tok")
  }

  /** Overlapping text chunking (RAG/window prep): 128-token windows
    * with stride 96 (32-token overlap), every token covered, last
    * chunk short. One explode per doc — row count is Σ ceil(n/96),
    * no shuffle at all until the output sort; at cluster scale this
    * is a pure map stage. Chunk content hashes prove byte-identical
    * slicing across engines.
    */
  def chunkOverlap(s: SparkSession, dir: String): DataFrame =
    chunkOverlapDocs(s, T.t(s, dir, "documents"))

  private[graft] def chunkOverlapDocs(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val W = 128
    val S = 96
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("n"))
      .withColumn("nc", greatest(lit(1L),
        ceil(($"n" - (W - S)).cast("double") / S).cast("long")))
      .select($"doc_id", $"toks", $"n",
        explode(sequence(lit(0L), $"nc" - 1)).as("chunk_id"))
      .select(
        $"doc_id", $"chunk_id",
        ($"chunk_id" * S).as("start"),
        least(lit(W.toLong), $"n" - $"chunk_id" * S).as("len"),
        md5(concat_ws(" ",
          slice($"toks", ($"chunk_id" * S + 1).cast("int"), lit(W))))
          .as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Canonical-URL dedup — the first dedup pass every web-scale
    * pipeline runs BEFORE touching content (a URL census is free;
    * shingling is not): synthesize each doc's source URL (mixed-case
    * host + volatile tracking query), canonicalize with the CODEGEN
    * `parse_url` built-in — lowercase the HOST, keep the PATH, drop
    * the query string entirely (utm_* and session ids are exactly
    * what makes raw-URL dedup useless) — and census the collision
    * groups. Pure map + one hash agg; at 100 TB this is scan-speed.
    */
  def urlCanon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "documents")
      .withColumn("url", concat(
        lit("https://"), upper($"source"), lit(".Example.com/"),
        $"lang", lit("/p"), ($"doc_id" % 50).cast("string"),
        lit("?utm_source=feed&session="), $"doc_id".cast("string")))
      .select($"doc_id", concat(
        lower(expr("parse_url(url, 'HOST')")),
        expr("parse_url(url, 'PATH')")).as("canon"))
      .groupBy($"canon")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
      .orderBy($"canon")
  }

  /** Text normalization — the first stage of every curation pipeline
    * (C4/CCNet shape): lowercase, strip non-alphanumerics, collapse
    * whitespace, trim. Pure codegen'd column expressions at scan
    * speed. The fixture corpus is pre-clean, so a deterministic mess
    * is synthesized first (case flip + punctuation + ragged spacing —
    * same expression both engines, the piiScrub pattern); the
    * normalized-text hash proves byte-identical cleaning.
    */
  def normalizeText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val messy = concat(upper($"text"), lit("  !! "),
      $"lang", lit(".  The,  End?? "))
    val norm = trim(regexp_replace(
      regexp_replace(lower(messy), "[^a-z0-9 ]", ""), " +", " "))
    T.t(s, dir, "documents")
      .select(
        $"doc_id",
        length(messy).as("n_raw"),
        length(norm).as("n_norm"),
        md5(norm).as("norm_hash"))
      .orderBy($"doc_id")
  }

  /** Temperature-resampled domain mixture — the training-mix op:
    * per-source sampling probability ∝ n^α (α=0.5 here), so
    * low-resource domains are UP-weighted relative to proportional
    * sampling, under a global budget of half the corpus. Everything
    * that could drift between engines is pinned: √n quantizes through
    * DECIMAL(18,6) before the order-independent sum, the rate is a
    * floor'd integer ppm from one fixed-shape double expression, and
    * the per-doc keep decision is the md5-prefix uniform — a
    * deterministic coin any engine can replay. Corpus-scale work is
    * one scan + one broadcast join; the stats/rate table is
    * sources-sized.
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val docs = T.t(s, dir, "documents")
    // sources-sized; pinned so the four consumers (global, rates,
    // kept's broadcast, the final join) don't each rescan documents
    val stats = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", sqrt($"n_docs").cast(DecimalType(18, 6))
        .cast(DoubleType))
      .localCheckpoint()
    val global = stats.agg(
      sum(sqrt($"n_docs").cast(DecimalType(18, 6))).cast(DoubleType)
        .as("sumw"),
      sum($"n_docs").as("total"))
    val rates = stats.crossJoin(broadcast(global))
      .withColumn("rate_ppm",
        expr("least(1000000, cast(floor(((total div 2) * 1000000.0) * w" +
          " / sumw / n_docs) as bigint))"))
      .select($"source", $"n_docs", $"rate_ppm")
    val u = expr(
      "cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10)" +
        " as bigint) % 1000000")
    val kept = docs.join(broadcast(rates), "source")
      .filter(u < $"rate_ppm")
      .groupBy($"source").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left_outer")
      .select($"source", $"n_docs", $"rate_ppm",
        coalesce($"n_kept", lit(0L)).as("n_kept"))
      .orderBy($"source")
  }

  /** N-gram novelty vs the growing corpus: the fraction of a doc's
    * distinct 3-gram shingles whose FIRST owner (min doc_id) is the
    * doc itself — the streaming-ingest "how much of this batch is
    * new text" statistic (near-1 = fresh, near-0 = rehash of earlier
    * docs). Two partial-agged shuffles (gram → first owner, join
    * back → per-doc ratio), both keyed on the gram/doc — no windows,
    * no driver state; the ratio ships as integer ppm (pure integer
    * arithmetic, the llm_repetition drift contract).
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Dedup.shingleRows(T.t(s, dir, "documents"))
      .localCheckpoint() // feeds the first-owner agg AND the ratio join
    val first = grams.groupBy($"tok").agg(min($"doc_id").as("first_doc"))
    grams.join(first, "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when($"first_doc" === $"doc_id", 1)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        expr("n_novel * 1000000L div n_grams").as("novelty_ppm"))
      .orderBy($"doc_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_normalize" -> (normalizeText(_, _)),
    "llm_url_canon" -> (urlCanon(_, _)),
    "llm_ngram_novelty" -> (ngramNovelty(_, _)),
    "llm_chunk_overlap" -> (chunkOverlap(_, _)),
    "llm_decontam_bloom" -> (decontamBloom(_, _)),
    "llm_decontam_near" -> (decontamNear(_, _)),
    "llm_heavy_hitters" -> (heavyHitters(_, _)),
    "llm_pack_sequences" -> (packSequences(_, _)),
    "llm_sample_consistent" -> (sampleConsistent(_, _)),
    "llm_mix_temperature" -> (mixTemperature(_, _)),
    "llm_pii_scrub" -> (piiScrub(_, _)),
    "llm_top_terms" -> (topTerms(_, _)))

  // shared DuckDB fragment: distinct word-3-gram shingles (the
  // Dedup/Pipeline oracle CTE)
  private val shingleCte =
    """s AS (
      |  SELECT doc_id, unnest([toks[i] || '_' || toks[i+1] || '_' || toks[i+2]
      |      FOR i IN generate_series(1, len(toks)-2)]) AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      |t AS (SELECT DISTINCT doc_id, tok FROM s)""".stripMargin

  // single-line: a multi-line fragment would put the SQL || operator at
  // line start, where the enclosing oracle's stripMargin eats one bar
  private val contactSql =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@mail.example.com or call +1-555-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"

  override def oracleSql: Map[String, String] = Map(
    "llm_url_canon" ->
      """SELECT lower(upper(source) || '.Example.com') || '/' || lang
        |    || '/p' || CAST(doc_id % 50 AS VARCHAR) AS canon,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
        |FROM documents GROUP BY 1 ORDER BY canon""".stripMargin,
    "llm_normalize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    upper(text) || '  !! ' || lang || '.  The,  End?? ' AS messy
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, messy,
        |    trim(regexp_replace(regexp_replace(lower(messy),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM m)
        |SELECT doc_id,
        |  CAST(length(messy) AS INT) AS n_raw,
        |  CAST(length(norm) AS INT) AS n_norm,
        |  md5(norm) AS norm_hash
        |FROM n ORDER BY doc_id""".stripMargin,
    "llm_ngram_novelty" ->
      s"""WITH $shingleCte,
         |first AS (SELECT tok, MIN(doc_id) AS first_doc FROM t GROUP BY tok)
         |SELECT t.doc_id,
         |  COUNT(*) AS n_grams,
         |  COUNT(CASE WHEN first_doc = t.doc_id THEN 1 END) AS n_novel,
         |  CAST((COUNT(CASE WHEN first_doc = t.doc_id THEN 1 END) * 1000000)
         |      // COUNT(*) AS BIGINT) AS novelty_ppm
         |FROM t JOIN first USING (tok)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "llm_chunk_overlap" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, n,
        |    unnest(generate_series(0,
        |      greatest(1, CAST(ceil((n - 32) / 96.0) AS BIGINT)) - 1)) AS chunk_id
        |  FROM d)
        |SELECT doc_id, chunk_id, chunk_id * 96 AS start,
        |  least(128, n - chunk_id * 96) AS len,
        |  md5(array_to_string(
        |    toks[CAST(chunk_id * 96 + 1 AS BIGINT) :
        |         CAST(chunk_id * 96 + 128 AS BIGINT)], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "llm_decontam_bloom" ->
      s"""WITH $shingleCte,
         |probe AS (SELECT DISTINCT tok FROM t WHERE doc_id < 5),
         |flagged AS (
         |  SELECT DISTINCT doc_id FROM t JOIN probe USING (tok)
         |  WHERE doc_id >= 5)
         |SELECT d.doc_id FROM documents d
         |WHERE d.doc_id >= 5
         |  AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
         |ORDER BY d.doc_id""".stripMargin,
    "llm_decontam_near" ->
      s"""WITH $shingleCte,
         |bench AS (SELECT doc_id AS bench_id, tok FROM t WHERE doc_id < 25),
         |bsz AS (SELECT bench_id, COUNT(*) AS n_bench
         |        FROM bench GROUP BY bench_id),
         |inter AS (
         |  SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
         |  FROM t c JOIN bench b USING (tok) WHERE c.doc_id >= 25
         |  GROUP BY 1, 2)
         |SELECT doc_id, bench_id,
         |  n_shared * 1000000 // n_bench AS cont_ppm
         |FROM inter JOIN bsz USING (bench_id)
         |WHERE n_shared * 1000000 // n_bench >= 150000
         |ORDER BY doc_id, bench_id""".stripMargin,
    "llm_heavy_hitters" ->
      """WITH g AS (
        |  SELECT unnest([toks[i] || '_' || toks[i+1]
        |      FOR i IN generate_series(1, len(toks)-1)]) AS tok
        |  FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
        |c AS (SELECT tok, COUNT(*) AS n FROM g GROUP BY tok)
        |SELECT tok, n FROM c
        |WHERE n >= (SELECT COUNT(*) FROM g) / 1000.0
        |ORDER BY n DESC, tok""".stripMargin,
    "llm_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 8 AS grp,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT grp, doc_id, n,
        |    SUM(n) OVER (PARTITION BY grp ORDER BY doc_id) - n AS start
        |  FROM d)
        |SELECT grp, CAST(floor(start / 512.0) AS BIGINT) AS pack,
        |  COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS tok_sum
        |FROM c GROUP BY grp, pack ORDER BY grp, pack""".stripMargin,
    "llm_sample_consistent" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id FROM r WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin,
    // mirrors mixTemperature expression-for-expression: DECIMAL-
    // quantized sqrt weights, fixed-shape double rate, md5 coin
    "llm_mix_temperature" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(CAST(sqrt(COUNT(*)) AS DECIMAL(18,6)) AS DOUBLE) AS w
        |  FROM documents GROUP BY source),
        |g AS (
        |  SELECT CAST(SUM(CAST(sqrt(n_docs) AS DECIMAL(18,6))) AS DOUBLE)
        |      AS sumw,
        |    SUM(n_docs) AS total
        |  FROM s),
        |r AS (
        |  SELECT source, n_docs,
        |    LEAST(1000000, CAST(floor(((total // 2) * 1000000.0) * w
        |      / sumw / n_docs) AS BIGINT)) AS rate_ppm
        |  FROM s, g),
        |k AS (
        |  SELECT d.source, COUNT(*) AS n_kept
        |  FROM documents d JOIN r USING (source)
        |  WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))
        |          AS BIGINT) % 1000000 < r.rate_ppm
        |  GROUP BY d.source)
        |SELECT r.source, r.n_docs, r.rate_ppm,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
        |FROM r LEFT JOIN k USING (source)
        |ORDER BY r.source""".stripMargin,
    "llm_pii_scrub" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all($contactSql,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all($contactSql,
         |    '\\+[0-9][0-9-]{5,}')) AS INT) AS n_phones,
         |  md5(regexp_replace(regexp_replace($contactSql,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\+[0-9][0-9-]{5,}', '<PHONE>', 'g')) AS scrub_hash
         |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_top_terms" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |r AS (
        |  SELECT doc_id, tok, tf, df,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf DESC, df, tok) AS rn
        |  FROM tf JOIN df USING (tok))
        |SELECT doc_id, tok, tf, df FROM r WHERE rn <= 3
        |ORDER BY doc_id, tok""".stripMargin)
}
