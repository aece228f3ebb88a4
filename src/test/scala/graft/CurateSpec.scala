package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation-operator gates: the sketch-bounded ops (Bloom decontam,
  * Count-Min heavy hitters) must equal their sketch-free exact
  * counterparts — the one-sided-error argument made in Curate's
  * scaladoc, checked end-to-end — plus packing arithmetic, sampling
  * stability under corpus growth, and scrub completeness.
  */
class CurateSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF, SF01}
  import spark.implicits._

  test("bloom decontamination equals the sketch-free anti-join") {
    val got = llm.Curate.decontamBloom(spark, SF01)
      .as[Long].collect().toSet
    val sh = llm.Dedup.shingleRows(T.t(spark, SF01, "documents"))
      .localCheckpoint()
    val probe = sh.filter($"doc_id" < 5).select($"tok").distinct()
    val expected = T.t(spark, SF01, "documents")
      .select($"doc_id").filter($"doc_id" >= 5)
      .join(sh.join(probe, "tok").select($"doc_id").distinct(),
        Seq("doc_id"), "left_anti")
      .as[Long].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(got.nonEmpty && expected.size < 495,
      s"gate is trivial: clean=${got.size}/495")
  }

  test("count-min heavy hitters equal the exact GROUP BY / HAVING") {
    val got = llm.Curate.heavyHitters(spark, SF01)
      .as[(String, Long)].collect().toSet
    val grams = T.t(spark, SF01, "documents")
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val bi = grams
      .select(concat_ws("_", $"tok", lead($"tok", 1).over(w)).as("tok"),
        lead($"tok", 1).over(w).as("t1"))
      .filter($"t1".isNotNull).select($"tok").localCheckpoint()
    val total = bi.count()
    val expected = bi.groupBy($"tok").agg(count(lit(1)).as("n"))
      .filter($"n" >= total / 1000.0)
      .as[(String, Long)].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(got.nonEmpty, "threshold admitted nothing — gate is trivial")
  }

  test("sequence packing matches an independent driver-side recompute") {
    val got = llm.Curate.packSequences(spark, SF01)
      .as[(Long, Long, Long, Long)].collect().toSet
    val docs = T.t(spark, SF01, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .as[(Long, Long)].collect()
    val expected = docs.groupBy(_._1 % 8).toSeq.flatMap { case (grp, ds) =>
      var off = 0L
      ds.sortBy(_._1).map { case (_, n) =>
        val pack = off / 512
        off += n
        (grp, pack, n)
      }
    }.groupBy(t => (t._1, t._2))
      .map { case ((grp, pack), xs) =>
        (grp, pack, xs.size.toLong, xs.map(_._3).sum)
      }.toSet
    assert(got == expected)
    // packs are contiguous per group (no empty pack ids skipped except
    // by a doc longer than the budget straddling several windows)
    val byGrp = got.groupBy(_._1)
    byGrp.foreach { case (grp, rows) =>
      assert(rows.map(_._2).min == 0L, s"grp $grp must start at pack 0")
    }
  }

  test("consistent sample: stratum sizes capped at k, stable under growth") {
    val full = llm.Curate.sampleConsistent(spark, SF01)
      .as[(String, Long)].collect()
    val strata = T.t(spark, SF01, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    full.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length == math.min(5L, strata(lang)), lang)
    }
    // growth stability: on the half corpus, every full-corpus winner
    // that exists in the subset must still win (its hash rank can only
    // improve when competitors are removed)
    val out = T.scratch(SF01, "docs_half")
    T.t(spark, SF01, "documents").filter($"doc_id" % 2 === 0)
      .write.mode("overwrite").parquet(out)
    val half = spark.read.parquet(out)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val halfWinners = half.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"lang", $"doc_id")
      .as[(String, Long)].collect().toSet
    val fullWinnersInHalf = full.filter(_._2 % 2 == 0).toSet
    assert(fullWinnersInHalf.subsetOf(halfWinners),
      s"lost winners: ${fullWinnersInHalf -- halfWinners}")
  }

  test("pii scrub leaves no matchable email or phone") {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+[0-9][0-9-]{5,}"
    val contact = concat(
      $"text", lit(" contact user"), $"doc_id".cast("string"),
      lit("@mail.example.com or call +1-555-"),
      lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"))
    val residual = T.t(spark, SF01, "documents")
      .select(md5(regexp_replace(regexp_replace(contact, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>")).as("h"),
        (size(regexp_extract_all(
          regexp_replace(regexp_replace(contact, emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"), lit(emailRe), lit(0))) +
          size(regexp_extract_all(
            regexp_replace(regexp_replace(contact, emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>"), lit(phoneRe), lit(0)))).as("left"))
      .agg(max($"left")).as[Int].collect()(0)
    assert(residual == 0, s"$residual PII matches survived the scrub")
    // and the query itself found the planted PII
    val counts = llm.Curate.piiScrub(spark, SF01)
      .agg(min($"n_emails"), min($"n_phones")).as[(Int, Int)].collect()(0)
    assert(counts._1 >= 1 && counts._2 >= 1, counts.toString)
  }

  test("overlapping chunks cover every token exactly, stride 96") {
    val got = llm.Curate.chunkOverlap(spark, SF01)
      .select($"doc_id", $"chunk_id", $"start", $"len")
      .as[(Long, Long, Long, Long)].collect()
    val nToks = T.t(spark, SF01, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (id, chunks) =>
      val n = nToks(id)
      val sorted = chunks.sortBy(_._2)
      assert(sorted.head._3 == 0L, s"doc $id must start at 0")
      // chained coverage: each chunk starts inside the previous one
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + 96 && a._3 + a._4 > b._3, s"doc $id gap")
        case _ =>
      }
      val last = sorted.last
      assert(last._3 + last._4 == n, s"doc $id tail uncovered")
      assert(chunks.forall(c => c._4 >= 1 && c._4 <= 128), s"doc $id len")
    }
  }

  test("chunker on long synthetic docs: grid, overlap, and content hashes") {
    // fixture docs are all <= 99 tokens (single-chunk); drive the
    // multi-chunk path with 300/1000-token synthetic docs and check
    // against a driver-side recompute including md5 of each slice
    val docs = spark.range(20).select(
      $"id".as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0),
        when($"id" % 2 === 0, 299).otherwise(999)),
        i => concat(lit("w"), $"id", lit("_"), i))).as("text"))
    val got = llm.Curate.chunkOverlapDocs(spark, docs)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val texts = docs.as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = texts.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val n = toks.length
      val nc = math.max(1L, math.ceil((n - 32) / 96.0).toLong)
      (0L until nc).map { k =>
        val s0 = (k * 96).toInt
        val sliceStr = toks.slice(s0, s0 + 128).mkString(" ")
        val hash = md.digest(sliceStr.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, k, k * 96, math.min(128L, n - k * 96), hash)
      }
    }.toSet
    assert(got == expected)
    assert(expected.exists(_._2 >= 2), "multi-chunk path not exercised")
  }

  test("winnowing guarantee: docs sharing a >=6-word run share a fingerprint") {
    // the scheme's contract (SIGMOD'03): a shared run of t = w+k-1 = 6
    // words yields >= 1 shared (3-gram-hash, window-4) fingerprint.
    // Two otherwise-disjoint docs share a planted 10-word run.
    val shared = (0 until 10).map(i => s"run$i").mkString(" ")
    val docs = spark.createDataFrame(Seq(
      (0L, s"alpha beta gamma delta $shared eps zeta"),
      (1L, s"uno dos tres $shared quatro cinco seis siete"),
      (2L, "completely different words only here nothing shared at all")
    )).toDF("doc_id", "text")
    val fps = llm.TextStats.winnowDocs(spark, docs)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(0L) & fps(1L)).nonEmpty, "planted shared run missed")
    assert((fps(0L) & fps(2L)).isEmpty && (fps(1L) & fps(2L)).isEmpty,
      "disjoint docs must not collide at this scale")
  }

  test("top terms: exactly min(3, distinct toks) rows per doc, tf dominant") {
    val got = llm.Curate.topTerms(spark, SF01)
    val perDoc = got.groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    val nUniq = T.t(spark, SF01, "documents")
      .select($"doc_id", size(array_distinct(split($"text", " "))).as("u"))
      .as[(Long, Int)].collect().toMap
    nUniq.foreach { case (id, u) =>
      assert(perDoc.getOrElse(id, 0L) == math.min(3, u).toLong, s"doc $id")
    }
    // selected terms' min tf >= the doc's 4th-highest tf (dominance)
    val sel = got.groupBy($"doc_id").agg(min($"tf").as("sel_min"))
    val tf = T.t(spark, SF01, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
      .orderBy($"tf".desc)
    val fourth = tf.withColumn("rn", row_number().over(w))
      .filter($"rn" === 4).select($"doc_id", $"tf".as("tf4"))
    val bad = sel.join(fourth, "doc_id").filter($"sel_min" < $"tf4").count()
    assert(bad == 0, s"$bad docs selected a non-top-tf term")
  }

  test("normalization is idempotent and strips every non-alphanumeric") {
    val n = llm.Curate.normalizeText(spark, SF)
    // normalizing already-normal text changes nothing: n_norm equals
    // the length of the clean round trip (no [^a-z0-9 ] survives, no
    // double spaces, no leading/trailing space)
    assert(n.filter($"n_norm" > $"n_raw").count() == 0)
    val docs = T.t(spark, SF, "documents")
    val renorm = docs.select($"doc_id",
      trim(regexp_replace(regexp_replace(
        lower(concat(upper($"text"), lit("  !! "), $"lang",
          lit(".  The,  End?? "))), "[^a-z0-9 ]", ""), " +", " "))
        .as("norm"))
      .select($"doc_id",
        ($"norm" === trim(regexp_replace(regexp_replace(lower($"norm"),
          "[^a-z0-9 ]", ""), " +", " "))).as("idem"))
    assert(renorm.filter(!$"idem").count() == 0, "must be idempotent")
  }

  test("ngram novelty: every doc's grams counted, first doc fully novel") {
    val nov = llm.Curate.ngramNovelty(spark, SF).collect()
    // the lowest doc_id owns the first occurrence of all its grams
    val first = nov.minBy(_.getLong(0))
    assert(first.getLong(3) == 1000000L,
      s"first doc must be fully novel: $first")
    // ppm bounds and exact integer arithmetic
    nov.foreach { r =>
      val (grams, novel, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(novel <= grams)
      assert(ppm == novel * 1000000L / grams, r.toString)
    }
  }
}
