package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Transient phase-timing harness for the optimization round — NOT part
  * of the driver contract; deleted before round end.
  * Usage: runMain graft.Dev <mode> [sfDir]
  */
object Dev {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[dev] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("psink")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = Option(starts.remove(j.jobId))
          val ms = t0.map(t => (System.nanoTime() - t) / 1e6).getOrElse(-1.0)
          println(f"[job] ${j.jobId}%4d ${ms}%9.1f ms")
        }
      })
    SparkEntry.modules.foreach(m =>
      try m.prepare(spark, dir) catch { case _: Throwable => () })
    mode match {
      case "psink" => psink(spark, dir)
      case "devp" => graft.sources.DevP.run(spark, dir)
      case "psink2" => psink2(spark, dir)
      case "cdc" => cdc(spark, dir)
      case "pq" => pq(spark, dir)
      case "ppjoin" => ppjoin(spark, dir)
      case "shingle_explain" =>
        val docs = T.t(spark, dir, "documents")
        val mode = org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted")
        println("===== BEFORE (global distinct) =====")
        println(docs.select(col("doc_id"),
            explode(graft.functions.NgramFunctions.ngrams(col("text"), 3))
              .as("tok")).distinct()
          .queryExecution.explainString(mode))
        println("===== AFTER (shingleRows: per-doc array_distinct) =====")
        println(graft.llm.Dedup.shingleRows(docs)
          .queryExecution.explainString(mode))
      case m => println(s"unknown mode $m")
    }
    spark.stop()
  }

  /** llm_dedup_ppjoin_stored phase breakdown (mirrors Dedup). */
  def ppjoin(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val tau = 0.5
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      val docs = T.t(s, dir, "documents")
      val cut = time("cut agg") { docs.agg(max($"doc_id")).head().getLong(0) / 2 }
      val idxDir = graft.Fixtures.ensure(dir, "ppjoin_index")(_ => ())
      val bt = time("bt shingles ckpt") {
        graft.llm.Dedup.shingleRows(docs.filter($"doc_id" > cut))
          .localCheckpoint() }
      val bsz = bt.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val bprefix = bt
        .join(s.read.parquet(s"$idxDir/df"), Seq("tok"), "left_outer")
        .withColumn("df", coalesce($"df", lit(0L)))
        .withColumn("pos", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"df", $"tok")))
        .join(bsz, "doc_id")
        .filter($"pos" <= $"n" - ceil(lit(tau) * $"n") + 1)
        .select($"doc_id", $"tok", $"df", $"pos", $"n")
      time("bprefix (noop)") { noop(bprefix) }
      val dfCap = time("dfCap head") {
        s.read.parquet(s"$idxDir/meta").head().getAs[Long]("df_cap") }
      val aPrefix = s.read.parquet(s"$idxDir/prefix")
      val rareA = aPrefix.filter($"df" <= dfCap)
      val rareB = bprefix.filter($"df" <= dfCap)
      val candExact = rareA.as("a")
        .join(rareB.as("b"), "tok")
        .filter($"a.n" >= lit(tau) * $"b.n" && $"b.n" >= lit(tau) * $"a.n")
        .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
        .agg(min(struct($"a.df".as("df"), $"tok",
          $"a.pos".as("pa"), $"b.pos".as("pb"),
          $"a.n".as("na"), $"b.n".as("nb"))).as("w"))
        .filter(least($"w.na" - $"w.pa", $"w.nb" - $"w.pb") + 1 >=
          ceil(lit(tau / (1 + tau)) * ($"w.na" + $"w.nb")))
        .select($"doc_a", $"doc_b")
      time("candExact (noop)") { noop(candExact) }
      val satA = aPrefix.filter($"df" > dfCap).select($"doc_id").distinct()
      val satB = bprefix.filter($"df" > dfCap).select($"doc_id").distinct()
      val bandsA = s.read.parquet(s"$idxDir/bands").join(satA, "doc_id")
      val bandsB = graft.llm.Dedup.bandRows(
        graft.llm.Dedup.minhashSigs(bt.join(satB, "doc_id")))
      val candLsh = bandsA.as("a").join(bandsB.as("b"), Seq("band", "bh"))
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      time("candLsh (noop)") { noop(candLsh) }
      val candidates = candExact.unionByName(candLsh).distinct()
      time("full verify (noop)") {
        noop(graft.llm.Dedup.devVerifyPairs(s, candidates,
          s.read.parquet(s"$idxDir/shingles").unionByName(bt)))
      }
    }
  }

  /** llm_knn_pq_trained phase breakdown (mirrors Knn.knnPqTrained). */
  def pq(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val PqM = 8; val PqDim = 64; val PqSubDim = PqDim / PqM
    val NQueries = 20; val K = 5
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      val b = T.t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val wide = sys.env.contains("DEV_PQ_WIDE")
      val sub = time("sub ckpt") {
        val s0 = b.select($"vec_id", posexplode(array((0 until PqM).map(m =>
          slice($"v", m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("m", "sv")))
        (if (wide) s0.repartition(32, $"vec_id", $"m") else s0)
          .localCheckpoint() }
      val cb0 = sub.filter($"vec_id" < 16)
        .select($"vec_id".as("c"), $"m", $"sv".as("cv"))
      val argminAgg = sys.env.contains("DEV_PQ_AGG")
      def mkDists(cb: org.apache.spark.sql.DataFrame) =
        if (argminAgg)
          sub.join(broadcast(cb), Seq("m"))
            .select($"vec_id", $"m", $"c",
              graft.functions.SqDistQ15.sq_dist_q15_long($"sv", $"cv").as("dl"))
            .withColumn("dist", graft.functions.SqDistQ15.decimal_q15($"dl"))
        else
          sub.join(broadcast(cb), Seq("m"))
            .select($"vec_id", $"m", $"c",
              graft.functions.SqDistQ15.sq_dist_q15($"sv", $"cv").as("dist"))
      val dists0 = time("pqDists(cb0) ckpt") { mkDists(cb0).localCheckpoint() }
      val wCode = Window.partitionBy($"vec_id", $"m").orderBy($"dist", $"c")
      def argmin(dists: org.apache.spark.sql.DataFrame) =
        if (argminAgg)
          dists.groupBy($"vec_id", $"m")
            .agg(min($"dl" * 16 + $"c").as("pk"))
            .select($"vec_id", $"m", ($"pk" % 16).as("c"))
        else
          dists.withColumn("rn", row_number().over(wCode))
            .filter($"rn" === 1).select($"vec_id", $"m", $"c")
      val codes0 = argmin(dists0)
      time("codes0 argmin (noop)") { noop(codes0) }
      val refit = codes0.join(sub, Seq("vec_id", "m"))
        .select($"m", $"c", posexplode($"sv").as(Seq("d", "x")))
        .groupBy($"m", $"c", $"d")
        .agg((sum($"x".cast(DecimalType(30, 15))).cast(DoubleType) /
          count(lit(1))).as("ncv"))
      val cb1 = cb0
        .select($"c", $"m", posexplode($"cv").as(Seq("d", "cv0")))
        .join(refit, Seq("m", "c", "d"), "left")
        .groupBy($"c", $"m")
        .agg(sort_array(collect_list(struct($"d",
          coalesce($"ncv", $"cv0").as("cv")))).as("dc"))
        .select($"c", $"m", transform($"dc", x => x("cv")).as("cv"))
      val dists1 = time("pqDists(cb1) ckpt [incl refit]") {
        mkDists(cb1).localCheckpoint() }
      time("probe (noop)") {
        val codes = argmin(dists1)
          .select($"vec_id".as("nid"), $"m", $"c".as("code"))
        val lut = dists1.filter($"vec_id" < NQueries)
          .select($"vec_id".as("qid"), $"m", $"c".as("code"), $"dist")
        val wTop = Window.partitionBy($"qid").orderBy($"adc", $"nid")
        noop(codes.join(broadcast(lut), Seq("m", "code"))
          .filter($"nid" =!= $"qid")
          .groupBy($"qid", $"nid")
          .agg(sum($"dist").as("adc"))
          .withColumn("rn", row_number().over(wTop))
          .filter($"rn" <= K)
          .select($"qid", $"nid",
            round($"adc".cast(DoubleType), 4).as("adc_dist"), $"rn")
          .orderBy($"qid", $"rn"))
      }
    }
  }

  /** stream_cdc_replica phase breakdown. */
  def cdc(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val st = graft.sources.GraftStorage(s)
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val src = T.scratch(dir, "stream_cdc_replica_src")
      val dst = T.scratch(dir, "stream_cdc_replica_dst")
      val ckpt = dst + "_ckpt"
      val hconf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(hconf)
      Seq(src, dst, ckpt).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val base = T.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      time("setup v1 snapshot write") {
        st.writeVersioned(base.repartition(4), src)
      }
      time("setup v2 MoR delete") {
        st.deleteVersionedMor(src, col("o_orderkey") % 13 === 2, "o_orderkey")
      }
      time("setup v3 MoR update") {
        st.updateVersionedMor(src, col("o_orderkey") % 13 === 5,
          Map("o_totalprice" -> (col("o_totalprice") * 2)), "o_orderkey")
      }
      time("setup v4 append") {
        st.writeVersioned(base.filter(col("o_orderkey") % 89 === 3)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
            lit("E").as("o_orderstatus"), lit(3.0).as("o_totalprice")),
          src, append = true)
      }
      time("setup dst v0") { st.writeVersioned(base.limit(0), dst) }
      val q = s.readStream.format("graft-stream")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          time(s"batch $id foreachBatch body") {
            if (!st.txnCommitted(dst, "cdc_replica", id)) {
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col("o_orderkey"))
                .orderBy(col("_commit_version").desc, col("_change_type").desc)
              val latest = time(s"batch $id rank+ckpt") { batch
                .withColumn("__rn", row_number().over(w))
                .filter(col("__rn") === 1).drop("__rn", "_commit_version")
                .localCheckpoint() }
              val ups = latest.filter(col("_change_type") === "insert")
                .drop("_change_type")
              val delKeys = latest.filter(col("_change_type") === "delete")
                .select(col("o_orderkey"))
              val counts = time(s"batch $id census") {
                latest.groupBy(col("_change_type")).count()
                .collect().map(r => r.getString(0) -> r.getLong(1)).toMap }
              val upsEmpty = counts.getOrElse("insert", 0L) == 0L
              if (counts.getOrElse("delete", 0L) > 0L)
                time(s"batch $id deleteVersionedMorKeys") {
                  st.deleteVersionedMorKeys(dst, delKeys, "o_orderkey",
                    if (upsEmpty) Some("cdc_replica" -> id) else None): Unit }
              if (!upsEmpty) {
                if (st.countVersionedFast(dst).contains(0L))
                  time(s"batch $id bootstrap append") {
                    st.writeVersioned(ups, dst, append = true, Seq.empty,
                      Seq.empty, Seq.empty, Some("cdc_replica" -> id)): Unit }
                else
                  time(s"batch $id mergeVersionedMor") {
                    st.mergeVersionedMor(dst, ups, "o_orderkey",
                      Some("cdc_replica" -> id)): Unit }
              }
            }
          }
        }
        .trigger(Trigger.AvailableNow())
        .start()
      time("stream total") { q.awaitTermination() }
      time("final read+agg") {
        st.readVersioned(dst)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), T.dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
          .write.format("noop").mode("overwrite").save()
      }
    }
  }

  /** stream_sink_partitioned with the commit body phase-timed. */
  def psink2(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val st = graft.sources.GraftStorage(s)
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val src = graft.Fixtures.ensure(dir, "stream_psink_src") { p =>
        T.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
          .repartition(4).write.mode("overwrite").parquet(p)
      }
      val outP = T.scratch(dir, "stream_sink_partitioned")
      val ckpt = outP + "_ckpt"
      val hconf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(outP).getFileSystem(hconf)
      Seq(outP, ckpt).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val schema = s.read.parquet(src).schema
      st.createVersionedPartitioned(outP, schema, Seq("days(ts)"))
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          time(s"batch $id instrumentedAppend") {
            graft.sources.DevP.instrumentedAppend(
              st, batch, outP, Seq("days(ts)"))
          }
        }
        .trigger(Trigger.AvailableNow())
        .start()
      time("stream total") { q.awaitTermination() }
    }
  }

  /** stream_sink_partitioned phase breakdown. */
  def psink(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val st = graft.sources.GraftStorage(s)
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val src = graft.Fixtures.ensure(dir, "stream_psink_src") { p =>
        T.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
          .repartition(4).write.mode("overwrite").parquet(p)
      }
      val outP = T.scratch(dir, "stream_sink_partitioned")
      val ckpt = outP + "_ckpt"
      val hconf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(outP).getFileSystem(hconf)
      time("delete scratch") {
        Seq(outP, ckpt).foreach(p =>
          fs.delete(new org.apache.hadoop.fs.Path(p), true))
      }
      val schema = s.read.parquet(src).schema
      time("createVersionedPartitioned") {
        st.createVersionedPartitioned(outP, schema, Seq("days(ts)"))
      }
      var batchN = 0
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batchN += 1
          val committed = time(s"batch $id txnCommitted") {
            st.txnCommitted(outP, "stream_sink_partitioned", id)
          }
          if (!committed)
            time(s"batch $id writeVersionedPartitioned") {
              st.writeVersionedPartitioned(batch, outP, Seq("days(ts)"),
                append = true, sortedBy = Seq.empty,
                txn = Some("stream_sink_partitioned" -> id)): Unit
            }
        }
        .trigger(Trigger.AvailableNow())
        .start()
      time("stream total") { q.awaitTermination() }
      time("final read+agg") {
        st.readVersioned(outP)
          .groupBy(expr("CAST(date_trunc('DAY', ts) AS DATE)").as("day"))
          .agg(count(lit(1)).cast("long").as("cnt"),
            sum(col("event_id")).cast("long").as("id_sum"))
          .filter(col("day") >= lit("2024-01-25").cast("date"))
          .orderBy(col("day"))
          .write.format("noop").mode("overwrite").save()
      }
    }
  }
}
