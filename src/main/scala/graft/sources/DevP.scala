package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transient probe for the optimization round — phase-times the inside
  * of a partitioned append commit. Deleted before round end.
  */
object DevP {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[devp] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** Mirror of writeVersionedPartitioned with phase timers, driven
    * from the real foreachBatch body by Dev.psink2.
    */
  def instrumentedAppend(st: GraftStorage, batch: DataFrame,
      path: String, partCols: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val s = batch.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val dirP = new Path(path)
    val fs = dirP.getFileSystem(conf)
    val vs = time("  listVersions") { st.listVersions(path) }
    time("  schema gates") {
      val prior = st.partitionSpec(path, vs.last)
      require(prior.map(GraftStorage.parsePartField) ==
        partCols.map(GraftStorage.parsePartField))
      GraftStorage.mergeSchemaJsons(
        st.manifestEntries(path, vs.last).collect {
          case e if e.startsWith("H\t") => e.drop(2)
        } :+ batch.schema.json)
    }
    val n = vs.last + 1
    val commitDir = st.newCommitDir(dirP, n)
    val keyCols = partCols.map { sp =>
      val f = GraftStorage.parsePartField(sp)
      f.keyExpr(batch.schema(f.col).dataType)
    }
    val w = time("  writeTasks") { st.writeTasks(batch) }
    println(s"[devp]   writeTasks = $w")
    val distributed = batch.repartition(w, keyCols: _*)
    val freshFiles = time("  writeCommitData") {
      st.writeCommitData(distributed, commitDir, partCols, fs)
    }
    time("  validateCommitFiles") {
      st.validateCommitFiles(path, freshFiles, commitDir, fs)
    }
    time("  requireMorKeyNonNull") {
      st.requireMorKeyNonNull(path, batch.schema, commitDir, fs,
        Some(freshFiles.filter(_.endsWith(".parquet"))))
    }
    val rcl = time("  rowCountLines") { st.rowCountLines(freshFiles) }
    val fresh = freshFiles ++ rcl ++
      Seq("P\t" + partCols.map(GraftStorage.parsePartField(_).spec)
        .mkString(","), s"H\t${batch.schema.json}")
    time("  publishManifestDelta") {
      st.publishManifestDelta(fs, dirP, n, Seq("P\t", "O\t"),
        fresh, Some(commitDir))
    }
  }

  def run(s: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val st = GraftStorage(s)
    val src = graft.Fixtures.ensure(dir, "stream_psink_src") { p =>
      graft.T.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
        .repartition(4).write.mode("overwrite").parquet(p)
    }
    val outP = graft.T.scratch(dir, "devp_psink")
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(outP).getFileSystem(conf)
    val batch0 = s.read.parquet(src)
      .sample(0.25, 42) // ~one micro-batch worth
      .cache()
    println(s"[devp] batch rows = ${batch0.count()}")
    val schema = batch0.schema
    val partCols = Seq("days(ts)")
    val keyCols = partCols.map { sp =>
      val f = GraftStorage.parsePartField(sp)
      f.keyExpr(schema(f.col).dataType)
    }
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      fs.delete(new Path(outP), true)
      st.createVersionedPartitioned(outP, schema, partCols)
      val dirP = new Path(outP)
      val commitDir = st.newCommitDir(dirP, 1L)
      time("A repartition(keys)+partitionBy") {
        st.writeCommitData(batch0.repartition(keyCols: _*),
          commitDir, partCols, fs)
      }
      val c2 = st.newCommitDir(dirP, 2L)
      time("B no-shuffle partitionBy") {
        st.writeCommitData(batch0, c2, partCols, fs)
      }
      val c3 = st.newCommitDir(dirP, 3L)
      time("C flat write (no partitionBy)") {
        st.writeCommitData(batch0, c3, Seq.empty, fs)
      }
      val c4 = st.newCommitDir(dirP, 4L)
      time("D repartition(keys) flat") {
        st.writeCommitData(batch0.repartition(keyCols: _*),
          c4, Seq.empty, fs)
      }
      val c5 = st.newCommitDir(dirP, 5L)
      time("E coalesce(1)+partitionBy") {
        st.writeCommitData(batch0.coalesce(1), c5, partCols, fs)
      }
      time("F noop sink of repartition(keys)") {
        batch0.repartition(keyCols: _*)
          .write.format("noop").mode("overwrite").save()
      }
      val c6 = st.newCommitDir(dirP, 6L)
      time("G repartition(writeTasks,keys)+partBy") {
        st.writeCommitData(
          batch0.repartition(st.writeTasks(batch0), keyCols: _*),
          c6, partCols, fs)
      }
      val c7 = st.newCommitDir(dirP, 7L)
      time("H repartition(30,keys) flat") {
        st.writeCommitData(batch0.repartition(30, keyCols: _*),
          c7, Seq.empty, fs)
      }
      val c8 = st.newCommitDir(dirP, 8L)
      time("I G + committer v2") {
        val fields = partCols.map(GraftStorage.parsePartField)
        val out = batch0.repartition(st.writeTasks(batch0), keyCols: _*)
        val pdf = fields.foldLeft(out)((d, f) =>
          d.withColumn(f.dirName, f.keyExpr(out.schema(f.col).dataType)))
        pdf.write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .partitionBy(fields.map(_.dirName): _*)
          .parquet(c8.toString)
      }
      val c10 = st.newCommitDir(dirP, 10L)
      time("K G without AQE") {
        s.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val fields = partCols.map(GraftStorage.parsePartField)
          val out = batch0.repartition(st.writeTasks(batch0), keyCols: _*)
          val pdf = fields.foldLeft(out)((d, f) =>
            d.withColumn(f.dirName, f.keyExpr(out.schema(f.col).dataType)))
          pdf.write.mode("overwrite")
            .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
            .partitionBy(fields.map(_.dirName): _*)
            .parquet(c10.toString)
        } finally s.conf.set("spark.sql.adaptive.enabled", "true")
      }
      val c9 = st.newCommitDir(dirP, 9L)
      time("J E + committer v2 (serial)") {
        val fields = partCols.map(GraftStorage.parsePartField)
        val out = batch0.coalesce(1)
        val pdf = fields.foldLeft(out)((d, f) =>
          d.withColumn(f.dirName, f.keyExpr(out.schema(f.col).dataType)))
        pdf.write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .partitionBy(fields.map(_.dirName): _*)
          .parquet(c9.toString)
      }
    }
  }
}
