package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized commit-sequence fuzz for the versioned layer: a seeded
  * stream of append / CoW-delete / MoR-delete / update / merge /
  * compact / restore operations runs against BOTH the storage format
  * and an in-memory model (a Map per committed version). After every
  * operation the snapshot content, the metadata COUNT(*) fast path,
  * and a random historical version must all agree with the model —
  * the closest thing to a proof that the manifest algebra (file
  * carries, DV anti-joins, H/S/R metadata lines, restore republish)
  * composes under arbitrary interleavings, not just the scripted
  * spec scenarios.
  */
class StorageFuzzSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  for (seed <- Seq(1234, 987)) {
  test("30 random versioned operations agree with the in-memory model " +
    s"at every step (seed $seed)") {
    sources.GraftCatalog.register(spark)
    val st = sources.GraftStorage(spark)
    val out = T.scratch(SF, s"fuzz_versioned_$seed")
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val rnd = new scala.util.Random(seed)

    var nextKey = 0L
    def freshBatch(n: Int): Map[Long, Long] = {
      val m = (nextKey until nextKey + n).map(k => k -> rnd.nextLong(1000)).toMap
      nextKey += n
      m
    }
    def df(m: Map[Long, Long]) =
      m.toSeq.sortBy(_._1).toDF("k", "v")

    // model: content of each committed version
    val history = scala.collection.mutable.ArrayBuffer[Map[Long, Long]]()
    var cur: Map[Long, Long] = freshBatch(20)
    st.writeVersioned(df(cur), out)
    history += cur

    def checkAll(opName: String): Unit = {
      val got = st.readVersioned(out).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == cur, s"after $opName: snapshot mismatch")
      assert(st.countVersioned(out) == cur.size,
        s"after $opName: countVersioned mismatch")
      // the SQL catalog must agree at every step — on MoR-carrying
      // snapshots this exercises MorReadRule's anti-join rewrite
      // under arbitrary DV/CoW/compact/restore interleavings
      val viaSql = spark.sql(s"SELECT k, v FROM graft.`$out`").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSql == cur, s"after $opName: catalog SQL read mismatch")
      // a random historical version must read as it was committed
      val v = rnd.nextInt(history.size)
      val hist = st.readVersioned(out, Some(v.toLong)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hist == history(v), s"after $opName: version $v drifted")
      val histSql = spark.sql(
        s"SELECT k, v FROM graft.`$out` VERSION AS OF $v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(histSql == history(v),
        s"after $opName: catalog time travel to $v drifted")
    }

    for (step <- 1 to 30) {
      // a fully emptied table can only grow back (the file-wise ops
      // need at least one data file to read)
      val op = if (cur.isEmpty) 0 else rnd.nextInt(10)
      val name = op match {
        case 0 => // append fresh keys
          val b = freshBatch(1 + rnd.nextInt(10))
          st.writeVersioned(df(b), out, append = true)
          cur = cur ++ b
          "append"
        case 1 => // CoW delete by predicate
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          st.deleteVersioned(out, $"k" % m === r)
          cur = cur.filter { case (k, _) => k % m != r }
          "deleteCow"
        case 2 => // MoR delete (key-based DV)
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          st.deleteVersionedMor(out, $"k" % m === r, "k")
          cur = cur.filter { case (k, _) => k % m != r }
          "deleteMor"
        case 3 => // update a slice
          val m = 2 + rnd.nextInt(4)
          val delta = rnd.nextLong(100)
          st.updateVersioned(out, $"k" % m === 0,
            Map("v" -> (col("v") + delta)))
          cur = cur.map { case (k, v) =>
            k -> (if (k % m == 0) v + delta else v) }
          "update"
        case 4 => // merge: update half the surviving keys + insert new
          val upd = cur.keys.toSeq.sorted.take(cur.size / 2)
            .map(k => k -> rnd.nextLong(1000)).toMap
          val ins = freshBatch(1 + rnd.nextInt(5))
          if ((upd ++ ins).nonEmpty) {
            st.mergeVersioned(out, df(upd ++ ins), "k")
            cur = cur ++ upd ++ ins
          } else {
            st.writeVersioned(df(cur), out) // degenerate: recommit
          }
          "merge"
        case 5 => // compact (materializes MoR, rewrites layout)
          st.compactVersioned(out, 1 + rnd.nextInt(3))
          "compact"
        case 6 => // restore to a random past version
          val v = rnd.nextInt(history.size)
          st.restoreVersioned(out, v.toLong)
          cur = history(v)
          "restore"
        case 7 => // MoR upsert: DV+files commit (sequence-scoped)
          val upd = cur.keys.toSeq.sorted.takeRight(cur.size / 3)
            .map(k => k -> rnd.nextLong(1000)).toMap
          val ins = freshBatch(1 + rnd.nextInt(4))
          if ((upd ++ ins).nonEmpty) {
            st.mergeVersionedMor(out, df(upd ++ ins), "k")
            cur = cur ++ upd ++ ins
          } else st.writeVersioned(df(cur), out)
          "mergeMor"
        case 8 => // RE-INSERT keys a past delete removed: the
          // sequence rule must let them survive the old DVs
          val gone = history.flatMap(_.keys).distinct
            .filterNot(cur.contains).take(3)
          if (gone.isEmpty) {
            val b = freshBatch(1 + rnd.nextInt(4))
            st.writeVersioned(df(b), out, append = true)
            cur = cur ++ b
          } else {
            val back = gone.map(k => k -> rnd.nextLong(1000)).toMap
            st.writeVersioned(df(back), out, append = true)
            cur = cur ++ back
          }
          "reinsert"
        case 9 => // MoR delete by POSITION (keyless form): exact
          // (file,pos) DV — duplicates-safe, no identifier contract
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          st.deleteVersionedMorPos(out, $"k" % m === r)
          cur = cur.filter { case (k, _) => k % m != r }
          "deleteMorPos"
      }
      // compact/MoR-materialize may publish intermediate versions;
      // resync the model history to the actual version list
      while (history.size < st.listVersions(out).size) {
        val v = history.size.toLong
        history += st.readVersioned(out, Some(v)).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      checkAll(s"step $step ($name)")
    }
  }
  }
}
