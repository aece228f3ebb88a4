package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** True Structured Streaming smoke: the SAME transform cores that the
  * batch oracle checks run over a readStream file source with a
  * watermark, through the memory sink — batch/stream result parity.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, SF}
  import spark.implicits._

  private lazy val eventsDir: String = {
    val out = T.scratch(SF, "stream_events_src")
    T.events(spark, SF).write.mode("overwrite").parquet(out)
    out
  }

  test("streaming tumbling agg matches batch result") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withWatermark("ts", "1 hour")
    val q = streaming.StreamOps.tumblingCore(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("tumbling_out")
      .select($"w_start", $"event_type", $"cnt", $"sum_value")
      .collect().toSet
    val want = streaming.StreamOps.tumblingCore(T.events(spark, SF))
      .collect().toSet
    assert(got == want)
  }

  test("streaming dropDuplicates matches batch distinct state") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_out").count()
    val want = T.events(spark, SF)
      .select($"user_id", $"event_type").distinct().count()
    assert(got == want)
  }

  test("custom state via mapGroupsWithState matches batch per-user counts") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
    val counted = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
    val q = counted.toDF("user_id", "n")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("state_out")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    // last update per user = final count
    val got = spark.table("state_out")
      .groupBy($"user_id").agg(max($"n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = T.events(spark, SF).groupBy($"user_id")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("streaming session window counts match batch sessionization") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withWatermark("ts", "2 hours")
    val q = streaming.StreamOps.sessionCore(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("session_out")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("session_out")
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = streaming.StreamOps.streamSession(spark, SF)
      .select($"user_id", $"n_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
