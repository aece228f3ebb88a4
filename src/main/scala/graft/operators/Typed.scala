package graft.operators

import graft.{QueryModule, T}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset surface — SURVEY.md §1.1/§2.12: the reference's rows
  * are typed Java objects (`JavaRDD<SAMRecord>`); the Spark-native
  * counterpart is `Dataset[T]` with case-class encoders and custom
  * `Aggregator`s where compile-time field access matters. Quantities
  * aggregate as integer cents inside the Aggregator, so the typed
  * path stays exactly comparable with the SQL oracle.
  */
case class LineRecord(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

case class QtyStats(cnt: Long, qty_cents: Long)

object QtyAgg extends Aggregator[LineRecord, QtyStats, QtyStats] {
  override def zero: QtyStats = QtyStats(0L, 0L)
  override def reduce(b: QtyStats, r: LineRecord): QtyStats =
    QtyStats(b.cnt + 1, b.qty_cents + math.round(r.l_quantity * 100))
  override def merge(a: QtyStats, b: QtyStats): QtyStats =
    QtyStats(a.cnt + b.cnt, a.qty_cents + b.qty_cents)
  override def finish(r: QtyStats): QtyStats = r
  override def bufferEncoder: Encoder[QtyStats] = Encoders.product[QtyStats]
  override def outputEncoder: Encoder[QtyStats] = Encoders.product[QtyStats]
}

object TypedOps extends QueryModule {

  /** Typed filter → groupByKey → custom Aggregator → flatten. */
  def typedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_returnflag")
      .as[LineRecord]
      .filter(_.l_quantity > 10)
      .groupByKey(_.l_returnflag)
      .agg(QtyAgg.toColumn.name("stats"))
      .toDF("l_returnflag", "stats")
      .selectExpr("l_returnflag", "stats.cnt AS cnt",
        "CAST(stats.qty_cents AS DOUBLE) / 100.0 AS sum_qty")
      .orderBy("l_returnflag")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_agg" -> (typedAgg(_, _)))

  override def oracleSql: Map[String, String] = Map(
    "typed_agg" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS sum_qty
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
