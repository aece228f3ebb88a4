package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Size gates for operators whose EXACT form is a scale-killer.
  *
  * An exact global `ntile` is a window with no partitionBy — one
  * executor sorts the world. Correct and fast on the rollups the
  * oracle queries feed it (thousands-to-millions of rows), fatal at
  * 10⁹. Same design as the dedup-clustering gate
  * (`Dedup.LocalEdgesConf`): a conf-keyed row threshold decides per
  * input, the decision probe is a BOUNDED job (`limit(t+1).count()`
  * — stops counting at t+1, never scans the world), the exact form
  * survives below the gate (hash-oracled), and above it the same
  * report runs on `approx_percentile` cuts — one distributed pass,
  * no global sort, the documented 100 TB semantics
  * (llm_quality_cuts oracles the primitive with error-bound checks).
  */
object ScaleGate {

  /** Max input rows for which exact global-window ntile runs; above
    * this the approx-percentile cut path takes over. Default keeps
    * every oracle-scale input exact.
    */
  val ExactNtileMaxRows = "spark.graft.ntile.exactMaxRows"

  /** Decision probe: does `df` fit the exact-ntile gate? One bounded
    * job — `limit(t+1)` caps work at the threshold regardless of
    * input size.
    */
  def fitsExactNtile(s: SparkSession, df: DataFrame): Boolean = {
    val t = s.conf.get(ExactNtileMaxRows, "10000000").toLong
    df.limit((t + 1).min(Int.MaxValue).toInt).count() <= t
  }

  /** `ntile(n)` over a global ordering of one numeric column —
    * exact (global window, `tiebreak` makes boundaries deterministic)
    * below the gate, approx-percentile cuts above it. `valueCol`
    * must be a plain non-null numeric column name. The approx form
    * trades the equal-size guarantee for a cut-based bucketing with
    * NO global sort: ties land in one bucket and sizes wobble by the
    * sketch error — the documented large-scale semantics.
    */
  def gatedNtile(s: SparkSession, df: DataFrame, exact: Boolean,
      valueCol: String, descending: Boolean, tiebreak: String,
      n: Int, out: String): DataFrame =
    gatedNtiles(s, df, exact, Seq((valueCol, descending, out)),
      tiebreak, n)

  /** Several gated ntiles over the SAME input in one shot: the exact
    * path runs one window per spec (cheap below the gate), the approx
    * path computes EVERY cut array in a SINGLE aggregate pass + one
    * broadcast cross join — at the 10⁹-row scale the gate exists
    * for, per-column agg jobs would rescan the input once per spec.
    */
  def gatedNtiles(s: SparkSession, df: DataFrame, exact: Boolean,
      specs: Seq[(String, Boolean, String)], tiebreak: String,
      n: Int): DataFrame = {
    if (exact) {
      specs.foldLeft(df) { case (d, (valueCol, descending, out)) =>
        val order =
          if (descending) Seq(col(valueCol).desc, col(tiebreak))
          else Seq(col(valueCol), col(tiebreak))
        d.withColumn(out, ntile(n).over(Window.orderBy(order: _*)))
      }
    } else {
      val fracs = (1 until n).map(i => i.toDouble / n)
      val cuts = df.agg(
        expr(s"approx_percentile(${specs.head._1}, " +
          s"array(${fracs.mkString(",")}), 10000)").as(
          s"__cuts_${specs.head._3}"),
        specs.tail.map { case (c, _, out) =>
          expr(s"approx_percentile($c, array(${fracs.mkString(",")}), " +
            s"10000)").as(s"__cuts_$out")
        }: _*)
      val joined = df.crossJoin(broadcast(cuts))
      specs.foldLeft(joined) { case (d, (valueCol, descending, out)) =>
        val ascBucket =
          s"1 + size(filter(__cuts_$out, c -> $valueCol > c))"
        d.withColumn(out,
          if (descending) expr(s"${n + 1} - ($ascBucket)")
          else expr(ascBucket))
          .drop(s"__cuts_$out")
      }
    }
  }
}
