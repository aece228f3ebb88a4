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
      n: Int, out: String): DataFrame = {
    if (exact) {
      val order =
        if (descending) Seq(col(valueCol).desc, col(tiebreak))
        else Seq(col(valueCol), col(tiebreak))
      df.withColumn(out, ntile(n).over(Window.orderBy(order: _*)))
    } else {
      val fracs = (1 until n).map(i => i.toDouble / n)
      val cuts = df.agg(expr(
        s"approx_percentile($valueCol, array(${fracs.mkString(",")}), " +
          "10000)").as(s"__cuts_$out"))
      val ascBucket = s"1 + size(filter(__cuts_$out, c -> $valueCol > c))"
      df.crossJoin(broadcast(cuts))
        .withColumn(out,
          if (descending) expr(s"${n + 1} - ($ascBucket)")
          else expr(ascBucket))
        .drop(s"__cuts_$out")
    }
  }
}
