package graft.operators

import org.apache.spark.sql.Column

/** Interval-predicate canonicalization — SURVEY.md §2.3 F4
  * (BoundedTraversalUtil.java:35-51 `QueryInterval.optimizeIntervals`):
  * driver-side sort + merge of overlapping/adjacent closed intervals
  * before they become a pushed predicate. Fewer disjoint ranges →
  * smaller OR tree → cleaner row-group pruning.
  */
object Intervals {

  /** Merge overlapping or adjacent closed [lo, hi] intervals. */
  def normalize(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = ivs.filter(iv => iv._2 >= iv._1).sortBy(_._1)
    sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tail, (l, h)) if l <= hi + 1 =>
        (lo, math.max(hi, h)) :: tail
      case (acc, iv) => iv :: acc
    }.reverse
  }

  /** OR-of-ranges predicate over the normalized set. */
  def predicate(c: Column, ivs: Seq[(Long, Long)]): Column =
    normalize(ivs)
      .map { case (lo, hi) => c >= lo && c <= hi }
      .reduceOption(_ || _)
      .getOrElse(org.apache.spark.sql.functions.lit(false))
}
