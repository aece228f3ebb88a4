package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.SparkSession

/** Native as-of join — SURVEY.md §2.4 "as-of (nearest preceding
  * event)". Spark has no first-class as-of operator; the composable
  * fallbacks are a pairwise join+rank (O(|L|·|R|) per key) or the
  * union-last() window trick (one global sort over the union). This
  * operator is the textbook O(n) shape: co-partition both sides by
  * key, sort by (key, ts), and stream-merge each partition keeping a
  * one-row memo of the latest right row — the disq-style
  * per-partition pipelined iterator (AbstractBinarySamSource
  * mapPartitions pattern) as a first-class Catalyst citizen.
  *
  * Semantics: LEFT OUTER; for each left row, the right row with equal
  * key and the greatest rightTs <= leftTs (ties broken by the
  * trailing right sort expressions). Null keys/ts never match.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val schema = output
    val leftOut = left.output
    val rightOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      // bind against nullable right attrs — unmatched rows carry nulls
      val project = UnsafeProjection.create(schema.map(a => a: Expression),
        leftOut ++ rightOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // memo: latest right row seen for memoKey (rows arrive key-, ts-sorted)
      var memoKey: Any = null
      var memoRow: InternalRow = null
      lIter.flatMap { lRow =>
        val lKey = lKeyB.eval(lRow)
        val lTs = lTsB.eval(lRow)
        if (lKey == null || lTs == null) {
          Iterator.single(project(joined(lRow, nullRight)))
        } else {
          // advance right up to (key, ts): every consumed row with our
          // key becomes the memo (sort order makes the last one the
          // as-of match)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyB.eval(rRow)
            val rTs = rTsB.eval(rRow)
            val take =
              if (rKey == null || rTs == null) true // skip unmatched
              else {
                val kc = keyOrd.compare(rKey, lKey)
                kc < 0 || (kc == 0 && tsOrd.compare(rTs, lTs) <= 0)
              }
            if (take) {
              rBuf.next()
              if (rKey != null && rTs != null) {
                memoKey = rKey
                memoRow = rRow.copy()
              }
            } else advancing = false
          }
          val matched = memoRow != null && memoKey != null &&
            keyOrd.compare(memoKey, lKey) == 0
          Iterator.single(project(
            joined(lRow, if (matched) memoRow else nullRight)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoin logical → AsOfJoinExec physical. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Dataset-level API for the native as-of join. Columns are named —
  * attributes are resolved directly against each side's analyzed
  * output, so there is no cross-side ambiguity even when both sides
  * share column names.
  */
object AsOf {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.graftbridge.Bridge

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val spark = SparkSession.active
    val lp = Bridge.analyzed(left)
    val rp = Bridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lt, rt) = (attr(lp, leftTs), attr(rp, rightTs))
    // the exec compares and HASHES right values with orderings built
    // from the LEFT types — a type mismatch would ClassCastException
    // at best and silently null-match at worst (Int 5 and Long 5
    // hash to different partitions)
    require(lk.dataType == rk.dataType,
      s"as-of join key types differ: ${lk.dataType.simpleString} vs " +
        s"${rk.dataType.simpleString}")
    require(lt.dataType == rt.dataType,
      s"as-of join ts types differ: ${lt.dataType.simpleString} vs " +
        s"${rt.dataType.simpleString}")
    Bridge.ofRows(spark, AsOfJoin(lp, rp, lk, rk, lt, rt,
      rightTieBreak.map(attr(rp, _))))
  }
}
