package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-grams: one expression that tokenizes on single
  * spaces and emits `"_"`-joined n-grams as an array, all on raw
  * UTF8String bytes (no JVM String round trip).
  *
  * This replaces the posexplode + `lead()`-window gram builder that
  * previously fed every shingle consumer: the window formulation
  * SHUFFLES the whole token stream on doc_id and runs two window
  * passes before the first gram exists, while `posexplode(ngrams(
  * text, 3))` is a pure map — no exchange at all until the consumer's
  * own aggregation. (The array-LAMBDA formulation was rejected
  * earlier for a different reason: Catalyst inlines single-use
  * aliases into the lambda, re-evaluating split() per element —
  * quadratic per doc. A single owned expression sidesteps both
  * problems: split happens exactly once, inside.)
  */
case class NgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngrams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    NgramsExpr.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // a static-call shim keeps the projection inside whole-stage
    // codegen; the loop itself lives in compute()
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramsExpr$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramsExpr {
  private val Space = UTF8String.fromString(" ")
  private val Joiner = UTF8String.fromString("_")

  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.split(Space, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (n == 1) toks(i)
        else UTF8String.concatWs(Joiner,
          java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object NgramFunctions {
  /** Array of `"_"`-joined word n-grams of a space-tokenized string
    * column; `posexplode` it for (pos, gram) rows.
    */
  def ngrams(c: Column, n: Int): Column =
    Bridge.column(NgramsExpr(Bridge.expression(c), n))
}
