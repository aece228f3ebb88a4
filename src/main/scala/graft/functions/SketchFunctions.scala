package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen'd probes against broadcast sketches (SURVEY.md §2.12
  * preference order (b) — native `Expression` over Scala UDF).
  *
  * A `udf((t: String) => bc.value.mightContain(t))` pays per row: an
  * InternalRow→Row conversion, UTF8String→String copy, closure
  * dispatch, and a codegen fence that splits the surrounding
  * WholeStageCodegen span. These expressions stay inside codegen and
  * probe the sketch directly on the UTF8String bytes (the sketches
  * hash UTF-8 bytes, so `putString`-inserted items match byte-wise).
  * The `Broadcast` handle — not the sketch — rides the serialized
  * expression, so task binaries stay small and each executor holds
  * one deserialized sketch.
  */
case class BloomMightContain(
    child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    // hoist Broadcast.value() out of the row loop: one field per task
    val bf = ctx.addMutableState(bloomCls, "graftBloom",
      v => s"$v = ($bloomCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $bf.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Long-key variant of [[BloomMightContain]]: probes via the sketch's
  * long hash path, matching filters built by `df.stat.bloomFilter`
  * over an integral column (those insert with `putLong`, whose hash
  * differs from the byte path — the two variants are NOT
  * interchangeable).
  */
case class BloomMightContainLong(
    child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val bf = ctx.addMutableState(bloomCls, "graftBloomL",
      v => s"$v = ($bloomCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count-Min estimate for a string column against a broadcast sketch
  * — composable as a plain Long column (`cms_estimate(c) >= thr`).
  * The one `toString` per row is the sketch API's requirement; the
  * probe still runs inside WholeStageCodegen with no row boxing.
  */
case class CmsEstimateCount(
    child: Expression, cms: Broadcast[CountMinSketch])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    cms.value.estimateCount(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsCls = classOf[CountMinSketch].getName
    val bcRef = ctx.addReferenceObj("cmsBc", cms,
      classOf[Broadcast[_]].getName)
    val sk = ctx.addMutableState(cmsCls, "graftCms",
      v => s"$v = ($cmsCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $sk.estimateCount((Object) $c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchFunctions {
  /** Boolean column: may `c` be in the broadcast Bloom filter.
    * One-sided — false ⇒ definitely absent (no false negatives).
    */
  def bloom_might_contain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloom))

  /** Boolean column: may LONG key `c` be in a Bloom filter built over
    * an integral column. One-sided, long-hash path.
    */
  def bloom_might_contain_long(c: Column,
      bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(c), bloom))

  /** Long column: Count-Min frequency estimate of string column `c`.
    * One-sided — never under-estimates.
    */
  def cms_estimate(c: Column, cms: Broadcast[CountMinSketch]): Column =
    Bridge.column(CmsEstimateCount(Bridge.expression(c), cms))
}
