package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe for the decontamination
  * prefilter — the codegen'd replacement for the black-box Scala
  * `udf((x: String) => bf.mightContainString(x))` that used to sit on
  * the WIDEST stage of the pipeline (every train shingle passes
  * through it). A Scala udf breaks whole-stage codegen at that point
  * and pays per-row catalyst⇄Scala ser/de (UTF8String → String); this
  * expression keeps the stage inside one codegen'd loop and probes the
  * filter directly on the UTF8String's UTF-8 bytes.
  *
  * Bit-identical to the udf form: `mightContainString(s)` is defined
  * as `mightContainBinary(utf8 bytes of s)` (spark-sketch
  * BloomFilterImpl), and `UTF8String.getBytes` yields exactly those
  * bytes. Exactness of the downstream result never depends on it
  * anyway — false positives die in the exact confirm semi-join.
  *
  * The filter rides a BROADCAST handle, not the expression itself: the
  * serialized plan ships only the small handle per stage, and each
  * executor materializes the (data-sized) filter once per host via the
  * torrent broadcast — exactly how a 100 TB scan wants a multi-MB
  * eval-set sketch distributed.
  */
case class BloomMightContainStr(child: Expression, bfb: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a string input, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    bfb.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("bfb", bfb, classOf[Broadcast[_]].getName)
    // resolve the broadcast ONCE per task (mutable state init), not per row
    val bf = ctx.addMutableState(bfClass, "bloomFilter",
      v => s"$v = ($bfClass) $ref.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  /** Column wrapper: true iff `c`'s UTF-8 bytes might be in the
    * broadcast bloom filter (no false negatives). */
  def mightContain(c: Column, bfb: Broadcast[BloomFilter]): Column =
    column(BloomMightContainStr(expression(c), bfb))
}
