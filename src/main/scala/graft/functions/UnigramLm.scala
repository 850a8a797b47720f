package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword segmentation — the Viterbi inference step of the
  * SentencePiece unigram model (Kudo 2018, "Subword Regularization"):
  * given per-piece costs (−log p scaled to exact 10⁻⁶-grain longs),
  * find the segmentation minimizing total cost; ties break to FEWER
  * pieces, which together with integer costs makes the optimum value
  * pair unique and engine-independent (the piece SEQUENCE may tie;
  * the value (cost, count) cannot).
  *
  * The model is bounded (vocab + alphabet) and ships as a plan
  * reference object; the DP runs O(n·maxPieceLen) hash probes per
  * word inside whole-stage codegen — applied to the word-TYPE table,
  * never per corpus row (same posture as [[WpVocab]]).
  */
final class UgModel(pieces: Array[String], costs: Array[Long]) extends Serializable {
  require(pieces.length == costs.length, "pieces/costs length mismatch")
  val maxLen: Int = pieces.map(_.length).max
  private val map = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }

  /** [bestCost, nPieces] for `w`, or [-1, -1] if no segmentation exists
    * (impossible when the model contains the corpus alphabet — kept as
    * an explicit sentinel rather than a throw so a mis-built model
    * surfaces as a visible value, not an executor crash). */
  def viterbi(w: UTF8String): ArrayData = {
    val s = w.toString
    val n = s.length
    val INF = Long.MaxValue
    val dpC = Array.fill(n + 1)(INF)
    val dpN = Array.fill(n + 1)(Int.MaxValue)
    dpC(0) = 0; dpN(0) = 0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        if (dpC(i - l) != INF) {
          val c = map.get(s.substring(i - l, i))
          if (c != null) {
            val cand = dpC(i - l) + c
            val candN = dpN(i - l) + 1
            if (cand < dpC(i) || (cand == dpC(i) && candN < dpN(i))) {
              dpC(i) = cand; dpN(i) = candN
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (dpC(n) == INF) new GenericArrayData(Array[Any](-1L, -1L))
    else new GenericArrayData(Array[Any](dpC(n), dpN(n).toLong))
  }
}

/** Native expression: Viterbi min-cost segmentation value of a word
  * under a fixed unigram piece-cost model. */
case class UnigramViterbi(child: Expression, model: UgModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi requires a string input, got $t")
  }

  override def nullSafeEval(v: Any): Any = model.viterbi(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugModel", model, classOf[UgModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.viterbi($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramLm {
  /** Column wrapper: [bestCost, nPieces] of `c` under the cost model. */
  def viterbi(c: Column, model: Seq[(String, Long)]): Column =
    column(UnigramViterbi(expression(c),
      new UgModel(model.map(_._1).toArray, model.map(_._2).toArray)))
}
