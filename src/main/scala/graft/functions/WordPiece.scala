package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword segmentation — the WordPiece
  * inference algorithm (Song et al. 2021, "Fast WordPiece
  * Tokenization", EMNLP: greedy longest prefix match is WordPiece's
  * definition, linear with a trie). At each position the longest
  * vocabulary piece starting there is consumed; the induced vocabulary
  * always contains every single character of the corpus's words, so
  * segmentation is total (no UNK path). A character outside the
  * vocabulary — impossible by construction here — falls back to a
  * single-char piece rather than looping.
  *
  * The vocabulary is a bounded model (tens to tens-of-thousands of
  * pieces at any corpus scale) compiled to a per-length hash set and
  * shipped as a plan reference object, so the per-word scan runs
  * inside whole-stage codegen at O(maxPieceLen) set probes per
  * consumed character.
  */
final class WpVocab(pieces: Array[String]) extends Serializable {
  val maxLen: Int = pieces.map(_.length).max
  private val set = new java.util.HashSet[String](java.util.Arrays.asList(pieces: _*))

  /** Greedy longest-match pieces of `w` as a catalyst string array. */
  def segment(w: UTF8String): ArrayData = {
    val s = w.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    while (pos < s.length) {
      var len = math.min(maxLen, s.length - pos)
      while (len > 1 && !set.contains(s.substring(pos, pos + len))) len -= 1
      // len == 1 falls through whether or not the char is in vocab:
      // single-char fallback keeps the scan total and terminating
      out += UTF8String.fromString(s.substring(pos, pos + len))
      pos += len
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Native expression: greedy longest-match segmentation of a word
  * against a fixed vocabulary. */
case class WordPieceSegment(child: Expression, vocab: WpVocab)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment requires a string input, got $t")
  }

  override def nullSafeEval(v: Any): Any = vocab.segment(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", vocab, classOf[WpVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPiece {
  /** Column wrapper: greedy longest-match pieces of `c` under `vocab`. */
  def segment(c: Column, vocab: Seq[String]): Column =
    column(WordPieceSegment(expression(c), new WpVocab(vocab.toArray)))
}
