package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975, CACM
  * 18(6)) compiled to a dense byte-level DFA: goto trie + BFS failure
  * links folded into full 256-way transition rows, and each state
  * carrying the failure-closed list of pattern ids that END there. A
  * text of n bytes is scanned in EXACTLY n transitions regardless of
  * how many patterns the dictionary holds — the property that makes a
  * 400-entry C4 badword list (or a few-thousand-entry PII/brand
  * lexicon) the same cost as one `contains`.
  *
  * Counts are OVERLAPPING occurrence counts: every (pattern, end
  * position) match is counted once — "batch batch batch" contains
  * "batch batch" twice, which a replace-and-measure scan would
  * undercount. Patterns are matched on raw UTF-8 bytes; for the
  * ASCII-lowercase dictionaries used here that equals character
  * matching (every byte of a multi-byte code point is ≥ 0x80 and can
  * never alias an ASCII pattern byte).
  *
  * The automaton is built once at plan construction (the dictionary is
  * a fixed literal, data-independent) and ships inside the serialized
  * plan — a few KB for hundreds of patterns; a multi-MB dictionary
  * would ride a broadcast handle instead, the
  * [[BloomMightContainStr]] pattern.
  */
object AcAutomaton {
  /** Compile a fixed dictionary into an [[AcCompiled]] DFA. Emits are
    * failure-closed inside the BFS itself: a state's failure target is
    * strictly shallower and assigned before the state enters the
    * queue, so its closure is final when the state is processed. */
  def apply(patterns: Seq[String]): AcCompiled = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty")
    import scala.collection.mutable
    val children = mutable.ArrayBuffer(mutable.Map.empty[Int, Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var v = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xFF
        v = children(v).getOrElseUpdate(c, {
          children += mutable.Map.empty
          ends += Nil
          children.size - 1
        })
      }
      ends(v) ::= pid
    }
    val n = children.size
    val fail = new Array[Int](n)
    val delta = Array.tabulate(n)(_ => new Array[Int](256))
    val emits = new Array[List[Int]](n)
    emits(0) = Nil
    val queue = mutable.Queue.empty[Int]
    for (c <- 0 until 256) children(0).get(c) match {
      case Some(u) => delta(0)(c) = u; queue += u
      case None    => delta(0)(c) = 0
    }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      // fail(v) was set before v entered the queue and fail(v) is
      // strictly shallower, so its closure is already final (BFS order)
      emits(v) = ends(v) ::: emits(fail(v))
      for (c <- 0 until 256) children(v).get(c) match {
        case Some(u) => fail(u) = delta(fail(v))(c); delta(v)(c) = u; queue += u
        case None    => delta(v)(c) = delta(fail(v))(c)
      }
    }
    new AcCompiled(patterns.toArray, delta, emits.map(_.toArray))
  }
}

/** The compiled DFA the expression ships: dense transitions + per-state
  * emitted pattern ids. */
final class AcCompiled(
    val patterns: Array[String],
    private val delta: Array[Array[Int]],
    private val emits: Array[Array[Int]]) extends Serializable {

  /** Per-pattern overlapping occurrence counts over `s`'s bytes, as a
    * catalyst long array aligned with [[patterns]]. */
  def counts(s: UTF8String): ArrayData = {
    val out = new Array[Long](patterns.length)
    var state = 0
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      state = delta(state)(s.getByte(i) & 0xFF)
      val e = emits(state)
      var j = 0
      while (j < e.length) { out(e(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression: array of per-pattern overlapping substring
  * counts — one automaton pass per row, inside whole-stage codegen
  * (the DFA rides the plan as a reference object, resolved once per
  * generated class, not per row). */
case class AhoCorasickCounts(child: Expression, ac: AcCompiled)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ac_counts requires a string input, got $t")
  }

  override def nullSafeEval(v: Any): Any = ac.counts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac, classOf[AcCompiled].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasick {
  /** Column wrapper: per-pattern overlapping substring counts of the
    * fixed dictionary in `c`. */
  def counts(c: Column, patterns: Seq[String]): Column =
    column(AhoCorasickCounts(expression(c), AcAutomaton(patterns)))
}
