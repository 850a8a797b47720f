package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Native codebook math for the quantization tiers (k-means IVF and
  * product quantization).
  *
  * Both Lloyd fits keep their model on the driver (it is K×dims longs —
  * a few KiB at any corpus scale), so nearest-codeword assignment can be
  * a PURE MAP-SIDE expression against the literal codebook: no
  * broadcast join producing a |corpus|×K intermediate, no argmin
  * aggregate (whose struct/array buffers force ObjectHashAggregate and
  * its sort-based fallback). The expression runs a tight primitive loop
  * inside whole-stage codegen — the compiled form of the
  * one-map-side-pass-per-Lloyd-round shape that scales to 100 TB.
  *
  * Semantics are bit-identical to the DataFrame form they replace
  * (`min(struct(dist, cid))` over an exploded codebook): exact integer
  * squared distance Σ(x·scale − c)², ties broken to the LOWER cid
  * (codewords are scanned in ascending-cid order with a strict `<`).
  */

/** argmin_cid Σ_i (vec_i · scale − codeword_i)² over the sub-codebook
  * selected by `sub` (the subspace index; pass `lit(0)` for a single
  * codebook). `cents(m)` is the flat codeword matrix for subspace m
  * (row k = dims longs starting at k·dims, ascending-cid order);
  * `cids(m)` the matching codeword ids. Returns the winning cid. */
case class NearestCodeword(
    left: Expression, // ArrayType(LongType) vector
    right: Expression, // subspace index
    cents: Array[Array[Long]],
    cids: Array[Array[Long]],
    scale: Long) extends BinaryExpression {

  override def dataType: DataType = LongType
  // also null for an empty input vector (no dims → no nearest codeword)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_codeword requires (array<bigint>, integral subspace index), got ($l, $r)")
    }

  override def nullSafeEval(v: Any, m: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mi = m.asInstanceOf[Number].intValue()
    val c = cents(mi); val ids = cids(mi)
    val dims = arr.numElements()
    if (dims == 0) return null
    val k = c.length / dims
    var best = Long.MaxValue; var bestCid = Long.MaxValue
    var j = 0
    while (j < k) {
      var acc = 0L; var i = 0
      while (i < dims) {
        val dd = arr.getLong(i) * scale - c(j * dims + i)
        acc += dd * dd; i += 1
      }
      if (acc < best) { best = acc; bestCid = ids(j) }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[][]")
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val c = ctx.freshName("c"); val ids = ctx.freshName("ids")
      val dims = ctx.freshName("dims"); val k = ctx.freshName("k")
      val best = ctx.freshName("best"); val bestCid = ctx.freshName("bestCid")
      val acc = ctx.freshName("acc"); val dd = ctx.freshName("dd")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |int $dims = $v.numElements();
         |if ($dims == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $c = $centsRef[(int) $m];
         |  long[] $ids = $cidsRef[(int) $m];
         |  int $k = $c.length / $dims;
         |  long $best = Long.MAX_VALUE; long $bestCid = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      long $dd = $v.getLong($i) * ${scale}L - $c[$j * $dims + $i];
         |      $acc += $dd * $dd;
         |    }
         |    if ($acc < $best) { $best = $acc; $bestCid = $ids[$j]; }
         |  }
         |  ${ev.value} = $bestCid;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Exact integer squared distance Σ_i (a_i · scale − b_i)² between two
  * long arrays — the codegen'd form of the
  * `aggregate(zip_with(...))` higher-order pair (interpreted lambda
  * dispatch per element) used for query-side distance tables.
  * Length-mismatched inputs return null, matching the replaced form
  * (`zip_with` null-pads the shorter array and the null propagates
  * through `aggregate`), so the bit-identical-equivalence claim holds
  * on ALL inputs, not just equal-length ones. */
case class ScaledSqDist(left: Expression, right: Expression, scale: Long)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  // also null on length mismatch (see class doc)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"scaled_sq_dist requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L; var i = 0
    while (i < n) {
      val dd = x.getLong(i) * scale - y.getLong(i)
      acc += dd * dd; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val dd = ctx.freshName("dd")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $dd = $x.getLong($i) * ${scale}L - $y.getLong($i);
         |    $acc += $dd * $dd;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object CodebookExpressions {
  /** Column wrapper: nearest codeword id for `vec` in subspace `sub`.
    * `cb` rows are (m, cid, codeword) with codewords ascending by cid
    * within each m. */
  def nearestCodeword(vec: Column, sub: Column,
      cents: Array[Array[Long]], cids: Array[Array[Long]], scale: Long): Column =
    column(NearestCodeword(expression(vec), expression(sub), cents, cids, scale))

  def scaledSqDist(a: Column, b: Column, scale: Long): Column =
    column(ScaledSqDist(expression(a), expression(b), scale))
}
