package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass tokenizer. Semantically IDENTICAL BY CONSTRUCTION
  * to `filter(split(lower(text), "[^a-z0-9]+"), t -> t != '')` — it
  * lowercases through the same `UTF8String.toLowerCase` the built-in
  * `lower()` uses, then emits the maximal `[a-z0-9]+` byte runs (every
  * non-ASCII byte of a multi-byte code point is ≥ 0x80, hence a
  * separator under the kept set, exactly as under the regex). What it
  * removes is the regex engine and the three-operator pipeline: one
  * scan, no intermediate array, no per-token regex state — measured
  * ~1.9× over the composed form on the documents corpus
  * (`MicroBench tokenize`), and it participates in whole-stage codegen.
  * Tokenization feeds every text/dedup/decontamination query, which is
  * why this is the one scalar path worth a custom Expression.
  */
case class Tokenize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExpressions.tokenizeUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.tokenizeUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Native single-pass distinct word n-gram shingler. Semantically
  * IDENTICAL BY CONSTRUCTION to the composed form
  * `array_distinct(transform(sequence(0, size-n), i => concat_ws(" ",
  * slice(toks, i+1, n))))` guarded for short arrays: windows join
  * through `UTF8String.concatWs` (the exact `concat_ws` kernel, same
  * null-skipping), and a LinkedHashSet preserves `array_distinct`'s
  * first-occurrence order. What it removes is the five-operator
  * pipeline's intermediate allocations (index sequence, per-window
  * slice arrays, pre-distinct output array) and array_distinct's
  * second pass. Shingling feeds the span/dedup/decontamination
  * family — the second-hottest scalar path after [[Tokenize]].
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExpressions.shinglesUtf8(input.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExpressions.shinglesUtf8($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Every (length, shingle) pair for lengths 1..maxN in one pass — see
  * [[TextExpressions.shinglesMultiUtf8]]. Output rows (gl BIGINT,
  * sp STRING) match the tagged union of per-length [[Shingles]]
  * explodes (the q_dedup_suffix fused gram pass), at one array scan
  * and one byte-buffer write per position. */
case class ShinglesMulti(child: Expression, maxN: Int) extends UnaryExpression {
  require(maxN >= 1, s"max shingle width must be >= 1, got $maxN")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles_multi requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gl", LongType, nullable = false),
    StructField("sp", StringType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExpressions.shinglesMultiUtf8(input.asInstanceOf[ArrayData], maxN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExpressions.shinglesMultiUtf8($c, $maxN)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesMulti =
    copy(child = newChild)
}

/** Native content-defined chunker (LBFS-lineage CDC — Muthitacharoen
  * et al., SOSP 2001) over a Rabin-style rolling polynomial hash. One
  * pass per document: decode code points once, roll
  * `h ← (h − c·B⁷)·B + c'` across every [[TextExpressions.CDC_W]]-char
  * window in O(1) per position, cut where `h mod CDC_MOD = 0`, and
  * emit the chunk substrings directly (no cut-array materialization,
  * no per-window re-hash). All arithmetic is exact int64 — code points
  * are reduced mod 251 so the full 8-term polynomial peaks at ~1.4e17,
  * far under 2⁶³ — which is what lets the DuckDB oracle evaluate the
  * IDENTICAL polynomial non-rolling per window and land on the same
  * cuts bit-for-bit. B=127 is odd, so `h mod 64` sees every window
  * position (a power-of-two base would reduce the boundary predicate
  * to the last character alone).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextExpressions.cdcChunksUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.cdcChunksUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object TextExpressions {
  private val SPACE = UTF8String.fromString(" ")

  /** CDC geometry — shared verbatim by the DuckDB oracle SQL. */
  val CDC_W = 8            // boundary window (chars)
  val CDC_MOD = 64L        // boundary rate ⇒ expected chunk ≈ 64 chars
  val CDC_B = 127L         // odd polynomial base (coprime to CDC_MOD)
  val CDC_CP_MOD = 251     // code-point reduction keeping int64 exact
  /** B^(W-1) .. B^0, the per-term weights (B=127, W=8). */
  val CDC_POWS: Array[Long] = {
    val a = new Array[Long](CDC_W)
    a(CDC_W - 1) = 1L
    var j = CDC_W - 2
    while (j >= 0) { a(j) = a(j + 1) * CDC_B; j -= 1 }
    a
  }

  /** Chunks of `s` split at content-defined boundaries: a boundary
    * after 1-based char position i+W-1 wherever the window [i, i+W)
    * satisfies `poly(window) mod CDC_MOD = 0` (i ≤ L−W+1); a cut at
    * exactly L+1 merges with the final sentinel, so the chunks always
    * tile the input exactly. Empty input → empty array. */
  def cdcChunksUtf8(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    // one decode pass: cpm(k) = codepoint(char k) % CDC_CP_MOD,
    // off(k) = byte offset of char k, off(L) = n
    val cpm = new Array[Int](n + 1)
    val off = new Array[Int](n + 1)
    var L = 0
    var i = 0
    while (i < n) {
      off(L) = i
      val b0 = bytes(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var k = 1
        while (k < len && i + k < n) { cp = (cp << 6) | (bytes(i + k) & 0x3F); k += 1 }
      }
      cpm(L) = cp % CDC_CP_MOD
      L += 1
      i += len
    }
    off(L) = n
    val out = new java.util.ArrayList[AnyRef](4)
    var start = 0 // 0-based char index of the current chunk start
    if (L >= CDC_W) {
      var h = 0L
      var k = 0
      while (k < CDC_W) { h = h * CDC_B + cpm(k); k += 1 }
      var b = 0 // window start, 0-based
      while (b <= L - CDC_W) {
        if (h % CDC_MOD == 0L) {
          val cut = b + CDC_W
          if (cut < L) {
            out.add(UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(bytes, off(start), off(cut))))
            start = cut
          }
        }
        if (b < L - CDC_W) h = (h - cpm(b) * CDC_POWS(0)) * CDC_B + cpm(b + CDC_W)
        b += 1
      }
    }
    out.add(UTF8String.fromBytes(
      java.util.Arrays.copyOfRange(bytes, off(start), n)))
    new GenericArrayData(out.toArray)
  }

  def cdcChunksFast(text: Column): Column = column(CdcChunks(expression(text)))

  /** Space-joined n-windows of a string array (distinct keeps
    * first-occurrence order, the array_distinct contract; non-distinct
    * keeps every occurrence in position order — the posexplode /
    * frequency-bigram form); empty result below n elements. */
  def shinglesUtf8(a: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = a.numElements()
    if (len < n) return new GenericArrayData(Array.empty[AnyRef])
    val out: java.util.Collection[AnyRef] =
      if (distinct) new java.util.LinkedHashSet[AnyRef]()
      else new java.util.ArrayList[AnyRef](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      out.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** All (length, shingle) pairs for lengths 1..maxN in ONE token walk
    * — row-for-row what `union over n of explode(shingles(toks, n))
    * tagged with n` produces (per-length distinct, non-null tokens),
    * but with one array scan instead of maxN and each window's bytes
    * written ONCE: the length-j gram at position i is a prefix of the
    * length-(j+1) gram, so every emitted UTF8String shares one backing
    * buffer per position (maxN token copies per position instead of
    * the triangular maxN·(maxN+1)/2 the per-length concats pay). */
  def shinglesMultiUtf8(a: ArrayData, maxN: Int): ArrayData = {
    val len = a.numElements()
    val seen = Array.fill(maxN)(new java.util.HashSet[UTF8String]())
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < len) {
      val lim = math.min(maxN, len - i)
      var total = 0
      var j = 0
      while (j < lim) {
        // null tokens contribute nothing (concatWs skips them), mirroring
        // shinglesUtf8's per-length windows; over-allocate one byte per
        // window slot for the separator.
        total += (if (a.isNullAt(i + j)) 0 else a.getUTF8String(i + j).numBytes) + 1
        j += 1
      }
      val buf = new Array[Byte](total)
      var off = 0
      j = 0
      while (j < lim) {
        if (!a.isNullAt(i + j)) {
          if (off > 0) { buf(off) = ' '; off += 1 }
          val tb = a.getUTF8String(i + j).getBytes
          System.arraycopy(tb, 0, buf, off, tb.length)
          off += tb.length
        }
        val sp = UTF8String.fromBytes(buf, 0, off)
        if (seen(j).add(sp))
          out.add(org.apache.spark.sql.catalyst.InternalRow((j + 1).toLong, sp))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def shinglesFast(toks: Column, n: Int): Column =
    column(Shingles(expression(toks), n))

  def shinglesMultiFast(toks: Column, maxN: Int): Column =
    column(ShinglesMulti(expression(toks), maxN))

  /** Every n-window in position order (no dedupe) — feeds posexplode
    * position arithmetic and frequency bigrams. */
  def shinglesAllFast(toks: Column, n: Int): Column =
    column(Shingles(expression(toks), n, distinct = false))

  /** Maximal [a-z0-9]+ runs of the lowercased input, as UTF8Strings. */
  def tokenizeUtf8(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val out = new java.util.ArrayList[AnyRef](8)
    var i = 0
    var start = -1
    while (i < b.length) {
      val c = b(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, i)))
        start = -1
      }
      i += 1
    }
    if (start >= 0)
      out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, b.length)))
    new GenericArrayData(out.toArray)
  }

  def tokensFast(text: Column): Column = column(Tokenize(expression(text)))

  /** SQL registration (`SELECT tokenize(text)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize", exprs => Tokenize(exprs.head), "built-in")
}
