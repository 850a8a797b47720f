package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the query inventory and the
  * imaging pipeline. Everything here composes Spark built-ins
  * (codegen'd, Catalyst-foldable) — no Scala UDFs in hot paths.
  */
object GraftFunctions {

  /** Emission-wavelength (nm) → OME channel color, as an upper-bound
    * lookup: first band whose upper bound exceeds the wavelength wins;
    * >= 750 falls through to pink (reference
    * compress/png_to_zarr.py:397-436, exclusive upper bounds).
    * Expressed as a when-chain so Catalyst can constant-fold it.
    */
  def wavelengthToHex(wl: Column): Column = {
    val bands: Seq[(Int, Int)] = Seq(
      460 -> 0x690AFE, 470 -> 0x3F2EFE, 480 -> 0x4B90FE, 490 -> 0x59D5F8,
      500 -> 0x5DF8D6, 520 -> 0x5AFEB8, 540 -> 0x58FEA1, 560 -> 0x51FF1E,
      565 -> 0xBBFB01, 575 -> 0xE9EC02, 580 -> 0xF5C503, 590 -> 0xF39107,
      600 -> 0xF15211, 620 -> 0xF0121E, 750 -> 0xF00050)
    bands.foldRight(lit(0xF00050): Column) { case ((ub, hexVal), rest) =>
      when(wl < lit(ub), lit(hexVal)).otherwise(rest)
    }
  }

  /** `#%06x`-style channel color string (reference png_to_zarr.py:80). */
  def colorHex(c: Column): Column = format_string("%06x", c)

  /** 28-bit deterministic hash of a string via md5 — chosen because the
    * DuckDB oracle can compute the identical value
    * (CAST(concat('0x', substr(md5(s),1,7)) AS BIGINT)); small enough
    * that affine permutations (a*h+b) never overflow int64.
    */
  def hash28(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** Tokenize to lowercase word array, empty tokens removed. Runs the
    * native single-pass [[Tokenize]] expression — equivalent by
    * construction to the composed `filter(split(lower(..)))` form
    * (kept below for the equivalence property test), ~1.9× faster. */
  def tokens(text: Column): Column = TextExpressions.tokensFast(text)

  /** The composed built-in form `tokens` replaces; retained as the
    * equivalence-test reference. */
  private[graft] def tokensRegex(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > lit(0))

  /** Distinct word n-gram shingles of a token array. Runs the native
    * single-pass [[Shingles]] expression — equivalent by construction
    * to the composed `array_distinct(transform(...))` form (kept below
    * for the equivalence property test). */
  def shingles(toks: Column, n: Int): Column =
    TextExpressions.shinglesFast(toks, n)

  /** The composed built-in form `shingles` replaces; retained as the
    * equivalence-test reference. Guarded for arrays shorter than n
    * (Spark's sequence() would otherwise run backwards). */
  private[graft] def shinglesComposed(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))

  /** Cosine similarity of two float-array columns, computed in double
    * with index-order accumulation. Delegates to the native
    * [[CosineSim]] Catalyst expression (tight codegen'd loop) — the
    * brute-force baseline; the LSH/IVF paths bound the candidate set
    * before this runs at scale.
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosineFast(a, b)

  /** Squared L2 norm of a float-array column (double). */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Morton / Z-order interleave of two 8-bit coordinates into a
    * 16-bit curve value: bit i of `x` lands at curve bit 2i, bit i of
    * `y` at 2i+1. Composed from codegen'd bit built-ins (shift / AND /
    * sum) — no UDF — so Catalyst folds it when inputs are literal and
    * whole-stage codegen keeps it in-register per row. Rows sorted or
    * range-bucketed by the curve value are spatially local in (x, y):
    * the multi-dimensional clustering used for data layout (file
    * skipping on two correlated dimensions) at 100 TB. */
  def zorder8(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Single-partition window over a BOUNDED (already limit-ed / K-row)
    * input — the marker for every deliberate global re-rank in the
    * engine. The constant partition key documents the intent in the
    * plan source; Catalyst folds it away (measured on Spark 4.1), so
    * the physical plan is the plain global window and WindowExec's "No
    * Partition Defined" warning is instead silenced at the logger by
    * [[graft.core.LogHygiene.quietWindowWarnings]] — the warning is
    * pure noise on a ≤ k-row input and would bury real unbounded-
    * window signals. */
  def boundedWindow(order: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(order: _*)

  /** Reference Scala implementation of [[zorder8]] for property tests. */
  private[graft] def zorder8Ref(x: Int, y: Int): Long =
    (0 until 8).map { i =>
      (((x >> i) & 1).toLong << (2 * i)) + (((y >> i) & 1).toLong << (2 * i + 1))
    }.sum

  /** Hilbert curve index on the 256×256 plane. Runs the native
    * single-loop [[HilbertIndex8]] expression — the composed-Column
    * unrolling below doubles its tree per rotation step (4⁸ nodes by
    * step 8) and made q_hilbert_locality a 67-second query at sf0.1;
    * the native loop is sub-second on the same input (equivalence
    * pinned by property test against [[hilbert8Ref]]). Unlike Morton
    * order, consecutive curve values are always ADJACENT cells (unit
    * Manhattan step — pinned by property test), which is why Hilbert
    * clustering yields tighter per-file bounding boxes than z-order
    * for 2-D data skipping. */
  def hilbert8(x0: Column, y0: Column): Column =
    CurveExpressions.hilbertFast(x0, y0)

  /** The composed-Column form [[hilbert8]] replaces; retained as the
    * equivalence-test reference for the native expression. Do NOT use
    * in queries — exponential expression-tree growth (see scaladoc
    * above). */
  private[graft] def hilbert8Composed(x0: Column, y0: Column): Column = {
    var x = x0.cast("int"); var y = y0.cast("int"); var d = lit(0L)
    var s = 128
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > 0, 1).otherwise(0)
      val ry = when(y.bitwiseAND(lit(s)) > 0, 1).otherwise(0)
      d = d + lit(s.toLong * s) * (rx * 3).bitwiseXOR(ry).cast("long")
      // rot(256): if ry==0 { if rx==1 reflect both in 255−·; swap }
      val nx = when(ry === 0, when(rx === 1, lit(255) - y).otherwise(y)).otherwise(x)
      val ny = when(ry === 0, when(rx === 1, lit(255) - x).otherwise(x)).otherwise(y)
      x = nx; y = ny
      s >>= 1
    }
    d
  }

  /** Reference Scala implementation of [[hilbert8]] for property tests
    * (also the generator template for the DuckDB oracle's CTE chain —
    * the three implementations share this exact iteration). */
  private[graft] def hilbert8Ref(x0: Int, y0: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 128
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255 - x; y = 255 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
