package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.{GraftFunctions, TextExpressions}

/** Round-15 operator laws: the fused multi-length gram pass that
  * replaced q_dedup_suffix's 8 per-length explodes must be row-for-row
  * identical to them, and the direct UTF8 routine must honor the
  * per-length distinct contract on crafted inputs. */
class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("ShinglesMulti == tagged union of per-length Shingles explodes on fixture docs") {
    val docs = Tables.documents(spark, SF)
      .select(col("doc_id"), GraftFunctions.tokens(col("text")).as("w"))
    val fused = docs.select(col("doc_id"),
        explode(TextExpressions.shinglesMultiFast(col("w"), 8)).as("gs"))
      .select(col("doc_id"), col("gs.gl"), col("gs.sp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val union = (1 to 8).map { n =>
      docs.select(col("doc_id"), lit(n.toLong).as("gl"),
        explode(GraftFunctions.shingles(col("w"), n)).as("sp"))
    }.reduce(_ unionAll _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(fused.nonEmpty && fused == union,
      "fused multi-length grams must equal the tagged per-length union")
  }

  test("shinglesMultiUtf8 dedups per length and shares window prefixes") {
    def arr(toks: String*) =
      new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
    def run(maxN: Int, toks: String*): Seq[(Long, String)] = {
      val out = TextExpressions.shinglesMultiUtf8(arr(toks: _*), maxN)
      (0 until out.numElements()).map { i =>
        val row = out.getStruct(i, 2)
        (row.getLong(0), row.getUTF8String(1).toString)
      }
    }
    // repeated unigram dedups at length 1 but both bigrams survive
    assert(run(2, "a", "b", "a") ==
      Seq((1L, "a"), (2L, "a b"), (1L, "b"), (2L, "b a")))
    // window shorter than maxN emits only the lengths that fit
    assert(run(4, "x", "y") == Seq((1L, "x"), (2L, "x y"), (1L, "y")))
    // empty array emits nothing
    assert(run(3) == Seq.empty)
    // multi-byte tokens keep exact bytes across the shared buffer
    assert(run(2, "héllo", "wörld") ==
      Seq((1L, "héllo"), (2L, "héllo wörld"), (1L, "wörld")))
  }

  test("shinglesMultiUtf8 skips null tokens like concatWs (per-length Shingles parity)") {
    def arrN(toks: Option[String]*) = new GenericArrayData(
      toks.map(_.map(UTF8String.fromString).orNull).toArray[Any])
    val out = TextExpressions.shinglesMultiUtf8(
      arrN(Some("a"), None, Some("b")), 3)
    val got = (0 until out.numElements()).map { i =>
      val row = out.getStruct(i, 2)
      (row.getLong(0), row.getUTF8String(1).toString)
    }
    // windows: [a]→"a", [a,∅]→"a", [a,∅,b]→"a b", [∅]→"", [∅,b]→"b", [b]→"b"
    // concatWs drops nulls without a separator; per-length dedup applies.
    assert(got == Seq((1L, "a"), (2L, "a"), (3L, "a b"),
      (1L, ""), (2L, "b"), (1L, "b")))
  }
}
