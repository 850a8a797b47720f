package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Curation-operator unit/property tests: Z-order bit math (reference
  * implementation + Spark column agreement + locality bound), PII
  * regex detection/redaction on crafted strings, and the Gopher rule
  * booleans on hand-computed documents.
  */
class CurationSpec extends AnyFunSuite with PropSupport {
  private lazy val spark = SparkSessionTestWrapper.spark
  import spark.implicits._

  private def deinterleave(z: Long): (Int, Int) = {
    var x = 0; var y = 0
    for (i <- 0 until 8) {
      x |= (((z >> (2 * i)) & 1L) << i).toInt
      y |= (((z >> (2 * i + 1)) & 1L) << i).toInt
    }
    (x, y)
  }

  test("zorder8Ref: interleave/deinterleave round-trip over the full domain") {
    val coords = Gen.choose(0, 255)
    forAllN2(coords, coords) { (x: Int, y: Int) =>
      assert(deinterleave(GraftFunctions.zorder8Ref(x, y)) === ((x, y)))
    }
  }

  test("zorder8 column agrees with the reference implementation") {
    val rows = for (x <- 0 until 256 by 7; y <- 0 until 256 by 11) yield (x.toLong, y.toLong)
    val got = rows.toDF("x", "y")
      .select($"x", $"y", GraftFunctions.zorder8($"x", $"y").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === GraftFunctions.zorder8Ref(r.getLong(0).toInt, r.getLong(1).toInt))
    }
  }

  test("hilbert8Ref: bijective on the full 256x256 plane") {
    val all = for (x <- 0 until 256; y <- 0 until 256)
      yield GraftFunctions.hilbert8Ref(x, y)
    assert(all.min == 0L && all.max == 65535L && all.distinct.size == 65536)
  }

  test("hilbert8Ref: unit-step continuity — consecutive indices are adjacent cells") {
    // THE Hilbert property (Morton order lacks it): walking the curve
    // never jumps. Invert by exhaustive tabulation, then check every
    // consecutive pair is Manhattan-distance 1.
    val inv = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256)
      inv(GraftFunctions.hilbert8Ref(x, y).toInt) = (x, y)
    for (d <- 0 until 65535) {
      val (x1, y1) = inv(d); val (x2, y2) = inv(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert8 column agrees with the reference implementation") {
    val rows = for (x <- 0 until 256 by 7; y <- 0 until 256 by 11) yield (x.toLong, y.toLong)
    val got = rows.toDF("x", "y")
      .select($"x", $"y", GraftFunctions.hilbert8($"x", $"y").as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === GraftFunctions.hilbert8Ref(r.getLong(0).toInt, r.getLong(1).toInt))
    }
  }

  test("retained composed-Column hilbert form agrees with the reference (sampled)") {
    val rows = for (x <- 0 until 256 by 23; y <- 0 until 256 by 31) yield (x.toLong, y.toLong)
    val got = rows.toDF("x", "y")
      .select($"x", $"y", GraftFunctions.hilbert8Composed($"x", $"y").as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === GraftFunctions.hilbert8Ref(r.getLong(0).toInt, r.getLong(1).toInt))
    }
  }

  test("hilbert beats morton on non-aligned tiles, ties on aligned ones (full plane)") {
    def areaSum(curve: (Int, Int) => Long, tile: Long): Long =
      (for (x <- 0 until 256; y <- 0 until 256) yield (curve(x, y) / tile, x, y))
        .groupBy(_._1).values.map { pts =>
          val xs = pts.map(_._2); val ys = pts.map(_._3)
          (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
        }.sum
    val h1000 = areaSum(GraftFunctions.hilbert8Ref, 1000)
    val z1000 = areaSum(GraftFunctions.zorder8Ref, 1000)
    assert(h1000 < z1000, s"hilbert $h1000 must beat morton $z1000 at tile 1000")
    // aligned power-of-4 tiles: both are exact 32x32 quadrant blocks
    assert(areaSum(GraftFunctions.hilbert8Ref, 1024) ==
      areaSum(GraftFunctions.zorder8Ref, 1024))
  }

  test("zorder locality: every 1024-wide curve bucket spans a bbox of at most 32x32") {
    // exhaustive over the full 256x256 plane — the property file-level
    // min/max pruning relies on at scale
    val byBucket = (for (x <- 0 until 256; y <- 0 until 256)
      yield (GraftFunctions.zorder8Ref(x, y) >> 10, x, y))
      .groupBy(_._1)
    byBucket.foreach { case (_, pts) =>
      val xs = pts.map(_._2); val ys = pts.map(_._3)
      assert(xs.max - xs.min <= 31 && ys.max - ys.min <= 31)
    }
  }

  test("PII redaction masks emails, IPv4s and phones exactly, in order") {
    val df = Seq(
      ("a", "write bob.smith+x@mail.example.com or 10.1.2.3 or +1-555-0042 ok"),
      ("b", "no pii here 1.2 3.4"),
      ("c", "two ips 192.168.0.1 10.0.0.255 and e@x.io")
    ).toDF("id", "s")
    val RE_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val RE_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val RE_PHONE = "\\+1-555-\\d{4}"
    val out = df.select($"id",
      size(regexp_extract_all($"s", lit(RE_EMAIL), lit(0))).as("ne"),
      size(regexp_extract_all($"s", lit(RE_IP), lit(0))).as("ni"),
      size(regexp_extract_all($"s", lit(RE_PHONE), lit(0))).as("np"),
      regexp_replace(regexp_replace(regexp_replace($"s",
        RE_EMAIL, "[EMAIL]"), RE_IP, "[IP]"), RE_PHONE, "[PHONE]").as("red"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out("a") === ((1, 1, 1, "write [EMAIL] or [IP] or [PHONE] ok")))
    assert(out("b") === ((0, 0, 0, "no pii here 1.2 3.4")))
    assert(out("c") === ((1, 2, 0, "two ips [IP] [IP] and [EMAIL]")))
  }

  test("Gopher rules evaluate to the hand-computed booleans") {
    // doc A: 26 tokens, mean word length 130/26 = 5.0 (the inclusive
    //        upper bound), 4 stopword hits, distinct ratio 25/26 —
    //        passes all four rules.
    val passTokens = Seq("the", "quick", "brown", "foxes", "jumped", "over",
      "lazy", "dogs", "while", "seven", "wizards", "brewed", "potent", "elixirs",
      "under", "a", "glowing", "moon", "and", "the", "stars", "watched",
      "distant", "ships", "sailing", "home")
    val docA = passTokens.mkString(" ")
    // doc B: 4 tokens < 25 — fails r_len; no stopwords — fails r_stop.
    val docB = "alpha beta gamma delta"
    val df = Seq((0L, docA, "en"), (1L, docB, "en")).toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text")).withColumn("source", lit("t"))
    df.createOrReplaceTempView("curation_docs")
    val w = GraftFunctions.tokens($"text")
    val rules = df.select($"doc_id",
      (size(w) >= 25 && size(w) <= 90).as("r_len"),
      (aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(w))
        .between(4.0, 5.0).as("r_wlen"),
      (size(filter(w, t => t.isin(Seq("the", "a", "of", "and").map(lit): _*))) >= 2).as("r_stop"),
      (size(array_distinct(w)).cast("double") / size(w) >= 0.35).as("r_distinct"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(rules(0L) === ((true, true, true, true)))
    assert(rules(1L) === ((false, true, false, true)))
  }
}
