package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.SparkSessionTestWrapper

/** The native bloom probe must agree with `mightContainString` on
  * every input (it is defined over the same UTF-8 bytes) and must
  * never produce a false negative for inserted members — the property
  * the decontamination prefilter's correctness rests on. */
class BloomExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark

  test("native probe == mightContainString on members, non-members, and unicode") {
    import spark.implicits._
    val members = (0 until 500).map(i => s"shingle $i with späces ✓")
    val bf = BloomFilter.create(members.size.toLong, 0.01)
    members.foreach(bf.putString)
    val bfb = spark.sparkContext.broadcast(bf)
    val probeSet = members ++ (500 until 1500).map(i => s"absent $i ünïcode")
    val got = probeSet.toDF("s")
      .select(col("s"), BloomExpressions.mightContain(col("s"), bfb).as("m"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(1) == bf.mightContainString(r.getString(0)),
        s"probe disagrees with mightContainString for '${r.getString(0)}'")
    }
    val byVal = got.map(r => r.getString(0) -> r.getBoolean(1)).toMap
    members.foreach(m => assert(byVal(m), s"false negative for member '$m'"))
  }

  test("null input probes to null") {
    val bf = BloomFilter.create(10, 0.01)
    bf.putString("x")
    val bfb = spark.sparkContext.broadcast(bf)
    val r = spark.sql("SELECT CAST(NULL AS STRING) AS s")
      .select(BloomExpressions.mightContain(col("s"), bfb))
      .collect().head
    assert(r.isNullAt(0))
  }
}
