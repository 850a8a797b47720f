package graft

import org.scalatest.funsuite.AnyFunSuite

/** Law-level invariants for the round-12 operators, beyond the oracle
  * hash gate: prefix-filter join exactness vs brute force, skyline
  * dominance certification vs a quadratic check, gap-fill accounting
  * identities, and bloom semi-join equality with the unfiltered join.
  */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("prefix join: identical to the brute-force threshold Jaccard join") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val got = SparkEntry.queries("q_dedup_prefixjoin")(spark, SF).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("jac_bp"))).toMap
    // brute force: every shared-shingle pair, no prefix pruning
    val sh = Tables.documents(spark, SF)
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("s"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(cnt.select(col("doc_id").as("da"), col("c").as("ca")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("c").as("cb")), "db")
      .where(lit(5) * col("inter") >= lit(3) * (col("ca") + col("cb") - col("inter")))
      .select(col("da"), col("db"), col("inter"),
        expr("(inter * 10000) div (ca + cb - inter)").as("jac_bp"))
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("jac_bp"))).toMap
    assert(brute.nonEmpty, "fixture must contain at least one near-dup pair")
    assert(got == brute,
      s"prefix filter must lose nothing: got ${got.size}, brute ${brute.size}")
  }

  test("skyline: every kept point undominated, every dropped point dominated") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val frontier = SparkEntry.queries("q_curation_skyline")(spark, SF).collect()
      .map(r => (r.getAs[Long]("len"), r.getAs[Long]("ttr_milli")))
    assert(frontier.nonEmpty)
    val pts = Tables.documents(spark, SF)
      .withColumn("w", tokens(col("text")))
      .select(col("n_chars").as("len"),
        expr("size(array_distinct(w)) * 1000L div size(w)").as("ttr"))
      .groupBy("len").agg(max("ttr").as("ttr"))
      .collect().map(r => (r.getAs[Long]("len"), r.getAs[Long]("ttr")))
    def dominated(p: (Long, Long)) = pts.exists(q =>
      (q._1 > p._1 && q._2 >= p._2) || (q._1 >= p._1 && q._2 > p._2))
    frontier.foreach(p => assert(!dominated(p), s"kept point $p is dominated"))
    pts.filterNot(frontier.contains).foreach(p =>
      assert(dominated(p), s"dropped point $p is undominated"))
    // frontier is strictly monotone: longer ⇒ strictly lower ttr
    frontier.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(b._2 < a._2, s"$a -> $b not strictly decreasing")
      case _           =>
    }
  }

  test("gap-fill: accounting identities hold per user") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_events_gapfill")(spark, SF).collect()
    assert(rows.nonEmpty)
    val spans = Tables.events(spark, SF)
      .groupBy("user_id")
      .agg((expr("max(unix_micros(ts)) div 3600000000")
        - expr("min(unix_micros(ts)) div 3600000000") + 1L).as("span"),
        countDistinct(expr("unix_micros(ts) div 3600000000")).as("hrs"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("span"), r.getAs[Long]("hrs"))).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val (span, hrs) = spans(u)
      assert(r.getAs[Long]("n_hours") == span, s"user $u grid covers the span")
      assert(r.getAs[Long]("n_obs") == hrs, s"user $u observed-hour count")
      // first grid hour is always observed (span starts at the first
      // event), so LOCF leaves no leading hole: obs + filled = hours
      assert(r.getAs[Long]("n_obs") + r.getAs[Long]("n_filled")
        == r.getAs[Long]("n_hours"), s"user $u fill accounting")
    }
  }

  test("bloom semi-join: one-sided reduction, exact join result preserved") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_join_bloom")(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRows, nPass, nJoin) = (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_pass"), r.getAs[Long]("n_join"))
      assert(nJoin <= nPass && nPass <= nRows,
        s"reduction must be one-sided: $nJoin <= $nPass <= $nRows")
    }
    // the joined aggregate equals the plain (no bloom) join
    val li = Tables.lineitem(spark, SF)
    val dim = Tables.orders(spark, SF)
      .where(col("o_orderpriority") === "1-URGENT"
        && expr("o_orderdate >= timestamp'2000-01-01'")
        && expr("o_orderdate < timestamp'2000-04-01'"))
      .select(col("o_orderkey")).distinct()
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("q"))).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val (n, q) = plain.getOrElse(flag, (0L, 0.0))
      assert(r.getAs[Long]("n_join") == n, s"flag $flag join count")
      assert(math.abs(r.getAs[Double]("sum_qty") - q) < 1e-9, s"flag $flag qty")
    }
  }
}
