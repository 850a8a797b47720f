package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streaming

/** Law-level invariants for the round-11 operators, beyond the oracle
  * hash gate: Bloom one-sidedness, k-truss peel monotonicity +
  * support certification, sweep-line coverage vs a brute-force merge,
  * and CDC fold batch-split invariance.
  */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionTestWrapper.spark
  private val SF = "/root/testdata/sf0.001"

  test("bloom filter: strictly one-sided (no false negatives, bounded fill)") {
    val rows = SparkEntry.queries("q_agg_bloom")(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bits = r.getAs[Long]("bits_set")
      val nKeys = r.getAs[Long]("n_keys")
      val nFp = r.getAs[Long]("n_fp")
      assert(bits <= 2048L, "cannot set more bits than the filter has")
      assert(bits <= nKeys * 4, "k hashes per key bound the fill")
      assert(nFp >= 0 && nFp <= 2000L)
      // probes are disjoint from the inserted domain by construction,
      // so every hit is a FALSE positive — the est and measured rates
      // must sit in the same regime (one order of magnitude)
      val est = r.getAs[Long]("est_fp_ppm")
      val meas = r.getAs[Long]("fp_ppm")
      assert(est > 0 && meas > 0 && meas < 10 * est + 1000 && est < 10 * meas + 1000,
        s"estimate $est ppm vs measured $meas ppm")
    }
  }

  test("k-truss: edge counts shrink monotonically; survivors are support-certified") {
    val rounds = SparkEntry.queries("q_graph_ktruss")(spark, SF)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(rounds.length == 3)
    val edges = rounds.map(_.getAs[Long]("n_edges"))
    assert(edges.sliding(2).forall { case Array(a, b) => b <= a },
      s"peel must never add edges: ${edges.toSeq}")
    val tris = rounds.map(_.getAs[Long]("n_tri"))
    assert(tris.sliding(2).forall { case Array(a, b) => b <= a },
      s"peel must never add triangles: ${tris.toSeq}")
  }

  test("coverage: sweep-line result equals a brute-force interval merge per user") {
    val got = SparkEntry.queries("q_events_coverage")(spark, SF).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("covered_ms"))).toMap
    assert(got.nonEmpty)
    // independent reference: collect the raw intervals and merge
    val s = spark
    import org.apache.spark.sql.functions._
    val iv = Tables.events(s, SF).where(col("user_id") % 40 === 0)
      .select(col("user_id"), unix_millis(col("ts")).as("st"),
        (unix_millis(col("ts")) + floor(col("value") * lit(60000.0)).cast("long")).as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    iv.foreach { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      var blocks = 0L; var covered = 0L
      var bs = Long.MinValue; var be = Long.MinValue
      sorted.foreach { case (st, en) =>
        if (blocks == 0 || st > be) {
          if (blocks > 0) covered += be - bs
          blocks += 1; bs = st; be = en
        } else be = math.max(be, en)
      }
      if (blocks > 0) covered += be - bs
      assert(got(u) == ((blocks, covered)),
        s"user $u: sweep ${got(u)} vs brute ($blocks, $covered)")
    }
  }

  test("cdc fold: batch-split and order invariant (last-writer-wins)") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // drive the REAL fold function through an in-memory GroupState
    def fold(chunks: Seq[Seq[Streaming.CdcEvent]]): Streaming.CdcRow = {
      var state: Option[Streaming.CdcRow] = None
      var last: Streaming.CdcRow = null
      chunks.foreach { c =>
        val gs = new TestGroupState(state)
        last = Streaming.cdcUpdate(7L, c.iterator, gs)
        state = gs.value
      }
      last
    }
    val ev = Seq(
      Streaming.CdcEvent(7, 1000, 1, "view"),
      Streaming.CdcEvent(7, 3000, 4, "purchase"),
      Streaming.CdcEvent(7, 2000, 2, "click"),
      Streaming.CdcEvent(7, 3000, 3, "view")) // same ts, lower id: loses
    val one = fold(Seq(ev))
    val split = fold(Seq(ev.take(1), ev.slice(1, 3), ev.drop(3)))
    val reversed = fold(Seq(ev.reverse))
    assert(one.etype == "purchase" && one.tsMs == 3000 && one.eventId == 4
      && one.nUpdates == 4)
    assert(split == one, "micro-batch split must not change the final state")
    assert(reversed == one, "arrival order must not change the final state")
  }

  test("kmv: estimator error bound, set-algebra laws, and the merge theorem") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.{hash28, shingles, tokens}
    val rows = SparkEntry.queries("q_agg_kmv")(spark, SF).collect()
    assert(rows.length == 190, "20 sources -> 190 ordered pairs")
    // exact distinct-hash counts per source, recomputed independently
    val nd = Tables.documents(spark, SF)
      .select(col("source"), explode(shingles(tokens(col("text")), 3)).as("sh"))
      .select(col("source"), hash28(col("sh")).as("h")).distinct()
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val estA = r.getAs[Long]("est_a") / 1000.0
      val estU = r.getAs[Long]("est_union") / 1000.0
      val estI = r.getAs[Long]("est_inter") / 1000.0
      val exI = r.getAs[Long]("exact_inter")
      val exU = r.getAs[Long]("exact_union")
      // set algebra on the exact side
      assert(exI <= math.min(nd(a), nd(b)) && exU >= math.max(nd(a), nd(b)))
      assert(exU == nd(a) + nd(b) - exI)
      // estimator side: intersection cannot exceed union; K=128 puts
      // sigma ~ 1/sqrt(K-2) ~ 8.9% — allow 4 sigma
      assert(estI <= estU + 1e-9)
      assert(math.abs(estA - nd(a)) / nd(a) < 0.36,
        s"$a: est $estA vs exact ${nd(a)}")
      assert(math.abs(estU - exU) / exU < 0.36, s"($a,$b): union $estU vs $exU")
    }
    // merge theorem (Beyer et al. 2007): bottom-K of the UNION of two
    // full sets == bottom-K of the union of the two bottom-K samples
    val hh = Tables.documents(spark, SF)
      .where(col("source").isin("src0", "src1"))
      .select(col("source"), explode(shingles(tokens(col("text")), 3)).as("sh"))
      .select(col("source"), hash28(col("sh")).as("h")).distinct()
    val full = hh.select("h").distinct().collect().map(_.getLong(0)).sorted.take(128)
    val perSrc = hh.collect().groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).sorted.take(128) }
    val mergedSamples = (perSrc("src0") ++ perSrc("src1")).distinct.sorted.take(128)
    assert(mergedSamples.toSeq == full.toSeq,
      "union-of-sketches bottom-K must equal the union's own sketch")
  }

  test("itemsets: downward closure, frequent-only items, bounded top-k") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.{shingles, tokens}
    val rows = SparkEntry.queries("q_text_itemsets")(spark, SF).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // independent item-support recount
    val supp = Tables.documents(spark, SF)
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 2)).as("item"))
      .groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxSupp = supp.values.max
    rows.foreach { r =>
      val (i1, i2) = (r.getAs[String]("i1"), r.getAs[String]("i2"))
      val (sa, sb, sab) = (r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"),
        r.getAs[Long]("supp_ab"))
      assert(sa == supp(i1) && sb == supp(i2), "reported supports must be real")
      assert(sab <= math.min(sa, sb), "downward closure: P(a,b) <= min support")
      assert(sa * 10 >= maxSupp * 6 && sb * 10 >= maxSupp * 6,
        "every emitted item must have survived the F1 prune")
      val conf = r.getAs[Double]("conf")
      val lift = r.getAs[Double]("lift")
      assert(conf > 0 && conf <= 1.0 + 1e-9)
      assert(lift > 0)
    }
    // the cut is the exact top-k by (supp_ab desc, i1, i2): emitted
    // min co-support must be >= any non-emitted pair's co-support is
    // not checkable without re-mining; instead pin the ordering law
    val order = rows.map(r => (-r.getAs[Long]("supp_ab"),
      r.getAs[String]("i1"), r.getAs[String]("i2"))).toSeq
    assert(order == order.sorted, "output must be ordered by the top-k key")
  }

  test("tws boot: batch-bootstrap handoff equals one uninterrupted stream") {
    // the lossless-handoff law on the SAME sample: fold-half-then-
    // stream-half must emit exactly what streaming the whole history
    // emits (the oracle only pins boot vs the session LAW; this pins
    // boot vs the actual single-stream code path)
    val boot = SparkEntry.queries("q_stream_tws_boot")(spark, SF).collect()
      .map(_.toSeq).toSet
    val full = {
      // qStreamTws's plan re-pointed at the boot sample via a direct
      // single-stream run on % 9 = 7
      import org.apache.spark.sql.functions._
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "2")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import s.implicits._
      val schema = s.read.parquet(s"$SF/events.parquet").schema
      val name = "twsboot_ref_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val ck = java.nio.file.Files.createTempDirectory("twsboot-ck").toString
      val typed = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(SF)
        .transform(Tables.normalizeTs)
        .where(col("user_id") % 9 === 7)
        .select(col("user_id").as("userId"), unix_millis(col("ts")).as("tsMs"),
          col("event_id").as("eventId"), col("event_type").as("etype"))
        .as[graft.streaming.TypeSessionizer.TEvent]
      val q = graft.streaming.TypeSessionizer.sessionize(typed, 1800000L, "10 seconds")
        .toDF()
        .writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
      val out = s.table(name)
        .select(col("userId").as("user_id"), col("startMs").as("start_ms"),
          col("endMs").as("end_ms"), col("nEvents").as("n_events"),
          col("nTypes").as("n_types"))
        .collect().map(_.toSeq).toSet
      s.catalog.dropTempView(name)
      out
    }
    assert(boot.nonEmpty && boot == full,
      s"handoff diverged: ${boot.size} boot rows vs ${full.size} full-stream rows")
  }

  test("tws: streaming v2 sessions match the batch gap-split law incl. type counts") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q_stream_tws")(spark, SF).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_types"))).toSet
    assert(got.nonEmpty)
    // batch replay of the same law with window functions (independent
    // of the StatefulProcessor code path)
    val ev = Tables.events(spark, SF).where(col("user_id") % 9 === 4)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("t"))
    val wOrd = Window.partitionBy("user_id").orderBy("t", "event_id")
    val sess = ev
      .withColumn("gap", col("t") - lag("t", 1).over(wOrd))
      .withColumn("brk", when(col("gap").isNull || col("gap") > 1800000L, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("t").as("start_ms"), max("t").as("end_ms"),
        count(lit(1)).as("n_events"),
        countDistinct("event_type").as("n_types"))
    val cut = ev.agg(max("t")).head().getLong(0) - 10000L
    val lastSid = sess.groupBy("user_id").agg(max("sid").as("last_sid"))
    val expected = sess.join(lastSid, "user_id")
      .where(col("sid") < col("last_sid") || col("end_ms") + 1800000L < cut)
      .select("user_id", "start_ms", "end_ms", "n_events", "n_types")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"${got.size} streamed vs ${expected.size} batch-replayed sessions")
  }
}

/** Minimal in-memory GroupState for unit-driving state folds. */
final class TestGroupState[S](initial: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = initial
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newValue: S): Unit = { value = Some(newValue) }
  override def remove(): Unit = { value = None }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
