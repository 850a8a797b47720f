package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: builds an sf×FACTOR dataset from an
  * existing driver fixture by unioning FACTOR key-remapped copies,
  * preserving referential integrity and join fan-outs exactly.
  *
  * Purpose (round-10 verdict item 1): the 100 TB posture of every
  * query is argued by plan shape; this turns the argument into a
  * measurement — run `graft.Bench` on the source and the scaled
  * fixture and compare per-query scaling factors against the data
  * ratio, and run `graft.Verify` + the DuckDB oracle on the scaled
  * fixture to confirm correctness is scale-independent.
  *
  * Construction rules (copy i ∈ [0, factor), offset = i·(maxKey+1)):
  *  - region/nation: fixed-size dimensions, copied once (TPC-H keeps
  *    them constant across SF).
  *  - customer/supplier/part/orders/lineitem: every key column gets
  *    its table's offset; foreign keys get the referenced table's
  *    offset — each copy is a disjoint, structurally identical
  *    sub-universe, so per-key group sizes and join fan-outs match
  *    the source exactly (scaling measures data volume, not a
  *    distribution shift).
  *  - events: event_id/user_id offset; timestamps kept (the window /
  *    sessionization load scales in users, not time range — the
  *    realistic growth axis).
  *  - documents: doc_id offset; copies i>0 suffix EVERY alnum token
  *    with `x<i>` (one regexp pass). A whole-doc suffix would leave
  *    copies near-identical under minhash/simhash/shingle measures
  *    and fabricate ~100× near-dup pairs (measured: 43M minhash pairs
  *    at factor 10); per-token suffixing makes copy vocabularies
  *    disjoint, so near-dup structure exists only WITHIN a copy and
  *    every dedup/text workload scales linearly with rows. n_chars
  *    recomputed. CAVEAT (measured, round 15): vocabulary
  *    disjointness holds only for ONE-LEVEL builds. Scaling an
  *    already-scaled fixture reuses suffixes — in sf1×16, outer copy
  *    i's inner sub-copy 0 carries suffix `x<i>`, bit-identical to
  *    outer copy 0's inner sub-copy i (verified: sf16d docs 5000+k ≡
  *    50000+k), fabricating full-document cross-copy duplicates. The
  *    engine handles them fine (q_dedup_suffix reports the full
  *    length), but per-copy-sliced verification (sharded_check's
  *    `copy` kind) is only valid on one-level fixtures — build those
  *    with a single ScaleUp call from the base fixture (factor 160
  *    documents-only ≈ the sf16d text volume).
  *  - embeddings: vec_id offset; copies i>0 rotate the vector by
  *    i mod dim positions, composed (once i exceeds the dimension)
  *    with a deterministic per-(cycle, position) sign flip — both are
  *    norm-preserving per-copy isometries, so ANN/near-dup bucket
  *    densities grow linearly, not quadratically, at any factor.
  *
  * All transforms are pure deterministic column expressions of a
  * deterministic fixture — repeated runs are bit-identical. Output is
  * one plain parquet FILE per table (`<dest>/<name>.parquet`),
  * matching the driver fixture layout so `graft.Tables` and the
  * DuckDB oracle read both the same way.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <destDir> <factor> [tables-csv]
  */
object ScaleUp {
  /** SQL for copy i's embedding isometry over an `embedding` column of
    * dimension `dim`: rotate by i mod dim positions; once i exceeds
    * the dimension (rotation alone would repeat every dim copies, and
    * a raw slice by i > dim is invalid — its length goes negative),
    * compose with a deterministic per-(cycle, position) Rademacher
    * sign flip. Both parts are per-copy isometries (norms and
    * intra-copy distances unchanged) that break cross-copy
    * correlation for ANY factor; copies with i < dim are
    * bit-identical to the pure rotation, so fixtures built with
    * factor <= dim are unchanged. */
  private[graft] def embeddingCopyExpr(dim: Int, i: Int): String = {
    val (rot, cyc) = (i % dim, i / dim)
    val rotated =
      if (rot == 0) "embedding"
      else s"concat(slice(embedding, ${rot + 1}, size(embedding) - $rot), " +
           s"slice(embedding, 1, $rot))"
    if (cyc == 0) rotated
    else s"transform($rotated, (x, p) -> cast(x * (1 - 2 * " +
         s"(conv(substr(md5(concat('$cyc', ':', p)), 1, 1), 16, 10) % 2)) as float))"
  }

  def main(args: Array[String]): Unit = {
    val (src, dest, factor) = (args(0), args(1), args(2).toInt)
    // optional 4th arg: comma-separated table subset to emit (e.g.
    // "embeddings" builds a vector-only decade fixture for the banded-
    // LSH candidate-growth probe without paying for 16x of lineitem)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def keySpan(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    // lazy: a tables-csv subset build must not scan (or require the
    // existence of) excluded tables — e.g. a documents-only build on a
    // source fixture with no embeddings.parquet, or the vector-decade
    // embeddings-only build that would otherwise pay key-span scans of
    // every relational table.
    lazy val customer = Tables.customer(spark, src)
    lazy val supplier = Tables.supplier(spark, src)
    lazy val part     = Tables.part(spark, src)
    lazy val orders   = Tables.orders(spark, src)
    lazy val lineitem = Tables.lineitem(spark, src)
    lazy val events   = Tables.events(spark, src)
    lazy val docs     = Tables.documents(spark, src)
    lazy val embs     = Tables.embeddings(spark, src)

    lazy val offC = keySpan(customer, "c_custkey")
    lazy val offS = keySpan(supplier, "s_suppkey")
    lazy val offP = keySpan(part, "p_partkey")
    lazy val offO = keySpan(orders, "o_orderkey")
    lazy val offE = keySpan(events, "event_id")
    lazy val offU = keySpan(events, "user_id")
    lazy val offD = keySpan(docs, "doc_id")
    lazy val offV = keySpan(embs, "vec_id")

    /** union of `factor` copies with per-copy column rewrites */
    def scaled(df: DataFrame)(rewrite: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => rewrite(df, i)).reduce(_ unionByName _)

    def shift(df: DataFrame, i: Int, cols: (String, Long)*): DataFrame =
      cols.foldLeft(df) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + lit(i * off))
      }

    /** write as ONE plain parquet file `<dest>/<name>.parquet` (the
      * driver fixture layout — a file, not a directory — so DuckDB's
      * read_parquet and Spark both load it unchanged; Spark still
      * splits a single file by row group for parallel scans). */
    def write(df: => DataFrame, name: String): Unit = {
      if (!only.forall(_.contains(name))) return
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dest), conf)
      val tmp = new org.apache.hadoop.fs.Path(s"$dest/.tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part1 = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      val out = new org.apache.hadoop.fs.Path(s"$dest/$name.parquet")
      fs.delete(out, false)
      fs.rename(part1, out)
      fs.delete(tmp, true)
      // metadata-only count from the written footer — re-counting `df`
      // would re-execute the full factor-way union a second time
      println(s"[scaleup] $name: ${spark.read.parquet(out.toString).count()} rows -> $out")
    }

    new java.io.File(dest).mkdirs()
    // fixed dims: copy once
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(scaled(customer)((d, i) => shift(d, i, "c_custkey" -> offC)), "customer")
    write(scaled(supplier)((d, i) => shift(d, i, "s_suppkey" -> offS)), "supplier")
    write(scaled(part)((d, i) => shift(d, i, "p_partkey" -> offP)), "part")
    write(scaled(orders)((d, i) =>
      shift(d, i, "o_orderkey" -> offO, "o_custkey" -> offC)), "orders")
    write(scaled(lineitem)((d, i) =>
      shift(d, i, "l_orderkey" -> offO, "l_partkey" -> offP, "l_suppkey" -> offS)),
      "lineitem")
    write(scaled(events)((d, i) =>
      shift(d, i, "event_id" -> offE, "user_id" -> offU)), "events")
    write(scaled(docs) { (d, i) =>
      val shifted = shift(d, i, "doc_id" -> offD)
      if (i == 0) shifted
      else shifted
        .withColumn("text",
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1x$i"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")
    // One aggregate proves the dimension is uniform (the rotation SQL
    // slices by size(embedding), but `rot` derives from this value — a
    // mixed-dimension table would regress to the negative-slice crash
    // for rows shorter than rot) and gives a clear error on an empty
    // table instead of head()'s NoSuchElementException. Gated on the
    // same tables-csv subset as write(): a documents-only build must
    // not pay (or hard-fail on) an embeddings scan the caller excluded.
    if (only.forall(_.contains("embeddings"))) {
      val dimRow = embs.agg(
        min(size(col("embedding"))).as("lo"),
        max(size(col("embedding"))).as("hi")).head()
      require(!dimRow.isNullAt(0),
        s"embeddings at $src is empty — nothing to scale")
      require(dimRow.getInt(0) == dimRow.getInt(1),
        s"embeddings at $src has mixed vector dimensions " +
          s"(${dimRow.getInt(0)}..${dimRow.getInt(1)}); the per-copy " +
          "rotation isometry requires one uniform dimension")
      val dim = dimRow.getInt(0)
      write(scaled(embs) { (d, i) =>
        val shifted = shift(d, i, "vec_id" -> offV)
        if (i == 0) shifted
        else shifted.withColumn("embedding", expr(embeddingCopyExpr(dim, i)))
      }, "embeddings")
    }

    spark.stop()
  }
}
