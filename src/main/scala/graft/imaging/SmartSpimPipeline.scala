package graft.imaging

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.hadoop.fs.{Path => HPath}
import java.nio.file.{Files, Paths}

/** The SmartSPIM image dataflow, Spark-first (SURVEY.md §3.2):
  *
  *   binaryFile scan → decode (S2/C2) → fragment explode → groupByKey
  *   chunk assembly (the rechunk shuffle, P3) → per-chunk windowed-mean
  *   downsample (A1, shuffle-free) → merge sub-blocks (one shrinking
  *   shuffle per pyramid level) → blosc/zstd encode + zarr chunk files
  *   (S7/C1) via foreachPartition.
  *
  * Scale design: pixel payloads never pass through a window function or
  * a driver collect. The only full-data shuffle is the level-0 rechunk
  * (inherent — the reference's dask `rechunk` does the same,
  * png_to_zarr.py:592-593); each pyramid level then shuffles 8× less
  * data. Slice z-indices are parsed from the `<z>.<ext>` filename
  * whenever a paths-only pass proves that safe, so image bytes stay on
  * their input partitions until the rechunk — no z-map join at all.
  */
object SmartSpimPipeline {

  /** One decoded Z-slice (reference: one dask chunk per file). */
  final case class SliceRow(stack: String, z: Int, height: Int, width: Int,
      data: Array[Byte])

  /** A slice fragment destined for one storage chunk. */
  final case class Fragment(stack: String, zc: Int, yc: Int, xc: Int,
      zoff: Int, yoff: Int, xoff: Int, dy: Int, dx: Int, data: Array[Byte])

  /** One zarr storage chunk (chunk-as-row; SURVEY.md §1.4). dz/dy/dx are
    * the actual (edge-clamped) dims; the writer pads to full chunk. */
  final case class ChunkRow(stack: String, zc: Int, yc: Int, xc: Int,
      dz: Int, dy: Int, dx: Int, data: Array[Byte])

  /** Sub-block of a downsampled chunk en route to its coarser chunk.
    * (Public: Spark's generated code must reach the accessors.) */
  final case class SubBlock(stack: String, zc: Int, yc: Int, xc: Int,
      zoff: Int, yoff: Int, xoff: Int, dz: Int, dy: Int, dx: Int,
      data: Array[Byte])

  // ------------------------------------------------------------- reading

  /** Lazy stack reader (S2): one row per slice, z = rank of the file
    * path within its stack (glob-alphabetical Z order, readers.py:145).
    *
    * Fast path: the reference layout names slices `<z>.<ext>` with
    * zero-padded z (so alphabetical order IS numeric order). When a
    * cheap paths-only pass proves every stack's filenames are numeric,
    * fixed-width and contiguous from 0, z is parsed straight from the
    * filename — zero shuffles, zero joins, zero broadcasts on the image
    * bytes, at any scale. Otherwise fall back to a per-stack window
    * rank joined back on path (a plain equi-join; no broadcast — at
    * ~12.5M slices per 100 TB a broadcast z-map would be multi-GB).
    */
  def slices(spark: SparkSession, dir: String, ext: String): Dataset[SliceRow] =
    slices(spark, Seq(dir), ext)

  /** Multi-stack variant: one scan over every stack dir in the shard,
    * so the whole shard becomes ONE pipeline (one rechunk shuffle, one
    * write job per level) instead of a driver loop of per-stack jobs —
    * the shape that keeps 1000 executors busy on 10k stacks. */
  def slices(spark: SparkSession, dirs: Seq[String], ext: String): Dataset[SliceRow] = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$ext")
      .load(dirs: _*)
    // stack dir = parent of the slice file
    val stackOf = regexp_replace(col("path"), "/[^/]+$", "")
    val stemOf = regexp_extract(col("path"), "/(\\d+)\\.[^./]+$", 1)
    // paths-only validation (binaryFile prunes `content`: this reads
    // the listing, not the bytes): per stack, filenames must be all
    // numeric, one width (alphabetical == numeric), distinct, 0..n-1.
    val chk = files
      .select(stackOf.as("stack_dir"), stemOf.as("zs"))
      .groupBy("stack_dir")
      .agg(count(lit(1)).as("n"),
        sum(when(col("zs") === "", 1).otherwise(0)).as("non_numeric"),
        min(when(col("zs") =!= "", col("zs").cast("long"))).as("zmin"),
        max(when(col("zs") =!= "", col("zs").cast("long"))).as("zmax"),
        countDistinct(when(col("zs") =!= "", col("zs").cast("long"))).as("nd"),
        // single-width check via min/max, not a second countDistinct
        // (each distinct agg multiplies the pre-shuffle rows)
        min(when(col("zs") =!= "", length(col("zs")))).as("wmin"),
        max(when(col("zs") =!= "", length(col("zs")))).as("wmax"))
      .collect() // one tiny row per stack
    val filenameIsZ = chk.nonEmpty && chk.forall { r =>
      r.getAs[Long]("non_numeric") == 0L &&
        r.getAs[Int]("wmin") == r.getAs[Int]("wmax") &&
        r.getAs[Long]("zmin") == 0L &&
        r.getAs[Long]("zmax") == r.getAs[Long]("n") - 1 &&
        r.getAs[Long]("nd") == r.getAs[Long]("n")
    }
    val indexed =
      if (filenameIsZ)
        files.select(col("path"), stemOf.cast("int").as("z"), col("content"))
      else {
        // ranking is per stack so the window shuffle stays partitioned
        // even when many stacks share one glob; join back on path with
        // NO broadcast hint (the z-map grows with the input).
        val zmap = spark.read.format("binaryFile")
          .option("pathGlobFilter", s"*.$ext").load(dirs: _*)
          .select(col("path"), stackOf.as("stack_dir"))
          .withColumn("z", row_number().over(
            Window.partitionBy("stack_dir").orderBy("path")) - 1)
          .drop("stack_dir")
        files.join(zmap, "path")
          .select(col("path"), col("z"), col("content"))
      }
    indexed
      .as[(String, Int, Array[Byte])]
      .map { case (path, z, content) =>
        val dec = ImageCodec.decode(content)
        val stack = {
          val p = path.stripSuffix("/")
          val cut = p.lastIndexOf('/')
          p.substring(0, math.max(cut, 0))
        }
        SliceRow(stack, z, dec.height, dec.width, dec.data)
      }
  }

  // ------------------------------------------------- rechunk (P3 shuffle)

  /** Explode each (1, Y, X) slice into per-chunk fragments and assemble
    * (cz, cy, cx) chunks — the central shuffle, ≡ dask rechunk
    * (png_to_zarr.py:592-593). `shard` keys that one shuffle by the v3
    * shard grid instead, producing shard-co-located chunks (see
    * [[assembleFragments]]). */
  def rechunk(slicesDs: Dataset[SliceRow], chunk: Seq[Int],
      shard: Option[Seq[Int]] = None,
      parts: Option[Int] = None): Dataset[ChunkRow] = {
    val spark = slicesDs.sparkSession
    import spark.implicits._
    val Seq(cz, cy, cx) = chunk
    val frags = slicesDs.flatMap { s =>
      val nyc = (s.height + cy - 1) / cy
      val nxc = (s.width + cx - 1) / cx
      for {
        yc <- 0 until nyc
        xc <- 0 until nxc
      } yield {
        val y0 = yc * cy; val dy = math.min(cy, s.height - y0)
        val x0 = xc * cx; val dx = math.min(cx, s.width - x0)
        val out = new Array[Byte](dy * dx * 2)
        var r = 0
        while (r < dy) {
          System.arraycopy(s.data, ((y0 + r) * s.width + x0) * 2, out, r * dx * 2, dx * 2)
          r += 1
        }
        Fragment(s.stack, s.z / cz, yc, xc, s.z % cz, 0, 0, dy, dx, out)
      }
    }
    assembleFragments(frags.map(f =>
      SubBlock(f.stack, f.zc, f.yc, f.xc, f.zoff, f.yoff, f.xoff, 1, f.dy, f.dx, f.data)),
      shard, parts)
  }

  /** Copy one chunk's sub-blocks into place. Chunk dims are the
    * covered extents (contiguous from 0 by construction). */
  private def assembleOne(stack: String, zc: Int, yc: Int, xc: Int,
      fs: Array[SubBlock]): ChunkRow = {
    val dz = fs.map(f => f.zoff + f.dz).max
    val dy = fs.map(f => f.yoff + f.dy).max
    val dx = fs.map(f => f.xoff + f.dx).max
    val out = new Array[Byte](dz * dy * dx * 2)
    fs.foreach { f =>
      var z = 0
      while (z < f.dz) {
        var y = 0
        while (y < f.dy) {
          System.arraycopy(
            f.data, (z * f.dy + y) * f.dx * 2,
            out, (((f.zoff + z) * dy + (f.yoff + y)) * dx + f.xoff) * 2,
            f.dx * 2)
          y += 1
        }
        z += 1
      }
    }
    ChunkRow(stack, zc, yc, xc, dz, dy, dx, out)
  }

  /** Group sub-blocks by target chunk and copy them into place.
    *
    * With `shard` set (zarr v3 `sharding_indexed` downstream), the ONE
    * shuffle is keyed by the SHARD — a pure function of the chunk key
    * (round-11 verdict item 2) — and chunks assemble from a
    * within-partition sort instead of a groupByKey: the output is
    * shard-co-located AND shard-contiguous, so the sharded writer can
    * stream whole shard objects with NO second exchange
    * ([[writeLevelBy]] `colocated=true`). Peak task memory stays one
    * chunk's fragments (the sort spills; runs are consumed
    * incrementally), not one shard's.
    *
    * `parts` (round-12) widens THAT shuffle when the caller knows the
    * shard count: hash-placing k shards into p partitions leaves the
    * slowest partition with ~max-bucket shards (balls-in-bins), and in
    * the small-job regime (k within a few× of the core count — every
    * pyramid level above 0, and level 0 itself on a single stack) the
    * straggler bucket is 2-3× the mean, which gates the whole write
    * stage. 2× the shard count in partitions makes buckets mostly
    * singletons, so the stage makespan is total-work/cores instead of
    * max-bucket. At real scale (shards ≫ partitions) the hint is
    * inert: [[colocatedParts]] never drops below the session's
    * configured shuffle width. */
  /** Shuffle width for a shard-keyed assembly with a KNOWN shard
    * count: 2× the shards (mostly-singleton hash buckets, makespan ≈
    * total/cores) capped at 4 tasks per core, never below the
    * session's configured shuffle width — so a real deployment's
    * bytes-based sizing always wins and only the small-job straggler
    * regime is widened. */
  def colocatedParts(spark: SparkSession, shardCount: Long): Int = {
    val conf = spark.sessionState.conf.numShufflePartitions
    val cap = 4L * spark.sparkContext.defaultParallelism
    math.max(conf.toLong, math.min(2L * math.max(shardCount, 1L), cap)).toInt
  }

  private def assembleFragments(frags: Dataset[SubBlock],
      shard: Option[Seq[Int]] = None,
      parts: Option[Int] = None): Dataset[ChunkRow] = {
    val spark = frags.sparkSession
    import spark.implicits._
    shard match {
      case Some(Seq(gz, gy, gx)) =>
        frags
          .repartition(parts.getOrElse(spark.sessionState.conf.numShufflePartitions),
            col("stack"), expr(s"zc div $gz"),
            expr(s"yc div $gy"), expr(s"xc div $gx"))
          .sortWithinPartitions(col("stack"), expr(s"zc div $gz"),
            expr(s"yc div $gy"), expr(s"xc div $gx"),
            col("zc"), col("yc"), col("xc"))
          .mapPartitions { it =>
            val b = it.buffered
            new Iterator[ChunkRow] {
              override def hasNext: Boolean = b.hasNext
              override def next(): ChunkRow = {
                val h = b.head
                val key = (h.stack, h.zc, h.yc, h.xc)
                val run = scala.collection.mutable.ArrayBuffer(b.next())
                while (b.hasNext &&
                    (b.head.stack, b.head.zc, b.head.yc, b.head.xc) == key)
                  run += b.next()
                assembleOne(h.stack, h.zc, h.yc, h.xc, run.toArray)
              }
            }
          }
      case _ =>
        frags.groupByKey(f => (f.stack, f.zc, f.yc, f.xc))
          .mapGroups { (key: (String, Int, Int, Int), it: Iterator[SubBlock]) =>
            assembleOne(key._1, key._2, key._3, key._4, it.toArray)
          }
    }
  }

  // ------------------------------------------- pyramid (A1, per level)

  /** Dtype-preserving non-overlapping windowed mean on one chunk's
    * voxels: mean over the (clamped) s³ window, truncated toward zero —
    * matches xarray_multiscale windowed_mean + preserve_dtype
    * (png_to_zarr.py:386-392). Pure, shuffle-free.
    */
  def windowedMean(dz: Int, dy: Int, dx: Int, data: Array[Byte],
      s: Seq[Int]): (Int, Int, Int, Array[Byte]) = {
    val Seq(sz, sy, sx) = s
    val oz = (dz + sz - 1) / sz; val oy = (dy + sy - 1) / sy; val ox = (dx + sx - 1) / sx
    val out = new Array[Byte](oz * oy * ox * 2)
    var z = 0
    while (z < oz) {
      val z1 = math.min((z + 1) * sz, dz)
      var y = 0
      while (y < oy) {
        val y1 = math.min((y + 1) * sy, dy)
        var x = 0
        while (x < ox) {
          val x1 = math.min((x + 1) * sx, dx)
          var sum = 0L; var n = 0
          var iz = z * sz
          while (iz < z1) {
            var iy = y * sy
            while (iy < y1) {
              var ix = x * sx
              val rowBase = (iz * dy + iy) * dx
              while (ix < x1) {
                val off = (rowBase + ix) * 2
                sum += ((data(off + 1) & 0xFF) << 8) | (data(off) & 0xFF)
                n += 1; ix += 1
              }
              iy += 1
            }
            iz += 1
          }
          val v = (sum / n).toInt // floor: preserve_dtype truncation
          val off = ((z * oy + y) * ox + x) * 2
          out(off) = (v & 0xFF).toByte
          out(off + 1) = ((v >> 8) & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      z += 1
    }
    (oz, oy, ox, out)
  }

  /** One pyramid step: downsample every chunk in place (no shuffle),
    * then merge the s³ sibling sub-blocks into full-size chunks of the
    * next level (a shuffle over 1/8th the bytes for s=2). Requires the
    * chunk dims to be divisible by the scale factor (true for the
    * reference defaults 128³ / 2³). */
  def downsampleLevel(chunks: Dataset[ChunkRow], chunk: Seq[Int],
      factor: Seq[Int], shard: Option[Seq[Int]] = None,
      parts: Option[Int] = None): Dataset[ChunkRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val Seq(cz, cy, cx) = chunk
    val Seq(sz, sy, sx) = factor
    require(cz % sz == 0 && cy % sy == 0 && cx % sx == 0,
      "chunk size must be divisible by scale factor")
    val sub = chunks.map { c =>
      val (oz, oy, ox, data) = windowedMean(c.dz, c.dy, c.dx, c.data, factor)
      SubBlock(c.stack, c.zc / sz, c.yc / sy, c.xc / sx,
        (c.zc % sz) * (cz / sz), (c.yc % sy) * (cy / sy), (c.xc % sx) * (cx / sx),
        oz, oy, ox, data)
    }
    assembleFragments(sub, shard, parts)
  }

  /** Fused multi-level downsample: compute pyramid level `levels`
    * DIRECTLY from level-0 chunks in one pass — the optional operator
    * fusion SURVEY §4 sketches (`downsample(downsample(x))` → one
    * stride-2^k pass).
    *
    * Semantics are the ITERATED ones, bit-for-bit: the kernel applies
    * the dtype-truncating windowed mean `levels` times to each chunk's
    * local array (floor-of-floor, clamped at array edges), so the
    * result is identical to `downsampleLevel` applied `levels` times —
    * NOT a single mean over the 2^k-wide window, which rounds
    * differently. Locality holds because 2^k-aligned windows of extent
    * 2^k never cross a chunk boundary when 2^k divides the chunk dim
    * (edge chunks clamp at the array edge, which is their own edge).
    *
    * At scale this replaces k shuffles + k intermediate level
    * materializations (the reference's write-then-readback per level,
    * png_to_zarr.py:673-675) with ZERO intermediate state and ONE
    * shuffle over 8^-k of the input bytes — the path to use when only
    * a coarse level is consumed (thumbnailing, registration preview,
    * QC stats), while the per-level loop remains the path that writes
    * every level. */
  def downsampleToLevel(chunks: Dataset[ChunkRow], chunk: Seq[Int],
      factor: Seq[Int], levels: Int): Dataset[ChunkRow] = {
    require(levels >= 1, "levels must be >= 1")
    val spark = chunks.sparkSession
    import spark.implicits._
    val Seq(cz, cy, cx) = chunk
    val Seq(fz, fy, fx) = factor.map(f => math.pow(f, levels).toInt)
    require(cz % fz == 0 && cy % fy == 0 && cx % fx == 0,
      "chunk size must be divisible by factor^levels")
    val sub = chunks.map { c =>
      var dz = c.dz; var dy = c.dy; var dx = c.dx; var data = c.data
      var i = 0
      while (i < levels) {
        val r = windowedMean(dz, dy, dx, data, factor)
        dz = r._1; dy = r._2; dx = r._3; data = r._4
        i += 1
      }
      SubBlock(c.stack, c.zc / fz, c.yc / fy, c.xc / fx,
        (c.zc % fz) * (cz / fz), (c.yc % fy) * (cy / fy), (c.xc % fx) * (cx / fx),
        dz, dy, dx, data)
    }
    assembleFragments(sub)
  }

  // ------------------------------------------------------- zarr sink (S7)

  /** Write one level's chunks as zarr v2 chunk files under
    * `<store>/<level>/<t>/<c>/<z>/<y>/<x>` ("/" separator,
    * png_to_zarr.py:691-699). Edge chunks are padded to the full chunk
    * shape with the fill value (zarr v2 requirement). Executor-side,
    * one file per chunk row; atomic via temp + rename so task retries
    * are safe (deterministic chunk paths make retries idempotent).
    */
  def writeLevel(chunks: Dataset[ChunkRow], store: String, level: Int,
      chunk: Seq[Int], clevel: Int, byteShuffle: Boolean,
      compressed: Boolean, cname: String = "zstd"): Unit =
    writeLevelBy(chunks, _ => store, level, chunk, clevel, byteShuffle,
      compressed, cname)

  /** Pad an edge chunk to the full chunk shape (zarr requirement) and
    * apply the blosc codec — the per-chunk payload as stored. */
  private def encodeChunk(c: ChunkRow, cz: Int, cy: Int, cx: Int,
      clevel: Int, byteShuffle: Boolean, compressed: Boolean,
      cname: String): Array[Byte] = {
    val full =
      if (c.dz == cz && c.dy == cy && c.dx == cx) c.data
      else {
        val out = new Array[Byte](cz * cy * cx * 2)
        var z = 0
        while (z < c.dz) {
          var y = 0
          while (y < c.dy) {
            System.arraycopy(c.data, ((z * c.dy + y) * c.dx) * 2,
              out, ((z * cy + y) * cx) * 2, c.dx * 2)
            y += 1
          }
          z += 1
        }
        out
      }
    if (compressed) BloscCodec.compress(full, 2, clevel, byteShuffle, cname)
    else full
  }

  /** Commit a fully-written temp object to its deterministic target.
    * First rename can lose only to a concurrent retry of the SAME
    * deterministic write (identical bytes): delete and retry once. A
    * second failure with the target present means the racer re-won —
    * drop our tmp; with no target it's a real store fault, and
    * silently dropping the object would corrupt the array, so throw
    * (the task retries). */
  private[graft] def commitTmp(fs: org.apache.hadoop.fs.FileSystem,
      tmp: HPath, target: HPath): Unit =
    if (!fs.rename(tmp, target)) {
      fs.delete(target, false)
      if (!fs.rename(tmp, target)) {
        if (fs.exists(target)) fs.delete(tmp, false)
        else throw new java.io.IOException(
          s"store commit failed: rename $tmp -> $target")
      }
    }

  /** Atomic whole-object store write: temp + rename so task retries
    * are safe (deterministic paths make retries idempotent). */
  private def atomicPut(dir: HPath, name: String, payload: Array[Byte]): Unit = {
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.mkdirs(dir)
    val target = new HPath(dir, name)
    val tmp = new HPath(dir, s".$name.tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(payload) finally out.close()
    commitTmp(fs, tmp, target)
  }

  /** Multi-store variant: `storeOf` maps a chunk row's stack key to its
    * OME-Zarr store path, so one write job covers every stack in the
    * shard (the pooled pipeline). The closure must be serializable —
    * derive the store from the stack path, don't capture a session.
    *
    * `format` 2 (default) writes the reference's v2 key layout
    * `<level>/0/0/z/y/x`; 3 writes the v3 default encoding
    * `<level>/c/0/0/z/y/x`. `shard` (chunks-per-shard Z,Y,X; v3 only)
    * writes `sharding_indexed` shard objects instead of chunk files.
    *
    * With `colocated=true` (round-11: the single-shuffle sharded
    * write), `chunks` MUST come from a shard-keyed assembly
    * ([[rechunk]]/[[downsampleLevel]] with the SAME `shard` grid):
    * each partition then holds whole shards, contiguously — the writer
    * encodes and streams shard objects per-partition with ZERO
    * additional exchange, and per-task memory is one encoded payload.
    * With `colocated=false` the writer assumes nothing: chunks are
    * compressed map-side, then ONE extra shuffle keyed by
    * (stack, shard coords) co-locates each shard's inner chunks so the
    * whole object assembles in a single task — shuffle volume is the
    * compressed level. */
  def writeLevelBy(chunks: Dataset[ChunkRow], storeOf: String => String,
      level: Int, chunk: Seq[Int], clevel: Int, byteShuffle: Boolean,
      compressed: Boolean, cname: String = "zstd",
      format: Int = 2, shard: Option[Seq[Int]] = None,
      colocated: Boolean = false): Unit = {
    val Seq(cz, cy, cx) = chunk
    shard match {
      case Some(Seq(gz, gy, gx)) if format == 3 && colocated =>
        chunks.foreachPartition { (it: Iterator[ChunkRow]) =>
          val conf = new org.apache.hadoop.conf.Configuration()
          val nSlots = gz * gy * gx
          var key: (String, Int, Int, Int) = null
          var offsets: Array[Long] = null
          var lens: Array[Long] = null
          var off = 0L
          var fs: org.apache.hadoop.fs.FileSystem = null
          var out: org.apache.hadoop.fs.FSDataOutputStream = null
          var tmp: HPath = null
          var target: HPath = null
          def flush(): Unit = if (key != null) {
            out.write(ZarrShard.index(offsets, lens)); out.close(); out = null
            commitTmp(fs, tmp, target)
            key = null
          }
          try {
            it.foreach { c =>
              val k = (c.stack, c.zc / gz, c.yc / gy, c.xc / gx)
              if (k != key) {
                flush()
                key = k
                offsets = Array.fill(nSlots)(-1L)
                lens = Array.fill(nSlots)(-1L)
                off = 0L
                val dir = new HPath(storeOf(c.stack), s"$level/c/0/0/${k._2}/${k._3}")
                fs = dir.getFileSystem(conf)
                fs.mkdirs(dir)
                val name = k._4.toString
                target = new HPath(dir, name)
                tmp = new HPath(dir, s".$name.tmp-${java.util.UUID.randomUUID}")
                out = fs.create(tmp, true)
              }
              val payload =
                encodeChunk(c, cz, cy, cx, clevel, byteShuffle, compressed, cname)
              val slot = ((c.zc % gz) * gy + (c.yc % gy)) * gx + (c.xc % gx)
              offsets(slot) = off; lens(slot) = payload.length.toLong
              out.write(payload); off += payload.length
            }
            flush()
          } finally if (out != null) {
            // failed task: close AND delete the open tmp, or retries
            // accumulate `.N.tmp-UUID` orphans in the store
            out.close()
            if (fs != null && tmp != null) fs.delete(tmp, false)
          }
        }
      case Some(Seq(gz, gy, gx)) if format == 3 =>
        val session = chunks.sparkSession
        import session.implicits._
        chunks
          .map(c => (c.stack, c.zc, c.yc, c.xc,
            encodeChunk(c, cz, cy, cx, clevel, byteShuffle, compressed, cname)))
          .groupByKey { case (stack, zc, yc, xc, _) =>
            (stack, zc / gz, yc / gy, xc / gx) }
          .mapGroups { (key: (String, Int, Int, Int),
              it: Iterator[(String, Int, Int, Int, Array[Byte])]) =>
            // STREAMED shard assembly: payloads go to the store in
            // iterator order with per-slot (offset, nbytes) recorded,
            // index+crc appended last (index_location=end permits any
            // body order). Peak memory = ONE payload, not the shard —
            // buffering whole shards across 32 local tasks OOMed an
            // 8 g heap on the 2 GB ImagingBench stack.
            val (stack, sz, sy, sx) = key
            val nSlots = gz * gy * gx
            val offsets = Array.fill(nSlots)(-1L)
            val lens = Array.fill(nSlots)(-1L)
            val dir = new HPath(storeOf(stack), s"$level/c/0/0/$sz/$sy")
            val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
            fs.mkdirs(dir)
            val name = sx.toString
            val target = new HPath(dir, name)
            val tmp = new HPath(dir, s".$name.tmp-${java.util.UUID.randomUUID}")
            val out = fs.create(tmp, true)
            var off = 0L
            try {
              it.foreach { case (_, zc, yc, xc, payload) =>
                val slot = ((zc % gz) * gy + (yc % gy)) * gx + (xc % gx)
                offsets(slot) = off; lens(slot) = payload.length.toLong
                out.write(payload); off += payload.length
              }
              out.write(ZarrShard.index(offsets, lens))
            } finally out.close()
            commitTmp(fs, tmp, target)
            1
          }
          .foreach((_: Int) => ()) // side-effecting write: force execution
      case _ =>
        chunks.foreachPartition { (it: Iterator[ChunkRow]) =>
          it.foreach { c =>
            val payload =
              encodeChunk(c, cz, cy, cx, clevel, byteShuffle, compressed, cname)
            val dir = new HPath(storeOf(c.stack),
              if (format == 2) s"$level/0/0/${c.zc}/${c.yc}"
              else s"$level/c/0/0/${c.zc}/${c.yc}")
            atomicPut(dir, c.xc.toString, payload)
          }
        }
    }
  }

  /** Wave-bounded write (reference P5/P6, BlockedArrayWriter.store,
    * zarr_writer.py:188-213): split the chunk grid into voxel blocks of
    * ~`targetSizeMb` (ChunkPlanner.getBlockShape, "cycle" growth) and
    * write one wave per block as its own Spark job. Under Spark this is
    * OPTIONAL — the DAG scheduler handles millions of tasks — but it
    * bounds in-flight shuffle/write volume against a slow object store
    * at 100 TB, exactly the reference's stated motivation ("reduce the
    * scheduling burden for massive (terabyte-scale) arrays").
    * `chunks` should be persisted by the caller: each wave filters the
    * same Dataset. */
  def writeLevelInWaves(chunks: Dataset[ChunkRow], storeOf: String => String,
      level: Int, chunk: Seq[Int], clevel: Int, byteShuffle: Boolean,
      compressed: Boolean, shape: Seq[Int], targetSizeMb: Long,
      cname: String = "zstd"): Unit = {
    val block = ChunkPlanner.getBlockShape(shape, chunk, itemSize = 2, targetSizeMb)
    ChunkPlanner.genSlices(shape, block).foreach { box =>
      // voxel box → inclusive chunk-coordinate ranges
      val lo = box.lo.zip(chunk).map { case (v, c) => v / c }
      val hi = box.hi.zip(chunk).map { case (v, c) => (v - 1) / c }
      val wave = chunks.filter(c =>
        c.zc >= lo(0) && c.zc <= hi(0) &&
        c.yc >= lo(1) && c.yc <= hi(1) &&
        c.xc >= lo(2) && c.xc <= hi(2))
      writeLevelBy(wave, storeOf, level, chunk, clevel, byteShuffle, compressed, cname)
    }
  }

  // -------------------------------------------------- read-back (S6/test)

  /** Driver-side level reader for verification: assembles the full
    * (Z, Y, X) voxel array from chunk files. Test-scale only. */
  def readLevel(store: String, level: Int, shape: Seq[Int], chunk: Seq[Int],
      compressed: Boolean): Array[Short] = {
    val Seq(nz, ny, nx) = shape
    val Seq(cz, cy, cx) = chunk
    val out = new Array[Short](nz * ny * nx)
    for {
      zc <- 0 until (nz + cz - 1) / cz
      yc <- 0 until (ny + cy - 1) / cy
      xc <- 0 until (nx + cx - 1) / cx
    } {
      val p = Paths.get(store, level.toString, "0", "0",
        zc.toString, yc.toString, xc.toString)
      if (Files.exists(p)) {
        val raw = Files.readAllBytes(p)
        val full = if (compressed) BloscCodec.decompress(raw) else raw
        var z = 0
        while (z < math.min(cz, nz - zc * cz)) {
          var y = 0
          while (y < math.min(cy, ny - yc * cy)) {
            var x = 0
            while (x < math.min(cx, nx - xc * cx)) {
              val src = ((z * cy + y) * cx + x) * 2
              val v = (((full(src + 1) & 0xFF) << 8) | (full(src) & 0xFF)).toShort
              out(((zc * cz + z) * ny + (yc * cy + y)) * nx + (xc * cx + x)) = v
              x += 1
            }
            y += 1
          }
          z += 1
        }
      }
    }
    out
  }
}
