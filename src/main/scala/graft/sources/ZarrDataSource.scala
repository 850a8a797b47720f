package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.imaging.BloscCodec

/** DataSource V2 `zarr` format (SURVEY.md §7 step 8): the OME-Zarr
  * chunk store as a first-class Spark table of chunk rows.
  *
  *   spark.read.format("zarr").load(store)
  *     .where($"level" === 0 && $"zc" === 1)      // pruned at listing
  *   chunkDf.write.format("zarr").mode("append")
  *     .option("chunk", "128,128,128").save(store)
  *
  * Replaces the reference's zarr-python store (create_dataset +
  * BlockedArrayWriter.store, compress/png_to_zarr.py:691-702 and
  * compress/zarr_writer.py:188-213) with Spark-native scan/sink
  * semantics:
  *
  *  - **Filter pushdown** on (level, zc, yc, xc): predicates prune the
  *    driver-side chunk listing, so a one-chunk lookup opens one file —
  *    the analog of parquet partition pruning for the chunk grid.
  *  - **Column pruning**: a scan that doesn't need `data` never reads
  *    a chunk file at all (coordinates come from the path grid), so
  *    `count()`/metadata queries are pure-listing.
  *  - **Write** pads edge chunks to the full chunk shape, optionally
  *    blosc/zstd-compresses (C1), and commits each file atomically via
  *    temp + rename — task retries are idempotent because chunk paths
  *    are deterministic.
  *
  * Store layout is zarr v2 with "/" dimension separator exactly as the
  * reference writes it: `<store>/<level>/0/0/<zc>/<yc>/<xc>` plus a
  * `.zarray` JSON per level; pixels are uint16 little-endian. Chunk
  * payloads use the c-blosc1 frame layout (BloscCodec): this source
  * reads zstd-, lz4- and snappy-format blosc frames, including
  * multi-block and split-stream variants, and writes zstd frames any
  * c-blosc consumer can read (CodecSpec decodes independently
  * constructed foreign frames; in-sandbox cross-validation against
  * python-blosc itself is not possible — no such package here).
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrTable.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZarrTable(properties.get("path"))
}

object ZarrTable {
  /** Chunk-as-row schema (SURVEY.md §1.4). dz/dy/dx are the logical
    * (edge-clamped) dims; stored payloads are padded to full chunks. */
  val SCHEMA: StructType = StructType(Seq(
    StructField("level", IntegerType), StructField("zc", IntegerType),
    StructField("yc", IntegerType), StructField("xc", IntegerType),
    StructField("dz", IntegerType), StructField("dy", IntegerType),
    StructField("dx", IntegerType), StructField("data", BinaryType)))

  private val COORDS = Set("level", "zc", "yc", "xc")

  /** Per-level store metadata parsed from `.zarray`. */
  final case class LevelMeta(level: Int, shape: Seq[Int], chunk: Seq[Int],
      compressed: Boolean)

  /** Minimal `.zarray` parse: 5-D TCZYX shape/chunks, compressor
    * null-or-blosc — the only forms the engine writes. */
  def readLevelMeta(fs: FileSystem, store: HPath, level: Int): Option[LevelMeta] = {
    val p = new HPath(store, s"$level/.zarray")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val j = JsonMethods.parse(txt)
      def ints(field: String): Seq[Int] = (j \ field) match {
        case JArray(vs) => vs.collect { case JInt(i) => i.toInt }
        case _ => Nil
      }
      val shape = ints("shape").takeRight(3)
      val chunk = ints("chunks").takeRight(3)
      val compressed = (j \ "compressor") != JNull
      if (shape.size == 3 && chunk.size == 3)
        Some(LevelMeta(level, shape, chunk, compressed))
      else None
    }
  }

  /** True iff the chunk coordinates can satisfy `f` (conservative:
    * unknown filter shapes never prune). */
  def matches(f: Filter, row: Map[String, Int]): Boolean = f match {
    case EqualTo(a, v: Number) => row.get(a).forall(_ == v.intValue)
    case In(a, vs) => row.get(a).forall(x => vs.exists {
      case v: Number => v.intValue == x; case _ => true })
    case GreaterThan(a, v: Number) => row.get(a).forall(_ > v.intValue)
    case GreaterThanOrEqual(a, v: Number) => row.get(a).forall(_ >= v.intValue)
    case LessThan(a, v: Number) => row.get(a).forall(_ < v.intValue)
    case LessThanOrEqual(a, v: Number) => row.get(a).forall(_ <= v.intValue)
    case And(l, r) => matches(l, row) && matches(r, row)
    case Or(l, r) => matches(l, row) || matches(r, row)
    case _ => true
  }

  /** A filter prunes the listing iff it only references coordinate
    * columns in shapes `matches` understands exactly. */
  def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _: Number) => COORDS(a)
    case In(a, vs) => COORDS(a) && vs.forall(_.isInstanceOf[Number])
    case GreaterThan(a, _: Number) => COORDS(a)
    case GreaterThanOrEqual(a, _: Number) => COORDS(a)
    case LessThan(a, _: Number) => COORDS(a)
    case LessThanOrEqual(a, _: Number) => COORDS(a)
    case And(l, r) => prunable(l) && prunable(r)
    case Or(l, r) => prunable(l) && prunable(r)
    case _ => false
  }
}

class ZarrTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "zarr source requires a path")
  override def name(): String = s"zarr:$path"
  override def schema(): StructType = ZarrTable.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ZarrWriteBuilder(path, info)
}

// ------------------------------------------------------------------ read

class ZarrScanBuilder(store: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ZarrTable.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(ZarrTable.prunable)
    filters // Spark re-evaluates everything post-scan; pushdown is for pruning
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ZarrScan(store, pushed, required)
}

/** One chunk file (or grid position) to read. dz/dy/dx are the
  * edge-clamped logical dims; cz/cy/cx the stored (padded) chunk. */
final case class ZarrChunkSpec(level: Int, zc: Int, yc: Int, xc: Int,
    dz: Int, dy: Int, dx: Int, cz: Int, cy: Int, cx: Int,
    compressed: Boolean, path: String)

final case class ZarrInputPartition(specs: Seq[ZarrChunkSpec]) extends InputPartition

class ZarrScan(store: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ZarrScan store=$store pushed=[${pushed.mkString(", ")}] cols=[${required.fieldNames.mkString(",")}]"

  /** Driver-side planning: walk the level `.zarray`s, enumerate the
    * chunk grid, and drop every chunk whose coordinates a pushed filter
    * rules out — partition pruning on the chunk grid. */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new HPath(store)
    val fs = root.getFileSystem(new Configuration())
    val specs = ArrayBuffer.empty[ZarrChunkSpec]
    val levels = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toInt).sorted
    for (level <- levels; m <- ZarrTable.readLevelMeta(fs, root, level)) {
      val Seq(nz, ny, nx) = m.shape
      val Seq(cz, cy, cx) = m.chunk
      for {
        zc <- 0 until (nz + cz - 1) / cz
        yc <- 0 until (ny + cy - 1) / cy
        xc <- 0 until (nx + cx - 1) / cx
        coords = Map("level" -> level, "zc" -> zc, "yc" -> yc, "xc" -> xc)
        if pushed.forall(ZarrTable.matches(_, coords))
      } specs += ZarrChunkSpec(level, zc, yc, xc,
        math.min(cz, nz - zc * cz), math.min(cy, ny - yc * cy),
        math.min(cx, nx - xc * cx), cz, cy, cx, m.compressed,
        s"$store/$level/0/0/$zc/$yc/$xc")
    }
    val n = math.max(1, math.min(specs.length,
      SparkSession.active.sparkContext.defaultParallelism))
    specs.zipWithIndex.groupBy(_._2 % n).values
      .map(g => ZarrInputPartition(g.map(_._1).toSeq): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(required)
}

class ZarrReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ZarrPartitionReader(p.asInstanceOf[ZarrInputPartition].specs, required)
}

/** Emits one row per chunk; opens the chunk file only when the `data`
  * column survives pruning (metadata queries are listing-only). */
class ZarrPartitionReader(specs: Seq[ZarrChunkSpec], required: StructType)
    extends PartitionReader[InternalRow] {
  private val needData = required.fieldNames.contains("data")
  private val it = specs.iterator
  private var row: InternalRow = _
  @transient private lazy val fs =
    new HPath(specs.head.path).getFileSystem(new Configuration())

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val s = it.next()
    val values: Array[Any] = required.fieldNames.map {
      case "level" => s.level
      case "zc" => s.zc
      case "yc" => s.yc
      case "xc" => s.xc
      case "dz" => s.dz
      case "dy" => s.dy
      case "dx" => s.dx
      case "data" => readData(s)
    }.toArray[Any]
    row = new GenericInternalRow(values)
    true
  }

  /** Raw (unpadded) voxel bytes for the chunk, or null if the file is
    * absent (un-materialized all-fill chunk). */
  private def readData(s: ZarrChunkSpec): Array[Byte] = {
    val p = new HPath(s.path)
    if (!needData || !fs.exists(p)) return null
    val in = fs.open(p)
    val raw = try {
      val st = fs.getFileStatus(p)
      val buf = new Array[Byte](st.getLen.toInt)
      in.readFully(0, buf); buf
    } finally in.close()
    val full = if (s.compressed) BloscCodec.decompress(raw) else raw
    // clip the padded payload back to the edge-clamped dims
    if (s.dz == s.cz && s.dy == s.cy && s.dx == s.cx) full
    else {
      val out = new Array[Byte](s.dz * s.dy * s.dx * 2)
      var z = 0
      while (z < s.dz) {
        var y = 0
        while (y < s.dy) {
          System.arraycopy(full, ((z * s.cy + y) * s.cx) * 2,
            out, ((z * s.dy + y) * s.dx) * 2, s.dx * 2)
          y += 1
        }
        z += 1
      }
      out
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- write

class ZarrWriteBuilder(store: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  // Chunk files overwrite deterministically by path, so truncate-then-
  // append and plain append coincide for a fixed chunk grid.
  override def truncate(): WriteBuilder = this

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ZarrBatchWrite(store, info)
  }
}

class ZarrBatchWrite(store: String, info: LogicalWriteInfo) extends BatchWrite {
  private def opts = info.options()
  private def chunk = Option(opts.get("chunk"))
    .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(128, 128, 128))
  private def clevel = Option(opts.get("clevel")).map(_.toInt).getOrElse(3)
  private def shuffle = Option(opts.get("shuffle")).forall(_.toBoolean)
  private def compressed = Option(opts.get("compressed")).forall(_.toBoolean)

  override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory =
    ZarrWriterFactory(store, info.schema().fieldNames, chunk, clevel, shuffle,
      compressed)

  /** Driver-side finalize: when the caller provides the level's logical
    * shape (`shape` = "Z,Y,X", `level` default 0), commit writes the
    * `.zarray` metadata, making the store self-describing for the read
    * path without a separate metadata step. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    Option(opts.get("shape")).foreach { s =>
      val Seq(nz, ny, nx) = s.split(",").map(_.trim.toLong).toSeq
      val level = Option(opts.get("level")).map(_.toInt).getOrElse(0)
      val p = new HPath(store, s"$level/.zarray")
      val fs = p.getFileSystem(new Configuration())
      val out = fs.create(p, true)
      try out.write(graft.imaging.ZarrMeta.render(graft.imaging.ZarrMeta.zarray(
        Seq(1L, 1L, nz, ny, nx), Seq(1, 1, chunk(0), chunk(1), chunk(2)),
        clevel, shuffle, compressed)).getBytes("UTF-8"))
      finally out.close()
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class ZarrWriterFactory(store: String, fieldNames: Array[String],
    chunk: Seq[Int], clevel: Int, shuffle: Boolean, compressed: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ZarrDataWriter(store, fieldNames, chunk, clevel, shuffle, compressed)
}

final case class ZarrCommit(files: Int) extends WriterCommitMessage

/** Pads each chunk row to the full chunk shape, compresses, and writes
  * `<store>/<level>/0/0/<zc>/<yc>/<xc>` atomically (temp + rename). */
class ZarrDataWriter(store: String, fieldNames: Array[String], chunk: Seq[Int],
    clevel: Int, shuffle: Boolean, compressed: Boolean)
    extends DataWriter[InternalRow] {
  private val ord = fieldNames.zipWithIndex.toMap
  private val Seq(cz, cy, cx) = chunk
  private var written = 0
  @transient private lazy val fs =
    new HPath(store).getFileSystem(new Configuration())

  override def write(r: InternalRow): Unit = {
    val (level, zc, yc, xc) = (r.getInt(ord("level")), r.getInt(ord("zc")),
      r.getInt(ord("yc")), r.getInt(ord("xc")))
    val (dz, dy, dx) = (r.getInt(ord("dz")), r.getInt(ord("dy")), r.getInt(ord("dx")))
    val data = r.getBinary(ord("data"))
    val full =
      if (dz == cz && dy == cy && dx == cx) data
      else {
        val out = new Array[Byte](cz * cy * cx * 2)
        var z = 0
        while (z < dz) {
          var y = 0
          while (y < dy) {
            System.arraycopy(data, ((z * dy + y) * dx) * 2,
              out, ((z * cy + y) * cx) * 2, dx * 2)
            y += 1
          }
          z += 1
        }
        out
      }
    val payload =
      if (compressed) BloscCodec.compress(full, 2, clevel, shuffle) else full
    val dir = new HPath(store, s"$level/0/0/$zc/$yc")
    fs.mkdirs(dir)
    val target = new HPath(dir, xc.toString)
    val tmp = new HPath(dir, s".$xc.tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(payload) finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(target, false); fs.rename(tmp, target)
    }
    written += 1
  }

  override def commit(): WriterCommitMessage = ZarrCommit(written)
  override def abort(): Unit = () // deterministic paths: retry overwrites
  override def close(): Unit = ()
}
