package graft.imaging

/** Driver-side write-planning arithmetic — semantic port of the
  * reference's block planner (reference compress/zarr_writer.py:15-120,
  * :129-186, :215-244). Pure functions, property-tested.
  *
  * Under Spark these plan (a) the zarr storage chunk grid and (b) the
  * optional bounded "write waves" that cap in-flight shuffle output for
  * terabyte-scale sinks (the reference runs waves sequentially to limit
  * its scheduler; Spark's DAG scheduler doesn't need it at test scale,
  * but at 100 TB waves bound the sink's open-file/commit pressure).
  */
object ChunkPlanner {

  final case class Box(lo: Array[Int], hi: Array[Int]) {
    def shape: Array[Int] = lo.indices.map(i => hi(i) - lo(i)).toArray
    override def toString =
      lo.indices.map(i => s"[${lo(i)},${hi(i)})").mkString("x")
  }

  /** Byte size of an array with the given shape
    * (zarr_writer.py:15-27). */
  def byteSize(shape: Seq[Int], itemSize: Int): Long = {
    require(shape.forall(_ > 0), "shape must be > 0 in all dimensions")
    shape.foldLeft(itemSize.toLong)(_ * _)
  }

  /** Which of two shapes lands closer to the byte target
    * (zarr_writer.py:29-48; shape1 wins ties). */
  def closerToTarget(shape1: Seq[Int], shape2: Seq[Int],
      targetBytes: Long, itemSize: Int): Seq[Int] = {
    val s1 = byteSize(shape1, itemSize)
    val s2 = byteSize(shape2, itemSize)
    if (math.abs(s1 - targetBytes) < math.abs(s2 - targetBytes)) shape1 else shape2
  }

  /** Grow base chunks by integer multiples until closest to a byte
    * target (zarr_writer.py:51-120). `cycle` doubles one dimension at a
    * time round-robin; `iso` scales all dimensions by i = 2, 3, ….
    * Both clamp at the data shape and stop once every dim is clamped.
    */
  def expandChunks(chunks: Seq[Int], dataShape: Seq[Int],
      targetSize: Long, itemSize: Int, mode: String = "iso"): Seq[Int] = {
    require(chunks.forall(_ >= 1), "chunks must be >= 1 for all dimensions")
    require(dataShape.forall(_ >= 1), "data_shape must be >= 1 for all dimensions")
    require(chunks.zip(dataShape).forall { case (c, s) => c <= s },
      "chunks cannot be larger than data_shape in any dimension")
    require(targetSize > 0, "target_size must be > 0")
    require(itemSize > 0, "itemsize must be > 0")

    mode match {
      case "cycle" =>
        var current = chunks.toArray
        var prev = current.clone()
        var idx = 0
        val n = current.length
        var done = false
        while (!done && byteSize(current.toSeq, itemSize) < targetSize) {
          prev = current.clone()
          current(idx % n) = math.min(dataShape(idx % n), current(idx % n) * 2)
          idx += 1
          if (current.indices.forall(i => current(i) >= dataShape(i))) done = true
        }
        closerToTarget(current.toSeq, prev.toSeq, targetSize, itemSize)
      case "iso" =>
        val initial = chunks.toArray
        var current = initial.toSeq
        var prev = current
        var i = 2
        var done = false
        while (!done && byteSize(current, itemSize) < targetSize) {
          prev = current
          current = initial.indices.map(k => math.min(dataShape(k), initial(k) * i))
          i += 1
          if (current.indices.forall(k => current(k) >= dataShape(k))) done = true
        }
        closerToTarget(current, prev, targetSize, itemSize)
      case other => throw new IllegalArgumentException(s"Invalid mode $other")
    }
  }

  /** Tile an N-D shape by a block shape; the last block along each
    * dimension is truncated (zarr_writer.py:129-186). Row-major order,
    * identical to the reference's recursive generator. */
  def genSlices(arrShape: Seq[Int], blockShape: Seq[Int]): Iterator[Box] = {
    require(arrShape.length == blockShape.length,
      "array shape and block shape have different lengths")
    def along(dim: Int): Iterator[List[(Int, Int)]] =
      if (dim >= arrShape.length) Iterator(Nil)
      else (0 until arrShape(dim) by blockShape(dim)).iterator.flatMap { i =>
        val end = math.min(i + blockShape(dim), arrShape(dim))
        along(dim + 1).map((i, end) :: _)
      }
    along(0).map { bounds =>
      Box(bounds.map(_._1).toArray, bounds.map(_._2).toArray)
    }
  }

  /** Block shape for bounded write waves (zarr_writer.py:215-244):
    * expand the storage chunk toward `targetSizeMb` (reference default
    * 409600 MB; the job passes 12800 MB, png_to_zarr.py:656-659). */
  def getBlockShape(dataShape: Seq[Int], chunks: Seq[Int], itemSize: Int,
      targetSizeMb: Long = 409600L, mode: String = "cycle"): Seq[Int] = {
    val clamped = chunks.zip(dataShape).map { case (c, s) => math.min(c, s) }
    expandChunks(clamped, dataShape, targetSizeMb * 1024L * 1024L, itemSize, mode)
  }

  /** Number of chunks per dimension for a shape (ceil division). */
  def chunkGrid(shape: Seq[Int], chunk: Seq[Int]): Seq[Int] =
    shape.zip(chunk).map { case (s, c) => (s + c - 1) / c }
}
