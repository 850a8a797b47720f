package graft.imaging

/** zarr v3 `sharding_indexed` shard assembly: the concatenated inner-
  * chunk payloads, then the row-major (offset, nbytes) uint64-LE
  * index, then the index's crc32c — `index_location: end`. Missing
  * slots (all-fill chunks never materialized) encode as
  * (2^64-1, 2^64-1), i.e. (-1L, -1L). Shared by the DSv2 zarr sink
  * (`sources/ZarrDataSource.scala`) and the imaging pipeline's v3
  * write path (`SmartSpimPipeline.writeLevelBy`). */
object ZarrShard {

  /** The footer: per-slot (offset, nbytes) pairs in row-major slot
    * order, uint64-LE, followed by the crc32c of those index bytes.
    * Missing slots carry (-1L, -1L). */
  def index(offsets: Array[Long], lens: Array[Long]): Array[Byte] = {
    val idx = java.nio.ByteBuffer.allocate(offsets.length * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < offsets.length) {
      idx.putLong(offsets(i)); idx.putLong(lens(i)); i += 1
    }
    val idxBytes = idx.array()
    val crc = new java.util.zip.CRC32C()
    crc.update(idxBytes)
    val out = java.util.Arrays.copyOf(idxBytes, idxBytes.length + 4)
    java.nio.ByteBuffer.wrap(out, idxBytes.length, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(crc.getValue.toInt)
    out
  }

  /** In-memory assembly of a whole shard (used when the caller already
    * buffers the slot payloads, e.g. the DSv2 writer's per-task
    * LinkedHashMap). Large shards should prefer streaming the payloads
    * and appending [[index]] — see SmartSpimPipeline.writeLevelBy. */
  def assemble(slots: Array[Array[Byte]]): Array[Byte] = {
    val offsets = Array.fill(slots.length)(-1L)
    val lens = Array.fill(slots.length)(-1L)
    var offset = 0L
    var i = 0
    while (i < slots.length) {
      val p = slots(i)
      if (p != null) { offsets(i) = offset; lens(i) = p.length.toLong; offset += p.length }
      i += 1
    }
    val idxBytes = index(offsets, lens)
    val out = new java.io.ByteArrayOutputStream(offset.toInt + idxBytes.length)
    slots.foreach(p => if (p != null) out.write(p))
    out.write(idxBytes)
    out.toByteArray
  }
}
