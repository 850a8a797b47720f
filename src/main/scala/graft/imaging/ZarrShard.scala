package graft.imaging

/** zarr v3 `sharding_indexed` shard assembly: the concatenated inner-
  * chunk payloads, then the row-major (offset, nbytes) uint64-LE
  * index, then the index's crc32c — `index_location: end`. Missing
  * slots (all-fill chunks never materialized) encode as
  * (2^64-1, 2^64-1), i.e. (-1L, -1L). Shared by the DSv2 zarr sink
  * (`sources/ZarrDataSource.scala`) and the imaging pipeline's v3
  * write path (`SmartSpimPipeline.writeLevelBy`). */
object ZarrShard {

  def assemble(slots: Array[Array[Byte]]): Array[Byte] = {
    val index = java.nio.ByteBuffer.allocate(slots.length * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var offset = 0L
    val body = new java.io.ByteArrayOutputStream()
    slots.foreach { p =>
      if (p == null) { index.putLong(-1L); index.putLong(-1L) }
      else {
        index.putLong(offset); index.putLong(p.length.toLong)
        body.write(p); offset += p.length
      }
    }
    val idxBytes = index.array()
    val crc = new java.util.zip.CRC32C()
    crc.update(idxBytes)
    val tail = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(crc.getValue.toInt).array()
    val out = new java.io.ByteArrayOutputStream(body.size + idxBytes.length + 4)
    body.writeTo(out); out.write(idxBytes); out.write(tail)
    out.toByteArray
  }
}
