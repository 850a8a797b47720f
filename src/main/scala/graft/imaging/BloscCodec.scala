package graft.imaging

import com.github.luben.zstd.Zstd
import java.nio.{ByteBuffer, ByteOrder}

/** Blosc1-framed zstd chunk codec (reference default compressor:
  * blosc cname=zstd clevel=3 shuffle=SHUFFLE, models.py:55-59; applied
  * per zarr chunk at png_to_zarr.py:691-699).
  *
  * Layout written (single-block blosc1 container):
  *   bytes 0..15  header: version, versionlz, flags, typesize,
  *                nbytes, blocksize, cbytes (LE int32s)
  *   bytes 16..19 bstart[0] = 20 (offset of the only block)
  *   bytes 20..   zstd frame of the (optionally byte-shuffled) payload
  *
  * flags bit0 = byte-shuffle, bits 5-7 = compressor id (zstd = 5).
  * The byte-shuffle filter transposes bytes across elements
  * (all low bytes, then all high bytes for typesize 2), which is what
  * makes zstd effective on smooth 16-bit imagery.
  *
  * `decompress` round-trips our own frames (property-tested); zstd is
  * the pure-Java com.github.luben.zstd that ships with Spark.
  */
object BloscCodec {
  private val VERSION: Byte = 2
  private val VERSION_LZ: Byte = 1
  private val FLAG_SHUFFLE = 0x01
  private val FLAG_MEMCPY = 0x02
  private val ZSTD_ID = 5 // << 5 in flags
  private val HEADER = 16
  private val BSTART = 4

  /** Byte-transpose across elements: out groups byte-plane j of every
    * element together. Identity for typesize 1. */
  def shuffle(data: Array[Byte], typesize: Int): Array[Byte] = {
    if (typesize <= 1 || data.length % typesize != 0) return data
    val n = data.length / typesize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < typesize) {
      var i = 0
      val base = j * n
      while (i < n) {
        out(base + i) = data(i * typesize + j)
        i += 1
      }
      j += 1
    }
    out
  }

  /** Inverse of [[shuffle]]. */
  def unshuffle(data: Array[Byte], typesize: Int): Array[Byte] = {
    if (typesize <= 1 || data.length % typesize != 0) return data
    val n = data.length / typesize
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < typesize) {
      var i = 0
      val base = j * n
      while (i < n) {
        out(i * typesize + j) = data(base + i)
        i += 1
      }
      j += 1
    }
    out
  }

  def compress(data: Array[Byte], typesize: Int, clevel: Int,
      byteShuffle: Boolean): Array[Byte] = {
    val payload = if (byteShuffle) shuffle(data, typesize) else data
    val compressed = Zstd.compress(payload, clevel)
    // blosc semantics: fall back to memcpy when compression doesn't help
    val useRaw = compressed.length >= data.length
    val body = if (useRaw) payload else compressed
    val bstartLen = if (useRaw) 0 else BSTART
    val out = ByteBuffer.allocate(HEADER + bstartLen + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    var flags = ZSTD_ID << 5
    if (byteShuffle) flags |= FLAG_SHUFFLE
    if (useRaw) flags |= FLAG_MEMCPY
    out.put(VERSION).put(VERSION_LZ).put(flags.toByte)
      .put((typesize & 0xFF).toByte)
      .putInt(data.length)      // nbytes
      .putInt(data.length)      // blocksize (single block)
      .putInt(HEADER + bstartLen + body.length) // cbytes
    if (!useRaw) out.putInt(HEADER + BSTART)    // bstart[0]
    out.put(body)
    out.array()
  }

  def decompress(frame: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val version = buf.get(); val versionLz = buf.get()
    require(version >= 1 && versionLz >= 1, "bad blosc header")
    val flags = buf.get() & 0xFF
    val typesize = buf.get() & 0xFF
    val nbytes = buf.getInt(); val _blocksize = buf.getInt(); val cbytes = buf.getInt()
    require(cbytes == frame.length, s"cbytes $cbytes != frame ${frame.length}")
    val memcpy = (flags & FLAG_MEMCPY) != 0
    val payload =
      if (memcpy) java.util.Arrays.copyOfRange(frame, HEADER, HEADER + nbytes)
      else {
        val bstart = buf.getInt()
        val block = java.util.Arrays.copyOfRange(frame, bstart, frame.length)
        Zstd.decompress(block, nbytes)
      }
    if ((flags & FLAG_SHUFFLE) != 0) unshuffle(payload, typesize) else payload
  }
}
