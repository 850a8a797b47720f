package graft.imaging

import org.scalatest.funsuite.AnyFunSuite

/** Binary layout law for v3 `sharding_indexed` shard objects
  * (ZarrShard): body = concatenated present payloads, footer =
  * row-major (offset, nbytes) uint64-LE pairs + crc32c of the index
  * bytes, missing slots = (-1, -1). The DSv2 reader's footer parse
  * and the pipeline's streamed writer both rely on exactly this. */
class ZarrShardSpec extends AnyFunSuite {

  private def parseFooter(obj: Array[Byte], slots: Int): Array[(Long, Long)] = {
    val idxLen = slots * 16
    val bb = java.nio.ByteBuffer.wrap(obj, obj.length - idxLen - 4, idxLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(slots)((bb.getLong, bb.getLong))
  }

  test("assemble: offsets address payloads, missing slots are (-1,-1), crc32c checks") {
    val a = Array[Byte](1, 2, 3)
    val c = Array[Byte](9, 8, 7, 6)
    val obj = ZarrShard.assemble(Array(a, null, c))
    assert(obj.length == a.length + c.length + 3 * 16 + 4)
    val idx = parseFooter(obj, 3)
    assert(idx(0) == (0L, 3L) && idx(1) == (-1L, -1L) && idx(2) == (3L, 4L))
    assert(obj.slice(0, 3).toSeq == a.toSeq)
    assert(obj.slice(idx(2)._1.toInt, idx(2)._1.toInt + 4).toSeq == c.toSeq)
    // crc32c over the index bytes matches the stored LE tail
    val idxBytes = obj.slice(obj.length - 3 * 16 - 4, obj.length - 4)
    val crc = new java.util.zip.CRC32C(); crc.update(idxBytes)
    val stored = java.nio.ByteBuffer.wrap(obj, obj.length - 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(stored == crc.getValue.toInt)
  }

  test("index() is assemble's tail; body order is free (streamed-writer law)") {
    val a = Array[Byte](1, 2, 3)
    val c = Array[Byte](9, 8, 7, 6)
    val obj = ZarrShard.assemble(Array(a, null, c))
    assert(ZarrShard.index(Array(0L, -1L, 3L), Array(3L, -1L, 4L)).toSeq ==
      obj.slice(a.length + c.length, obj.length).toSeq)
    // a streamed writer that saw slot 2 first writes body c++a with
    // swapped offsets — every slot still resolves to its own payload
    val streamed = c ++ a ++ ZarrShard.index(Array(4L, -1L, 0L), Array(3L, -1L, 4L))
    val idx = parseFooter(streamed, 3)
    assert(streamed.slice(idx(0)._1.toInt, idx(0)._1.toInt + idx(0)._2.toInt).toSeq == a.toSeq)
    assert(streamed.slice(idx(2)._1.toInt, idx(2)._1.toInt + idx(2)._2.toInt).toSeq == c.toSeq)
  }

  test("all-missing shard: pure footer, every slot (-1,-1)") {
    val obj = ZarrShard.assemble(new Array[Array[Byte]](4))
    assert(obj.length == 4 * 16 + 4)
    assert(parseFooter(obj, 4).forall(_ == (-1L, -1L)))
  }
}
