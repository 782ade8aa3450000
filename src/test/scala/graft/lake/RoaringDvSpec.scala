package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level pins for the Delta deletion-vector codec ([[RoaringDv]]):
  * the RoaringBitmapArray portable layout, the 32-bit Roaring interchange
  * structure (array AND bitmap containers), and Z85 — including the
  * published ZeroMQ test vector. No external Delta reader ships in this
  * environment, so these golden bytes are the binary-compat evidence
  * (the IcebergAvro/JPEG treatment).
  */
class RoaringDvSpec extends AnyFunSuite {

  test("Z85: published ZeroMQ test vector encodes/decodes (HelloWorld)") {
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(RoaringDv.z85Encode(bytes) == "HelloWorld")
    assert(RoaringDv.z85Decode("HelloWorld").toSeq == bytes.toSeq)
  }

  test("Z85: non-multiple-of-4 input zero-pads; decode returns padded block") {
    val enc = RoaringDv.z85Encode(Array[Byte](1, 2, 3))
    assert(enc.length == 5)
    assert(RoaringDv.z85Decode(enc).toSeq == Seq[Byte](1, 2, 3, 0))
  }

  test("golden bytes: {1,2,3} serializes to the documented portable layout") {
    val b = RoaringDv.serialize(Array(1L, 2L, 3L))
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt() == RoaringDv.ArrayMagic) // 1681511377
    assert(buf.getLong() == 1L)                  // one 32-bit bitmap
    assert(buf.getInt() == 12346)                // no-run cookie
    assert(buf.getInt() == 1)                    // one container
    assert(buf.getShort() == 0)                  // key 0
    assert(buf.getShort() == 2)                  // cardinality-1
    assert(buf.getInt() == 16)                   // container offset
    assert(Seq(buf.getShort(), buf.getShort(), buf.getShort()) == Seq(1, 2, 3))
    assert(!buf.hasRemaining)
  }

  test("round-trip: empty, singleton, dense-over-4096 (bitmap container), multi-key") {
    for (positions <- Seq(
        Array.empty[Long],
        Array(0L),
        Array(65535L, 65536L, 131071L), // container-key boundaries
        (0L until 5000L).toArray,       // > 4096 -> bitmap container
        Array(5L, 70000L, 1000000L))) {
      val got = RoaringDv.deserialize(RoaringDv.serialize(positions))
      assert(got.toSeq == positions.distinct.sorted.toSeq, positions.take(5).toSeq)
    }
  }

  test("round-trip across the 32-bit high-word boundary (dense bitmap array)") {
    val positions = Array(3L, (1L << 32) + 7L, (2L << 32) + 9L)
    val bytes = RoaringDv.serialize(positions)
    // dense: three 32-bit bitmaps, the middle ones non-empty where stated
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.getInt()
    assert(buf.getLong() == 3L)
    assert(RoaringDv.deserialize(bytes).toSeq == positions.toSeq)
  }

  test("foreign run-container form is readable (runs expand on read)") {
    // hand-build a run-cookie bitmap: values 10..14 as one run
    val buf = java.nio.ByteBuffer.allocate(4 + 8 + 64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(RoaringDv.ArrayMagic)
    buf.putLong(1L)
    buf.putInt(12347 | (0 << 16)) // run cookie, containerCount-1 = 0
    buf.put(1.toByte)             // run flag for container 0
    buf.putShort(0)               // key
    buf.putShort(4)               // cardinality-1
    // < 4 containers -> no offset section
    buf.putShort(1)               // nRuns
    buf.putShort(10)              // run start
    buf.putShort(4)               // run length (10..14)
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())
    assert(RoaringDv.deserialize(bytes).toSeq == (10L to 14L).toSeq)
  }
}
