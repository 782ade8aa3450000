package graft.lake

import java.nio.{ByteBuffer, ByteOrder}

/** Delta Lake DELETION-VECTOR bitmap codec — the binary format the
  * protocol's `deletionVectors` table feature stores row indexes in
  * (delta-io/delta PROTOCOL.md §Deletion Vector Format, and the public
  * reference implementation's RoaringBitmapArray/Z85 codecs):
  *
  *  - a 64-bit "RoaringBitmapArray" in PORTABLE serialization: magic
  *    `1681511377` (i32 LE), bitmap count (i64 LE), then one standard
  *    32-bit Roaring bitmap per high word 0..max (dense, empties
  *    included); value v lives in bitmap `v >>> 32` at low word
  *    `v & 0xFFFFFFFF`;
  *  - each 32-bit bitmap in the Roaring interchange format
  *    (RoaringFormatSpec, no-run form): cookie `12346` (u32 LE),
  *    container count (u32 LE), per-container descriptive headers
  *    (u16 key, u16 cardinality-1), per-container byte offsets (u32,
  *    from the start of this bitmap's serialization), then the
  *    containers — sorted u16 arrays up to 4096 values, 8 KiB bitsets
  *    above;
  *  - Z85 (ZeroMQ base-85) for inlining the blob into the JSON log:
  *    4 bytes → 5 chars over the canonical 85-char alphabet; blobs are
  *    zero-padded to a 4-byte multiple before encoding and the
  *    descriptor's `sizeInBytes` names the unpadded length.
  *
  * No external Delta reader ships in this environment, so binary
  * compatibility is proven the IcebergAvro/JPEG way: structural
  * golden-byte pins in RoaringDvSpec (including the published Z85 test
  * vector) plus full round-trips through our own reader.
  */
object RoaringDv {

  val ArrayMagic = 1681511377
  private val CookieNoRun = 12346
  private val ArrayMaxCard = 4096

  // ---- RoaringBitmapArray (64-bit, portable) ------------------------------

  /** Serialize sorted-or-not distinct positions (≥ 0). */
  def serialize(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "negative row index")
    val sorted = positions.distinct.sorted
    val byHigh = sorted.groupBy(v => (v >>> 32).toInt)
    val maxHigh = if (sorted.isEmpty) -1 else (sorted.last >>> 32).toInt
    val bitmaps = (0 to maxHigh).map(h =>
      serialize32(byHigh.getOrElse(h, Array.empty[Long]).map(v => (v & 0xFFFFFFFFL).toInt)))
    val size = 4 + 8 + bitmaps.map(_.length).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(ArrayMagic)
    buf.putLong(maxHigh + 1L)
    bitmaps.foreach(buf.put)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == ArrayMagic, s"bad RoaringBitmapArray magic $magic")
    val n = buf.getLong()
    val out = Array.newBuilder[Long]
    (0L until n).foreach { h =>
      deserialize32(buf).foreach(low => out += (h << 32) | (low & 0xFFFFFFFFL))
    }
    out.result()
  }

  // ---- standard 32-bit Roaring bitmap (portable, no-run) ------------------

  private def serialize32(lows: Array[Int]): Array[Byte] = {
    val sorted = lows.distinct.sorted
    val byKey = sorted.groupBy(v => (v >>> 16) & 0xFFFF).toSeq.sortBy(_._1)
    val headerBytes = 8 + byKey.size * 4
    val offsetBytes = byKey.size * 4
    val containerSizes = byKey.map { case (_, vs) =>
      if (vs.length <= ArrayMaxCard) vs.length * 2 else 8192
    }
    val buf = ByteBuffer
      .allocate(headerBytes + offsetBytes + containerSizes.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(CookieNoRun)
    buf.putInt(byKey.size)
    byKey.foreach { case (k, vs) =>
      buf.putShort(k.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    var off = headerBytes + offsetBytes
    containerSizes.foreach { sz => buf.putInt(off); off += sz }
    byKey.foreach { case (_, vs) =>
      if (vs.length <= ArrayMaxCard) vs.foreach(v => buf.putShort((v & 0xFFFF).toShort))
      else {
        val bits = new Array[Long](1024)
        vs.foreach { v => val b = v & 0xFFFF; bits(b >>> 6) |= (1L << (b & 63)) }
        bits.foreach(buf.putLong)
      }
    }
    buf.array()
  }

  /** Reads one 32-bit bitmap from the buffer (advancing it). Handles the
    * no-run form this codec writes plus the run-cookie form a foreign
    * writer might emit (runs expanded on read).
    */
  private def deserialize32(buf: ByteBuffer): Array[Int] = {
    val start = buf.position()
    val cookie = buf.getInt()
    val out = Array.newBuilder[Int]
    if ((cookie & 0xFFFF) == 12347) {
      // run-capable form: container count in the upper 16 bits + 1
      val n = (cookie >>> 16) + 1
      val runFlags = new Array[Byte]((n + 7) / 8)
      buf.get(runFlags)
      val headers = (0 until n).map(_ => (buf.getShort() & 0xFFFF, (buf.getShort() & 0xFFFF) + 1))
      val hasOffsets = n >= 4
      if (hasOffsets) (0 until n).foreach(_ => buf.getInt())
      (0 until n).foreach { i =>
        val (key, card) = headers(i)
        val isRun = (runFlags(i / 8) & (1 << (i % 8))) != 0
        if (isRun) {
          val nRuns = buf.getShort() & 0xFFFF
          (0 until nRuns).foreach { _ =>
            val s = buf.getShort() & 0xFFFF
            val len = buf.getShort() & 0xFFFF
            (s to s + len).foreach(v => out += (key << 16) | v)
          }
        } else if (card <= ArrayMaxCard) {
          (0 until card).foreach(_ => out += (key << 16) | (buf.getShort() & 0xFFFF))
        } else {
          readBitset(buf, key, out)
        }
      }
    } else {
      require(cookie == CookieNoRun, s"bad roaring cookie $cookie")
      val n = buf.getInt()
      val headers = (0 until n).map(_ => (buf.getShort() & 0xFFFF, (buf.getShort() & 0xFFFF) + 1))
      val offsets = (0 until n).map(_ => buf.getInt())
      headers.zip(offsets).foreach { case ((key, card), off) =>
        buf.position(start + off)
        if (card <= ArrayMaxCard)
          (0 until card).foreach(_ => out += (key << 16) | (buf.getShort() & 0xFFFF))
        else readBitset(buf, key, out)
      }
    }
    out.result()
  }

  private def readBitset(buf: ByteBuffer, key: Int,
      out: scala.collection.mutable.Builder[Int, Array[Int]]): Unit =
    (0 until 1024).foreach { w =>
      var bits = buf.getLong()
      val base = w * 64
      while (bits != 0L) {
        val t = java.lang.Long.numberOfTrailingZeros(bits)
        out += (key << 16) | (base + t)
        bits &= bits - 1
      }
    }

  // ---- Z85 ----------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode; input is zero-padded to a 4-byte multiple (callers record
    * the unpadded length, e.g. the descriptor's sizeInBytes).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ new Array[Byte](4 - bytes.length % 4)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (padded(i + j) & 0xFFL))
      val chunk = new Array[Char](5)
      (4 to 0 by -1).foreach { j => chunk(j) = Z85Alphabet((v % 85).toInt); v /= 85 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"bad Z85 char '${s.charAt(i + j)}'")
        v = v * 85 + d
      }
      val o = i / 5 * 4
      (0 until 4).foreach(j => out(o + j) = ((v >>> ((3 - j) * 8)) & 0xFF).toByte)
      i += 5
    }
    out
  }
}
