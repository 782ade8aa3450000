package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM media codecs for the multimodal pipeline — no external
  * libraries, just the byte formats:
  *
  *  - BMP: 24-bit uncompressed Windows bitmaps (BITMAPFILEHEADER +
  *    BITMAPINFOHEADER, bottom-up rows padded to 4 bytes) — the standard
  *    uncompressed interchange format, decodable by any image tool.
  *  - WAV: RIFF PCM, 16-bit little-endian mono — the canonical
  *    uncompressed audio container.
  *  - GVID: a toy length-prefixed container of BMP frames standing in for
  *    a video format (real deployments decode containers with
  *    ffmpeg-class libraries; the per-frame decode below them is exactly
  *    this BMP path).
  *
  * These replace the round-2 codec STUB for uncompressed formats: decode
  * genuinely parses headers and pixel/sample payloads, and resize really
  * resamples pixels. Compressed codecs (JPEG/H.264/MP3) remain out of
  * scope in this environment — the honest boundary is now "compressed
  * bitstreams" rather than "all decoding".
  */
object MediaCodec {

  // ----- BMP -------------------------------------------------------------

  private def bmpRowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** 24-bit BMP from row-major RGB triplets (rgb.length == w*h*3). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, s"need ${width * height * 3} bytes")
    val stride = bmpRowStride(width)
    val dataSize = stride * height
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + dataSize) // file size
    bb.putInt(0)             // reserved
    bb.putInt(54)            // pixel data offset
    bb.putInt(40)            // BITMAPINFOHEADER size
    bb.putInt(width)
    bb.putInt(height)        // positive: bottom-up
    bb.putShort(1)           // planes
    bb.putShort(24)          // bpp
    bb.putInt(0)             // BI_RGB (uncompressed)
    bb.putInt(dataSize)
    bb.putInt(2835).putInt(2835) // 72 dpi
    bb.putInt(0).putInt(0)   // palette
    // rows bottom-up, BGR order, padded to 4
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        bb.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse a 24-bit uncompressed BMP → (width, height, row-major RGB).
    * None when the magic/header/geometry is not a BMP this codec wrote —
    * per-record isolation, like the corrupt-record readers.
    */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = bb.getInt(10)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    if (bpp != 24 || compression != 0 || width <= 0 || height <= 0 || offset < 54)
      return None
    // size guards in LONG arithmetic: a hostile header (width=height=50000)
    // must fail the bounds check, not overflow int into a negative "pass"
    // and then blow up allocation — per-record isolation means None, never
    // an exception that kills the task
    val strideL = (width.toLong * 3 + 3) & ~3L
    if (offset.toLong + strideL * height > bytes.length) return None
    val stride = strideL.toInt // fits: strideL * height <= bytes.length
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val rowOff = offset + (height - 1 - y) * stride // stored bottom-up
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        rgb(p) = bytes(rowOff + x * 3 + 2)     // R
        rgb(p + 1) = bytes(rowOff + x * 3 + 1) // G
        rgb(p + 2) = bytes(rowOff + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some((width, height, rgb))
  }

  /** Nearest-neighbor resample — a REAL pixel transform (not a metadata
    * edit): output pixel (x,y) samples input (x*w/w', y*h/h').
    */
  def resizeRgb(
      width: Int, height: Int, rgb: Array[Byte],
      newWidth: Int, newHeight: Int): Array[Byte] = {
    val out = new Array[Byte](newWidth * newHeight * 3)
    var y = 0
    while (y < newHeight) {
      val sy = (y.toLong * height / newHeight).toInt
      var x = 0
      while (x < newWidth) {
        val sx = (x.toLong * width / newWidth).toInt
        val s = (sy * width + sx) * 3
        val d = (y * newWidth + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ----- WAV -------------------------------------------------------------

  /** RIFF/WAVE PCM, 16-bit little-endian mono. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                 // PCM
    bb.putShort(1)                 // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)      // byte rate
    bb.putShort(2)                 // block align
    bb.putShort(16)                // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach { s => bb.putShort(s); () }
    bb.array()
  }

  /** Parse PCM WAV → (sampleRate, samples); walks RIFF chunks so extra
    * chunks (LIST/INFO) before `data` are tolerated. None on non-PCM/
    * non-mono-16-bit or malformed payloads.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var sampleRate = -1
    var ok = false
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length && data == null) {
      val id = tag(pos)
      val size = bb.getInt(pos + 4)
      // long arithmetic: size near Int.MaxValue must fail, not wrap negative
      if (size < 0 || pos.toLong + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          val fmt = bb.getShort(pos + 8)
          val channels = bb.getShort(pos + 10)
          sampleRate = bb.getInt(pos + 12)
          val bits = bb.getShort(pos + 22)
          ok = fmt == 1 && channels == 1 && bits == 16
        case "data" =>
          if (!ok || sampleRate <= 0) return None
          data = new Array[Short](size / 2)
          var i = 0
          while (i < data.length) { data(i) = bb.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (data == null) None else Some((sampleRate, data))
  }

  // ----- GVID (toy frame container) --------------------------------------

  /** magic "GVID" + int32 frame count + per-frame (int32 length, BMP). */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val size = 8 + frames.map(_.length + 4).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")).putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f); () }
    bb.array()
  }

  def decodeVideo(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 8 ||
      new String(bytes, 0, 4, "US-ASCII") != "GVID") return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(4)
    if (n < 0) return None
    val out = Vector.newBuilder[Array[Byte]]
    var pos = 8
    var i = 0
    while (i < n) {
      if (pos + 4 > bytes.length) return None
      val len = bb.getInt(pos)
      if (len < 0 || pos.toLong + 4 + len > bytes.length) return None
      out += java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)
      pos += 4 + len
      i += 1
    }
    Some(out.result())
  }
}
