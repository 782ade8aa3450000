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
  *  - PNG: 8-bit truecolor, REAL zlib compression (java.util.zip) and the
  *    full scanline filter set (None/Sub/Up/Average/Paeth) — a genuinely
  *    compressed format decoded end to end with zero external libraries.
  *  - GVID: a toy length-prefixed container of BMP frames standing in for
  *    a video format (real deployments decode containers with
  *    ffmpeg-class libraries; the per-frame decode below them is exactly
  *    this BMP path).
  *
  * These replace the round-2 codec STUB: decode genuinely parses headers,
  * entropy-coded payloads (PNG) and pixel/sample data, and resize really
  * resamples pixels. Baseline JPEG — the LOSSY image path — lives in
  * [[JpegCodec]] (pure-JVM Huffman + DCT, no external libraries). The
  * remaining out-of-scope boundary is motion-compensated video and
  * perceptual audio only (H.264/MP3 — stacks that need ffmpeg-class
  * libraries this environment doesn't ship).
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

  // ----- PNG -------------------------------------------------------------
  // A real COMPRESSED format, pure JVM: zlib (java.util.zip) + the PNG
  // scanline filter set. Encoder cycles through all five filter types row
  // by row (None/Sub/Up/Average/Paeth), so every decoder filter path is
  // exercised by any round trip taller than 4 rows; decoder accepts 8-bit
  // truecolor (RGB) and truecolor+alpha (alpha dropped), non-interlaced —
  // what virtually every ML-pipeline PNG is.

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crcChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(data.length)
    val typeBytes = chunkType.getBytes("US-ASCII")
    bb.put(typeBytes).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(typeBytes); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** 8-bit truecolor PNG from row-major RGB (rgb.length == w*h*3). */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, s"need ${width * height * 3} bytes")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val f = y % 5 // cycle every filter type — decoder coverage by construction
      val o = y * (1 + stride)
      raw(o) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = rgb(y * stride + i) & 0xff
        val a = if (i >= bpp) rgb(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) rgb((y - 1) * stride + i - bpp) & 0xff else 0
        raw(o + 1 + i) = (f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case _ => cur - paeth(a, b, c)
        }).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(crcChunk("IHDR", ihdr))
    out.write(crcChunk("IDAT", zout.toByteArray))
    out.write(crcChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Parse an 8-bit truecolor (or truecolor+alpha) non-interlaced PNG →
    * (width, height, row-major RGB). None on anything else — per-record
    * isolation, same contract as decodeBmp.
    */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(PngSig)) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 8
    var width = -1; var height = -1; var bpp = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (pos.toLong + 8 > bytes.length) return None
      val len = bb.getInt(pos)
      if (len < 0 || pos.toLong + 12 + len > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = bb.getInt(pos + 8)
          height = bb.getInt(pos + 12)
          val depth = bytes(pos + 16) & 0xff
          val color = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          if (depth != 8 || (color != 2 && color != 6) || interlace != 0 ||
            width <= 0 || height <= 0) return None
          // hostile-geometry guard in LONG arithmetic before any allocation
          if (width.toLong * height * 4 + height > Int.MaxValue) return None
          bpp = if (color == 2) 3 else 4
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (width <= 0 || idat.size == 0) return None
    val stride = width * bpp
    val expect = height * (1 + stride)
    val raw = new Array[Byte](expect)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < expect && !inflater.finished()) {
        val n = inflater.inflate(raw, off, expect - off)
        // output space is available, so a zero-byte step means the stream
        // cannot progress: truncated input, or a preset-dictionary (FDICT)
        // request this decoder does not serve. Either way: None — a
        // hostile record must never spin the task forever.
        if (n == 0) return None
        off += n
      }
      if (off != expect) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // de-filter scanlines in place over a reconstruction buffer
    val recon = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      var i = 0
      while (i < stride) {
        val x = raw(y * (1 + stride) + 1 + i) & 0xff
        val a = if (i >= bpp) recon(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) recon((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) recon((y - 1) * stride + i - bpp) & 0xff else 0
        recon(y * stride + i) = (f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case _ => x + paeth(a, b, c)
        }).toByte
        i += 1
      }
      y += 1
    }
    val rgb =
      if (bpp == 3) recon
      else { // drop alpha
        val out = new Array[Byte](width * height * 3)
        var p = 0
        while (p < width * height) {
          out(p * 3) = recon(p * 4); out(p * 3 + 1) = recon(p * 4 + 1)
          out(p * 3 + 2) = recon(p * 4 + 2)
          p += 1
        }
        out
      }
    Some((width, height, rgb))
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
