package graft.operators

/** Pure-JVM BASELINE JPEG codec (ITU-T T.81 sequential DCT, 8-bit) — the
  * LOSSY half of the multimodal codec boundary, with zero external
  * libraries: marker parsing, canonical Huffman entropy coding with
  * byte stuffing and restart markers, Annex-K quality-scaled quantization,
  * separable FDCT/IDCT, JFIF YCbCr color transform, and 4:4:4 / 4:2:0
  * chroma subsampling with replication upsampling on decode.
  *
  * Encoder notes:
  *  - Quantization tables are the public T.81 Annex-K bases scaled by the
  *    usual IJG quality curve; tables travel in DQT so any reader decodes.
  *  - Huffman tables are canonical FLAT tables (12 DC symbols at 4 bits,
  *    162 AC symbols at 8 bits) emitted in DHT. Entropy-optimal Annex-K
  *    tables are a compression refinement, not a format requirement; flat
  *    tables keep the table constants tiny, leave the all-ones code unused
  *    as T.81 demands, and still run-length-compress via EOB/ZRL. The
  *    DECODER accepts arbitrary canonical tables (it reads whatever DHT
  *    carries — including libjpeg/ImageIO-written Annex-K tables).
  *  - Quantized coefficients are clamped to the baseline category bounds
  *    (DC to [-1024,1023], AC to [-1023,1023]) so every emitted stream is
  *    spec-valid for any input.
  *
  * Decoder scope (per-record isolation — `None`, never an exception or a
  * hang, on anything outside it): baseline/extended-sequential Huffman
  * (SOF0/SOF1), 8-bit, 1 or 3 components, sampling factors 1..2, DRI/RSTn,
  * APPn/COM skipped. Progressive (SOF2) and arithmetic coding are declined.
  * Hostile-geometry guards run in long arithmetic before any allocation.
  */
object JpegCodec {

  private val MaxDim = 16384
  private val MaxPixels = 1 << 24 // 16M px — decode allocation cap

  /** natural-order position of the k-th zigzag coefficient (T.81 fig. 5) */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // T.81 Annex K.1/K.2 base quantization tables, natural order
  private val BaseQLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val BaseQChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(95, quality)) // ≤95 keeps coeffs in category bounds comfortably
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // cosine basis cosT(x)(u) = cos((2x+1)·u·π/16); C(0) = 1/√2
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** F(u,v) = ¼ Cu Cv Σx Σy f(x,y) cos..cos — separable, rows then cols. */
  private def fdct(f: Array[Double], out: Array[Double]): Unit = {
    val g = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var y = 0
        while (y < 8) { s += f(x * 8 + y) * CosT(y)(v); y += 1 }
        g(x * 8 + v) = s
        v += 1
      }
      x += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var x2 = 0
        while (x2 < 8) { s += g(x2 * 8 + v) * CosT(x2)(u); x2 += 1 }
        out(u * 8 + v) = 0.25 * Cn(u) * Cn(v) * s
        v += 1
      }
      u += 1
    }
  }

  /** f(x,y) = ¼ Σu Σv Cu Cv F(u,v) cos..cos — separable. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val g = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Cn(u) * coef(u * 8 + v) * CosT(x)(u); u += 1 }
        g(x * 8 + v) = s
        v += 1
      }
      x += 1
    }
    x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += Cn(v) * g(x * 8 + v) * CosT(y)(v); v += 1 }
        val p = (0.25 * s + 128.5).toInt
        out(x * 8 + y) = if (p < 0) 0 else if (p > 255) 255 else p
        y += 1
      }
      x += 1
    }
  }

  // ----- encoder Huffman tables: canonical flat ---------------------------

  private val DcBits: Array[Int] = { val b = new Array[Int](16); b(3) = 12; b } // 12 syms @4 bits
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits: Array[Int] = { val b = new Array[Int](16); b(7) = 162; b } // 162 syms @8 bits
  private val AcVals: Array[Int] = {
    val syms = Seq(0x00, 0xF0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
    syms.sorted.toArray
  }
  // encoder lookup: symbol → canonical code (= its index, tables being flat)
  private val AcIdx: Array[Int] = {
    val m = Array.fill(256)(-1)
    AcVals.zipWithIndex.foreach { case (s, i) => m(s) = i }
    m
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = if (nbits > 0) {
      val pad = 8 - nbits
      val b = ((acc << pad) | ((1 << pad) - 1)) & 0xff
      out.write(b); if (b == 0xFF) out.write(0)
      acc = 0; nbits = 0
    }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) } // unstuffed
    def bytes: Array[Byte] = out.toByteArray
  }

  /** bit category: 0 for 0, else s with 2^(s-1) ≤ |v| < 2^s */
  private def cat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** quantize one FDCT'd block to zigzag order with baseline category clamps */
  private def quantZig(frq: Array[Double], qtab: Array[Int], z: Array[Int]): Unit = {
    var k = 0
    while (k < 64) {
      val nat = ZigZag(k)
      var q = math.round(frq(nat) / qtab(nat)).toInt
      val lo = if (k == 0) -1024 else -1023
      if (q < lo) q = lo else if (q > 1023) q = 1023
      z(k) = q
      k += 1
    }
  }

  /** Huffman-encode one quantized-zigzag block; returns the new DC predictor. */
  private def writeBlock(bw: BitWriter, z: Array[Int], dcPred: Int): Int = {
    val diff = z(0) - dcPred
    val s = cat(diff)
    bw.put(s, 4) // flat DC table: code(s) == s at 4 bits
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = z(k)
      if (v == 0) run += 1
      else {
        while (run >= 16) { bw.put(AcIdx(0xF0), 8); run -= 16 }
        val sz = cat(v)
        bw.put(AcIdx((run << 4) | sz), 8)
        bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(AcIdx(0x00), 8) // EOB
    z(0)
  }

  /** extract an 8×8 block (edge-replicated, level-shifted) from a plane */
  private def extractBlock(
      plane: Array[Int], pw: Int, ph: Int, x0: Int, y0: Int,
      out: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(ph - 1, y0 + y)
      var x = 0
      while (x < 8) {
        val sx = math.min(pw - 1, x0 + x)
        out(y * 8 + x) = plane(sy * pw + sx) - 128.0
        x += 1
      }
      y += 1
    }
  }

  /** Encode row-major RGB as a baseline JFIF JPEG. `subsample420` selects
    * 4:2:0 chroma (2×2 luma blocks per MCU, box-averaged chroma);
    * `restartInterval` > 0 emits DRI + RSTn markers every that many MCUs.
    */
  def encodeJpeg(
      width: Int, height: Int, rgb: Array[Byte], quality: Int = 90,
      subsample420: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height * 3,
      s"need ${width * height * 3} bytes")
    val qL = scaledQuant(BaseQLuma, quality)
    val qC = scaledQuant(BaseQChroma, quality)
    val n = width * height
    val yP = new Array[Int](n); val cbF = new Array[Int](n); val crF = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff; val g = rgb(i * 3 + 1) & 0xff; val b = rgb(i * 3 + 2) & 0xff
      yP(i) = math.min(255, math.max(0, (0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt))
      cbF(i) = math.min(255, math.max(0, (-0.168736 * r - 0.331264 * g + 0.5 * b + 128.5).toInt))
      crF(i) = math.min(255, math.max(0, (0.5 * r - 0.418688 * g - 0.081312 * b + 128.5).toInt))
      i += 1
    }
    val (hs, vs) = if (subsample420) (2, 2) else (1, 1)
    // chroma planes, box-averaged down by (hs, vs)
    val cw = (width + hs - 1) / hs
    val ch = (height + vs - 1) / vs
    val cbP = new Array[Int](cw * ch); val crP = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var sb = 0; var sr = 0; var cnt = 0
        var dy = 0
        while (dy < vs) {
          val sy = cy * vs + dy
          if (sy < height) {
            var dx = 0
            while (dx < hs) {
              val sx = cx * hs + dx
              if (sx < width) { sb += cbF(sy * width + sx); sr += crF(sy * width + sx); cnt += 1 }
              dx += 1
            }
          }
          dy += 1
        }
        cbP(cy * cw + cx) = sb / cnt; crP(cy * cw + cx) = sr / cnt
        cx += 1
      }
      cy += 1
    }
    // entropy-coded scan
    val mcusX = (width + 8 * hs - 1) / (8 * hs)
    val mcusY = (height + 8 * vs - 1) / (8 * vs)
    val bw = new BitWriter
    val f = new Array[Double](64); val frq = new Array[Double](64); val z = new Array[Int](64)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var sinceRst = 0; var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRst == restartInterval) {
          bw.flushWithOnes()
          bw.marker(0xD0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7; sinceRst = 0
          dcY = 0; dcCb = 0; dcCr = 0
        }
        var by = 0
        while (by < vs) {
          var bx = 0
          while (bx < hs) {
            extractBlock(yP, width, height, (mx * hs + bx) * 8, (my * vs + by) * 8, f)
            fdct(f, frq); quantZig(frq, qL, z); dcY = writeBlock(bw, z, dcY)
            bx += 1
          }
          by += 1
        }
        extractBlock(cbP, cw, ch, mx * 8, my * 8, f)
        fdct(f, frq); quantZig(frq, qC, z); dcCb = writeBlock(bw, z, dcCb)
        extractBlock(crP, cw, ch, mx * 8, my * 8, f)
        fdct(f, frq); quantZig(frq, qC, z); dcCr = writeBlock(bw, z, dcCr)
        sinceRst += 1
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    // assemble the file
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(payload, 0, payload.length)
    }
    marker(0xD8) // SOI
    seg(0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = new java.io.ByteArrayOutputStream()
    dqt.write(0x00); ZigZag.foreach(nat => dqt.write(qL(nat)))
    dqt.write(0x01); ZigZag.foreach(nat => dqt.write(qC(nat)))
    seg(0xDB, dqt.toByteArray)
    seg(0xC0, Array[Byte](8,
      (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte,
      3,
      1, ((hs << 4) | vs).toByte, 0, // Y: sampling, quant table 0
      2, 0x11, 1,                    // Cb: 1×1, quant table 1
      3, 0x11, 1))                   // Cr
    val dht = new java.io.ByteArrayOutputStream()
    dht.write(0x00); DcBits.foreach(dht.write); DcVals.foreach(dht.write) // DC table 0
    dht.write(0x10); AcBits.foreach(dht.write); AcVals.foreach(dht.write) // AC table 0
    seg(0xC4, dht.toByteArray)
    if (restartInterval > 0)
      seg(0xDD, Array[Byte]((restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    seg(0xDA, Array[Byte](3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)) // all comps share tables 0
    val data = bw.bytes
    out.write(data, 0, data.length)
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ----- decoder ----------------------------------------------------------

  /** canonical Huffman decode table per T.81 F.2.2.3 (mincode/maxcode/valptr) */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        if (bits(l - 1) > 0) { code += bits(l - 1); maxCode(l) = code - 1 }
        k += bits(l - 1)
        code <<= 1
        l += 1
      }
    }
    /** next symbol, or -1 on exhausted/invalid input */
    def decode(br: BitReader): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        val b = br.readBit(); if (b < 0) return -1
        code = (code << 1) | b; l += 1
        if (code <= maxCode(l)) {
          val idx = valPtr(l) + code - minCode(l)
          if (idx >= vals.length) return -1
          return vals(idx)
        }
      }
      -1
    }
  }

  private final class BitReader(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var acc = 0
    private var nbits = 0
    /** next bit, or -1 at a marker / end of data */
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= end) return -1
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xFF) {
          if (pos >= end) return -1
          val nb = data(pos) & 0xff
          if (nb == 0x00) pos += 1 // stuffed data byte
          else { pos -= 1; return -1 } // real marker: rewind, signal end
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    /** s raw bits big-endian, or Int.MinValue on exhaustion */
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) {
        val b = readBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** discard pad bits, consume the next RSTn marker; false if absent */
    def consumeRestart(): Boolean = {
      nbits = 0
      while (pos + 1 < end) {
        if ((data(pos) & 0xff) == 0xFF) {
          val m = data(pos + 1) & 0xff
          if (m >= 0xD0 && m <= 0xD7) { pos += 2; return true }
          if (m == 0xFF) pos += 1 // fill byte
          else if (m == 0x00) pos += 2 // stuffed pre-marker residue: skip
          else return false
        } else pos += 1
      }
      false
    }
  }

  private def ext(r: Int, s: Int): Int = if (r < (1 << (s - 1))) r - (1 << s) + 1 else r

  private final class JComp(val id: Int, val hs: Int, val vs: Int, val tq: Int) {
    var td = 0
    var ta = 0
    var plane: Array[Int] = null
    var padW = 0
    var dcPred = 0
  }

  /** Parse a baseline JPEG → (width, height, row-major RGB); None on
    * anything outside the documented scope or malformed input.
    */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decode0(bytes) catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decode0(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = -1; var h = -1
    var comps: Array[JComp] = null
    var restartInterval = 0
    while (pos + 2 <= b.length) {
      if ((b(pos) & 0xff) != 0xFF) return None
      val marker = b(pos + 1) & 0xff
      if (marker == 0xFF) { pos += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) pos += 2
      else if (marker == 0xD9) return None // EOI before any scan
      else {
        if (pos + 4 > b.length) return None
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2 || pos.toLong + 2 + len > b.length) return None
        val seg = pos + 4
        val segEnd = pos + 2 + len
        marker match {
          case 0xDB => // DQT — possibly several tables in one segment
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(ZigZag(k)) = b(p + 1 + k) & 0xff; k += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xC4 => // DHT — possibly several tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
              val total = bits.sum
              if (total > 256 || p + 17 + total > segEnd) return None
              val vals = Array.tabulate(total)(i => b(p + 17 + i) & 0xff)
              val tab = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xC0 | 0xC1 => // baseline / extended sequential Huffman
            if (segEnd - seg < 6) return None
            val prec = b(seg) & 0xff
            h = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
            w = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
            val nc = b(seg + 5) & 0xff
            if (prec != 8 || w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
              w.toLong * h > MaxPixels || (nc != 1 && nc != 3) ||
              segEnd - seg < 6 + 3 * nc) return None
            val cs = new Array[JComp](nc)
            var ci = 0
            while (ci < nc) {
              val o = seg + 6 + ci * 3
              val cid = b(o) & 0xff
              val hv = b(o + 1) & 0xff
              val chs = hv >> 4; val cvs = hv & 0x0f
              val tq = b(o + 2) & 0xff
              if (chs < 1 || chs > 2 || cvs < 1 || cvs > 2 || tq > 3) return None
              // duplicate component ids make SOS references ambiguous
              var cj = 0
              while (cj < ci) { if (cs(cj).id == cid) return None; cj += 1 }
              cs(ci) = new JComp(cid, chs, cvs, tq)
              ci += 1
            }
            comps = cs
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // progressive / arithmetic / hierarchical: out of scope
          case 0xDD =>
            if (segEnd - seg < 2) return None
            restartInterval = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
          case 0xDA => // SOS
            if (comps == null || w < 0) return None
            val ns = b(seg) & 0xff
            if (ns != comps.length || segEnd - seg < 1 + 2 * ns + 3) return None
            // scan entries are matched to SOF components by the scan
            // component selector Cs, NOT positionally — a spec-valid scan
            // may list components in a different order than SOF, and the
            // entropy-coded MCU interleave follows the SCAN order (T.81
            // B.2.3). Unknown or repeated selectors → malformed → None.
            val scanComps = new Array[JComp](ns)
            var si = 0
            while (si < ns) {
              val csel = b(seg + 1 + si * 2) & 0xff
              val tsel = b(seg + 2 + si * 2) & 0xff
              var cj = 0
              var hit: JComp = null
              while (cj < comps.length) {
                if (comps(cj).id == csel) hit = comps(cj); cj += 1
              }
              if (hit == null) return None // selector names no SOF component
              var sj = 0
              while (sj < si) { if (scanComps(sj) eq hit) return None; sj += 1 }
              hit.td = tsel >> 4
              hit.ta = tsel & 0x0f
              if (hit.td > 3 || hit.ta > 3) return None
              scanComps(si) = hit
              si += 1
            }
            return decodeScan(b, segEnd, w, h, comps, scanComps, quant, dcTabs, acTabs,
              restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        pos = segEnd
      }
    }
    None
  }

  private def decodeScan(
      b: Array[Byte], scanStart: Int, w: Int, h: Int, comps: Array[JComp],
      scanComps: Array[JComp],
      quant: Array[Array[Int]], dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      restartInterval: Int): Option[(Int, Int, Array[Byte])] = {
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      if (quant(c.tq) == null || dcTabs(c.td) == null || acTabs(c.ta) == null) return None
      c.padW = mcusX * c.hs * 8
      val padH = mcusY * c.vs * 8
      if (c.padW.toLong * padH > MaxPixels.toLong * 4) return None
      c.plane = new Array[Int](c.padW * padH)
    }
    val br = new BitReader(b, scanStart, b.length)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var sinceRst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && sinceRst == restartInterval) {
          if (!br.consumeRestart()) return None
          comps.foreach(_.dcPred = 0)
          sinceRst = 0
        }
        // MCU component interleave follows the SCAN-header order, which
        // may differ from SOF order (scanComps vs comps)
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          val qt = quant(c.tq); val dcT = dcTabs(c.td); val acT = acTabs(c.ta)
          var by = 0
          while (by < c.vs) {
            var bx = 0
            while (bx < c.hs) {
              // one block
              java.util.Arrays.fill(coef, 0)
              val s = dcT.decode(br)
              if (s < 0 || s > 11) return None
              if (s > 0) {
                val r = br.receive(s); if (r == Int.MinValue) return None
                c.dcPred += ext(r, s)
              }
              coef(0) = c.dcPred * qt(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = acT.decode(br); if (rs < 0) return None
                val run = rs >> 4; val sz = rs & 0x0f
                if (sz == 0) {
                  if (run == 15) k += 16 else eob = true // ZRL / EOB
                } else {
                  k += run
                  if (k > 63 || sz > 10) return None
                  val r = br.receive(sz); if (r == Int.MinValue) return None
                  coef(ZigZag(k)) = ext(r, sz) * qt(ZigZag(k))
                  k += 1
                }
              }
              idct(coef, px)
              val ox = (mx * c.hs + bx) * 8
              val oy = (my * c.vs + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  c.plane((oy + yy) * c.padW + ox + xx) = px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        sinceRst += 1
        mx += 1
      }
      my += 1
    }
    // color convert with replication upsampling
    val rgb = new Array[Byte](w * h * 3)
    def clamp(v: Double): Byte = {
      val i = (v + 0.5).toInt
      (if (i < 0) 0 else if (i > 255) 255 else i).toByte
    }
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = c.plane(y * c.padW + x).toByte
          val p = (y * w + x) * 3
          rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      // JFIF binds YCbCr roles to component IDs 1/2/3, not to SOF slot
      // order — honor that when the stream uses the standard IDs, fall
      // back to slot order for nonstandard numbering
      def byId(id: Int, slot: Int): JComp =
        comps.find(_.id == id).getOrElse(comps(slot))
      val standardIds = comps.map(_.id).sorted.sameElements(Array(1, 2, 3))
      val cY = if (standardIds) byId(1, 0) else comps(0)
      val cCb = if (standardIds) byId(2, 1) else comps(1)
      val cCr = if (standardIds) byId(3, 2) else comps(2)
      var y = 0
      while (y < h) {
        val yY = y * cY.vs / vMax; val yCb = y * cCb.vs / vMax; val yCr = y * cCr.vs / vMax
        var x = 0
        while (x < w) {
          val lum = cY.plane(yY * cY.padW + x * cY.hs / hMax)
          val cb = cCb.plane(yCb * cCb.padW + x * cCb.hs / hMax) - 128
          val cr = cCr.plane(yCr * cCr.padW + x * cCr.hs / hMax) - 128
          val p = (y * w + x) * 3
          rgb(p) = clamp(lum + 1.402 * cr)
          rgb(p + 1) = clamp(lum - 0.344136 * cb - 0.714136 * cr)
          rgb(p + 2) = clamp(lum + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Some((w, h, rgb))
  }
}
