package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      val x = p % w; val y = p / w
      (i % 3 match {
        case 0 => math.min(255, x * 255 / math.max(1, w - 1))
        case 1 => math.min(255, y * 255 / math.max(1, h - 1))
        case 2 => 128
      }).toByte
    }

  private def flat(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => (i % 3 match {
      case 0 => r; case 1 => g; case 2 => b
    }).toByte)

  private def maxErr(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length)
    var m = 0; var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > m) m = d
      i += 1
    }
    m
  }

  test("roundtrip geometry across sizes, 4:4:4 and 4:2:0") {
    for {
      (w, h) <- Seq((1, 1), (7, 5), (8, 8), (17, 9), (16, 16), (33, 21))
      sub <- Seq(false, true)
    } {
      val src = gradient(w, h)
      val jpg = JpegCodec.encodeJpeg(w, h, src, quality = 90, subsample420 = sub)
      val dec = JpegCodec.decodeJpeg(jpg)
      assert(dec.isDefined, s"decode failed w=$w h=$h sub=$sub")
      val (dw, dh, out) = dec.get
      assert(dw == w && dh == h, s"geometry $dw x $dh != $w x $h (sub=$sub)")
      assert(out.length == w * h * 3)
    }
  }

  test("flat color survives nearly exactly; smooth gradient within lossy tolerance") {
    val (w, h) = (32, 24)
    val f = flat(w, h, 200, 64, 30)
    val fj = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, f, quality = 90)).get._3
    assert(maxErr(f, fj) <= 4, s"flat err ${maxErr(f, fj)}")
    val g = gradient(w, h)
    val gj444 = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, g, quality = 90)).get._3
    assert(maxErr(g, gj444) <= 24, s"444 gradient err ${maxErr(g, gj444)}")
    val gj420 = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, g, quality = 90, subsample420 = true)).get._3
    assert(maxErr(g, gj420) <= 48, s"420 gradient err ${maxErr(g, gj420)}")
  }

  test("encode and decode are deterministic") {
    val (w, h) = (19, 13)
    val src = gradient(w, h)
    val a = JpegCodec.encodeJpeg(w, h, src, quality = 85, subsample420 = true)
    val b = JpegCodec.encodeJpeg(w, h, src, quality = 85, subsample420 = true)
    assert(a.sameElements(b))
    val d1 = JpegCodec.decodeJpeg(a).get._3
    val d2 = JpegCodec.decodeJpeg(a).get._3
    assert(d1.sameElements(d2))
  }

  test("restart markers: DRI/RSTn stream decodes identically to the unrestarted one") {
    val (w, h) = (40, 24) // 15 MCUs at 4:2:0 → several restart intervals
    val src = gradient(w, h)
    val plain = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, src, quality = 90, subsample420 = true)).get._3
    val rst = JpegCodec.encodeJpeg(w, h, src, quality = 90, subsample420 = true,
      restartInterval = 2)
    assert(rst.containsSlice(Array(0xFF.toByte, 0xDD.toByte)), "DRI marker missing")
    val restarted = JpegCodec.decodeJpeg(rst)
    assert(restarted.isDefined, "restart stream failed to decode")
    assert(restarted.get._3.sameElements(plain),
      "restart stream must reconstruct the same pixels")
  }

  // javax.imageio ships with the JDK (test-only reference implementation —
  // the engine's own decode path never touches it): our streams must be
  // readable by an independent decoder, and our decoder must read streams
  // an independent encoder wrote, including its Annex-K Huffman tables and
  // subsampled chroma.
  test("interop: ImageIO decodes our stream within tolerance") {
    val (w, h) = (32, 24)
    val src = gradient(w, h)
    for (sub <- Seq(false, true)) {
      val jpg = JpegCodec.encodeJpeg(w, h, src, quality = 90, subsample420 = sub)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null, s"ImageIO rejected our stream (sub=$sub)")
      assert(img.getWidth == w && img.getHeight == h)
      val out = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val o = (y * w + x) * 3
        out(o) = ((p >> 16) & 0xff).toByte
        out(o + 1) = ((p >> 8) & 0xff).toByte
        out(o + 2) = (p & 0xff).toByte
      }
      assert(maxErr(src, out) <= 48, s"ImageIO read err ${maxErr(src, out)} (sub=$sub)")
    }
  }

  test("interop: our decoder reads an ImageIO-encoded JPEG within tolerance") {
    val (w, h) = (32, 24)
    val src = gradient(w, h)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((src(o) & 0xff) << 16) | ((src(o + 1) & 0xff) << 8) | (src(o + 2) & 0xff))
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val dec = JpegCodec.decodeJpeg(baos.toByteArray)
    assert(dec.isDefined, "failed to decode ImageIO-written JPEG")
    val (dw, dh, out) = dec.get
    assert(dw == w && dh == h)
    assert(maxErr(src, out) <= 48, s"decode err ${maxErr(src, out)}")
  }

  test("hostile inputs: truncations, garbage, and giant headers yield None, never throw") {
    val (w, h) = (16, 16)
    val jpg = JpegCodec.encodeJpeg(w, h, gradient(w, h), quality = 90)
    // every truncation point: None or a well-formed decode, never an exception
    var step = math.max(1, jpg.length / 97)
    var cut = 2
    while (cut < jpg.length) {
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(jpg, cut)) match {
        case Some((dw, dh, px)) => assert(dw == w && dh == h && px.length == w * h * 3)
        case None => ()
      }
      cut += step
    }
    assert(JpegCodec.decodeJpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.decodeJpeg(Array.fill[Byte](256)(0x55)).isEmpty)
    // hostile SOF: 50000×50000 must fail the long-arithmetic guard pre-allocation
    val big = jpg.clone()
    val sof = {
      var i = 2
      var at = -1
      while (at < 0 && i + 4 < big.length) {
        if ((big(i) & 0xff) == 0xFF && (big(i + 1) & 0xff) == 0xC0) at = i
        else i += 1
      }
      at
    }
    assert(sof > 0)
    big(sof + 5) = 0xC3.toByte; big(sof + 6) = 0x50.toByte // height 50000
    big(sof + 7) = 0xC3.toByte; big(sof + 8) = 0x50.toByte // width 50000
    assert(JpegCodec.decodeJpeg(big).isEmpty)
    // progressive SOF2 is declined, not mis-decoded
    val prog = jpg.clone()
    prog(sof + 1) = 0xC2.toByte
    assert(JpegCodec.decodeJpeg(prog).isEmpty)
  }

  private def findMarker(b: Array[Byte], m: Int): Int = {
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) == 0xFF && (b(i + 1) & 0xff) == m) return i
      i += 1
    }
    -1
  }

  test("SOS scan components are matched by ID, not position") {
    val (w, h) = (16, 16)
    val jpg = JpegCodec.encodeJpeg(w, h, gradient(w, h), quality = 90)
    val sos = findMarker(jpg, 0xDA)
    assert(sos > 0)
    // SOS layout: FF DA len(2) ns(1) then (Cs, Td/Ta) pairs — first
    // selector byte is at sos+5. An ID naming no SOF component must be
    // malformed (None), not silently bound to whatever sits at that slot.
    val unknown = jpg.clone()
    unknown(sos + 5) = 9
    assert(JpegCodec.decodeJpeg(unknown).isEmpty,
      "scan referencing an unknown component ID must decode to None")
    // a repeated selector is equally malformed
    val dup = jpg.clone()
    dup(sos + 7) = dup(sos + 5) // second entry selects the same component
    assert(JpegCodec.decodeJpeg(dup).isEmpty,
      "scan selecting the same component twice must decode to None")
  }

  test("scan order that differs from SOF slot order decodes by ID (T.81 B.2.3)") {
    val (w, h) = (16, 16)
    val src = gradient(w, h)
    val jpg = JpegCodec.encodeJpeg(w, h, src, quality = 90)
    val expected = JpegCodec.decodeJpeg(jpg).get
    // Swap the Cb and Cr component ENTRIES inside SOF (3 bytes each: id,
    // sampling, quant selector) while leaving the SOS scan list (1,2,3)
    // and the entropy stream untouched. The stream stays spec-valid —
    // the MCU interleave follows the SCAN list — but SOF slot order is
    // now [Y, Cr, Cb], so a decoder that pairs scan entries to SOF slots
    // positionally swaps the chroma planes and produces wrong colors;
    // only ID matching reproduces the image.
    val perm = jpg.clone()
    val sof = findMarker(perm, 0xC0)
    assert(sof > 0)
    // entries start at sof+10 (FF C0 len2 prec1 h2 w2 nc1): Y +10..12,
    // Cb +13..15, Cr +16..18
    for (i <- 0 until 3) {
      val t = perm(sof + 13 + i)
      perm(sof + 13 + i) = perm(sof + 16 + i)
      perm(sof + 16 + i) = t
    }
    val decoded = JpegCodec.decodeJpeg(perm)
    assert(decoded.isDefined, "SOF-permuted stream must still decode")
    val (dw, dh, out) = decoded.get
    assert(dw == w && dh == h)
    assert(out.sameElements(expected._3),
      "SOF-permuted stream must decode identically — chroma planes must bind by ID")
  }
}
