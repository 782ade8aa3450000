package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import Multimodal._

  private def media() = mediaFromDocuments(graft.Tables(spark, sfDir).documents)

  test("media synthesis: binary payload column with kind metadata") {
    val m = media()
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.toDF().select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode: deterministic stub produces typed features with stable dims") {
    val d = decode(media())
    assert(d.columns.toSeq ==
      Seq("media_id", "kind", "width", "height", "n_frames", "feature"))
    val row = d.filter(col("media_id") === 0).collect()(0)
    // rerun → identical (stub is deterministic)
    val row2 = decode(media()).filter(col("media_id") === 0).collect()(0)
    assert(row.width == row2.width && row.height == row2.height)
    assert(d.filter(col("width") < 64 || col("width") >= 576).count() == 0)
    assert(d.filter(col("kind") =!= "video" && col("n_frames") =!= 1).count() == 0)
    assert(d.filter(size(col("feature")) =!= 8).count() == 0)
  }

  test("resize: caps the max dimension, preserves aspect floor") {
    val r = resize(decode(media()), maxDim = 128)
    assert(r.filter(col("width") > 128 || col("height") > 128).count() == 0)
    assert(r.filter(col("width") < 1 || col("height") < 1).count() == 0)
  }

  test("frame sampling explodes only video, stride-spaced") {
    val frames = sampleFrames(decode(media()), stride = 10)
    val nonVideo = frames.filter(col("kind") =!= "video")
    assert(nonVideo.filter(col("frame_idx") =!= 0).count() == 0)
    // every sampled index is a multiple of the stride
    assert(frames.filter(col("frame_idx") % 10 =!= 0).count() == 0)
    // videos with >=11 frames produce >1 sampled frame
    val deep = decode(media()).filter(col("kind") === "video" && col("n_frames") > 10)
      .select("media_id").collect().map(_.getLong(0)).toSet
    val sampledDeep = frames.groupBy("media_id").count()
      .filter(col("count") > 1).collect().map(_.getLong(0)).toSet
    assert(deep == sampledDeep)
  }

  test("mm_pipeline aggregates are exact byte accounting") {
    val df = mmPipeline.fn(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum == graft.Tables(spark, sfDir).documents.count())
  }

  test("BMP codec: golden round-trip, stride padding, corrupt rejection") {
    // 3x2 with distinct per-channel bytes — odd width forces row padding
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 11 + 5).toByte)
    val bmp = MediaCodec.encodeBmp(3, 2, rgb)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    // 54-byte header + 2 rows of stride 12 (3*3=9 padded to 12)
    assert(bmp.length == 54 + 2 * 12, s"stride padding wrong: ${bmp.length}")
    val Some((w, h, back)) = MediaCodec.decodeBmp(bmp)
    assert(w == 3 && h == 2)
    assert(back.toSeq == rgb.toSeq, "pixel round-trip must be exact (BGR+bottom-up undone)")
    // rejection: wrong magic, truncation, unsupported depth
    assert(MediaCodec.decodeBmp("not a bitmap".getBytes).isEmpty)
    assert(MediaCodec.decodeBmp(bmp.take(40)).isEmpty)
    val bad = bmp.clone(); bad(28) = 8 // claim 8bpp
    assert(MediaCodec.decodeBmp(bad).isEmpty)
  }

  test("WAV codec: golden round-trip, chunk walking, non-PCM rejection") {
    val samples = Array.tabulate(100)(i => (i * 337 - 16000).toShort)
    val wav = MediaCodec.encodeWav(16000, samples)
    assert(wav.length == 44 + 200)
    val Some((sr, back)) = MediaCodec.decodeWav(wav)
    assert(sr == 16000 && back.toSeq == samples.toSeq)
    // an extra chunk between fmt and data must be skipped, not fatal
    val withList = {
      val bb = java.nio.ByteBuffer.allocate(wav.length + 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(wav, 0, 36) // RIFF..fmt chunk
      bb.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
      bb.put(wav, 36, wav.length - 36) // data chunk
      val out = bb.array()
      // patch RIFF size
      java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(4, out.length - 8)
      out
    }
    assert(MediaCodec.decodeWav(withList).map(_._2.toSeq).contains(samples.toSeq))
    val stereo = wav.clone(); stereo(22) = 2 // claim 2 channels
    assert(MediaCodec.decodeWav(stereo).isEmpty)
  }

  test("video container + nearest-neighbor resize are pixel-exact") {
    val f0 = MediaCodec.encodeBmp(2, 2, Array.tabulate(12)(_.toByte))
    val f1 = MediaCodec.encodeBmp(2, 2, Array.tabulate(12)(i => (i + 100).toByte))
    val vid = MediaCodec.encodeVideo(Seq(f0, f1))
    val Some(frames) = MediaCodec.decodeVideo(vid)
    assert(frames.length == 2)
    assert(MediaCodec.decodeBmp(frames(1)).get._3.head == 100.toByte)
    assert(MediaCodec.decodeVideo(f0).isEmpty) // BMP is not a container
    // 4x4 -> 2x2 nearest neighbor picks pixels (0,0),(2,0),(0,2),(2,2)
    val src = Array.tabulate(4 * 4 * 3)(_.toByte)
    val out = MediaCodec.resizeRgb(4, 4, src, 2, 2)
    def px(a: Array[Byte], w: Int, x: Int, y: Int) =
      Seq(a((y * w + x) * 3), a((y * w + x) * 3 + 1), a((y * w + x) * 3 + 2))
    assert(px(out, 2, 0, 0) == px(src, 4, 0, 0))
    assert(px(out, 2, 1, 0) == px(src, 4, 2, 0))
    assert(px(out, 2, 0, 1) == px(src, 4, 0, 2))
    assert(px(out, 2, 1, 1) == px(src, 4, 2, 2))
  }

  test("codecs reject hostile headers without throwing (overflow guards)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // BMP claiming 50000x50000 in a tiny payload: int arithmetic would
    // overflow negative and pass the bounds check — must be None, not throw
    val bmp = MediaCodec.encodeBmp(2, 2, Array.fill(12)(1.toByte))
    val huge = bmp.clone()
    val hb = ByteBuffer.wrap(huge).order(ByteOrder.LITTLE_ENDIAN)
    hb.putInt(18, 50000); hb.putInt(22, 50000)
    assert(MediaCodec.decodeBmp(huge).isEmpty)
    val negOff = bmp.clone()
    ByteBuffer.wrap(negOff).order(ByteOrder.LITTLE_ENDIAN).putInt(10, -100)
    assert(MediaCodec.decodeBmp(negOff).isEmpty)
    // WAV data-chunk size near Int.MaxValue: pos + 8 + size must not wrap
    val wav = MediaCodec.encodeWav(8000, Array.fill(4)(0.toShort))
    val wHuge = wav.clone()
    ByteBuffer.wrap(wHuge).order(ByteOrder.LITTLE_ENDIAN).putInt(40, Int.MaxValue - 4)
    assert(MediaCodec.decodeWav(wHuge).isEmpty)
    // zero-frame container is well-formed at the codec level...
    val empty = MediaCodec.encodeVideo(Seq.empty)
    assert(MediaCodec.decodeVideo(empty).exists(_.isEmpty))
    // ...but the pipeline drops the record instead of calling frames.head
    import spark.implicits._
    val ds = Seq(Multimodal.MediaRecord(1L, "video", empty)).toDS()
    assert(Multimodal.decodeReal(ds).count() == 0)
  }

  test("real decode pipeline: every synthesized payload parses; probes match formulas") {
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir).documents
    val media = Multimodal.realMediaFromDocuments(docs)
    val decoded = Multimodal.decodeReal(media).cache()
    // no payload dropped: decode parsed every synthesized BMP/WAV/GVID
    assert(decoded.count() == docs.count(), "real decode dropped payloads")
    // spot-check the (0,0)-pixel probe against the generator formula
    val bad = decoded.filter(d => d.kind != "audio" && d.first_red != ((d.media_id * 31) % 256).toInt)
    assert(bad.count() == 0, bad.take(3).mkString(","))
    decoded.unpersist()
  }

  test("PNG codec: lossless round-trip through real zlib + all five filters") {
    // ≥5 rows so the encoder's filter cycle covers None/Sub/Up/Average/
    // Paeth; pseudo-random pixels make filter-reconstruction errors visible
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((1, 1), (3, 7), (16, 16), (23, 9))) {
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val png = MediaCodec.encodePng(w, h, rgb)
      // genuinely a PNG: signature + zlib-deflated payload
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
      val Some((dw, dh, out)) = MediaCodec.decodePng(png): @unchecked
      assert(dw == w && dh == h)
      assert(out.sameElements(rgb), s"pixel mismatch at ${w}x$h")
    }
  }

  test("PNG codec: RGBA input decodes with alpha dropped; rejects malformed") {
    // hand-build a tiny 2x1 color-type-6 (RGBA) PNG: decoder must strip the
    // alpha channel — the shape every screenshot-style PNG ships in
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(data.length).put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(2).putInt(1).put(8.toByte).put(6.toByte) // 2x1, depth 8, RGBA
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val raw = Array[Byte](0, /* filter None */ 10, 20, 30, 99, 40, 50, 60, 77)
    val defl = new java.util.zip.Deflater(); defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](128)
    val zlen = defl.deflate(zbuf); defl.end()
    val rgbaPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.take(zlen)) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((aw, ah, argb)) = MediaCodec.decodePng(rgbaPng): @unchecked
    assert(aw == 2 && ah == 1)
    assert(argb.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60), "alpha must be dropped")

    val rgb = Array[Byte](10, 20, 30, 40, 50, 60)
    val png = MediaCodec.encodePng(2, 1, rgb)
    // truncated IDAT stream → None, not an exception
    val cut = png.take(png.length - 16)
    assert(MediaCodec.decodePng(cut).isEmpty)
    // corrupted signature → None
    val sig = png.clone(); sig(1) = 'X'.toByte
    assert(MediaCodec.decodePng(sig).isEmpty)
    // hostile geometry: width*height*4 overflowing int must be rejected
    // before allocation
    val huge = png.clone()
    java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(16, 0x40000000) // width at IHDR offset 8+8
    assert(MediaCodec.decodePng(huge).isEmpty)
    // interlaced flag → unsupported → None
    val inter = png.clone(); inter(8 + 8 + 12) = 1.toByte
    assert(MediaCodec.decodePng(inter).isEmpty)
    // zlib FDICT (preset dictionary) stream: Inflater reports neither
    // finished nor needs-input — must return None, never spin the task
    // (0x78 0x20 is a valid zlib header with the FDICT bit set)
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0)
    val fdict = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.BIG_ENDIAN)
        .putInt(2).putInt(1).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()) ++
      chunk("IDAT", fdictIdat) ++ chunk("IEND", Array.emptyByteArray)
    assert(MediaCodec.decodePng(fdict).isEmpty, "FDICT stream must be rejected, not hang")
  }

  test("mm_real_png: geometry and both pixel probes match the oracle formulas") {
    val row = Multimodal.mmRealPng.fn(spark, sfDir).head()
    val docs = graft.Tables(spark, sfDir).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val w = docs.map { case (_, n) => 5L + n % 20 }
    val h = docs.map { case (_, n) => 5L + (n * 7) % 20 }
    assert(row.getAs[Long]("n_media") == docs.length.toLong)
    assert(row.getAs[Long]("sum_width") == w.sum)
    assert(row.getAs[Long]("sum_height") == h.sum)
    assert(row.getAs[Long]("sum_first_red") ==
      docs.map { case (id, _) => (id * 31) % 256 }.sum)
    assert(row.getAs[Long]("sum_last_red") ==
      docs.zipWithIndex.map { case ((id, _), i) => (id * 31 + (w(i) * h(i) - 1) * 3) % 256 }.sum)
  }
}
