package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines (SURVEY §2 D12): media
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run batched per partition.
  *
  * The Spark-side plumbing — schema, partition-local batching, typed
  * records, explode of variable-length outputs — is real and tested. REAL
  * pure-JVM codecs (MediaCodec) cover BMP, PCM WAV, a frame container and
  * zlib-compressed PNG end to end; the deterministic STUB below remains
  * only where LOSSY codecs would sit (JPEG/H.264/MP3 need ffmpeg-class
  * libraries this environment doesn't ship) and swaps out for a real
  * decoder without touching any plan structure.
  *
  * Scale: decode is mapPartitions with fixed-size batches — the same shape
  * a vectorized (Arrow/pandas-style) UDF pipeline has, embarrassingly
  * parallel, no shuffle until the final aggregate; a real deployment tunes
  * batch size to codec memory, not partition size.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  case class DecodedMedia(media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, feature: Array[Float])

  val BatchSize = 64

  /** deterministic fake of a media payload per document: the text bytes
    * under a kind derived from the id (image/audio/video round-robin).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  // ======================= STUB: fake codec ==============================
  // A real deployment replaces decodeOne with an actual decoder (JNI/ffmpeg
  // /ImageIO). Everything below derives deterministically from payload
  // bytes so plumbing stays testable without codec libraries.
  private def decodeOne(m: MediaRecord): DecodedMedia = {
    val len = m.payload.length
    val width = 64 + len % 512
    val height = 64 + (len * 7) % 512
    val frames = if (m.kind == "video") 1 + len % 30 else 1
    val feature = Array.tabulate(8) { i =>
      // fake embedding: byte-sum folded per stride — STUB
      var s = 0L
      var j = i
      while (j < len) { s += (m.payload(j) & 0xff); j += 8 }
      (s % 1000).toFloat / 1000f
    }
    DecodedMedia(m.media_id, m.kind, width, height, frames, feature)
  }
  // =======================================================================

  /** batched partition-local decode: the mapPartitions/batch shape of a
    * vectorized UDF pipeline, with the codec stubbed.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // batch boundary = where a real codec would amortize setup
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** STUB resize: pure metadata transform (a real impl rewrites payload). */
  def resize(decoded: Dataset[DecodedMedia], maxDim: Int): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(d.width, d.height))
      d.copy(width = math.max(1, (d.width * scale).toInt),
        height = math.max(1, (d.height * scale).toInt))
    }
  }

  /** frame sampling: one row per sampled frame (every `stride`-th). */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int = 10): DataFrame =
    decoded.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "kind", "frame_idx")

  /** end-to-end pipeline over documents: synthesize → decode → aggregate
    * per kind. The aggregate is integer-exact, so the oracle can check the
    * full plumbing (payload byte accounting) even with the codec stubbed.
    */
  val mmPipeline: Q = Q(
    "mm_pipeline",
    (s, dir) => {
      val media = mediaFromDocuments(Tables(s, dir).documents)
      decode(media).toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("width")).as("sum_width"),
          sum(col("height")).as("sum_height"),
          sum(col("n_frames")).as("sum_frames"))
        .orderBy("kind")
    },
    // strlen = byte length (payloads are the UTF-8 text bytes); SUM cast to
    // BIGINT because DuckDB sums integers into HUGEINT.
    Some("""SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      COUNT(*) AS n_media,
      CAST(SUM(64 + strlen(text) % 512) AS BIGINT) AS sum_width,
      CAST(SUM(64 + (strlen(text) * 7) % 512) AS BIGINT) AS sum_height,
      CAST(SUM(CASE WHEN doc_id % 3 = 2 THEN 1 + strlen(text) % 30 ELSE 1 END) AS BIGINT) AS sum_frames
    FROM documents GROUP BY 1 ORDER BY 1""")
  )

  /** frame sampling as a checked pipeline stage: stride-10 sampling over
    * the decoded stub frames, counted per kind — the oracle recomputes the
    * expected sample counts from first principles (stub dims are pure byte
    * accounting).
    */
  val mmFrameSample: Q = Q(
    "mm_frame_sample",
    (s, dir) => {
      val media = mediaFromDocuments(Tables(s, dir).documents)
      sampleFrames(decode(media), stride = 10)
        .groupBy("kind")
        .agg(count(lit(1)).as("total_frames"))
        .orderBy("kind")
    },
    Some("""SELECT kind, CAST(SUM(cnt) AS BIGINT) AS total_frames FROM (
      SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        CASE WHEN doc_id % 3 = 2 THEN (strlen(text) % 30) // 10 + 1 ELSE 1 END AS cnt
      FROM documents) sub
    GROUP BY kind ORDER BY kind""")
  )

  /** Exact binary-content dedup: payloads content-hashed (md5 over the raw
    * bytes) and counted per kind — the "same image uploaded twice" screen,
    * running entirely on the opaque binary column with no decode.
    */
  val mmBinaryDedup: Q = Q(
    "mm_binary_dedup",
    (s, dir) => {
      val media = mediaFromDocuments(Tables(s, dir).documents)
      media.toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_media"),
          countDistinct(md5(col("payload"))).as("n_unique_payloads"))
        .orderBy("kind")
    },
    // payloads are exactly the UTF-8 text bytes, so DuckDB's md5(text)
    // hashes the same byte stream as Spark's md5(binary payload)
    Some("""SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      COUNT(*) AS n_media,
      COUNT(DISTINCT md5(text)) AS n_unique_payloads
    FROM documents GROUP BY 1 ORDER BY 1""")
  )

  /** Metadata quality gate after resize: keep media whose post-resize
    * dimensions clear a minimum and whose aspect ratio is sane — the
    * filter stage between decode and training-set materialization. The
    * oracle recomputes the stub's resize arithmetic (IEEE double scale +
    * truncation) from first principles.
    */
  val mmMetadataFilter: Q = Q(
    "mm_metadata_filter",
    (s, dir) => {
      val media = mediaFromDocuments(Tables(s, dir).documents)
      resize(decode(media), maxDim = 256).toDF()
        .filter(col("width") >= 100 && col("height") >= 100 &&
          col("width").cast("double") / col("height") <= 3.0 &&
          col("height").cast("double") / col("width") <= 3.0)
        .groupBy("kind")
        .agg(count(lit(1)).as("n_kept"), sum(col("width")).as("sum_width"))
        .orderBy("kind")
    },
    Some("""WITH decoded AS (
      SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        (64 + strlen(text) % 512)::INT AS w0, (64 + (strlen(text) * 7) % 512)::INT AS h0
      FROM documents),
    resized AS (
      SELECT kind,
        greatest(1, trunc(w0 * least(1.0, 256.0 / greatest(w0, h0)))::INT) AS width,
        greatest(1, trunc(h0 * least(1.0, 256.0 / greatest(w0, h0)))::INT) AS height
      FROM decoded)
    SELECT kind, COUNT(*) AS n_kept, CAST(SUM(width) AS BIGINT) AS sum_width
    FROM resized
    WHERE width >= 100 AND height >= 100
      AND width::DOUBLE / height <= 3.0 AND height::DOUBLE / width <= 3.0
    GROUP BY kind ORDER BY kind""")
  )

  // ==================== REAL codec path (round 3) ========================
  // MediaCodec implements the actual byte formats (24-bit BMP, PCM WAV, a
  // length-prefixed BMP-frame container). Payloads below are genuine
  // encoded media synthesized deterministically from each document, and
  // decode PARSES those bytes — header geometry, bottom-up BGR rows with
  // stride padding, RIFF chunk walking. The oracle recomputes the expected
  // metadata and pixel/sample probes independently from doc_id and
  // length(text), so a decode bug (wrong stride, byte order, chunk offset)
  // breaks the hash. The stub path above remains for compressed formats.

  case class RealDecoded(media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, sample_rate: Int, n_samples: Int, first_red: Int, first_sample: Int)

  private def pixelBytes(id: Long, off: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(p => ((id * 31 + off + p) % 256).toByte)

  /** Genuine encoded payloads per document: images are real BMPs, audio is
    * real PCM WAV, video is a container of real BMP frames. All geometry /
    * content derives from (doc_id, char length) only, so an independent
    * engine can recompute what decode must find.
    */
  def realMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        val payload = (id % 3) match {
          case 0 =>
            val w = 8 + n % 24
            val h = 8 + (n * 3) % 24
            MediaCodec.encodeBmp(w, h, pixelBytes(id, 0, w * h * 3))
          case 1 =>
            val ns = 64 + n % 256
            MediaCodec.encodeWav(16000,
              Array.tabulate(ns)(j => (((id * 131 + j * 7) % 65536) - 32768).toShort))
          case _ =>
            val nf = 1 + n % 5
            val w = 8 + n % 16
            val h = 8
            MediaCodec.encodeVideo((0 until nf).map(i =>
              MediaCodec.encodeBmp(w, h, pixelBytes(id, i * 17, w * h * 3))))
        }
        val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        MediaRecord(id, kind, payload)
      }
  }

  /** Batched partition-local REAL decode: parse each payload's actual
    * bytes. Malformed payloads drop out (per-record isolation, like the
    * corrupt-record readers) instead of failing the batch.
    */
  def decodeReal(media: Dataset[MediaRecord]): Dataset[RealDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          // belt-and-braces: the codecs return None on every malformed
          // shape they anticipate, and anything they did not anticipate
          // still drops THIS record only — never the task
          try m.kind match {
            case "image" => MediaCodec.decodeBmp(m.payload).map { case (w, h, rgb) =>
              RealDecoded(m.media_id, m.kind, w, h, 1, 0, 0, rgb(0) & 0xff, 0)
            }
            case "audio" => MediaCodec.decodeWav(m.payload).map { case (sr, ss) =>
              RealDecoded(m.media_id, m.kind, 0, 0, 0, sr, ss.length, 0,
                if (ss.nonEmpty) ss(0).toInt else 0)
            }
            case _ => MediaCodec.decodeVideo(m.payload)
              .filter(_.nonEmpty) // a zero-frame container decodes to nothing
              .flatMap { frames =>
                MediaCodec.decodeBmp(frames.head).map { case (w, h, rgb) =>
                  RealDecoded(m.media_id, m.kind, w, h, frames.length, 0, 0, rgb(0) & 0xff, 0)
                }
              }
          } catch { case _: Exception => None }
        }
      }
    }
  }

  /** REAL resize: decode pixels, nearest-neighbor resample, re-encode.
    * The payload is rewritten — downstream consumers read the resized BMP.
    */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "image") m
      else MediaCodec.decodeBmp(m.payload) match {
        case Some((w, h, rgb)) =>
          val s = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val nw = math.max(1, (w * s).toInt)
          val nh = math.max(1, (h * s).toInt)
          m.copy(payload = MediaCodec.encodeBmp(nw, nh,
            MediaCodec.resizeRgb(w, h, rgb, nw, nh)))
        case None => m
      }
    }
  }

  /** Decode REAL payloads and aggregate metadata plus pixel/sample probes
    * per kind — every value must survive an actual encode→parse round trip
    * through the binary format.
    */
  val mmRealDecode: Q = Q(
    "mm_real_decode",
    (s, dir) => {
      val media = realMediaFromDocuments(Tables(s, dir).documents)
      decodeReal(media).toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_media"),
          sum("width").as("sum_width"),
          sum("height").as("sum_height"),
          sum("n_frames").as("sum_frames"),
          sum("n_samples").as("sum_samples"),
          sum("first_red").as("sum_first_red"),
          sum("first_sample").as("sum_first_sample"))
        .orderBy("kind")
    },
    Some("""SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      COUNT(*) AS n_media,
      CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 8 + length(text) % 24
                    WHEN doc_id % 3 = 2 THEN 8 + length(text) % 16 ELSE 0 END) AS BIGINT) AS sum_width,
      CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 8 + (length(text) * 3) % 24
                    WHEN doc_id % 3 = 2 THEN 8 ELSE 0 END) AS BIGINT) AS sum_height,
      CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1
                    WHEN doc_id % 3 = 2 THEN 1 + length(text) % 5 ELSE 0 END) AS BIGINT) AS sum_frames,
      CAST(SUM(CASE WHEN doc_id % 3 = 1 THEN 64 + length(text) % 256 ELSE 0 END) AS BIGINT) AS sum_samples,
      CAST(SUM(CASE WHEN doc_id % 3 <> 1 THEN (doc_id * 31) % 256 ELSE 0 END) AS BIGINT) AS sum_first_red,
      CAST(SUM(CASE WHEN doc_id % 3 = 1 THEN (doc_id * 131) % 65536 - 32768 ELSE 0 END) AS BIGINT) AS sum_first_sample
    FROM documents GROUP BY 1 ORDER BY 1""")
  )

  /** Pixel-level resize through the real codec: decode → resample →
    * re-encode → re-decode. Dimensions follow the truncating scale
    * arithmetic; the (0,0) pixel probe must be UNCHANGED by nearest-
    * neighbor resampling — both recomputed independently by the oracle.
    */
  val mmRealResize: Q = Q(
    "mm_real_resize",
    (s, dir) => {
      import s.implicits._
      val media = realMediaFromDocuments(Tables(s, dir).documents)
        .filter(col("kind") === "image").as[MediaRecord]
      decodeReal(resizeImages(media, maxDim = 16)).toDF()
        .agg(
          count(lit(1)).as("n_media"),
          sum("width").as("sum_width"),
          sum("height").as("sum_height"),
          sum("first_red").as("sum_first_red"))
    },
    Some("""WITH img AS (
      SELECT doc_id, 8 + length(text) % 24 AS w0, 8 + (length(text) * 3) % 24 AS h0
      FROM documents WHERE doc_id % 3 = 0)
    SELECT COUNT(*) AS n_media,
      CAST(SUM(greatest(1, trunc(w0 * least(1.0, 16.0 / greatest(w0, h0)))::INT)) AS BIGINT) AS sum_width,
      CAST(SUM(greatest(1, trunc(h0 * least(1.0, 16.0 / greatest(w0, h0)))::INT)) AS BIGINT) AS sum_height,
      CAST(SUM((doc_id * 31) % 256) AS BIGINT) AS sum_first_red
    FROM img""")
  )

  /** PNG round trip — a real COMPRESSED format end to end: every document
    * becomes a genuine zlib-deflated PNG (encoder cycles all five scanline
    * filters, so any image ≥5 rows exercises Sub/Up/Average/Paeth
    * reconstruction), decode re-inflates and de-filters, and the oracle
    * independently recomputes geometry plus FIRST and LAST pixel probes
    * from (doc_id, length(text)). The last-pixel probe only matches if
    * filter reconstruction was correct across every row above it.
    */
  val mmRealPng: Q = Q(
    "mm_real_png",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).documents
        .select(col("doc_id"), length(col("text")).as("n"))
        .as[(Long, Int)]
        .map { case (id, n) =>
          val w = 5 + n % 20
          val h = 5 + (n * 7) % 20
          val png = MediaCodec.encodePng(w, h, pixelBytes(id, 0, w * h * 3))
          MediaCodec.decodePng(png) match {
            case Some((dw, dh, rgb)) =>
              (id, dw, dh, rgb(0) & 0xff, rgb(rgb.length - 3) & 0xff)
            case None => (id, -1, -1, -1, -1)
          }
        }
        .toDF("doc_id", "width", "height", "first_red", "last_red")
        .agg(
          count(lit(1)).as("n_media"),
          sum("width").as("sum_width"),
          sum("height").as("sum_height"),
          sum("first_red").as("sum_first_red"),
          sum("last_red").as("sum_last_red"))
    },
    Some("""WITH g AS (
      SELECT doc_id, 5 + length(text) % 20 AS w, 5 + (length(text) * 7) % 20 AS h
      FROM documents)
    SELECT COUNT(*) AS n_media,
      CAST(SUM(w) AS BIGINT) AS sum_width,
      CAST(SUM(h) AS BIGINT) AS sum_height,
      CAST(SUM((doc_id * 31) % 256) AS BIGINT) AS sum_first_red,
      CAST(SUM((doc_id * 31 + (w * h - 1) * 3) % 256) AS BIGINT) AS sum_last_red
    FROM g""")
  )

  /** LOSSY codec round trip — baseline JPEG end to end through the engine's
    * own pure-JVM encoder/decoder (JpegCodec): every document becomes a
    * smooth-gradient image, encoded with per-doc parameter variation
    * (4:2:0 vs 4:4:4 by doc parity, restart markers every 2 MCUs for
    * doc_id % 4 == 0) and decoded back. Lossy means pixel values can't be
    * recomputed in SQL, so the oracle pins what IS exact — geometry and
    * counts — while the engine asserts the fidelity claim per record
    * against the formula-defined source pixels: decode succeeds, dims
    * match, max |err| ≤ 32, and images ≥ 1024 px compress smaller than
    * raw. A broken Huffman path, IDCT, or upsampler fails those counts,
    * which the oracle predicts independently from (doc_id, length(text)).
    */
  val mmRealJpeg: Q = Q(
    "mm_real_jpeg",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).documents
        .select(col("doc_id"), length(col("text")).as("n"))
        .as[(Long, Int)]
        .map { case (id, n) =>
          val w = 16 + n % 33
          val h = 16 + (n * 7) % 33
          val base = ((id * 31) % 128).toInt
          val rgb = Array.tabulate(w * h * 3) { i =>
            val p = i / 3
            math.min(255, base + (p % w) * 2 + p / w).toByte
          }
          val jpg = JpegCodec.encodeJpeg(w, h, rgb, quality = 85,
            subsample420 = id % 2 == 0,
            restartInterval = if (id % 4 == 0) 2 else 0)
          val ok = JpegCodec.decodeJpeg(jpg) match {
            case Some((dw, dh, out)) if dw == w && dh == h =>
              var m = 0; var i = 0
              while (i < out.length) {
                val d = math.abs((out(i) & 0xff) - (rgb(i) & 0xff))
                if (d > m) m = d
                i += 1
              }
              if (m <= 32) 1 else 0
            case _ => 0
          }
          val largeSmaller =
            if (w * h >= 1024) { if (jpg.length < rgb.length) 1 else 0 } else 0
          (id, w, h, ok, largeSmaller)
        }
        .toDF("doc_id", "width", "height", "ok", "large_smaller")
        .agg(
          count(lit(1)).as("n_media"),
          sum("width").as("sum_width"),
          sum("height").as("sum_height"),
          sum("ok").as("n_ok"),
          sum("large_smaller").as("n_large_smaller"))
    },
    Some("""WITH g AS (
      SELECT doc_id, 16 + length(text) % 33 AS w, 16 + (length(text) * 7) % 33 AS h
      FROM documents)
    SELECT COUNT(*) AS n_media,
      CAST(SUM(w) AS BIGINT) AS sum_width,
      CAST(SUM(h) AS BIGINT) AS sum_height,
      CAST(COUNT(*) AS BIGINT) AS n_ok,
      CAST(SUM(CASE WHEN w * h >= 1024 THEN 1 ELSE 0 END) AS BIGINT) AS n_large_smaller
    FROM g""")
  )

  val all: Seq[Q] = Seq(mmPipeline, mmFrameSample, mmBinaryDedup, mmMetadataFilter,
    mmRealDecode, mmRealResize, mmRealPng, mmRealJpeg)
}
