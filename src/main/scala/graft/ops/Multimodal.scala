package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata. */
final case class MediaRow(
    doc_id: Long,
    media_type: String, // "image" | "audio"
    width: Int, // image: pixels; audio: sample rate
    height: Int, // image: pixels; audio: channels
    format: String,
    payload: Array[Byte])

/** Extracted features for one media object. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    checksum: Long,
    features: Array[Float]) // fixed FeatureDim-length embedding

/** Multimodal-column plumbing: treat image/audio as opaque `binary` columns
  * with typed metadata, process them batch-at-a-time per partition.
  *
  * The decode step is REAL for every format the JVM can parse with zero
  * external dependencies: uncompressed 24-bit BMP (hand-rolled header
  * parse, bottom-up rows, 4-byte row padding stripped), RIFF/WAVE PCM16
  * mono (chunk walk to `fmt `/`data`, little-endian int16 samples), and —
  * via the JDK's own `javax.imageio.ImageIO` codecs — PNG, JPEG and GIF
  * (inflate, filter reconstruction, color-model normalization all done by
  * the platform decoder). Only formats the JDK genuinely ships no codec
  * for (video, lossy audio like MP3/Opus) fall back to [[decodeStub]],
  * the one clearly-marked fake left. The execution shape —
  * schema, binary payload handling, partition-sized batching, the narrow
  * `mapPartitions` loop (the Scala analogue of `mapInPandas`: one
  * buffer-reuse loop per partition, amortizing per-batch model setup) — is
  * the production shape; swapping the feature function for a JNI/ONNX
  * encoder call is the only remaining delta.
  *
  * Feature semantics (DuckDB-re-derivable, float32-EXACT by construction —
  * every lane is a sum of small integers, and float addition of integers
  * below 2^24 is exact in any order):
  *  - image: lane j = sum of decoded pixel-stream bytes at positions
  *    p ≡ j (mod 16); checksum = wrapping ck*31+b fold over the pixel
  *    stream (padding excluded — a decoder that misread the stride or
  *    padding shifts every byte and fails the oracle).
  *  - audio: lane j = sum of |sample| over samples k ≡ j (mod 16);
  *    checksum = the same byte fold over the raw PCM data bytes.
  */
object Multimodal {

  val FeatureDim = 16

  /** Deterministic data-section byte stream (splitmix64 of doc_id — the
    * SAME stream the DuckDB oracle re-derives): byte i of the media
    * payload's decoded content.
    */
  private def genData(id: Long, len: Int): Array[Byte] = {
    val bytes = new Array[Byte](len)
    var h = graft.fixtures.TranscriptGen.mix(id)
    var i = 0
    while (i < len) {
      if (i % 8 == 0) h = graft.fixtures.TranscriptGen.mix(h + i)
      bytes(i) = (h >>> ((i % 8) * 8)).toByte
      i += 1
    }
    bytes
  }

  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def putLE16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Valid uncompressed 24-bpp bottom-up BMP: 54-byte header + rows padded
    * to 4 bytes. `pix` is the pixel stream in file order (padding bytes
    * are zero, so the decoded stream is exactly `pix`).
    */
  def bmpFile(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(pix.length == w * h * 3)
    val stride = (w * 3 + 3) & ~3
    val dataSize = stride * h
    val file = new Array[Byte](54 + dataSize)
    file(0) = 'B'; file(1) = 'M'
    putLE32(file, 2, file.length)
    putLE32(file, 10, 54) // pixel data offset
    putLE32(file, 14, 40) // BITMAPINFOHEADER
    putLE32(file, 18, w)
    putLE32(file, 22, h) // positive = bottom-up
    putLE16(file, 26, 1) // planes
    putLE16(file, 28, 24) // bpp
    putLE32(file, 30, 0) // BI_RGB, uncompressed
    putLE32(file, 34, dataSize)
    putLE32(file, 38, 2835); putLE32(file, 42, 2835) // 72 DPI
    var r = 0
    while (r < h) {
      System.arraycopy(pix, r * w * 3, file, 54 + r * stride, w * 3)
      r += 1
    }
    file
  }

  private def putBE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
    b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
  }

  /** Valid PNG (8-bit truecolor RGB, filter None, STORED deflate blocks):
    * signature + IHDR + one IDAT + IEND. The zlib stream uses
    * uncompressed ("stored") deflate blocks — every inflate implementation
    * must accept them (RFC 1951 §3.2.4), so ImageIO's real PNG pipeline
    * (inflate → filter reconstruction → color model) decodes this like any
    * other PNG, while the file size stays a PURE FUNCTION of (w, h)
    * ([[pngFileLength]]) so the DuckDB oracle re-derives `n_bytes` without
    * modeling a compressor. `pix` is the RGB pixel stream, row-major
    * top-down — exactly what [[decodeImage]] returns.
    */
  def pngFile(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(pix.length == w * h * 3)
    // raw scanline data: 1 filter byte (0 = None) + w*3 RGB bytes per row
    val raw = new Array[Byte](h * (1 + w * 3))
    var r = 0
    while (r < h) {
      System.arraycopy(pix, r * w * 3, raw, r * (1 + w * 3) + 1, w * 3)
      r += 1
    }
    val nBlocks = math.max(1, (raw.length + 65534) / 65535)
    val zlib = new Array[Byte](2 + 5 * nBlocks + raw.length + 4)
    zlib(0) = 0x78; zlib(1) = 0x01 // CMF/FLG, (0x7801 % 31 == 0), no dict
    var src = 0
    var dst = 2
    while (src < raw.length || (raw.length == 0 && src == 0)) {
      val len = math.min(65535, raw.length - src)
      val fin = src + len >= raw.length
      zlib(dst) = if (fin) 1 else 0 // BFINAL | BTYPE=00 (stored)
      zlib(dst + 1) = len.toByte; zlib(dst + 2) = (len >> 8).toByte
      zlib(dst + 3) = (~len).toByte; zlib(dst + 4) = ((~len) >> 8).toByte
      System.arraycopy(raw, src, zlib, dst + 5, len)
      src += len; dst += 5 + len
      if (len == 0) src = raw.length + 1 // degenerate 0x0 image: one empty block
    }
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    putBE32(zlib, zlib.length - 4, adler.getValue.toInt)

    val ihdr = new Array[Byte](13)
    putBE32(ihdr, 0, w); putBE32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // compression 0, filter 0, interlace 0
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      putBE32(out, 0, data.length)
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      System.arraycopy(data, 0, out, 8, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      putBE32(out, 8 + data.length, crc.getValue.toInt)
      out
    }
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zlib) ++ chunk("IEND", Array.empty)
  }

  /** [[pngFile]]'s byte length as a pure function of (w, h): raw scanlines
    * = h*(1+3w); file = 8 (sig) + 25 (IHDR) + [12 + 2 + 5*blocks + raw + 4]
    * (IDAT with stored-deflate zlib) + 12 (IEND). One block below 64 KiB
    * of raw — every synthesized test image.
    */
  def pngFileLength(w: Int, h: Int): Int = {
    val raw = h * (1 + w * 3)
    val nBlocks = math.max(1, (raw + 65534) / 65535)
    8 + 25 + 12 + 2 + 5 * nBlocks + raw + 4 + 12
  }

  /** REAL image decode via the JDK's platform codecs: sniffs the container
    * magic (PNG / JPEG / GIF — the formats `javax.imageio.ImageIO` ships
    * decoders for in every JDK), hands the payload to ImageIO, and
    * normalizes the result to the row-major top-down RGB byte stream the
    * feature/checksum kernels consume. None when the magic is unknown or
    * the platform decoder rejects the payload.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val isPng = payload.length > 8 && (payload(0) & 0xff) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'
    val isJpeg = payload.length > 3 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff
    val isGif = payload.length > 6 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8'
    if (!isPng && !isJpeg && !isGif) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val pix = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val p = (y * w + x) * 3
          pix(p) = (rgb >> 16).toByte // R
          pix(p + 1) = (rgb >> 8).toByte // G
          pix(p + 2) = rgb.toByte // B
          x += 1
        }
        y += 1
      }
      Some((w, h, pix))
    } catch { case scala.util.control.NonFatal(_) => None } // fatal VM errors propagate
  }

  /** Valid RIFF/WAVE, PCM16 mono @16 kHz: canonical 44-byte header +
    * little-endian samples (`data` = the raw sample bytes).
    */
  def wavFile(data: Array[Byte]): Array[Byte] = {
    require(data.length % 2 == 0)
    val file = new Array[Byte](44 + data.length)
    file(0) = 'R'; file(1) = 'I'; file(2) = 'F'; file(3) = 'F'
    putLE32(file, 4, 36 + data.length)
    file(8) = 'W'; file(9) = 'A'; file(10) = 'V'; file(11) = 'E'
    file(12) = 'f'; file(13) = 'm'; file(14) = 't'; file(15) = ' '
    putLE32(file, 16, 16) // fmt chunk size
    putLE16(file, 20, 1) // PCM
    putLE16(file, 22, 1) // mono
    putLE32(file, 24, 16000) // sample rate
    putLE32(file, 28, 32000) // byte rate
    putLE16(file, 32, 2) // block align
    putLE16(file, 34, 16) // bits per sample
    file(36) = 'd'; file(37) = 'a'; file(38) = 't'; file(39) = 'a'
    putLE32(file, 40, data.length)
    System.arraycopy(data, 0, file, 44, data.length)
    file
  }

  /** Deterministic synthetic media derived from (doc_id, n_chars): REAL
    * BMP/WAV containers whose data section is a splitmix64 stream (no
    * external data; bit-identical across runs and partitionings).
    */
  def synthesize(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nc) =>
      if (id % 3 == 0) {
        val n = 32 + (nc % 96).toInt // samples
        MediaRow(id, "audio", 16000, 1, "wav", wavFile(genData(id, 2 * n)))
      } else {
        val w = 5 + (id % 8).toInt // some widths need row padding
        val h = 4 + (nc % 5).toInt
        val pix = genData(id, w * h * 3)
        if (id % 3 == 1) MediaRow(id, "image", w, h, "bmp", bmpFile(w, h, pix))
        else MediaRow(id, "image", w, h, "png", pngFile(w, h, pix))
      }
    }
  }

  /** REAL BMP decode: validates magic/bpp/compression, reads dimensions
    * and data offset from the header, strips the 4-byte row padding.
    * Returns (width, height, pixel stream in file order). None when the
    * payload is not an uncompressed 24-bpp BMP this decoder handles.
    */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val offset = le32(payload, 10)
    val w = le32(payload, 18)
    val h = le32(payload, 22)
    val bpp = le16(payload, 28)
    val compression = le32(payload, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return None
    val stride = (w * 3 + 3) & ~3
    if (offset.toLong + stride.toLong * h > payload.length) return None
    val pix = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      System.arraycopy(payload, offset + r * stride, pix, r * w * 3, w * 3)
      r += 1
    }
    Some((w, h, pix))
  }

  /** REAL WAV decode: walks RIFF chunks (not fixed offsets — a `LIST` or
    * `fact` chunk before `data` is handled) to `fmt ` and `data`; accepts
    * PCM16 only. Returns the int16 samples.
    */
  def decodeWav(payload: Array[Byte]): Option[Array[Short]] = {
    if (payload.length < 44) return None
    if (payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F')
      return None
    if (payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
      return None
    var pos = 12
    var fmtOk = false
    var data: Array[Short] = null
    while (pos + 8 <= payload.length) {
      val cid = new String(payload, pos, 4, "US-ASCII")
      val size = le32(payload, pos + 4)
      if (size < 0 || pos + 8 + size > payload.length) return None
      cid match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(payload, pos + 8)
          val bits = le16(payload, pos + 8 + 14)
          fmtOk = audioFormat == 1 && bits == 16
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var k = 0
          while (k < n) {
            out(k) = le16(payload, pos + 8 + 2 * k).toShort
            k += 1
          }
          data = out
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOk && data != null) Some(data) else None
  }

  /** STUB decoder — the fallback ONLY for formats the JDK genuinely ships
    * no codec for (video, MP3/Opus): derives FeatureDim floats
    * deterministically from the raw bytes so the plumbing stays testable.
    * A real deployment swaps this for a JNI/FFmpeg/ONNX call; BMP/WAV take
    * the hand-rolled paths and PNG/JPEG/GIF the ImageIO path above.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Rolling ck*31+b fold over content bytes (the oracle's HUGEINT fold). */
  private def byteChecksum(bytes: Array[Byte]): Long = {
    var ck = 0L
    var i = 0
    while (i < bytes.length) { ck = ck * 31 + (bytes(i) & 0xff); i += 1 }
    ck
  }

  private def imageFeatures(pix: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < pix.length) { out(i % FeatureDim) += (pix(i) & 0xff); i += 1 }
    out
  }

  private def audioFeatures(samples: Array[Short]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var k = 0
    while (k < samples.length) { out(k % FeatureDim) += math.abs(samples(k).toInt); k += 1 }
    out
  }

  /** Feature extraction as a narrow per-partition batch loop — no shuffle;
    * at 100 TB this is scan + CPU, scaling with executors. Batches of
    * `batchSize` model the GPU/encoder batch shape a real decoder needs.
    * Dispatch is by container magic (sniffed, not trusted metadata).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup happens HERE (e.g. encoder session reuse)
        batch.iterator.map { m =>
          val (ck, feats) = decodeBmp(m.payload) match {
            case Some((_, _, pix)) => (byteChecksum(pix), imageFeatures(pix))
            case None => decodeWav(m.payload) match {
              case Some(samples) =>
                val dataBytes = new Array[Byte](samples.length * 2)
                var k = 0
                while (k < samples.length) {
                  dataBytes(2 * k) = samples(k).toByte
                  dataBytes(2 * k + 1) = (samples(k) >> 8).toByte
                  k += 1
                }
                (byteChecksum(dataBytes), audioFeatures(samples))
              case None => decodeImage(m.payload) match { // PNG/JPEG/GIF via ImageIO
                case Some((_, _, pix)) => (byteChecksum(pix), imageFeatures(pix))
                case None => (byteChecksum(m.payload), decodeStub(m.payload))
              }
            }
          }
          MediaFeatures(m.doc_id, m.media_type, m.payload.length, ck, feats)
        }
      }
    }
  }
}
