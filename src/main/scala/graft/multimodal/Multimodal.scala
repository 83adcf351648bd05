package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition feature extraction.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape. Header-level image decoding ([[sniffImage]]/[[imageMeta]]: PNG /
  * GIF / BMP / JPEG dimensions) is REAL pure-byte parsing with no codec
  * dependency — the per-blob triage step a large ingest runs on everything.
  * PIXEL decoding is real for uncompressed 24-bit BMP ([[decodeBmp24]] /
  * [[bmpStats]] — byte arithmetic, padding + bottom-up handling, no
  * library); compressed formats (PNG/JPEG/audio/video) remain stubbed
  * (this container ships no codecs): `decodeStub` is a deterministic fake
  * standing in for a JNI/library call. Swap `decodeStub` for a real
  * decoder and nothing else changes.
  *
  * Scale notes: feature extraction is `mapPartitions` (the Scala analogue of
  * `mapInPandas`) so a real decoder amortizes its init cost per PARTITION,
  * not per row — the pattern that matters at 100 TB, where per-row library
  * init dominates naive implementations. Binary payloads stay off the
  * shuffle: all ops here are narrow.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, n_bytes: Int, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int, features: Array[Float])
  case class ImageMeta(doc_id: Long, format: String, width: Int, height: Int)

  /** Pack a text table into the multimodal layout: payload as binary +
    * metadata struct. In production the payload is the raw image/audio blob
    * landed from object storage.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("application/octet-stream").as("mime"),
      length(col("text")).cast("int").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB for the real media decode — a deterministic fake: a real
    * implementation would decode the image/audio here (e.g. via a JNI
    * codec) and emit pixel/sample buffers. The fake emits the raw bytes so
    * downstream shape logic is exercised honestly.
    */
  private def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** REAL (not stubbed) image metadata decode: container-format dimension
    * sniffing for PNG / GIF / BMP / JPEG from the raw header bytes — pure
    * byte parsing, no codec library, so it runs anywhere. This is the
    * decode step a 100 TB ingest actually runs on EVERY blob (to filter
    * corrupt/oversized/wrong-aspect images) before any pixel decode of the
    * survivors; unknown/truncated payloads yield ("unknown", -1, -1) rather
    * than failing the partition.
    */
  private[graft] def sniffImage(p: Array[Byte]): (String, Int, Int) = {
    @inline def u8(i: Int) = p(i) & 0xff
    @inline def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val unknown = ("unknown", -1, -1)
    if (p.length >= 24 && p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      ("png", be32(16), be32(20)) // IHDR is always the first chunk
    else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')
      ("gif", le16(6), le16(8)) // logical screen descriptor
    else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M') {
      // dispatch on the DIB header size: 40+ = BITMAPINFOHEADER family
      // (signed 32-bit dims, negative height = top-down), 12 = the OS/2
      // BITMAPCOREHEADER (unsigned 16-bit dims); anything else is not a
      // layout this sniffer knows — degrade rather than misparse
      val dib = le32(14)
      if (dib >= 40) {
        val h = le32(22)
        // |Int.MinValue| is not an Int — an untrusted blob carrying it
        // must degrade, not report a negative "normalized" height
        if (h == Int.MinValue) unknown else ("bmp", le32(18), math.abs(h))
      }
      else if (dib == 12) ("bmp", le16(18), le16(20))
      else unknown
    } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header. Long
      // cursor: on a ~2 GB blob the int increment could wrap negative and
      // index out of bounds — degrade, never throw.
      var cursor = 2L
      while (cursor + 9 < p.length) {
        val i = cursor.toInt
        if (u8(i) != 0xff) return unknown
        val m = u8(i + 1)
        if (m == 0xff) cursor += 1 // legal fill/padding byte before a marker
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) cursor += 2 // standalone markers
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return ("jpeg", be16(i + 7), be16(i + 5)) // SOFn: height then width
        else cursor += 2L + be16(i + 2) // skip segment payload
      }
      unknown
    } else unknown
  }

  case class BmpStats(doc_id: Long, width: Int, height: Int,
                      mean_r: Float, mean_g: Float, mean_b: Float)

  /** REAL pixel decode for uncompressed 24-bit BI_RGB BMPs — the one
    * mainstream image layout that needs no codec, just byte arithmetic:
    * BITMAPINFOHEADER, rows padded to 4 bytes, bottom-up (positive height)
    * or top-down (negative), pixels stored BGR. Returns row-major top-down
    * BGR triplets, or None for anything that isn't exactly this layout
    * (compressed formats stay behind [[decodeStub]] — honestly).
    */
  private[graft] def decodeBmp24(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    @inline def u8(i: Int) = p(i) & 0xff
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val offset = le32(10)
    val dib = le32(14)
    val width = le32(18)
    val heightRaw = le32(22)
    if (dib < 40 || le16(26) != 1 || le16(28) != 24 || le32(30) != 0) return None
    if (width <= 0 || heightRaw == 0 || heightRaw == Int.MinValue) return None
    val height = math.abs(heightRaw)
    val rowSize = ((24L * width + 31) / 32 * 4).toInt
    // reject dimension combos whose buffer can't exist before allocating
    if (rowSize <= 0 || height.toLong * rowSize > Int.MaxValue) return None
    if (offset < 0 || offset.toLong + height.toLong * rowSize > p.length) return None
    val out = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      // bottom-up files store the LAST image row first
      val srcRow = if (heightRaw > 0) height - 1 - row else row
      val src = offset + srcRow * rowSize
      System.arraycopy(p, src, out, row * width * 3, width * 3)
      row += 1
    }
    Some((width, height, out))
  }

  /** Per-image mean RGB over decoded BMP pixels — real pixel math, batched
    * per partition; non-BMP / corrupt payloads are dropped (the triage
    * contract: never fail the partition on one bad blob).
    */
  def bmpStats(media: Dataset[MediaRecord]): Dataset[BmpStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeBmp24(r.payload).map { case (w, h, bgr) =>
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < bgr.length) {
          sb += bgr(i) & 0xff; sg += bgr(i + 1) & 0xff; sr += bgr(i + 2) & 0xff
          i += 3
        }
        val n = (w.toLong * h).toFloat
        BmpStats(r.doc_id, w, h, sr / n, sg / n, sb / n)
      }
    })
  }

  case class AudioMeta(doc_id: Long, channels: Int, sample_rate: Int,
                       bits: Int, n_samples: Long, duration_ms: Long)

  /** REAL WAV (RIFF) metadata parse — chunk walk to `fmt ` and `data`,
    * pure byte arithmetic, no codec: the audio analog of [[sniffImage]].
    * Handles non-canonical chunk orders (LIST/INFO before data) and
    * word-aligned chunk sizes; returns None rather than throwing on
    * truncated or hostile input. PCM sample decoding itself stays behind
    * [[decodeStub]] like every compressed codec.
    */
  private[graft] def sniffWav(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    @inline def u8(i: Int) = p(i) & 0xff
    @inline def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def tag(i: Int, s: String) =
      p(i) == s(0).toByte && p(i + 1) == s(1).toByte &&
        p(i + 2) == s(2).toByte && p(i + 3) == s(3).toByte
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // LONG cursor: a hostile chunk size near Int.MaxValue would overflow an
    // int cursor to negative and index out of bounds — degrade, never throw
    var cursor = 12L
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    while (cursor + 8 <= p.length) {
      val i = cursor.toInt
      val size = le32(i + 4)
      if (size < 0) return None
      if (tag(i, "fmt ") && size >= 16 && i + 8 + 16 <= p.length) {
        if (le16(i + 8) != 1) return None // PCM only — compressed is stubbed
        fmt = Some((le16(i + 10), le32(i + 12), le16(i + 22)))
      } else if (tag(i, "data")) {
        // metadata decode needs only the declared size, not the samples
        return fmt.collect { case (c, r, b) if c > 0 && r > 0 && b > 0 =>
          (c, r, b, size.toLong)
        }
      }
      cursor += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Audio metadata extraction: channels / rate / depth / sample count /
    * duration per blob, batched per partition; undecodable blobs drop.
    */
  def audioMeta(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      sniffWav(r.payload).map { case (c, rate, bits, dataBytes) =>
        val nSamples = dataBytes / (c.toLong * bits / 8)
        AudioMeta(r.doc_id, c, rate, bits, nSamples, nSamples * 1000L / rate)
      }
    })
  }

  /** Image metadata extraction over the media table — the real decode step,
    * batched per partition like [[extractFeatures]].
    */
  def imageMeta(media: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (fmt, w, h) = sniffImage(r.payload)
      ImageMeta(r.doc_id, fmt, w, h)
    })
  }

  /** Feature extraction: decode (stubbed) then reduce to a fixed-size
    * float vector — here a `dim`-bucket byte histogram, normalized. Runs as
    * one pass per partition; decoder state would be initialized once per
    * partition in a real implementation.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real decoder/codec init would happen once, here
      rows.map { r =>
        val decoded = decodeStub(r.payload)
        val hist = new Array[Float](dim)
        decoded.foreach(b => hist((b & 0xff) % dim) += 1f)
        val n = math.max(decoded.length, 1).toFloat
        MediaFeatures(r.doc_id, r.mime, decoded.length, hist.map(_ / n))
      }
    }
  }

  /** STUB: image resize — a real implementation decodes, resamples to
    * (w, h), re-encodes. The fake deterministically truncates/pads the
    * payload to w*h bytes so output schema and sizes are exercised.
    */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    val target = w * h
    media.mapPartitions(_.map { r =>
      val out = java.util.Arrays.copyOf(decodeStub(r.payload), target)
      r.copy(n_bytes = target, payload = out)
    })
  }

  /** STUB: video frame sampling — a real implementation demuxes and grabs
    * every `stride`-th frame. The fake slices the payload at a fixed
    * stride, one output record per "frame", preserving the 1→N exploding
    * shape a real frame sampler has.
    */
  def frameSampleStub(media: Dataset[MediaRecord], stride: Int, frameBytes: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val decoded = decodeStub(r.payload)
      val frames = decoded.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
      frames.map { case (bytes, i) => (r.doc_id, i, bytes) }.toSeq
    }.toDF("doc_id", "frame_idx", "frame_payload")
  }

  /** Typed view of [[packDocuments]] output. */
  def asMediaDataset(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.as[MediaRecord]
  }
}
