package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")

  test("packDocuments produces binary payload + metadata") {
    val packed = Multimodal.packDocuments(docs)
    assert(packed.columns.toSeq == Seq("doc_id", "mime", "n_bytes", "payload"))
    val r = packed.filter($"doc_id" === 1L).collect()(0)
    assert(r.getAs[Int]("n_bytes") == 11)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("extractFeatures emits normalized fixed-size vectors") {
    val feats = Multimodal.extractFeatures(
      Multimodal.asMediaDataset(Multimodal.packDocuments(docs)), dim = 16).collect()
    assert(feats.forall(_.features.length == 16))
    feats.foreach(f => assert(math.abs(f.features.sum - 1f) < 1e-5))
    // n_bytes reports the DECODED byte count (payload length under the stub)
    assert(feats.map(f => f.doc_id -> f.n_bytes).toMap == Map(1L -> 11, 2L -> 3))
  }

  test("imageMeta decodes real PNG/GIF/BMP/JPEG headers (no codec library)") {
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ Array((w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(-h) // negative height = top-down rows
      b.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(30)
      b.put(0xff.toByte).put(0xd8.toByte)                    // SOI
      b.put(0xff.toByte).put(0xe0.toByte).putShort(5).put(Array[Byte](1, 2, 3)) // APP0 skip
      b.put(0xff.toByte).put(0xc0.toByte).putShort(8)        // SOF0
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.array()
    }
    // JPEG with legal 0xFF fill bytes between segments (padding before SOF)
    def jpegPadded(w: Int, h: Int): Array[Byte] = {
      val base = jpeg(w, h)
      base.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ base.drop(2)
    }
    // OS/2 BITMAPCOREHEADER: 12-byte DIB header, unsigned 16-bit dims
    def bmpCore(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(26)
      b.putInt(12).putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    // adversarial BMP carrying Int.MinValue as height — must degrade
    def bmpEvil(): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(54)
      b.putInt(40).putInt(10).putInt(Int.MinValue)
      b.array()
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", 24, png(640, 480)),
      Multimodal.MediaRecord(2L, "image/gif", 10, gif(320, 200)),
      Multimodal.MediaRecord(3L, "image/bmp", 26, bmp(800, 600)),
      Multimodal.MediaRecord(4L, "image/jpeg", 30, jpeg(1024, 768)),
      Multimodal.MediaRecord(5L, "application/octet-stream", 3, Array[Byte](1, 2, 3)),
      Multimodal.MediaRecord(6L, "image/jpeg", 32, jpegPadded(640, 400)),
      Multimodal.MediaRecord(7L, "image/bmp", 26, bmpCore(100, 50)),
      Multimodal.MediaRecord(8L, "image/bmp", 26, bmpEvil()))
      .toDS()
    val meta = Multimodal.imageMeta(media).collect()
      .map(m => m.doc_id -> ((m.format, m.width, m.height))).toMap
    assert(meta(1L) == (("png", 640, 480)))
    assert(meta(2L) == (("gif", 320, 200)))
    assert(meta(3L) == (("bmp", 800, 600))) // top-down height normalized
    assert(meta(4L) == (("jpeg", 1024, 768)))
    assert(meta(5L) == (("unknown", -1, -1))) // garbage degrades, not throws
    assert(meta(6L) == (("jpeg", 640, 400))) // fill bytes skipped, not misparsed
    assert(meta(7L) == (("bmp", 100, 50)))   // OS/2 core header dims
    assert(meta(8L) == (("unknown", -1, -1))) // |Int.MinValue| is not a height
  }

  test("resizeStub truncates/pads payloads to the target size") {
    val out = Multimodal.resizeStub(
      Multimodal.asMediaDataset(Multimodal.packDocuments(docs)), 2, 3).collect()
    assert(out.forall(_.payload.length == 6))
    assert(out.forall(_.n_bytes == 6))
  }

  test("frameSampleStub explodes payloads into strided frames") {
    val frames = Multimodal.frameSampleStub(
      Multimodal.asMediaDataset(Multimodal.packDocuments(docs)),
      stride = 2, frameBytes = 4)
    // doc 1: 11 bytes -> frames 0,1,2 -> stride 2 keeps 0,2
    val d1 = frames.filter($"doc_id" === 1L).select("frame_idx")
      .as[Int].collect().sorted.toSeq
    assert(d1 == Seq(0, 2))
  }

  /** Build a valid uncompressed 24-bit BMP: rows of (r,g,b) pixels given
    * TOP-DOWN; `bottomUp` stores them in the file bottom-up with positive
    * height (the common layout), else top-down with negative height.
    */
  private def bmp(rows: Seq[Seq[(Int, Int, Int)]], bottomUp: Boolean): Array[Byte] = {
    val h = rows.length; val w = rows.head.length
    val rowSize = ((24 * w + 31) / 32) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
      .putInt(0).putInt(54)                                  // pixel offset
    buf.putInt(40).putInt(w).putInt(if (bottomUp) h else -h) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(rowSize * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val fileRows = if (bottomUp) rows.reverse else rows
    fileRows.foreach { row =>
      row.foreach { case (r, g, b) =>
        buf.put(b.toByte).put(g.toByte).put(r.toByte)        // BGR on disk
      }
      (0 until rowSize - 3 * w).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  test("decodeBmp24: real pixel decode — padding, bottom-up AND top-down orders") {
    // 3x2 image (odd width forces 3 pad bytes per row)
    val topDownRows = Seq(
      Seq((255, 0, 0), (0, 255, 0), (0, 0, 255)),
      Seq((10, 20, 30), (40, 50, 60), (70, 80, 90)))
    for (bottomUp <- Seq(true, false)) {
      val Some((w, h, bgr)) = Multimodal.decodeBmp24(bmp(topDownRows, bottomUp))
      assert(w == 3 && h == 2)
      // first decoded pixel is always the image's TOP-LEFT, regardless of layout
      assert((bgr(2) & 0xff, bgr(1) & 0xff, bgr(0) & 0xff) == ((255, 0, 0)))
      assert((bgr(15 + 2) & 0xff, bgr(15 + 1) & 0xff, bgr(15) & 0xff) == ((70, 80, 90)))
    }
  }

  test("bmpStats computes exact channel means; non-BMP payloads are dropped") {
    val img = bmp(Seq(Seq((100, 0, 0), (200, 0, 0))), bottomUp = true)
    val media = Seq(
        Multimodal.MediaRecord(1L, "image/bmp", img.length, img),
        Multimodal.MediaRecord(2L, "text/plain", 5, "hello".getBytes),
        Multimodal.MediaRecord(3L, "image/bmp", 10, Array.fill(10)(0x42.toByte)))
      .toDS()
    val out = Multimodal.bmpStats(media).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
    assert(out.head.mean_r == 150f && out.head.mean_g == 0f && out.head.mean_b == 0f)
  }

  /** Canonical PCM WAV header bytes, optionally with a LIST chunk wedged
    * between fmt and data (common in tagged files — exercises chunk walk).
    */
  private def wav(channels: Int, rate: Int, bits: Int, nSamples: Int,
                  listChunk: Boolean = false): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val listBytes = if (listChunk) 12 else 0
    val buf = java.nio.ByteBuffer.allocate(44 + listBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + listBytes + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    if (listChunk) buf.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    buf.put("data".getBytes).putInt(dataSize)
    buf.array()
  }

  test("sniffWav parses canonical and LIST-bearing headers; rejects hostile input") {
    assert(Multimodal.sniffWav(wav(2, 44100, 16, 1000)) == Some((2, 44100, 16, 4000L)))
    assert(Multimodal.sniffWav(wav(1, 8000, 16, 50, listChunk = true)) ==
      Some((1, 8000, 16, 100L)))
    assert(Multimodal.sniffWav(wav(2, 44100, 16, 10).take(30)).isEmpty) // truncated
    val nonPcm = wav(1, 8000, 16, 10); nonPcm(20) = 3                   // IEEE float fmt
    assert(Multimodal.sniffWav(nonPcm).isEmpty)
    assert(Multimodal.sniffWav("RIFFxxxxJUNK".getBytes ++ Array.fill(40)(0.toByte)).isEmpty)
    assert(Multimodal.sniffWav(Array.empty[Byte]).isEmpty)
    // hostile chunk size near Int.MaxValue must not overflow the cursor
    val overflow = wav(1, 8000, 16, 10)
    overflow(16) = 0xf0.toByte; overflow(17) = 0xff.toByte
    overflow(18) = 0xff.toByte; overflow(19) = 0x7f.toByte // fmt size = 0x7ffffff0
    assert(Multimodal.sniffWav(overflow).isEmpty)
  }

  test("audioMeta derives samples and duration, drops undecodable blobs") {
    val good = wav(2, 16000, 16, 8000) // 8000 samples @16k = 500 ms
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio/wav", good.length, good),
        Multimodal.MediaRecord(2L, "text/plain", 3, "nah".getBytes))
      .toDS()
    val out = Multimodal.audioMeta(media).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
    assert(out.head == Multimodal.AudioMeta(1L, 2, 16000, 16, 8000L, 500L))
  }

  test("decodeBmp24 rejects truncation, wrong bit depth, compression, hostile dims") {
    val good = bmp(Seq(Seq((1, 2, 3))), bottomUp = true)
    assert(Multimodal.decodeBmp24(good).isDefined)
    assert(Multimodal.decodeBmp24(good.take(40)).isEmpty)      // truncated header
    assert(Multimodal.decodeBmp24(good.dropRight(1)).isEmpty)  // truncated pixels
    val wrongDepth = good.clone(); wrongDepth(28) = 8          // 8-bit palette
    assert(Multimodal.decodeBmp24(wrongDepth).isEmpty)
    val compressed = good.clone(); compressed(30) = 1          // BI_RLE8
    assert(Multimodal.decodeBmp24(compressed).isEmpty)
    val hugeDims = good.clone()
    // width = 0x40000000: rowSize overflows any plausible buffer — reject
    hugeDims(18) = 0; hugeDims(19) = 0; hugeDims(20) = 0; hugeDims(21) = 0x40
    assert(Multimodal.decodeBmp24(hugeDims).isEmpty)
  }
}
