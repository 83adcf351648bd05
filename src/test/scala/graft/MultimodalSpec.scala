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

  test("resize: real decode -> nearest-neighbor -> PNG re-encode round trip") {
    // 4x1 image with distinct pixels; resize to 2x1 picks source pixels
    // floor((x+0.5)*4/2) = 1 and 3 (pixel-center mapping)
    val rgb = Array[Int](
      10, 11, 12, /**/ 20, 21, 22, /**/ 30, 31, 32, /**/ 40, 41, 42
    ).map(_.toByte)
    val src = Multimodal.encodePng(4, 1, rgb)
    val media = Seq(
        Multimodal.MediaRecord(1L, "image/png", src.length, src),
        Multimodal.MediaRecord(2L, "text/plain", 3, "nah".getBytes))
      .toDS()
    val out = Multimodal.resize(media, 2, 1).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L)) // undecodable drops
    val Some((w, h, px)) = Multimodal.decodeImage(out.head.payload)
    assert(w == 2 && h == 1)
    assert(px.map(_ & 0xff).toSeq == Seq(20, 21, 22, 40, 41, 42))
  }

  test("imageDHash: hand-computed bits, dHash locality, resize path") {
    // 9x8 gradient brightening left-to-right: every adjacent comparison is
    // gray(x+1) > gray(x), so all 64 bits set -> hi = lo = 0xffffffff
    val grad = Array.tabulate(72 * 3)(k => ((k / 3) % 9 * 20).toByte)
    val png = Multimodal.encodePng(9, 8, grad)
    val media = Seq(Multimodal.MediaRecord(1L, "image/png", png.length, png)).toDS()
    val h = Multimodal.imageDHash(media).collect().head
    assert(h.width == 9 && h.height == 8)
    assert(h.dhash_hi == 0xffffffffL && h.dhash_lo == 0xffffffffL)

    // dHash locality: flipping ONE pixel changes at most the 2 comparisons
    // it participates in (this is the property that makes hamming an edit
    // metric and the chunk join complete over near-dups)
    val pert = grad.clone(); pert(3 * 40) = (pert(3 * 40) ^ 0x80).toByte
    val png2 = Multimodal.encodePng(9, 8, pert)
    val media2 = Seq(
      Multimodal.MediaRecord(1L, "image/png", png.length, png),
      Multimodal.MediaRecord(2L, "image/png", png2.length, png2)).toDS()
    val hs = Multimodal.imageDHash(media2).collect().sortBy(_.doc_id)
    val ham = java.lang.Long.bitCount(hs(0).dhash_hi ^ hs(1).dhash_hi) +
      java.lang.Long.bitCount(hs(0).dhash_lo ^ hs(1).dhash_lo)
    assert(ham >= 1 && ham <= 2)

    // non-canonical dims route through resizeRgb to the 9x8 grid: an 18x8
    // horizontal gradient downsamples to a strictly increasing 9-wide row,
    // reproducing the all-ones hash; undecodable payloads drop
    val big = Array.tabulate(18 * 8 * 3)(k => ((k / 3) % 18 * 10).toByte)
    val png3 = Multimodal.encodePng(18, 8, big)
    val media3 = Seq(
      Multimodal.MediaRecord(3L, "image/png", png3.length, png3),
      Multimodal.MediaRecord(4L, "text/plain", 3, "nah".getBytes)).toDS()
    val h3 = Multimodal.imageDHash(media3).collect()
    assert(h3.map(_.doc_id).toSeq == Seq(3L))
    assert(h3.head.width == 18 && h3.head.height == 8)
    assert(h3.head.dhash_hi == 0xffffffffL && h3.head.dhash_lo == 0xffffffffL)
  }

  test("decodeImage: real PNG/JPEG/GIF decode via ImageIO, BMP via bytes") {
    val rgb = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9).map(_.toByte)
    // PNG is lossless: pixels round-trip exactly through the real codec
    val Some((pw, ph, p)) = Multimodal.decodeImage(Multimodal.encodePng(2, 2, rgb))
    assert(pw == 2 && ph == 2 && p.toSeq == rgb.toSeq)
    // JPEG through the real ImageIO codec: lossy, so verify a solid-gray
    // image decodes to dimensions + near-the-input pixel values
    val gray = Array.fill(8 * 8 * 3)(128.toByte)
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val Some((jw, jh, jp)) = Multimodal.decodeImage(baos.toByteArray)
    assert(jw == 8 && jh == 8)
    jp.zip(gray).foreach { case (a, b) => assert(math.abs((a & 0xff) - (b & 0xff)) <= 4) }
    // BMP routes through decodeBmp24 and arrives as RGB (swizzled from BGR)
    val bmpBytes = bmp(Seq(Seq((255, 0, 0), (0, 255, 0))), bottomUp = true)
    val Some((bw, bh, bp)) = Multimodal.decodeImage(bmpBytes)
    assert(bw == 2 && bh == 1)
    assert(bp.map(_ & 0xff).toSeq == Seq(255, 0, 0, 0, 255, 0))
    // garbage degrades
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("imageStats: exact means over real decoded pixels, mixed formats") {
    val png = Multimodal.encodePng(2, 1, Array[Int](100, 0, 0, 200, 0, 0).map(_.toByte))
    val bmpB = bmp(Seq(Seq((0, 50, 0), (0, 150, 0))), bottomUp = false)
    val media = Seq(
        Multimodal.MediaRecord(1L, "image/png", png.length, png),
        Multimodal.MediaRecord(2L, "image/bmp", bmpB.length, bmpB),
        Multimodal.MediaRecord(3L, "text/plain", 3, "bad".getBytes))
      .toDS()
    val out = Multimodal.imageStats(media).collect()
      .map(s => s.doc_id -> s).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).format == "png" && out(1L).mean_r == 150f && out(1L).mean_g == 0f)
    assert(out(2L).format == "bmp" && out(2L).mean_g == 100f && out(2L).mean_r == 0f)
  }

  /** Build a minimal RIFF/AVI: LIST hdrl{avih(w,h)} + LIST movi with one
    * `00db` chunk per frame raster (caller supplies row-padded BGR bytes).
    */
  private def avi(w: Int, h: Int, frames: Seq[Array[Byte]],
                  frameTag: String = "00db"): Array[Byte] = {
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + 68 + 8 + moviSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(4 + 76 + 8 + moviSize).put("AVI ".getBytes)
    buf.put("LIST".getBytes).putInt(68).put("hdrl".getBytes)
    buf.put("avih".getBytes).putInt(56)
      .putInt(40000).putInt(0).putInt(0).putInt(0)   // usec/frame, maxbps, pad, flags
      .putInt(frames.size).putInt(0).putInt(1).putInt(0) // totalframes, initial, streams, bufsize
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put("LIST".getBytes).putInt(moviSize).put("movi".getBytes)
    frames.foreach { f =>
      buf.put(frameTag.getBytes).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  test("frameSample: REAL AVI demux — strided frames, exact per-frame means") {
    // 2x1 frames: rowSize = 8 (6 pixel bytes + 2 pad); disk order is BGR
    def frame(b0: Int, g0: Int, r0: Int, b1: Int, g1: Int, r1: Int) =
      Array(b0, g0, r0, b1, g1, r1, 0, 0).map(_.toByte)
    val payload = avi(2, 1, Seq(
      frame(10, 20, 30, 50, 60, 70),    // frame 0: means b=30 g=40 r=50
      frame(0, 0, 0, 0, 0, 0),          // frame 1: skipped by stride 2
      frame(100, 110, 120, 140, 150, 160))) // frame 2: b=120 g=130 r=140
    val media = Seq(Multimodal.MediaRecord(7L, "video/avi", payload.length, payload))
      .toDS()
    val out = Multimodal.frameSample(media, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(out(0).width == 2 && out(0).height == 1)
    assert(out(0).mean_r == 50f && out(0).mean_g == 40f && out(0).mean_b == 30f)
    assert(out(1).mean_r == 140f && out(1).mean_g == 130f && out(1).mean_b == 120f)
  }

  test("frameDelta: hand-computed SAD, threshold edge, one row per pair") {
    def frame(b0: Int, g0: Int, r0: Int, b1: Int, g1: Int, r1: Int) =
      Array(b0, g0, r0, b1, g1, r1, 0, 0).map(_.toByte)
    val payload = avi(2, 1, Seq(
      frame(10, 20, 30, 50, 60, 70),
      frame(10, 20, 30, 50, 60, 70),      // identical -> sad 0
      frame(20, 20, 30, 50, 60, 75),      // |10|+0+0+0+0+|5| = 15
      frame(0, 255, 30, 50, 60, 75)))     // |20|+|235| = 255
    val media = Seq(Multimodal.MediaRecord(7L, "video/avi", payload.length, payload))
      .toDS()
    val out = Multimodal.frameDelta(media, cutThreshold = 15L)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(1, 2, 3)) // k frames -> k-1 rows
    assert(out.map(_.sad).toSeq == Seq(0L, 15L, 255L))
    // threshold is >=: the sad-15 row IS a cut at threshold 15
    assert(out.map(_.is_cut).toSeq == Seq(false, true, true))
    // undecodable payloads drop wholesale
    val junk = Seq(Multimodal.MediaRecord(8L, "video/avi", 4, "junk".getBytes)).toDS()
    assert(Multimodal.frameDelta(junk, 1L).collect().isEmpty)
  }

  test("frameSample: MJPG 00dc frames decode via ImageIO, near source colors") {
    // three 2x2 solid-color frames with distinct dominant channels; JPEG is
    // lossy, so structure is exact and pixel means are tolerance-checked
    def solid(r: Int, g: Int, b: Int) =
      Array.tabulate(12)(k => Seq(r, g, b)(k % 3).toByte)
    val colors = Seq((200, 30, 30), (30, 200, 30), (30, 30, 200))
    val payload = Multimodal.encodeAviMjpg(2, 2,
      colors.map { case (r, g, b) => Multimodal.encodeJpeg(2, 2, solid(r, g, b)) })
    val media = Seq(Multimodal.MediaRecord(9L, "video/avi", payload.length, payload))
      .toDS()
    val out = Multimodal.frameSample(media, stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(out.forall(f => f.width == 2 && f.height == 2))
    out.zip(colors).foreach { case (f, (r, g, b)) =>
      assert(math.abs(f.mean_r - r) <= 8, s"frame ${f.frame_idx} mean_r ${f.mean_r} vs $r")
      assert(math.abs(f.mean_g - g) <= 8, s"frame ${f.frame_idx} mean_g ${f.mean_g} vs $g")
      assert(math.abs(f.mean_b - b) <= 8, s"frame ${f.frame_idx} mean_b ${f.mean_b} vs $b")
    }
  }

  test("demuxAvi MJPG: non-JPEG 00dc and dim-mismatched JPEG reject the payload") {
    val jpeg2x2 = Multimodal.encodeJpeg(2, 2, Array.fill(12)(100.toByte))
    // a valid JPEG frame mixed with a non-JPEG 00dc chunk: whole payload out
    assert(Multimodal.demuxAvi(avi(2, 2, Seq(jpeg2x2, Array.fill(8)(1.toByte)),
      frameTag = "00dc")).isEmpty)
    // JPEG decodes but its dims disagree with the avih header: reject
    assert(Multimodal.demuxAvi(avi(4, 4, Seq(jpeg2x2), frameTag = "00dc")).isEmpty)
    // the happy path for the same builder: dims agree -> one decoded frame
    val ok = Multimodal.demuxAvi(avi(2, 2, Seq(jpeg2x2), frameTag = "00dc"))
    assert(ok.nonEmpty && ok.get._3.length == 1 && ok.get._3.head.length == 12)
  }

  test("demuxAvi rejects compressed, truncated, and hostile payloads cleanly") {
    val raster = Array.fill(8)(1.toByte)
    // non-JPEG compressed frames (00dc with a real codec) are rejected, not faked
    assert(Multimodal.demuxAvi(avi(2, 1, Seq(raster), frameTag = "00dc")).isEmpty)
    // a frame smaller than the raster drops the whole payload
    assert(Multimodal.demuxAvi(avi(2, 1, Seq(Array[Byte](1, 2, 3)))).isEmpty)
    // truncation anywhere degrades to None, never throws
    val good = avi(2, 1, Seq(raster))
    (1 until good.length by 7).foreach { cut =>
      assert(Multimodal.demuxAvi(good.take(cut)).isEmpty, s"cut=$cut must degrade")
    }
    // non-AVI RIFF and garbage
    assert(Multimodal.demuxAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.demuxAvi(Array.fill(64)(0x41.toByte)).isEmpty)
    // hostile chunk size near Int.MaxValue must not wrap the cursor
    val hostile = good.clone()
    hostile(16) = 0xff.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0x7f.toByte
    assert(Multimodal.demuxAvi(hostile).isEmpty)
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

  test("sniffWav: hostile bit depths degrade; data-before-fmt order parses") {
    // bits = 4 (mono): bytes-per-frame would be zero -> audioMeta would
    // divide by zero; the sniffer must reject at parse time
    for (bits <- Seq(0, 4, 12)) {
      val bad = wav(1, 8000, 16, 10)
      bad(34) = bits.toByte; bad(35) = 0 // fmt bits field
      assert(Multimodal.sniffWav(bad).isEmpty, s"bits=$bits must degrade")
    }
    // legal-but-unusual chunk order: data chunk (empty) precedes fmt
    val buf = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    buf.put("data".getBytes).putInt(0)
    buf.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(2).putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    assert(Multimodal.sniffWav(buf.array()) == Some((2, 44100, 16, 0L)))
    // hostile: channels * bits overflow-adjacent values still reject cleanly
    val mono4 = wav(1, 8000, 16, 10); mono4(22) = 0 // channels = 0
    assert(Multimodal.sniffWav(mono4).isEmpty)
  }

  /** Full PCM WAV with real sample data: 16-bit signed little-endian. */
  private def wavPcm(channels: Int, rate: Int, samples: Seq[Int]): Array[Byte] = {
    val dataSize = samples.length * 2
    val blockAlign = channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
    buf.put("data".getBytes).putInt(dataSize)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  test("decodeWavPcm: real sample decode via javax.sound, signed round trip") {
    val samples = Seq(0, 1, -1, 32767, -32768, 12345, -12345)
    val Some((c, r, bits, out)) = Multimodal.decodeWavPcm(wavPcm(1, 8000, samples))
    assert(c == 1 && r == 8000 && bits == 16)
    assert(out.toSeq == samples)
    assert(Multimodal.decodeWavPcm("not audio".getBytes).isEmpty)
  }

  test("audioMono: truncated channel mean, mono pass-through, garbage drops") {
    val stereo = wavPcm(2, 8000, Seq(10, 20, -7, -8, 5, -4)) // 3 frames
    val mono = wavPcm(1, 8000, Seq(3, -9, 12))
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio/wav", stereo.length, stereo),
        Multimodal.MediaRecord(2L, "audio/wav", mono.length, mono),
        Multimodal.MediaRecord(3L, "text/plain", 3, "nah".getBytes))
      .toDS()
    val out = Multimodal.audioMono(media).collect().map(s => s.doc_id -> s).toMap
    assert(out.keySet == Set(1L, 2L))
    // frames: (10+20)/2=15, (-7-8)/2=-7 (truncation, not floor), (5-4)/2=0
    val s = out(1L)
    assert(s.channels == 2 && s.n_frames == 3L)
    assert(s.mono_sum == 15L - 7L + 0L && s.mono_min == -7 && s.mono_max == 15)
    val m = out(2L)
    assert(m.channels == 1 && m.mono_sum == 6L && m.mono_min == -9 && m.mono_max == 12)
  }

  test("imagePatches: hand-computed sums on a 4x4, edge columns truncate on 5x4") {
    // 4x4 image, pixel (x, y) = (r, g, b) = (x+4y, 2x, 3y)
    def rgb(w: Int, h: Int): Array[Byte] = {
      val a = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        a((y * w + x) * 3) = (x + 4 * y).toByte
        a((y * w + x) * 3 + 1) = (2 * x).toByte
        a((y * w + x) * 3 + 2) = (3 * y).toByte
      }
      a
    }
    val png4 = Multimodal.encodePng(4, 4, rgb(4, 4))
    val png5 = Multimodal.encodePng(5, 4, rgb(5, 4))
    val media = Seq(
        Multimodal.MediaRecord(1L, "image/png", png4.length, png4),
        Multimodal.MediaRecord(2L, "image/png", png5.length, png5))
      .toDS()
    val out = Multimodal.imagePatches(media, 2, 2).collect()
      .groupBy(_.doc_id)
    // doc 1: 2x2 grid of 2x2 patches; patch (0,0) covers (0,0),(1,0),(0,1),(1,1):
    // sum_r = 0+1+4+5 = 10, sum_g = 0+2+0+2 = 4, sum_b = 0+0+3+3 = 6
    val p00 = out(1L).find(_.patch_idx == 0).get
    assert((p00.sum_r, p00.sum_g, p00.sum_b, p00.n_px) == ((10L, 4L, 6L, 4)))
    assert(out(1L).length == 4)
    // 5x4 with 2x2 patches: x = 4 column truncates → still a 2x2 grid
    assert(out(2L).length == 4)
    assert(out(2L).forall(p => p.px < 2 && p.py < 2))
  }

  test("audioResample: hand-computed rational interpolation, negatives truncate") {
    // 1→... src 4, dst 3 over samples [0, 100, -100, 7]:
    // n_out = 3*3/4+1 = 3; i=0: pos 0 → 0
    // i=1: num=4, idx=1, rem=1 → (100*2 + (-100)*1)/3 = 100/3 = 33
    // i=2: num=8, idx=2, rem=2 → ((-100)*1 + 7*2)/3 = -86/3 = -28 (truncates)
    val w = wavPcm(1, 4, Seq(0, 100, -100, 7))
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio/wav", w.length, w),
        Multimodal.MediaRecord(2L, "audio/wav",
          wavPcm(2, 4, Seq(1, 2, 3, 4)).length, wavPcm(2, 4, Seq(1, 2, 3, 4))),
        Multimodal.MediaRecord(3L, "text/plain", 3, "nah".getBytes))
      .toDS()
    val out = Multimodal.audioResample(media, dstRate = 3).collect()
    // stereo (2) and garbage (3) drop
    assert(out.map(_.doc_id).toSeq == Seq(1L))
    val s = out.head
    assert(s.n_in == 4L && s.n_out == 3L)
    assert(s.sum_out == (0 + 33 - 28).toLong)
    assert(s.sum_sq_out == (0L + 33L * 33 + 28L * 28))
  }

  test("audioResample: dst = src is an exact pass-through") {
    val samples = Seq(5, -17, 300, -2, 9)
    val w = wavPcm(1, 8000, samples)
    val media = Seq(Multimodal.MediaRecord(1L, "audio/wav", w.length, w)).toDS()
    val s = Multimodal.audioResample(media, dstRate = 8000).collect().head
    assert(s.n_out == samples.length.toLong)
    assert(s.sum_out == samples.map(_.toLong).sum)
    assert(s.sum_sq_out == samples.map(v => v.toLong * v).sum)
  }

  test("audioStats: exact integer sums over real decoded PCM") {
    val good = wavPcm(2, 16000, Seq(10, -20, 30, -40)) // 2 frames stereo
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio/wav", good.length, good),
        Multimodal.MediaRecord(2L, "text/plain", 3, "nah".getBytes))
      .toDS()
    val out = Multimodal.audioStats(media).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
    val s = out.head
    assert(s.channels == 2 && s.sample_rate == 16000 && s.n_frames == 2L)
    assert(s.sum_amp == (10 - 20 + 30 - 40).toLong)
    assert(s.sum_sq == (100 + 400 + 900 + 1600).toLong)
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

  test("audioTrimSilence: trims both ends, keeps interior silence, mixes down") {
    val lead = wavPcm(1, 8000, Seq(10, -20, 600, 0, -700, 30))  // trim 2 + 1
    val silent = wavPcm(1, 8000, Seq(1, -2, 3))                 // all silent
    // stereo frames mix to (300+800)/2=550, (10-10)/2=0, (-900-301)/2=-600:
    // the mono MIX decides, so the quiet middle frame survives inside
    val stereo = wavPcm(2, 8000, Seq(300, 800, 10, -10, -900, -301))
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio/wav", lead.length, lead),
        Multimodal.MediaRecord(2L, "audio/wav", silent.length, silent),
        Multimodal.MediaRecord(3L, "audio/wav", stereo.length, stereo))
      .toDS()
    val out = Multimodal.audioTrimSilence(media, threshold = 500)
      .collect().map(s => s.doc_id -> s).toMap
    assert(out(1L).lead_trimmed == 2 && out(1L).tail_trimmed == 1)
    assert(out(1L).kept_frames == 3 && out(1L).kept_sum == 600L + 0 - 700)
    assert(out(2L).kept_frames == 0 && out(2L).lead_trimmed == 3 &&
      out(2L).tail_trimmed == 0)
    assert(out(3L).kept_frames == 3 && out(3L).kept_sum == 550L + 0 - 600)
  }

  test("lumaHistogram: integer luma bands over decoded pixels") {
    import Multimodal._
    // 2x1 BMP: pixel1 black (band 0), pixel2 white (band 3)
    val hdr = Array(0x42,0x4D,0x3E,0,0,0,0,0,0,0,0x36,0,0,0,
      0x28,0,0,0, 2,0,0,0, 1,0,0,0, 1,0, 24,0,
      0,0,0,0, 8,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0)
      .map(_.toByte)
    val px = Array(0,0,0, 255,255,255, 0,0).map(_.toByte)
    val media = Seq(MediaRecord(1L, "image/bmp", 62, hdr ++ px))
      .toDS()
    val out = lumaHistogram(media).collect().head
    assert(out == LumaHistogram(1L, 2, 1, 1L, 0L, 0L, 1L))
  }

  test("imageBorders: margins measured against the corner color exactly") {
    // 4x3 top-down? bmp() helper builds bottom-up rows; build via raw rows:
    // image: border color (10,20,30) frame 1px, interior pixel differs
    val b = (10, 20, 30)
    val rows = Seq(
      Seq(b, b, b, b),
      Seq(b, (99, 20, 30), (10, 20, 30), b), // one interior pixel differs
      Seq(b, b, b, b))
    val img = bmp(rows, bottomUp = true)
    val media = Seq(Multimodal.MediaRecord(1L, "image/bmp", img.length, img))
      .toDS()
    val out = Multimodal.imageBorders(media).collect().head
    // row 1 breaks uniformity at x=1: top=1, bottom=1, left=1;
    // col 2 IS corner-colored everywhere → right margin reaches 2
    assert(out == Multimodal.ImageBorders(1L, 4, 3, 1, 1, 1, 2))
  }

  test("imageBorders: fully uniform image reports full-size margins") {
    val b = (200, 200, 200)
    val img = bmp(Seq(Seq(b, b), Seq(b, b)), bottomUp = true)
    val media = Seq(Multimodal.MediaRecord(1L, "image/bmp", img.length, img))
      .toDS()
    val out = Multimodal.imageBorders(media).collect().head
    assert(out == Multimodal.ImageBorders(1L, 2, 2, 2, 2, 2, 2))
  }

  test("audioClipping: rail samples count, threshold inclusive") {
    val samples = Seq(1000, -1000, 999, 0, -1001, 500)
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => pcm.putShort(s.toShort))
    val payload = wav(1, 8000, 16, samples.length) ++ pcm.array()
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio/wav", payload.length, payload))
      .toDS()
    val out = Multimodal.audioClipping(media, threshold = 1000).collect()
    assert(out.toSeq == Seq(Multimodal.AudioClipping(1L, 6, 3L, 500000L)))
  }

  test("sceneStats: frames = deltas + 1, scenes = cuts + 1, exact mean") {
    val deltas = Seq(
      (1L, 1, 100L, false), (1L, 2, 500L, true), (1L, 3, 90L, false),
      (2L, 1, 50L, false)
    ).toDF("doc_id", "frame_idx", "sad", "is_cut")
    val out = Multimodal.sceneStats(deltas)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // clip 1: 4 frames, 1 cut → 2 scenes, mean 2000 milli-frames
    assert(out == Seq(
      (1L, 4L, 1L, 2L, 2000L, 500L),
      (2L, 2L, 0L, 1L, 2000L, 50L)))
  }

  test("audioZeroCrossing: strict sign changes only; zeros never cross") {
    // samples: 100,-50,30,0,-10,20 → pairs (+,-)(-,+)(+,0)(0,-)(-,+):
    // crossings at 1,2,5 → 3 of 5 pairs = 600000 ppm
    val samples = Seq(100, -50, 30, 0, -10, 20)
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => pcm.putShort(s.toShort))
    val payload = wav(1, 8000, 16, samples.length) ++ pcm.array()
    val media = Seq(
        Multimodal.MediaRecord(1L, "audio/wav", payload.length, payload),
        Multimodal.MediaRecord(2L, "audio/wav", 3, Array[Byte](1, 2, 3)))
      .toDS()
    val out = Multimodal.audioZeroCrossing(media).collect()
    assert(out.toSeq == Seq(Multimodal.AudioZcr(1L, 6, 3L, 600000L)))
  }

  test("audioSegments: consecutive active windows merge, gaps split") {
    // windowSize 4, threshold 100: windows [loud, loud, quiet, loud]
    val samples = Seq.fill(4)(50) ++ Seq.fill(4)(60) ++
      Seq.fill(4)(1) ++ Seq.fill(4)(99)
    val payload = wavPcm(1, 8000, samples)
    val media = Seq(
        Multimodal.MediaRecord(7L, "audio/wav", payload.length, payload))
      .toDS()
    val out = Multimodal.audioSegments(media, windowSize = 4,
        lowThreshold = 100L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (7L, 1L, 0L, 1L, 2L, 440L),   // windows 0-1: 4·50 + 4·60
      (7L, 2L, 3L, 3L, 1L, 396L)))  // window 3: 4·99; window 2 is quiet
  }

  test("imageDims: header-only sniff, unsniffable payloads drop") {
    def hdrBmp(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](26)
      b(0) = 'B'; b(1) = 'M'
      def le32(off: Int, v: Int): Unit = (0 until 4).foreach(i =>
        b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      le32(2, 26); le32(10, 26); le32(14, 40); le32(18, w); le32(22, h)
      b
    }
    val media = Seq(
        Multimodal.MediaRecord(1L, "image/bmp", 26, hdrBmp(1920, 1080)),
        Multimodal.MediaRecord(2L, "image/bmp", 26, hdrBmp(640, 640)),
        Multimodal.MediaRecord(3L, "application/junk", 3,
          Array[Byte](9, 9, 9)))
      .toDS()
    val out = Multimodal.imageDims(media).collect().toSet
    assert(out == Set(Multimodal.ImageDims(1L, "bmp", 1920, 1080),
      Multimodal.ImageDims(2L, "bmp", 640, 640)))
  }

  test("aspectBuckets: nearest ratio wins, ties go to the smaller id") {
    val dims = Seq(
      (1L, 1920, 1080),  // 16:9 exactly
      (2L, 640, 640),    // 1:1 exactly
      (3L, 1400, 1000),  // 1.4 → distance 66667 to 4:3 vs 100000 to 3:2
      (4L, 1000, 600)    // 5:3 ≈ 1666666 → 16:9 (111111) beats 3:2 (166666)
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.aspectBuckets(dims,
        Seq((1, 1), (4, 3), (3, 2), (16, 9), (2, 1)))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("1:1", 1000000L, 1L, 640L, 640L),
      ("4:3", 1333333L, 1L, 1400L, 1400L),
      ("16:9", 1777777L, 2L, 1000L, 1920L)))
  }
}
