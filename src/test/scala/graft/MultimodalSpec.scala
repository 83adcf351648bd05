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
}
