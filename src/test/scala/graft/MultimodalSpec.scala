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
