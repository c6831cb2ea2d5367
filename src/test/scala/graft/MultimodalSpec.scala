package graft

import graft.operators.Multimodal

/** Multimodal plumbing: the stubbed per-partition decoder must be
  * deterministic in the payload bytes and preserve the typed schema.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeStub: typed mapPartitions pipeline over binary payloads") {
    val ds = Multimodal.decodeStub(spark, sfDir)
    val rows = ds.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.decoder == "stub-v0"))
    assert(rows.forall(r => r.byte_len > 0 && r.width >= 16 && r.n_frames >= 1))
    // deterministic: same payload → same fake dims
    val again = Multimodal.decodeStub(spark, sfDir).collect()
    assert(rows.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("full media pipeline: decode -> resize -> frame-sample -> features") {
    val decoded = Multimodal.decodeStub(spark, sfDir)
    val resized = Multimodal.resizeStub(decoded, 224, 224)
    val frames = Multimodal.frameSampleStub(resized)
    val feats = Multimodal.featureExtractStub(frames)

    val nFrames = frames.count()
    val expFrames = decoded.collect().map(_.n_frames.toLong).sum
    assert(nFrames == expFrames, s"$nFrames frames vs expected $expFrames")
    assert(frames.collect().forall(f => f.width == 224 && f.height == 224))

    val fRows = feats.collect()
    assert(fRows.length == nFrames)
    assert(fRows.forall(f => f.embedding.length == 8 &&
      f.embedding.forall(v => v >= -1f && v <= 1f)))
    // deterministic end-to-end
    val again = Multimodal.featureExtractStub(
      Multimodal.frameSampleStub(Multimodal.resizeStub(
        Multimodal.decodeStub(spark, sfDir), 224, 224))).collect()
    assert(fRows.sortBy(r => (r.doc_id, r.frame_idx)).map(_.embedding.toSeq).toSeq ==
      again.sortBy(r => (r.doc_id, r.frame_idx)).map(_.embedding.toSeq).toSeq)
  }

  test("binary metadata matches text-derived expectations") {
    val df = Multimodal.multimodalMeta(spark, sfDir)
    val r = df.filter(org.apache.spark.sql.functions.col("doc_id") === 0).collect()(0)
    // ascii text: byte_len == char length
    val txt = graft.sources.Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0)
      .select("text").collect()(0).getString(0)
    assert(r.getAs[Long]("byte_len") == txt.length.toLong)
    assert(r.getAs[String]("magic_hex").length == 8) // 4 bytes → 8 hex chars
  }
}
