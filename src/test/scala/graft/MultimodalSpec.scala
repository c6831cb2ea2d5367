package graft

import graft.operators.Multimodal

/** Multimodal pipeline: encode/decode/resize are REAL codec work via
  * javax.imageio — the specs assert on genuine PNG/BMP magic bytes and
  * decoded raster dimensions, not stub arithmetic.
  */
class MultimodalSpec extends SparkSpec {

  test("encodeMedia emits real PNG/BMP bytes; decodeMedia reads real dims") {
    val payloads = Multimodal.encodeMedia(spark, sfDir)
    val rows = payloads.collect()
    assert(rows.length == 500)
    // real codec magic numbers
    rows.foreach { p =>
      if (p.fmt == "png")
        assert(p.payload.take(4).sameElements(Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)),
          s"doc ${p.doc_id}: not a PNG header")
      else
        assert(p.payload(0) == 'B'.toByte && p.payload(1) == 'M'.toByte,
          s"doc ${p.doc_id}: not a BMP header")
    }
    val metas = Multimodal.decodeMedia(payloads).collect()
    assert(metas.length == 500)
    metas.foreach { m =>
      // decoded dims must equal what encodeMedia rendered
      assert(m.width == 16 + (m.doc_id % 48).toInt, s"doc ${m.doc_id} width")
      assert(m.height == 16 + (m.doc_id % 32).toInt, s"doc ${m.doc_id} height")
      assert(m.byte_len > 0 && m.n_frames == 1)
      assert(m.decoder == (if (m.doc_id % 2 == 0) "imageio-png" else "imageio-bmp"))
    }
    // PNG (lossless) and BMP (raw) round-trip the raster exactly, so the
    // pixel hash is deterministic end-to-end
    val again = Multimodal.decodeMedia(Multimodal.encodeMedia(spark, sfDir)).collect()
    assert(metas.sortBy(_.doc_id).map(_.pixel_hash).toSeq ==
      again.sortBy(_.doc_id).map(_.pixel_hash).toSeq)
  }

  test("resizeMedia resamples real rasters to the target dims") {
    val resized = Multimodal.resizeMedia(Multimodal.encodeMedia(spark, sfDir), 224, 224)
    val metas = Multimodal.decodeMedia(resized).collect()
    assert(metas.length == 500)
    assert(metas.forall(m => m.width == 224 && m.height == 224))
    // deterministic: nearest-neighbor resample of a deterministic raster
    val again = Multimodal.decodeMedia(
      Multimodal.resizeMedia(Multimodal.encodeMedia(spark, sfDir), 224, 224)).collect()
    assert(metas.sortBy(_.doc_id).map(_.pixel_hash).toSeq ==
      again.sortBy(_.doc_id).map(_.pixel_hash).toSeq)
  }

  test("full media pipeline: encode -> resize -> decode -> frames -> features") {
    val decoded = Multimodal.decodeMedia(
      Multimodal.resizeMedia(Multimodal.encodeMedia(spark, sfDir), 64, 64))
    val frames = Multimodal.frameSample(decoded)
    val feats = Multimodal.featureExtractStub(frames)

    val nFrames = frames.count()
    val expFrames = decoded.collect().map(_.n_frames.toLong).sum
    assert(nFrames == expFrames, s"$nFrames frames vs expected $expFrames")
    assert(frames.collect().forall(f => f.width == 64 && f.height == 64))

    val fRows = feats.collect()
    assert(fRows.length == nFrames)
    assert(fRows.forall(f => f.embedding.length == 8 &&
      f.embedding.forall(v => v >= -1f && v <= 1f)))
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
