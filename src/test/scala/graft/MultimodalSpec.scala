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
    val resized = Multimodal.resizeMedia(Multimodal.encodeMedia(spark, sfDir), 64, 64)
    val decoded = Multimodal.decodeMedia(resized)
    val frames = Multimodal.frameSample(decoded)
    val feats = Multimodal.featureExtract(resized)

    val nFrames = frames.count()
    val expFrames = decoded.collect().map(_.n_frames.toLong).sum
    assert(nFrames == expFrames, s"$nFrames frames vs expected $expFrames")
    assert(frames.collect().forall(f => f.width == 64 && f.height == 64))

    val fRows = feats.collect()
    assert(fRows.length == nFrames)
    // L2-normalized 8x8 luma grid: unit norm, non-negative (luma >= 0)
    assert(fRows.forall(f => f.embedding.length == 64 &&
      f.embedding.forall(v => v >= 0f && v <= 1f)))
    assert(fRows.forall { f =>
      val n = math.sqrt(f.embedding.map(v => v.toDouble * v).sum)
      math.abs(n - 1.0) < 1e-4 || n == 0.0
    })
  }

  test("luma-grid features find visual near-dups across resizes") {
    import org.apache.spark.sql.functions._
    // the SAME image at two resolutions mean-pools to nearly the same
    // grid; different images do not — the property cosine search needs
    val payloads = Multimodal.encodeMedia(spark, sfDir)
    val at64 = Multimodal.featureExtract(
      Multimodal.resizeMedia(payloads, 64, 64))
    val at96 = Multimodal.featureExtract(
      Multimodal.resizeMedia(payloads, 96, 96))
    def toMap(ds: org.apache.spark.sql.Dataset[graft.operators.Multimodal.FrameFeature]) =
      ds.collect().map(f => f.doc_id -> f.embedding.map(_.toDouble)).toMap
    val (a, b) = (toMap(at64.limit(2000)), toMap(at96.limit(2000)))
    def cos(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    val ids = a.keySet.intersect(b.keySet).toSeq.sorted.take(20)
    ids.foreach { id =>
      assert(cos(a(id), b(id)) > 0.98, s"doc $id: resize broke self-similarity")
    }
    // cross-image similarity strictly lower than self-similarity
    val others = for (i <- ids.take(5); j <- ids.take(5) if i != j) yield cos(a(i), b(j))
    val selfMin = ids.take(5).map(id => cos(a(id), b(id))).min
    assert(others.max < selfMin,
      f"cross-image cosine ${others.max}%.4f should stay below self ${selfMin}%.4f")
  }

  test("aHash banding finds each resized copy, exact hamming verifies") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // plant perceptual dups: the same images at two resolutions, copies
    // offset by +100000 — the banded join must pair original ↔ copy
    val payloads = Multimodal.encodeMedia(spark, sfDir)
    val originals = Multimodal.resizeMedia(payloads, 64, 64)
    val copies = Multimodal.resizeMedia(payloads, 96, 96)
      .map(p => p.copy(doc_id = p.doc_id + 100000L))
    val feats = Multimodal.featureExtract(originals.union(copies))
    val n = 40 // bound the all-pairs check below
    val sample = feats.filter(f => (f.doc_id % 100000L) < n)
    val pairs = Multimodal.imageNearDupPairs(sample)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every original pairs with exactly its own copy
    val found = pairs.map(p => (p._1, p._2)).toSet
    val expected = sample.collect().map(_.doc_id).filter(_ < 100000L)
      .map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(found),
      s"missing planted dup pairs: ${expected -- found}")
    // no cross-image pair survives the hamming verify
    val cross = pairs.filter { case (a, b, _) => b - a != 100000L }
    assert(cross.isEmpty, s"false positives: ${cross.toSeq}")
    // the verify bound actually binds
    assert(pairs.forall(_._3 <= Multimodal.AHashMaxHamming))
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

  test("video: real GVID containers demux without decode; stride sampling decodes every k-th frame") {
    import graft.operators.Video
    val vids = Video.encodeVideos(spark, sfDir)
    // container magic is genuine, and the demux-only probe agrees with
    // the built frame counts and byte layout
    val probed = Video.probe(vids).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_frames"), r.getAs[Long]("container_bytes"), r.getAs[Long]("frame_bytes"))).toMap
    assert(probed.size == 500)
    probed.foreach { case (doc, (n, cbytes, fbytes)) =>
      assert(n == Video.nFrames(doc), s"doc $doc frame count")
      // container = 4 magic + 4 count + n×(4 length prefix) + frames
      assert(cbytes == 8L + 4L * n + fbytes, s"doc $doc layout")
    }
    // stride-2 sampling decodes exactly frames 0, 2, ... with real dims
    val sampled = Video.sampleFrames(vids, stride = 2).collect()
    sampled.foreach { f =>
      assert(f.frame_idx % 2 == 0 && f.width == Video.W && f.height == Video.H)
    }
    val perDoc = sampled.groupBy(_.doc_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq)
    perDoc.foreach { case (doc, idxs) =>
      assert(idxs == (0 until Video.nFrames(doc) by 2), s"doc $doc sampled frames")
    }
    // gray rasters: decoded luma sum equals the closed-form pixel sum
    val f0 = sampled.find(f => f.doc_id == 0L && f.frame_idx == 0).get
    val expected = (0 until Video.W * Video.H).map(i => Video.pixel(0L, 0L, i).toLong).sum
    assert(f0.luma_sum == expected)
  }

  test("video near-dup: brightened re-encodes found by frame-hash sequence, no cross-video pairs") {
    import graft.operators.Video
    import spark.implicits._
    // the contract corpus's closed-form pixels are a LINEAR ramp (so the
    // analytic oracle can restate them) — which makes every synthetic
    // video the same pattern shifted by a constant, i.e. aHash-identical
    // by construction. Near-dup detection needs videos with distinct
    // CONTENT, so this test builds its own seeded-noise corpus.
    def makeVideo(doc: Long, n: Int): Video.VideoPayload = {
      val rnd = new scala.util.Random(doc * 7919 + 13)
      val baos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(baos)
      out.writeBytes("GVID"); out.writeInt(n)
      (0 until n).foreach { _ =>
        val img = new java.awt.image.BufferedImage(Video.W, Video.H,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var idx = 0
        while (idx < Video.W * Video.H) {
          val v = rnd.nextInt(256)
          img.setRGB(idx % Video.W, idx / Video.W, (v << 16) | (v << 8) | v)
          idx += 1
        }
        val frame = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", frame)
        out.writeInt(frame.size()); out.write(frame.toByteArray)
      }
      Video.VideoPayload(doc, baos.toByteArray)
    }
    val base = spark.createDataset((0L until 100L).map(d => makeVideo(d, 2 + (d % 3).toInt)))
    // plant near-dups: decode every frame, brighten by +2, re-encode
    // under doc_id + 1000000 — a genuine codec round trip, not a byte copy
    val brightened = base.map { v =>
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(v.container))
      val magic = new Array[Byte](4); in.readFully(magic)
      val n = in.readInt()
      val baos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(baos)
      out.writeBytes("GVID"); out.writeInt(n)
      (0 until n).foreach { _ =>
        val len = in.readInt()
        val bytes = new Array[Byte](len); in.readFully(bytes)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val dst = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var idx = 0
        while (idx < img.getWidth * img.getHeight) {
          val v0 = img.getRGB(idx % img.getWidth, idx / img.getWidth) & 0xFF
          val b = math.min(255, v0 + 2)
          dst.setRGB(idx % img.getWidth, idx / img.getWidth, (b << 16) | (b << 8) | b)
          idx += 1
        }
        val frame = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", frame)
        out.writeInt(frame.size()); out.write(frame.toByteArray)
      }
      Video.VideoPayload(v.doc_id + 1000000L, baos.toByteArray)
    }
    val pairs = Video.videoNearDupPairs(base.union(brightened)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val planted = (0L until 100L).map(d => (d, d + 1000000L)).toSet
    assert(planted.subsetOf(pairs), s"missed: ${(planted -- pairs).take(5)}")
    assert(pairs == planted, s"false positives: ${(pairs -- planted).take(5)}")
  }
}
