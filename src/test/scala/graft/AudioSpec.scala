package graft

import graft.operators.{Audio, Multimodal}

/** Audio pipeline: encode/decode/resample are REAL codec work via
  * javax.sound.sampled — the specs assert on genuine RIFF/WAVE bytes,
  * codec-decoded acoustics against the synthesis formula, and
  * envelope-feature near-dup detection across resampled copies.
  */
class AudioSpec extends SparkSpec {

  test("encodeAudio emits real RIFF/WAVE bytes; decodeAudio matches the synthesis formula") {
    val payloads = Audio.encodeAudio(spark, sfDir)
    val rows = payloads.collect()
    assert(rows.length == 500)
    rows.foreach { p =>
      assert(new String(p.payload.take(4), "US-ASCII") == "RIFF",
        s"doc ${p.doc_id}: not a RIFF container")
      assert(new String(p.payload.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc ${p.doc_id}: not a WAVE file")
    }
    Audio.decodeAudio(payloads).collect().foreach { m =>
      val id = m.doc_id
      assert(m.sample_rate == Audio.sampleRate(id), s"doc $id rate")
      assert(m.channels == 1 && m.n_samples == Audio.nSamples(id).toLong, s"doc $id shape")
      // recompute the acoustics from the synthesis formula — the codec
      // round trip must preserve every sample bit-exactly
      val n = Audio.nSamples(id)
      var peak = 0L; var energy = 0L; var zc = 0L
      var prev = 0
      (0 until n).foreach { t =>
        val x = Audio.sample(id, t, n)
        peak = math.max(peak, math.abs(x).toLong)
        energy += x.toLong * x
        if (t > 0 && ((prev < 0) != (x < 0))) zc += 1
        prev = x
      }
      assert(m.peak == peak && m.energy == energy && m.zero_crossings == zc,
        s"doc $id: codec drifted from the formula " +
          s"(${m.peak},${m.energy},${m.zero_crossings}) vs ($peak,$energy,$zc)")
    }
  }

  test("resampleAudio does real DSP: sample count scales with the rate, duration holds") {
    val metas = Audio.decodeAudio(
      Audio.resampleAudio(Audio.encodeAudio(spark, sfDir), 12000)).collect()
    assert(metas.length == 500)
    metas.foreach { m =>
      assert(m.sample_rate == 12000, s"doc ${m.doc_id} rate")
      val srcN = Audio.nSamples(m.doc_id).toLong
      val srcRate = Audio.sampleRate(m.doc_id)
      assert(m.n_samples == srcN * 12000 / srcRate, s"doc ${m.doc_id} resampled count")
      assert(math.abs(m.duration_ms - srcN * 1000 / srcRate) <= 1,
        s"doc ${m.doc_id}: duration drifted")
    }
  }

  test("envelope features survive resampling and the banded hash finds every planted copy") {
    import spark.implicits._
    // small planted corpus: 40 originals + their 12kHz resampled copies
    // under shifted ids — the copy has DIFFERENT bytes (new rate, new
    // interpolated samples) but the same envelope shape
    val base = Audio.encodeAudio(spark, sfDir).filter(_.doc_id < 40)
    val copies = Audio.resampleAudio(base, 12000)
      .map(p => Audio.AudioPayload(p.doc_id + 100000, p.payload))
    val feats = Audio.envelopeFeature(base.union(copies), windows = 64)
    // banded hash candidates (pigeonhole recall) + exact cosine verify
    val pairs = Audio.audioNearDupPairs(feats).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    (0L until 40L).foreach { id =>
      assert(pairs.contains((id, id + 100000)),
        s"doc $id: resampled copy not found by the banded envelope hash")
    }
    val falsePos = pairs.filterNot { case (a, b) => b == a + 100000 }
    assert(falsePos.isEmpty, s"false near-dups: $falsePos")
  }

  test("occupancy cap keeps full recall on a planted mega-cluster bucket") {
    import spark.implicits._
    // 120 near-identical tracks (distinct envelopes, ONE band bucket,
    // pairwise L1 <= 16) — 120 > DedupOccupancyCap(32), so the anchor
    // path is exercised — plus 20 ordinary corpus tracks in other
    // buckets under shifted ids as the no-false-positive control.
    val k = 120
    val family = Audio.megaClusterTracks(spark, k)
    val contrast = Audio.encodeAudio(spark, sfDir).filter(_.doc_id < 20)
      .map(p => Audio.AudioPayload(p.doc_id + 1000000L, p.payload))
    val out = Audio.dedupFromEnvelopes(
      Audio.envelope16(family.union(contrast))).collect()
    val familyRows = out.filter(_.getAs[Long]("doc_id") < k)
    // recall: every family member except the min-id anchor is deduped,
    // and each links to an anchor (rank <= DedupAnchors => id <= 15)
    assert(familyRows.length == k - 1,
      s"expected ${k - 1} deduped family docs, got ${familyRows.length}")
    assert(familyRows.forall(_.getAs[Long]("rep_id") < Audio.DedupAnchors),
      "a family doc linked to a non-anchor representative")
    assert(familyRows.map(_.getAs[Long]("doc_id")).toSet == (1L until k.toLong).toSet)
    // zero false positives across the family/contrast boundary
    out.foreach { r =>
      val (rep, doc) = (r.getAs[Long]("rep_id"), r.getAs[Long]("doc_id"))
      assert((rep < k) == (doc < k), s"cross-family link $rep -> $doc")
    }
  }
}
