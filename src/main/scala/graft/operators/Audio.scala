package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Audio-column plumbing (SURVEY §2 multimodal family): audio payloads
  * as opaque `binary` columns, with REAL codec work via the JDK's
  * `javax.sound.sampled` (WAV/PCM16, headless, zero external deps) —
  * the audio twin of [[Multimodal]]'s ImageIO path.
  *
  * [[encodeAudio]] synthesizes a deterministic integer sawtooth
  * waveform per doc and writes genuine RIFF/WAVE bytes through
  * `AudioSystem`; [[decodeAudio]] reads them back through the real
  * codec (`AudioSystem.getAudioInputStream`) and folds the decoded PCM
  * frames into integer acoustics (peak, energy, zero crossings).
  * Because the waveform is a pure integer function of (doc_id, t), the
  * DuckDB oracle recomputes the SAME acoustics analytically — parity
  * proves the encode→WAV→decode round trip is bit-exact. A learned
  * audio encoder would replace only [[envelopeFeature]]'s fold (no
  * model weights in-container).
  *
  * Each stage is a typed `mapPartitions`: one codec context per
  * partition, the batch shape a `mapInPandas`/torchaudio decoder has in
  * a production pipeline.
  */
object Audio {

  /** synthesis parameters — all pure integer functions of doc_id, so
    * both engines (and the ScalaTest spec) can derive them independently
    */
  @inline def nSamples(id: Long): Int = 1600 + (id % 800).toInt
  @inline def sampleRate(id: Long): Int = if (id % 2 == 0) 16000 else 8000
  /** sawtooth step per sample — sized so the period (20000/f ≈ 11-12
    * samples) is much shorter than an envelope window: a window then
    * averages several full periods and its mean tracks the AMPLITUDE,
    * not the phase (with slow periods the envelope is phase noise)
    */
  @inline def freqStep(id: Long): Int = 1667 + (id % 64).toInt * 13
  /** per-window amplitude 1..8 (16 windows) — gives each doc an
    * envelope SHAPE, which is what the near-dup feature keys on. Each
    * window gets its own LARGE mixing constant so (id+7)·C(w) wraps
    * the 251 modulus many times — any polynomial linear in w gives
    * every doc the same staircase merely rotated, and small multipliers
    * leave id-differences ≡ 0 (mod 8) invisible (both observed as
    * false near-dups under the banded hash).
    */
  val AmpMix: Array[Int] = Array(1013, 2027, 3049, 4057, 5077, 6091, 7103, 8117,
    9127, 10139, 11149, 12157, 13163, 14173, 15187, 16193)
  @inline def amp(id: Long, w: Int): Int = 1 + ((id + 7) * AmpMix(w) % 251 % 8).toInt
  /** sample t of doc id: amplitude-modulated sawtooth in
    * [-10000, 9999], PCM16-safe. Both subtraction operands are
    * non-negative integer divisions, so Scala's truncating `/` and the
    * oracle's flooring `//` agree exactly.
    */
  @inline def sample(id: Long, t: Int, n: Int): Int = {
    val v = ((t.toLong * freqStep(id) + id * 7) % 20000).toInt
    val a = amp(id, (t.toLong * 16 / n).toInt)
    v * a / 8 - 10000 * a / 8
  }

  case class AudioPayload(doc_id: Long, payload: Array[Byte])
  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
    n_samples: Long, duration_ms: Long, peak: Long, energy: Long,
    zero_crossings: Long)
  case class AudioFeature(doc_id: Long, embedding: Array[Float])

  /** Synthesize a REAL WAV file per document: deterministic PCM16 mono
    * sawtooth, written through `AudioSystem.write` — genuine RIFF
    * header, fmt/data chunks, little-endian frames.
    */
  def encodeAudio(s: SparkSession, dir: String): Dataset[AudioPayload] = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = nSamples(id)
          val pcm = new Array[Byte](n * 2)
          var t = 0
          while (t < n) {
            val x = sample(id, t, n)
            pcm(2 * t) = (x & 0xFF).toByte            // little-endian PCM16
            pcm(2 * t + 1) = ((x >> 8) & 0xFF).toByte
            t += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            sampleRate(id).toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          AudioPayload(id, baos.toByteArray)
        }
      }
  }

  /** REAL decoder: `AudioSystem.getAudioInputStream` over the payload
    * bytes — format comes from the parsed WAV header, samples from the
    * decoded frame stream. Integer acoustics only (energy, not RMS —
    * no libm in anything an oracle checks).
    */
  def decodeAudio(ds: Dataset[AudioPayload]): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { p =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"unexpected WAV shape for doc ${p.doc_id}")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var peak = 0L; var energy = 0L; var zc = 0L
        var prevNeg = false
        var t = 0
        while (t < n) {
          // little-endian signed PCM16
          val x = ((bytes(2 * t + 1) << 8) | (bytes(2 * t) & 0xFF)).toLong
          if (math.abs(x) > peak) peak = math.abs(x)
          energy += x * x
          val neg = x < 0
          if (t > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          t += 1
        }
        val rate = fmt.getSampleRate.toInt
        AudioMeta(p.doc_id, rate, fmt.getChannels, n.toLong,
          n.toLong * 1000L / rate, peak, energy, zc)
      }
    }
  }

  /** REAL resample: decode, linear-interpolate the PCM to the target
    * rate with pure integer arithmetic (position in 1/65536 sample
    * units), re-encode through the codec — actual DSP, deterministic
    * across JVMs.
    */
  def resampleAudio(ds: Dataset[AudioPayload], targetRate: Int): Dataset[AudioPayload] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { p =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p.payload))
        val srcRate = ais.getFormat.getSampleRate.toInt
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        def src(i: Int): Int = {
          val j = math.min(i, n - 1)
          (bytes(2 * j + 1) << 8) | (bytes(2 * j) & 0xFF)
        }
        val outN = (n.toLong * targetRate / srcRate).toInt
        val pcm = new Array[Byte](outN * 2)
        var t = 0
        while (t < outN) {
          val pos = t.toLong * srcRate * 65536L / targetRate
          val i = (pos >> 16).toInt
          val frac = (pos & 0xFFFF).toInt
          val x = (src(i).toLong * (65536 - frac) + src(i + 1).toLong * frac) >> 16
          pcm(2 * t) = (x & 0xFF).toByte
          pcm(2 * t + 1) = ((x >> 8) & 0xFF).toByte
          t += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(targetRate.toFloat, 16, 1, true, false)
        val out = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, outN.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(out,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        AudioPayload(p.doc_id, baos.toByteArray)
      }
    }
  }

  /** REAL acoustic feature: 16-window mean-rectified-amplitude envelope
    * over the decoded PCM, L2-normalized — rate-invariant (a resampled
    * copy has nearly the same envelope), which is what downstream
    * near-dup search needs. Integer sums in the fold; floats only at
    * the final normalize.
    */
  def envelopeFeature(ds: Dataset[AudioPayload], windows: Int = 16): Dataset[AudioFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { p =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p.payload))
        val bytes = ais.readAllBytes()
        val n = math.max(bytes.length / 2, 1)
        val sums = new Array[Long](windows)
        val counts = new Array[Long](windows)
        var t = 0
        while (2 * t + 1 < bytes.length) {
          val x = (bytes(2 * t + 1) << 8) | (bytes(2 * t) & 0xFF)
          val w = math.min((t.toLong * windows / n).toInt, windows - 1)
          sums(w) += math.abs(x)
          counts(w) += 1
          t += 1
        }
        val means = Array.tabulate(windows)(w =>
          if (counts(w) == 0) 0.0 else sums(w).toDouble / counts(w))
        val norm = math.sqrt(means.map(m => m * m).sum)
        AudioFeature(p.doc_id,
          means.map(m => if (norm == 0) 0f else (m / norm).toFloat))
      }
    }
  }

  /** Audio near-dup pairs, the standard LSH shape: banded 64-bit
    * envelope hash generates candidates (pigeonhole recall — reuses
    * [[Multimodal.imageNearDupPairs]]'s feature-agnostic band join),
    * then an EXACT cosine on the true envelope verifies. The hash alone
    * over-fires: 8-level envelopes collide at chance level (observed),
    * but chance bit-collisions have cosine well below a true copy's.
    */
  def audioNearDupPairs(features: Dataset[AudioFeature], minCos: Double = 0.995): DataFrame = {
    import features.sparkSession.implicits._
    val cands = Multimodal.imageNearDupPairs(
      features.map(f => Multimodal.FrameFeature(f.doc_id, 0, f.embedding)))
    val emb = features.toDF().select(col("doc_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    cands.join(emb.as("ea"), col("doc_a") === col("ea.doc_id"))
      .join(emb.as("eb"), col("doc_b") === col("eb.doc_id"))
      .withColumn("cos", expr(graft.functions.VectorFns.sparkCosine("ea.v", "eb.v")))
      .filter(col("cos") >= minCos)
      .select(col("doc_a"), col("doc_b"), col("cos"))
      .orderBy("doc_a", "doc_b")
  }

  /** audio_meta oracle query: encode REAL WAVs, decode them through the
    * REAL codec, emit integer acoustics. The oracle recomputes the same
    * numbers analytically from the synthesis formula — any container or
    * codec bug (header drift, endianness, truncation) breaks parity.
    */
  def audioMeta(s: SparkSession, dir: String): DataFrame =
    decodeAudio(encodeAudio(s, dir)).toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("n_samples"), col("duration_ms"), col("peak"), col("energy"),
        col("zero_crossings"))
      .orderBy("doc_id")

  val audioMetaSql: String =
    s"""WITH params AS (
      |  SELECT doc_id, 1600 + doc_id % 800 AS n,
      |    CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS rate,
      |    1667 + doc_id % 64 * 13 AS f
      |  FROM documents),
      |samples AS (
      |  SELECT doc_id, i,
      |    ((i * f + doc_id * 7) % 20000) * a // 8 - 10000 * a // 8 AS x
      |  FROM (
      |    SELECT doc_id, n, f, i,
      |      1 + (doc_id + 7) * ([${AmpMix.mkString(", ")}][(i * 16 // n) + 1]) % 251 % 8 AS a
      |    FROM params, UNNEST(generate_series(0, CAST(n - 1 AS BIGINT))) AS t(i)) m),
      |acoustics AS (
      |  SELECT doc_id,
      |    CAST(MAX(ABS(x)) AS BIGINT) AS peak,
      |    CAST(SUM(x * x) AS BIGINT) AS energy,
      |    CAST(SUM(CASE WHEN px IS NOT NULL AND (x < 0) <> (px < 0) THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      |  FROM (SELECT doc_id, x, LAG(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
      |        FROM samples) s
      |  GROUP BY doc_id)
      |SELECT p.doc_id, CAST(p.rate AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS channels,
      |  CAST(p.n AS BIGINT) AS n_samples, CAST(p.n * 1000 // p.rate AS BIGINT) AS duration_ms,
      |  a.peak, a.energy, a.zero_crossings
      |FROM params p JOIN acoustics a USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  /** 16-window loudness envelope per decoded track — the banding
    * feature audio fingerprinting keys on (same windows as the
    * synth's amplitude staircase, so the envelope SHAPE is the doc's
    * acoustic identity): per (doc, window), the exact sample count and
    * Σ|x| in integers off the REAL decoded PCM. No floats anywhere, so
    * the closed-form SQL twin reproduces the decoder bit-for-bit.
    *
    * Scale shape: one typed mapPartitions decode pass per track
    * (audio_meta's shape, zero shuffles before the final order);
    * output is 16×tracks rows. Σ|x| ≤ 2×10⁴ per sample × 10⁹ samples
    * per track stays far under 2⁶³.
    */
  def audioEnvelope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    encodeAudio(s, dir).mapPartitions { rows =>
      rows.flatMap { p =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p.payload))
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val cnt = new Array[Long](16)
        val sum = new Array[Long](16)
        var t = 0
        while (t < n) {
          val x = ((bytes(2 * t + 1) << 8) | (bytes(2 * t) & 0xFF)).toLong
          val w = (t.toLong * 16 / n).toInt
          cnt(w) += 1; sum(w) += math.abs(x)
          t += 1
        }
        (0 until 16).map(w => (p.doc_id, w.toLong, cnt(w), sum(w)))
      }
    }.toDF("doc_id", "window", "n_in_window", "sum_abs")
      .orderBy("doc_id", "window")
  }

  val audioEnvelopeSql: String =
    s"""WITH params AS (
       |  SELECT doc_id, 1600 + doc_id % 800 AS n,
       |    1667 + doc_id % 64 * 13 AS f
       |  FROM documents),
       |samples AS (
       |  SELECT doc_id, i * 16 // n AS w,
       |    ((i * f + doc_id * 7) % 20000) * a // 8 - 10000 * a // 8 AS x
       |  FROM (
       |    SELECT doc_id, n, f, i,
       |      1 + (doc_id + 7) * ([${AmpMix.mkString(", ")}][(i * 16 // n) + 1]) % 251 % 8 AS a
       |    FROM params, UNNEST(generate_series(0, CAST(n - 1 AS BIGINT))) AS t(i)) m)
       |SELECT doc_id, CAST(w AS BIGINT) AS window,
       |  COUNT(*) AS n_in_window,
       |  CAST(SUM(ABS(x)) AS BIGINT) AS sum_abs
       |FROM samples GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The "same track re-ingested after a filter" plant: every
    * doc_id % 10 == 3 track re-encoded through the REAL codec with a
    * +16 DC offset per sample. Synthesis keeps samples in
    * [−10000, 9999], so +16 never clamps against PCM16 — the copy's
    * decoded samples are EXACTLY x+16 and the oracle replays the
    * plant analytically (the audio analog of video_dedup's
    * total-preserving corner swap).
    */
  val DedupCopyShift = 100000L
  private[graft] def offsetCopies(base: Dataset[AudioPayload]): Dataset[AudioPayload] = {
    import base.sparkSession.implicits._
    base.filter(_.doc_id % 10 == 3).mapPartitions { rows =>
      rows.map { p =>
        // planted ids live at base+Shift WITHIN each 10^7 replication
        // block (ScaleSmoke's offset) — a corpus with >100k docs per
        // block would collide planted ids with genuine ones; fail loud
        // instead of silently corrupting the dedup output
        require(p.doc_id % 10000000L < DedupCopyShift,
          s"doc_id ${p.doc_id} collides with the +$DedupCopyShift copy-id plant")
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p.payload))
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        var t = 0
        while (t < bytes.length / 2) {
          val x = ((bytes(2 * t + 1) << 8) | (bytes(2 * t) & 0xFF)) + 16
          bytes(2 * t) = (x & 0xFF).toByte
          bytes(2 * t + 1) = ((x >> 8) & 0xFF).toByte
          t += 1
        }
        val out = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, bytes.length / 2)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(out,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        AudioPayload(p.doc_id + DedupCopyShift, baos.toByteArray)
      }
    }
  }

  /** Band quantum for the envelope LSH: window means quantize to
    * ~one-amplitude-step buckets (an amp unit moves a window mean by
    * ≈ 10000/8 = 1250), so near-dup copies (mean shift ≤ 16) almost
    * always share buckets while different amp staircases never do.
    */
  val DedupBandQuant = 1250L
  /** verify bound: Σ₁₆ |mean_a − mean_b| — a +16 DC offset moves each
    * window mean by ≤ 16, so planted pairs sit ≤ 256; distinct
    * staircases differ by ≥ one amp step ≈ 1250 in some window.
    */
  val DedupMaxL1 = 256L
  /** Band-bucket occupancy cap: buckets at or below this size verify
    * ALL within-bucket pairs (exact behavior, the common case — no
    * sf0.001..sf0.1 bucket comes near it). Above it the candidate set
    * is density-sampled to [[DedupAnchors]]·k.
    */
  val DedupOccupancyCap = 32L
  /** Density anchors for over-full buckets: only the A lowest-id
    * members of a bucket with occupancy > [[DedupOccupancyCap]] pair
    * with the rest, so within-bucket candidates are A·k, never C(k,2).
    * Recall contract: a bucket that large at these signature widths is
    * a near-identical family (silence, re-encoded jingles, ringtones),
    * for which EVERY member verifies against the family's minimum-id
    * anchor — the star output keeps exactly one row per deduped doc
    * either way. What the cap can drop: a >Cap-member bucket holding
    * MANY DISTINCT near-dup families none of whose low-id members rank
    * in the top A — at which point the bucket is mis-bucketed for the
    * quantum, and the right fix is a narrower [[DedupBandQuant]], not
    * more pairs. Measured: tools.AudioMegaBucket (SCALE.md round 10).
    */
  val DedupAnchors = 16L

  /** Acoustic near-dup dedup over the audio corpus ∪ the planted
    * re-ingestions — the audio member of the per-modality dedup
    * family (text minhash / video aHash / audio envelope). EXACT
    * envelope-class collapse first (the video_dedup lesson: pair
    * output must be linear in classes, not Σ C(k,2)), then 4 bands ×
    * 4 quantized window means generate candidates between class
    * representatives, verified by the all-integer envelope L1
    * distance.
    *
    * Scale shape: envelopes are one typed mapPartitions codec pass
    * (tracks never shuffle); the class collapse is one linear agg on a
    * portable fingerprint; the band self-join is bucket-bounded AND
    * occupancy-capped ([[DedupOccupancyCap]]/[[DedupAnchors]] — the
    * round-9 residual: near-identical mega-clusters are exactly the
    * buckets the exact collapse provably cannot shrink), and sees one
    * row per content class; verification joins touch candidate pairs ×
    * 16 windows.
    */
  def audioDedup(s: SparkSession, dir: String): DataFrame = {
    val base = encodeAudio(s, dir)
    dedupFromEnvelopes(Materialize.stable(
      envelope16(base.union(offsetCopies(base)))))
  }

  /** One decode pass → the fixed 16-window mean-|x| envelope frame
    * `(doc_id, window, m)` the dedup chain keys on.
    */
  def envelope16(ds: Dataset[AudioPayload]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { p =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p.payload))
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val cnt = new Array[Long](16)
        val sum = new Array[Long](16)
        var t = 0
        while (t < n) {
          val x = ((bytes(2 * t + 1) << 8) | (bytes(2 * t) & 0xFF)).toLong
          val w = (t.toLong * 16 / n).toInt
          cnt(w) += 1; sum(w) += math.abs(x)
          t += 1
        }
        (0 until 16).map(w => (p.doc_id, w.toLong, sum(w) / cnt(w)))
      }
    }.toDF("doc_id", "window", "m")
  }

  /** Planted near-identical mega-cluster: k tracks through the REAL
    * codec whose envelope signatures are all DISTINCT (so the exact
    * class collapse provably cannot shrink the family — the silence /
    * re-encoded-jingle shape) yet sit in ONE band bucket with pairwise
    * L1 ≤ 16. Window w of track i holds constant samples
    * `3200 + bit_{w mod 14}(i)` — means are exact, signatures encode
    * i's low 14 bits (distinct for k ≤ 16384), and every band's bucket
    * vector quantizes to the same `2:2:2:2`. This is the adversarial
    * input for [[DedupOccupancyCap]]: without the cap the band join
    * scores C(k,2) candidates; with it, ≤ [[DedupAnchors]]·k.
    */
  def megaClusterTracks(s: SparkSession, k: Int): Dataset[AudioPayload] = {
    import s.implicits._
    require(k <= 16384, "signature distinctness holds for k <= 2^14")
    s.range(k.toLong).as[Long].mapPartitions { ids =>
      ids.map { i =>
        val n = 1600
        val pcm = new Array[Byte](n * 2)
        var t = 0
        while (t < n) {
          val w = t * 16 / n
          val x = 3200 + ((i >> (w % 14)) & 1L).toInt
          pcm(2 * t) = (x & 0xFF).toByte
          pcm(2 * t + 1) = ((x >> 8) & 0xFF).toByte
          t += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        AudioPayload(i, baos.toByteArray)
      }
    }
  }

  /** The dedup chain from an envelope frame `(doc_id, window, m)` on —
    * exact class collapse, capped band candidates, L1 verify, star
    * output. Exposed so the occupancy-cap path is testable on planted
    * mega-cluster frames (AudioSpec) and measurable at ×k
    * (tools.AudioMegaBucket) without re-running the codec pass.
    */
  /** per-doc exact envelope-class mapping (doc_id, rep, n_members) —
    * the audio twin of [[Video.signatureClasses]], exposed so the
    * multimodal curation pipeline (api.CorpusOps.curateMultimodal) can
    * read exact-dup drops from the same collapse the near-dup chain
    * keys on.
    */
  def envelopeClasses(env: DataFrame): DataFrame = {
    val seqs = env.groupBy("doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(window, m)))," +
        " s -> concat(s.window, ':', s.m)), '|')").as("sig_fp"))
    val classes = seqs.groupBy("sig_fp")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n_members"))
    seqs.join(classes, Seq("sig_fp")).select("doc_id", "rep", "n_members")
  }

  def dedupFromEnvelopes(env: DataFrame): DataFrame = {
    val mapping = Materialize.stable(envelopeClasses(env))
    val sigs = env.join(
      mapping.filter(col("doc_id") === col("rep"))
        .select(col("doc_id"), col("n_members")), Seq("doc_id"))
    val bands = sigs
      .withColumn("b", expr("window div 4"))
      .groupBy("doc_id", "n_members", "b")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(window, m)))," +
        s" s -> concat(s.m div $DedupBandQuant)), ':')").as("bv"))
    // Occupancy cap: rank + size ride ONE (b, bv)-partitioned window
    // pass (exchange shared between the two frames); the pair join's
    // left side is all members while the bucket fits the cap, and only
    // the DedupAnchors lowest ids above it — A·k candidates per
    // over-full bucket, never C(k,2).
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy("b", "bv").orderBy("doc_id")
    val bwAll = org.apache.spark.sql.expressions.Window.partitionBy("b", "bv")
    val ranked = bands
      .withColumn("rn", row_number().over(bw))
      .withColumn("bsize", count(lit(1)).over(bwAll))
    val cand = ranked.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id") &&
          (col("x.bsize") <= DedupOccupancyCap || col("x.rn") <= DedupAnchors))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // STAR-SHAPED output: each near-dup doc links to ONE representative
    // (its smallest qualifying partner), not to every clustered peer —
    // Σ(k−1) rows per k-member near-dup cluster instead of Σ C(k,2).
    // The video operator's exact collapse can't shrink these (envelopes
    // differ by a few integer units, only the CLUSTER is identical-ish)
    // — measured at ×10: all-pairs emitted 484,890 rows, the star
    // emits one row per dedupable doc. This is also what a dedup
    // pipeline actually consumes: a drop-list with provenance.
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("window"),
        col("m").as("ma"), col("n_members").as("members_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("window"),
        col("m").as("mb"), col("n_members").as("members_b")), Seq("doc_b", "window"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(expr("abs(ma - mb)")).as("l1_dist"),
        max("members_a").as("members_a"), max("members_b").as("members_b"))
      .filter(col("l1_dist") <= DedupMaxL1)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(struct(col("doc_a"), col("l1_dist"), col("members_a"), col("members_b"))).as("best"))
      .select(col("best.doc_a").as("rep_id"), col("doc_id"),
        col("best.l1_dist").as("l1_dist"),
        col("best.members_a").as("members_rep"),
        col("best.members_b").as("members_doc"))
      .orderBy("doc_id")
  }

  val audioDedupSql: String =
    s"""WITH tracks AS (
       |  SELECT doc_id AS vid, doc_id AS orig, 0 AS bump FROM documents
       |  UNION ALL
       |  SELECT doc_id + $DedupCopyShift, doc_id, 16 FROM documents WHERE doc_id % 10 = 3
       |), params AS (
       |  SELECT vid, orig, bump, 1600 + orig % 800 AS n,
       |    1667 + orig % 64 * 13 AS f
       |  FROM tracks),
       |samples AS (
       |  SELECT vid, i * 16 // n AS w,
       |    ((i * f + orig * 7) % 20000) * a // 8 - 10000 * a // 8 + bump AS x
       |  FROM (
       |    SELECT vid, orig, bump, n, f, i,
       |      1 + (orig + 7) * ([${AmpMix.mkString(", ")}][(i * 16 // n) + 1]) % 251 % 8 AS a
       |    FROM params, UNNEST(generate_series(0, CAST(n - 1 AS BIGINT))) AS t(i)) s0),
       |env AS (
       |  SELECT vid, CAST(w AS BIGINT) AS win,
       |    CAST(SUM(ABS(x)) AS BIGINT) // COUNT(*) AS m
       |  FROM samples GROUP BY 1, 2
       |), seqs AS (
       |  SELECT vid, string_agg(win || ':' || m, '|' ORDER BY win) AS sig_fp
       |  FROM env GROUP BY 1
       |), classes AS (
       |  SELECT sig_fp, MIN(vid) AS rep, CAST(COUNT(*) AS BIGINT) AS n_members
       |  FROM seqs GROUP BY 1
       |), sigs AS (
       |  SELECT e.vid, e.win, e.m, c.n_members
       |  FROM env e JOIN classes c ON e.vid = c.rep
       |), bands AS (
       |  SELECT vid, n_members, win // 4 AS b,
       |    string_agg(CAST(m // $DedupBandQuant AS VARCHAR), ':' ORDER BY win) AS bv
       |  FROM sigs GROUP BY 1, 2, 3
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY b, bv ORDER BY vid) AS rn,
       |    COUNT(*) OVER (PARTITION BY b, bv) AS bsize
       |  FROM bands
       |), cand AS (
       |  SELECT DISTINCT x.vid AS doc_a, y.vid AS doc_b
       |  FROM ranked x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.vid < y.vid
       |  WHERE x.bsize <= $DedupOccupancyCap OR x.rn <= $DedupAnchors
       |)
       |SELECT doc_a AS rep_id, doc_b AS doc_id, l1_dist,
       |  members_a AS members_rep, members_b AS members_doc
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_b ORDER BY doc_a) AS rn
       |  FROM (
       |    SELECT c.doc_a, c.doc_b,
       |      CAST(SUM(ABS(sa.m - sb.m)) AS BIGINT) AS l1_dist,
       |      MAX(sa.n_members) AS members_a, MAX(sb.n_members) AS members_b
       |    FROM cand c
       |    JOIN sigs sa ON c.doc_a = sa.vid
       |    JOIN sigs sb ON c.doc_b = sb.vid AND sa.win = sb.win
       |    GROUP BY 1, 2) p
       |  WHERE l1_dist <= $DedupMaxL1) r
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audio_envelope" -> (audioEnvelope _),
    "audio_dedup" -> (audioDedup _),
    "audio_meta" -> (audioMeta _))
  val oracles: Map[String, String] = Map(
    "audio_envelope" -> audioEnvelopeSql,
    "audio_dedup" -> audioDedupSql,
    "audio_meta" -> audioMetaSql)
}
