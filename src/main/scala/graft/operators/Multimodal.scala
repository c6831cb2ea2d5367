package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2): media payloads as opaque
  * `binary` columns with typed metadata. Encode/decode/resize are REAL
  * codec work via the JDK's `javax.imageio` (PNG + BMP, headless, zero
  * external deps): [[encodeMedia]] renders deterministic rasters and
  * emits genuine PNG/BMP bytes, [[decodeMedia]] reads them back with
  * real dimensions and a raster-fold pixel hash, [[resizeMedia]]
  * resamples actual pixels. Each stage is a typed `mapPartitions` —
  * the exact batched-per-partition shape a Pandas-UDF/`mapInPandas`
  * decoder has in a production pipeline. [[featureExtract]] computes a
  * REAL classical visual feature (mean-pooled luma grid, pHash family)
  * from the decoded raster; a learned vision encoder would replace only
  * that method body (no model weights in-container).
  */
object Multimodal {

  /** ImageIO defaults to FILE-backed stream caches: every static
    * read/write spins up a FileCache stream that hits executor-local
    * disk once per codec round trip — measured as the dominant cost of
    * the video family at sf0.1 (45k tiny-frame round trips serialized
    * on temp-file IO). Our frames are ≤ KB, so the in-memory cache is
    * strictly better; flip the JVM-global flag once per executor.
    * Referenced at the top of every codec mapPartitions (lazy val =
    * exactly-once per JVM, free afterwards).
    */
  private[operators] lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** binary metadata extraction: byte length, magic bytes (hex), head
    * fingerprint — all on the binary/text columns, no decode needed.
    * (The `documents` text stands in for the media payload bytes.)
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("payload", expr("encode(text, 'UTF-8')")) // the opaque binary column
      .select(col("doc_id"),
        expr("CAST(length(payload) AS BIGINT)").as("byte_len"),
        expr("hex(encode(substring(text, 1, 4), 'UTF-8'))").as("magic_hex"),
        expr(PortableHash.sparkWordHash("substring(text, 1, 64)")).as("head_hash"),
        expr("length(payload) div 1024 + 1").as("n_chunks"))
      .orderBy("doc_id")
  }

  val multimodalMetaSql: String =
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS byte_len,
       |  hex(encode(text[1:4])) AS magic_hex,
       |  ${PortableHash.duckWordHash("text[1:64]")} AS head_hash,
       |  octet_length(encode(text)) // 1024 + 1 AS n_chunks
       |FROM documents ORDER BY doc_id""".stripMargin

  /** A media object: real codec bytes (PNG or BMP, written by the JDK's
    * ImageIO — genuine magic numbers, headers, rasters).
    */
  case class MediaPayload(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Decoded-media record: what the decoder emits. `pixel_hash` is a
    * deterministic fold over the actual decoded raster.
    */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
    n_frames: Int, decoder: String, pixel_hash: Long)

  /** Deterministic LCG fill for synthetic rasters (value depends only on
    * the running state, so image content is a pure function of doc_id +
    * text length).
    */
  @inline private def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L

  /** Synthesize a real image per document: render a deterministic RGB
    * raster (seeded by doc_id + text) and encode it with the JDK's
    * ImageIO — PNG for even doc_ids, BMP for odd. The bytes that come
    * out are real codec output: `89 50 4E 47` / `42 4D` magic, real
    * headers, real compression. No external deps — javax.imageio is in
    * the JDK and works headless.
    */
  def encodeMedia(s: SparkSession, dir: String): Dataset[MediaPayload] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        imageIoMemCache
        // per-partition stage: ImageIO writer lookup is per-format and
        // cached by the JVM; allocation stays inside the partition loop
        rows.map { case (id, text) =>
          val w = 16 + (id % 48).toInt
          val h = 16 + (id % 32).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var st = lcg(id * 1000003L + text.length)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              st = lcg(st)
              img.setRGB(x, y, ((st >>> 40) & 0xFFFFFFL).toInt)
              x += 1
            }
            y += 1
          }
          val fmt = if (id % 2 == 0) "png" else "bmp"
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, baos)
          MediaPayload(id, fmt, baos.toByteArray)
        }
      }
  }

  /** REAL decoder: ImageIO.read over the payload bytes — width/height
    * come from the decoded image, pixel_hash folds the actual raster.
    * Runs per-partition (one decoder context per partition, batched —
    * the same shape a mapInPandas/PIL decoder has in production).
    * Stills are 1 frame; a video decoder would emit its true count.
    */
  def decodeMedia(ds: Dataset[MediaPayload]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
        imageIoMemCache
      rows.map { p =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.payload))
        require(img != null, s"undecodable payload for doc ${p.doc_id}")
        MediaMeta(p.doc_id, p.payload.length, img.getWidth, img.getHeight,
          n_frames = 1, decoder = s"imageio-${p.fmt}", pixel_hash = rasterHash(img))
      }
    }
  }

  /** Deterministic fold over the decoded ARGB raster. */
  private def rasterHash(img: java.awt.image.BufferedImage): Long = {
    var hsh = 1125899906842597L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        hsh = hsh * 31L + (img.getRGB(x, y) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    hsh
  }

  // ---- downstream media stages (encode → resize → decode →
  // frame-sample → feature-extract), each a typed mapPartitions with
  // the schema and batch shape of a real codec pipeline. All stages do
  // real codec/raster work, feature extraction included (luma grid). ---

  case class MediaFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
    frame_hash: Long)
  case class FrameFeature(doc_id: Long, frame_idx: Int, embedding: Array[Float])

  /** REAL resize: decode, nearest-neighbor resample the raster to w×h
    * (explicit pixel loop — deterministic across JVMs, no AWT rendering
    * pipeline), re-encode in the same format.
    */
  def resizeMedia(ds: Dataset[MediaPayload], w: Int, h: Int): Dataset[MediaPayload] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
        imageIoMemCache
      rows.map { p =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.payload))
        require(src != null, s"undecodable payload for doc ${p.doc_id}")
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val (sw, sh) = (src.getWidth, src.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            dst.setRGB(x, y, src.getRGB(x * sw / w, y * sh / h) & 0xFFFFFF)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, p.fmt, baos)
        MediaPayload(p.doc_id, p.fmt, baos.toByteArray)
      }
    }
  }

  /** frame sampling: one output row per frame (n_frames comes from the
    * decoded header; frame_hash chains off the REAL raster hash).
    */
  def frameSample(ds: Dataset[MediaMeta]): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      (0 until m.n_frames).map(i =>
        MediaFrame(m.doc_id, i, m.width, m.height,
          (m.pixel_hash + i * 8191L) & Long.MaxValue))
    }
  }

  /** REAL visual feature: mean-pooled `grid`×`grid` grayscale (luma)
    * over the decoded raster, L2-normalized — the classical
    * pHash-family feature. Integer luma sums with explicit loops, so
    * retries reproduce bit-identically across JVMs; resized copies of
    * an image mean-pool to nearly the same grid, which is exactly what
    * downstream cosine search needs to find visual near-dups. A learned
    * vision encoder slots in here with the same signature and batch
    * shape (per-partition init, array<float> out).
    */
  def featureExtract(ds: Dataset[MediaPayload], grid: Int = 8): Dataset[FrameFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
        imageIoMemCache
      rows.map { p =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.payload))
        require(img != null, s"undecodable payload for doc ${p.doc_id}")
        FrameFeature(p.doc_id, 0, lumaGridFeature(img, grid))
      }
    }
  }

  /** The mean-pooled L2-normalized luma-grid fold itself, shared by the
    * image path above and the video frame path (Video.frameFeatures).
    * Integer luma sums with explicit loops — retries reproduce
    * bit-identically across JVMs.
    */
  def lumaGridFeature(img: java.awt.image.BufferedImage, grid: Int): Array[Float] = {
    val (sums, counts) = lumaGridSums(img, grid)
    val means = Array.tabulate(grid * grid)(c =>
      if (counts(c) == 0) 0.0 else sums(c).toDouble / counts(c))
    val norm = math.sqrt(means.map(m => m * m).sum)
    means.map(m => if (norm == 0) 0f else (m / norm).toFloat)
  }

  /** the EXACT-INTEGER inner fold of [[lumaGridFeature]]: per-cell luma
    * sums and pixel counts. Exposed so integer perceptual hashes
    * (video_ahash) can stay float-free end to end — the oracle then
    * replicates the whole pipeline in integer SQL with zero ulp risk.
    */
  def lumaGridSums(img: java.awt.image.BufferedImage, grid: Int): (Array[Long], Array[Long]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // integer ITU-R 601 luma — no floating point in the fold
        val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        val cell = (y * grid / h) * grid + (x * grid / w)
        sums(cell) += luma
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  val AHashBands = 16         // 16 bands × 4 bits over the 64-bit hash
  val AHashMaxHamming = 15L   // pigeonhole: ≤15 flipped bits ⇒ ≥1 intact band

  /** 64-bit aHash over the luma-grid feature: bit i is set iff cell i's
    * (normalized) luma sits above the grid mean — the classical
    * average-hash. Pure column HOF math over the feature vector
    * (codegen'd, no UDF); resized/re-encoded copies of an image flip
    * only the bits whose cells hover at the mean.
    */
  def aHash(features: Dataset[FrameFeature]): DataFrame =
    features.toDF()
      .withColumn("__mean", expr(
        "aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)) / CAST(size(embedding) AS DOUBLE)"))
      .withColumn("ahash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, i) ->
          |  acc | CASE WHEN CAST(element_at(embedding, i + 1) AS DOUBLE) > __mean
          |    THEN shiftleft(1L, i) ELSE 0L END)""".stripMargin.replaceAll("\\s+", " ")))
      .drop("__mean")

  /** Visual near-dup pairs by banded aHash — the scalable candidate
    * generator for image dedup (the cosine feature join needs one; this
    * IS one): split the 64-bit hash into [[AHashBands]] bands, equi-join
    * on (band, value) — any pair within hamming [[AHashMaxHamming]]
    * shares at least one intact band (pigeonhole), so recall at the
    * threshold is GUARANTEED, not probabilistic — then verify the exact
    * hamming distance on candidates only. Same shape as dedup_simhash,
    * fed by real decoded pixels.
    *
    * Band sizing is corpus-dependent: the synthetic test images are
    * pure high-frequency noise — the adversarial extreme for perceptual
    * hashing — and resized copies flip up to 15 of 64 bits (measured;
    * distinct images differ by ≥20), forcing 4-bit bands whose random
    * collision rate is high and pushing the pruning work onto the
    * hamming verify. Natural images are low-frequency; self-hamming
    * sits under ~8 and 8-bit bands restore the selective bucket join.
    */
  def imageNearDupPairs(features: Dataset[FrameFeature]): DataFrame = {
    val h = aHash(features).select(col("doc_id"), col("ahash"))
    val bands = h.select(col("doc_id"), col("ahash"),
      explode(expr(s"transform(sequence(0, ${AHashBands - 1}), b -> " +
        s"named_struct('b', b, 'v', shiftrightunsigned(ahash, b * ${64 / AHashBands}) % ${1L << (64 / AHashBands)}))")).as("band"))
      .select(col("doc_id"), col("ahash"), col("band.b").as("b"), col("band.v").as("v"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.ahash ^ y.ahash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= AHashMaxHamming)
      .orderBy("doc_a", "doc_b")
  }

  // ---- image_dedup: the image modality's oracle-graded dedup row -------

  /** The oracle-graded image corpus: fixed [[ImgW]]×[[ImgH]] gray
    * rasters with POSITION-INDEXED pixels (value = closed-form
    * function of (doc, pixel index), the Video.pixel convention — not
    * [[encodeMedia]]'s chained LCG, which no SQL oracle can replay),
    * encoded through the REAL codec (PNG even ids / BMP odd ids, both
    * lossless). Gray (v,v,v) pixels make integer ITU-601 luma equal v
    * exactly, so the oracle's analytic pixel sums ARE the decoded luma
    * sums — parity proves the encode → PNG/BMP-decode → luma-grid →
    * aHash pipeline bit-exact end to end.
    */
  val ImgW = 32
  val ImgH = 32

  /** Closed-form gray value of pixel `idx` of image `doc` — its own
    * multiplier so the image corpus never aliases video frame 0; all
    * terms positive, products < 2⁶³ at any replication-block id.
    */
  @inline def imgPixel(doc: Long, idx: Long): Int =
    ((doc * 999983L + idx * 2654435761L) % 256L).toInt

  def encodeImages(s: SparkSession, dir: String): Dataset[MediaPayload] = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id").as[Long].mapPartitions { docs =>
      imageIoMemCache
      docs.map { doc =>
        val img = new java.awt.image.BufferedImage(ImgW, ImgH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var idx = 0
        while (idx < ImgW * ImgH) {
          val v = imgPixel(doc, idx)
          img.setRGB(idx % ImgW, idx / ImgW, (v << 16) | (v << 8) | v)
          idx += 1
        }
        val fmt = if (doc % 2 == 0) "png" else "bmp"
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, baos)
        MediaPayload(doc, fmt, baos.toByteArray)
      }
    }
  }

  /** "Same image re-ingested after an edit" plant: every doc_id%10==3
    * image REALLY decoded, corner-block swapped (cell 0's 4×4 pixel
    * block exchanges with cell 63's — the video_dedup plant on the
    * 32×32 grid), re-encoded in the same format under a shifted id.
    * The swap preserves the image total, so exactly the two swapped
    * cells' hash bits can exchange (0 or 2 bit flips) — what lets the
    * SQL oracle replay the plant analytically.
    */
  val ImageDedupShift = 100000L
  private[graft] def cornerSwappedImages(base: Dataset[MediaPayload]): Dataset[MediaPayload] = {
    import base.sparkSession.implicits._
    base.filter(_.doc_id % 10 == 3).mapPartitions { rows =>
      imageIoMemCache
      rows.map { p =>
        // planted ids live at base+Shift WITHIN each 10^7 replication
        // block (the plantId convention) — fail loud on collision
        require(p.doc_id % 10000000L < ImageDedupShift,
          s"doc_id ${p.doc_id} collides with the +$ImageDedupShift copy-id plant")
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.payload))
        require(src != null, s"undecodable payload for doc ${p.doc_id}")
        val dst = new java.awt.image.BufferedImage(ImgW, ImgH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var idx = 0
        while (idx < ImgW * ImgH) {
          val (r, c) = (idx / ImgW, idx % ImgW)
          val (sr, sc) =
            if (r < 4 && c < 4) (r + 28, c + 28)
            else if (r >= 28 && c >= 28) (r - 28, c - 28)
            else (r, c)
          val b = src.getRGB(sc, sr) & 0xFF
          dst.setRGB(c, r, (b << 16) | (b << 8) | b)
          idx += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, p.fmt, baos)
        MediaPayload(p.doc_id + ImageDedupShift, p.fmt, baos.toByteArray)
      }
    }
  }

  /** Split-halves integer aHash per decoded image — Video.aHashLoHi's
    * signature pass for stills: REAL decode, integer luma-grid sums,
    * bit c set iff 64·cellsum > total (float-free, both engines in
    * signed-BIGINT arithmetic).
    */
  def imageAHashLoHi(ds: Dataset[MediaPayload]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      imageIoMemCache
      rows.map { p =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p.payload))
        require(img != null, s"undecodable payload for doc ${p.doc_id}")
        val (sums, _) = lumaGridSums(img, 8)
        val total = sums.sum
        var lo = 0L; var hi = 0L
        var c = 0
        while (c < 64) {
          if (sums(c) * 64L > total) {
            if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
          }
          c += 1
        }
        (p.doc_id, lo, hi)
      }
    }.toDF("doc_id", "ahash_lo", "ahash_hi")
  }

  /** the video verify bar on a SINGLE image: the corner-swap plant
    * flips exactly 0 or 2 bits, so ≤2 is deterministic for every
    * planted pair; distinct noise images differ by ≥20 bits
    * (measured — the high-frequency adversarial regime the
    * [[imageNearDupPairs]] scaladoc prices).
    */
  val ImageDedupMaxHamming = 2L

  /** Visual near-dup dedup over the image corpus ∪ the planted
    * re-ingestions — the FOURTH modality's oracle row, completing the
    * per-modality dedup family: text (dedup_minhash), audio
    * (audio_dedup), video (video_dedup), image (this). EXACT
    * signature-class collapse first (the family's twice-measured
    * pair-explosion rule), 16×4-bit aHash bands generate candidates
    * between class representatives ([[Dedup.cappedPairs]] occupancy
    * discipline), integer hamming ≤ [[ImageDedupMaxHamming]] verifies,
    * star output — one row per deduped image with provenance.
    *
    * Scale shape: signatures are one typed mapPartitions codec pass
    * (images never shuffle); the collapse is one linear agg on an
    * exact string fingerprint; the band self-join is bucket-bounded
    * and occupancy-capped and sees one row per content class;
    * verification touches candidate pairs only — never images².
    */
  def imageDedup(s: SparkSession, dir: String,
      bucketCap: Long = Long.MaxValue, anchors: Long = 16L): DataFrame = {
    val base = encodeImages(s, dir)
    imageDedupFromSigs(
      Materialize.stable(imageAHashLoHi(base.union(cornerSwappedImages(base)))),
      bucketCap, anchors)
  }

  /** the dedup chain over an already-materialized still-image aHash
    * frame `(doc_id, ahash_lo, ahash_hi)` — the composition point for
    * pipelines that compute signatures once.
    */
  def imageDedupFromSigs(sigs0: DataFrame,
      bucketCap: Long = Long.MaxValue, anchors: Long = 16L): DataFrame = {
    val classes = sigs0
      .withColumn("sig_fp", expr("concat(ahash_lo, ':', ahash_hi)"))
      .groupBy("sig_fp")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("n_members"))
    val sigs = sigs0
      .withColumn("sig_fp", expr("concat(ahash_lo, ':', ahash_hi)"))
      .join(classes, Seq("sig_fp"))
      .filter(col("doc_id") === col("rep"))
      .select("doc_id", "ahash_lo", "ahash_hi", "n_members")
    val bands = sigs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 15), b -> named_struct('b', b, 'v', " +
          "CASE WHEN b < 8 THEN shiftright(ahash_lo, b * 4) % 16 " +
          "ELSE shiftright(ahash_hi, (b - 8) * 4) % 16 END))")).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.v").as("v"))
    val cand = Dedup.cappedPairs(bands, Seq("b", "v"), "doc_id", bucketCap, anchors)
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("ahash_lo").as("la"),
        col("ahash_hi").as("ha"), col("n_members").as("members_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("ahash_lo").as("lb"),
        col("ahash_hi").as("hb"), col("n_members").as("members_b")), Seq("doc_b"))
      .withColumn("hamming",
        expr("CAST(bit_count(la ^ lb) + bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= ImageDedupMaxHamming)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(struct(col("doc_a"), col("hamming"), col("members_a"), col("members_b"))).as("best"))
      .select(col("best.doc_a").as("rep_id"), col("doc_id"),
        col("best.hamming").as("hamming"),
        col("best.members_a").as("members_rep"),
        col("best.members_b").as("members_doc"))
      .orderBy("doc_id")
  }

  val imageDedupSql: String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS vid, doc_id AS orig, 0 AS is_copy FROM documents
       |  UNION ALL
       |  SELECT doc_id + $ImageDedupShift, doc_id, 1 FROM documents WHERE doc_id % 10 = 3
       |), px AS (
       |  -- the copy reads its pixel from the SWAPPED index (corner
       |  -- cell 0 <-> cell 63 on the 32x32 grid); originals read straight
       |  SELECT vid,
       |    ((i // $ImgW) // ${ImgH / 8}) * 8 + (i % $ImgW) // ${ImgW / 8} AS cell,
       |    (orig * 999983 +
       |      (CASE WHEN is_copy > 0 AND (i // $ImgW) < 4 AND (i % $ImgW) < 4
       |              THEN ((i // $ImgW) + 28) * $ImgW + ((i % $ImgW) + 28)
       |            WHEN is_copy > 0 AND (i // $ImgW) >= 28 AND (i % $ImgW) >= 28
       |              THEN ((i // $ImgW) - 28) * $ImgW + ((i % $ImgW) - 28)
       |            ELSE i END) * 2654435761) % 256 AS v
       |  FROM imgs, UNNEST(generate_series(0, ${ImgW * ImgH - 1})) AS t(i)
       |), cells AS (
       |  SELECT vid, cell, CAST(SUM(v) AS BIGINT) AS cs
       |  FROM px GROUP BY 1, 2
       |), tot AS (
       |  SELECT vid, CAST(SUM(cs) AS BIGINT) AS total
       |  FROM cells GROUP BY 1
       |), sigs AS (
       |  SELECT c.vid,
       |    CAST(SUM(CASE WHEN c.cs * 64 > t.total AND c.cell < 32
       |      THEN (CAST(1 AS BIGINT) << CAST(c.cell AS INT)) ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(SUM(CASE WHEN c.cs * 64 > t.total AND c.cell >= 32
       |      THEN (CAST(1 AS BIGINT) << CAST(c.cell - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
       |  FROM cells c JOIN tot t USING (vid)
       |  GROUP BY 1
       |), classes AS (
       |  SELECT lo || ':' || hi AS sig_fp, MIN(vid) AS rep,
       |    CAST(COUNT(*) AS BIGINT) AS n_members
       |  FROM sigs GROUP BY 1
       |), rsigs AS (
       |  SELECT s.vid, s.lo, s.hi, c.n_members
       |  FROM sigs s JOIN classes c ON s.vid = c.rep AND s.lo || ':' || s.hi = c.sig_fp
       |), bands AS (
       |  SELECT vid, bs.b AS b,
       |    CASE WHEN bs.b < 8 THEN (lo >> (bs.b * 4)) % 16
       |         ELSE (hi >> ((bs.b - 8) * 4)) % 16 END AS v
       |  FROM rsigs CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bs
       |), cand AS (
       |  SELECT DISTINCT x.vid AS doc_a, y.vid AS doc_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.v = y.v AND x.vid < y.vid
       |)
       |SELECT doc_a AS rep_id, doc_b AS doc_id, hamming,
       |  members_a AS members_rep, members_b AS members_doc
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_b
       |    ORDER BY doc_a, hamming, members_a, members_b) AS rn
       |  FROM (
       |    SELECT c.doc_a, c.doc_b,
       |      CAST(bit_count(xor(sa.lo, sb.lo)) + bit_count(xor(sa.hi, sb.hi)) AS BIGINT) AS hamming,
       |      sa.n_members AS members_a, sb.n_members AS members_b
       |    FROM cand c
       |    JOIN rsigs sa ON c.doc_a = sa.vid
       |    JOIN rsigs sb ON c.doc_b = sb.vid) p
       |  WHERE hamming <= $ImageDedupMaxHamming) r
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "image_dedup" -> ((s: SparkSession, dir: String) => imageDedup(s, dir)))
  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql,
    "image_dedup" -> imageDedupSql)
}
