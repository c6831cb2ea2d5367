package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2): media payloads as opaque
  * `binary` columns with typed metadata. The container has no image/
  * audio codecs, so the decode step is STUBBED (deterministic fake in
  * [[decodeStub]]) — but the Spark-side plumbing is real: binary column
  * synthesis, byte-level metadata as codegen expressions, and a
  * `mapPartitions` decode pipeline with a typed schema, the exact shape
  * a Pandas-UDF/`mapInPandas` decoder has in a production pipeline
  * (batched per-partition, schema declared up front).
  */
object Multimodal {

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

  /** Decoded-media record: what a real image/audio decoder would emit. */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
    n_frames: Int, decoder: String)

  /** STUB decoder: a real pipeline would decode image/audio bytes here
    * (the libs aren't in this container). The stub is deterministic in
    * the payload bytes so tests can assert on it; the partitioning,
    * schema, and batch shape are the real thing. Runs per-partition —
    * no per-row JNI/process overhead at scale, same reason mapInPandas
    * batches.
    */
  def decodeStub(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "decoder" init happens once here (codec handles,
        // model weights, ...) — the stub just derives fake dimensions
        rows.map { case (id, bytes) =>
          val len = bytes.length
          MediaMeta(id, len, width = 16 + len % 64, height = 16 + len % 48,
            n_frames = 1 + len % 8, decoder = "stub-v0")
        }
      }
  }

  // ---- downstream media stages (decode → resize → frame-sample →
  // feature-extract), each a typed mapPartitions with the schema and
  // batch shape of a real codec pipeline; the pixel math is stubbed,
  // the distribution/plumbing is not. ---------------------------------

  case class MediaFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
    frame_hash: Long)
  case class FrameFeature(doc_id: Long, frame_idx: Int, embedding: Array[Float])

  /** resize: dimension rewrite per record (a real impl rescales pixel
    * buffers per-partition; dims math is the contract either way).
    */
  def resizeStub(ds: Dataset[MediaMeta], w: Int, h: Int): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(m => m.copy(width = w, height = h)))
  }

  /** frame sampling: one output row per sampled frame (n_frames comes
    * from the decoded header; hash stands in for the frame bytes).
    */
  def frameSampleStub(ds: Dataset[MediaMeta]): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      (0 until m.n_frames).map(i =>
        MediaFrame(m.doc_id, i, m.width, m.height,
          (m.doc_id * 1000003L + i * 8191L) % 2147483647L))
    }
  }

  /** feature extraction: fixed-width float embedding per frame — the
    * deterministic stand-in for a vision encoder; output schema/shape
    * (array<float>, batched per partition) is what downstream
    * similarity search consumes.
    */
  def featureExtractStub(ds: Dataset[MediaFrame], dim: Int = 8): Dataset[FrameFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { frames =>
      // per-partition "model init" happens once here
      frames.map { f =>
        val emb = Array.tabulate(dim)(j =>
          (((f.frame_hash * (j + 1) * 604297L) % 2147483647L) % 2001L - 1000L).toFloat / 1000f)
        FrameFeature(f.doc_id, f.frame_idx, emb)
      }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _))
  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaSql)
}
