package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** The end-to-end streaming corpus ingest: documents arrive as an
  * unbounded stream and flow through fingerprint → watermarked dedup →
  * quality gate, producing the curated stream a training-data sink
  * writes as Hive-partitioned parquet. Composes the batch operators'
  * exact column math (same fingerprints, same quality score as
  * text_quality / corpus_curate), so batch backfills and the live
  * stream agree row-for-row.
  *
  * Cluster shape: fingerprint + quality are stateless map work in the
  * micro-batch; only the dedup stage keeps state (fingerprint-keyed,
  * watermark-expired). Sink via `.writeStream.partitionBy(...)
  * .format("parquet")` with checkpointing; exactly-once via the file
  * sink's transaction log.
  */
object IngestPipeline {

  val MinWords = 20L
  val MinScore = 0.27

  /** stream-side curation: input columns (doc_id, text, ts); output
    * adds fingerprint, n_words, score, keep.
    */
  def curate(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    def q6(e: String) = s"floor(($e) * 1000000) / CAST(1000000 AS DOUBLE)"
    docs
      .withColumn("fp", expr(PortableHash.sparkFingerprint("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("words", expr("filter(split(text, ' '), w -> w <> '')"))
      .withColumn("n_words", expr("CAST(size(words) AS BIGINT)"))
      .withColumn("distinct_ratio",
        expr(q6("CAST(size(array_distinct(words)) AS DOUBLE) / n_words")))
      .withColumn("stop_ratio",
        expr(q6("CAST(size(filter(words, w -> array_contains(array('the', 'a', 'and', 'of', 'to'), w))) AS DOUBLE) / n_words")))
      .withColumn("score",
        expr(q6("CAST(0.4 AS DOUBLE) * least(CAST(1 AS DOUBLE), CAST(n_words AS DOUBLE) / CAST(200 AS DOUBLE)) + CAST(0.3 AS DOUBLE) * distinct_ratio + CAST(0.3 AS DOUBLE) * stop_ratio")))
      .withColumn("keep", col("n_words") >= MinWords && col("score") >= MinScore)
      .select("doc_id", "ts", "fp", "n_words", "score", "keep")
  }
}
