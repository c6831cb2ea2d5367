package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table writer: pre-shuffle a table ONCE at write time so
  * every later join/aggregation on the bucket key is co-located and
  * shuffle-free — the 100 TB answer to "this join runs every hour on
  * the same key". `bucketBy + sortBy` makes the read side both
  * exchange-free AND sort-free for sort-merge joins.
  *
  * This is the Spark-native replacement for the reference's metadata
  * cache (src/index.ts:788): instead of caching listing lookups on one
  * node, the layout itself guarantees any executor can join its bucket
  * of the manifest/fingerprint table without moving data.
  */
object BucketedSink {

  /** write `df` as a bucketed external parquet table registered as
    * `name` at `path`.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
    bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)

  def table(s: SparkSession, name: String): DataFrame = s.table(name)
}
