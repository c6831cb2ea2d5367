package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real object-listing twin of the reference's `S3PathMatcher.
  * listObjects / findMatchingObjects / streamMatchingObjects`
  * (reference src/index.ts:798) — Spark's `binaryFile` source already
  * speaks "list a store by glob" against any Hadoop filesystem
  * (s3a://, gs://, hdfs://, file://), with distributed listing and
  * column pruning: selecting only path/length/modificationTime never
  * reads file bytes.
  *
  * The reference hand-rolls pagination, concurrency limits and a
  * metadata TTL cache around ListObjectsV2; on Spark those concerns are
  * the scheduler's. Matching composes with [[graft.api.PathMatcher]]
  * on the returned DataFrame.
  */
object FileManifest {

  /** list objects under `dir` (optionally glob-filtered at the listing
    * level) as the manifest schema `(key, size, last_modified_us)`.
    */
  def list(spark: SparkSession, dir: String, glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(dir)
      .select(
        col("path").as("key"),
        col("length").as("size"),
        unix_micros(col("modificationTime")).as("last_modified_us"))
  }

  /** findMatchingObjects: listing + compiled-glob filter on the key. */
  def findMatching(spark: SparkSession, dir: String, patterns: Seq[String]): DataFrame = {
    val pm = new graft.api.PathMatcher
    pm.filterMatching(list(spark, dir), patterns)
  }

  /** streamMatchingObjects: the same listing as an unbounded stream —
    * new files arriving under `dir` become new rows (file-source
    * discovery replaces the reference's polling + concurrency pool).
    * Feed into [[graft.streaming.EventStreams.changeFeed]] for a
    * continuous change classification.
    */
  def stream(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.format("parquet").schema(schema).load(dir)
}
