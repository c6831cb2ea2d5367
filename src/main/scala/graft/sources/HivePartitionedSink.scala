package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned lake writer/reader: the write side of the
  * reference's layout (`year=YYYY/month=MM/day=DD` dirs, reference
  * TimePartitionGenerator src/index.ts:1827) using Spark's native
  * partitioned parquet — so reads get real partition PRUNING
  * (`PartitionFilters` in the scan), the property the whole manifest
  * machinery exists to emulate.
  *
  * At 100 TB: `partitionBy` on low-cardinality date columns keeps file
  * counts sane (one dir per day × event_type); pruned reads touch only
  * the requested partitions' files. `maxRecordsPerFile` guards against
  * giant files on skewed days.
  */
object HivePartitionedSink {

  /** write events partitioned year=/month=/day= under `outDir`. */
  def writeEvents(s: SparkSession, dir: String, outDir: String): Unit =
    Tables.events(s, dir)
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .repartition(col("year"), col("month"), col("day")) // 1 shuffle → 1 file/partition-dir
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 5000000)
      .partitionBy("year", "month", "day")
      .parquet(outDir)

  /** read back with a partition filter — Catalyst prunes to the
    * matching `day=` directories; assert via plan in the spec.
    */
  def readDay(s: SparkSession, outDir: String, y: Int, m: Int, d: Int): DataFrame =
    s.read.parquet(outDir)
      .filter(col("year") === y && col("month") === m && col("day") === d)
}
