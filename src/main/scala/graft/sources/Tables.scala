package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning
  * freedom — every filter/projection in downstream operators should land
  * in the scan (`PushedFilters`/`ReadSchema`), which is what makes these
  * plans survive a 100 TB scale-up.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // any session that reads a graft table can parse graft_* expressions
    graft.expressions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long (`spark.sql.legacy.parquet.nanosAsLong`). Expose both the
    * exact integer epoch-micros (`ts_us`, used by every oracle-checked
    * computation) and a usable timestamp column (`ts`).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** documents/embeddings feed expression-HEAVY per-row work (signature
    * HOFs are interpreted, not codegen'd), and the testdata ships each
    * corpus as a single parquet row group = ONE split. Fan the corpus
    * out across cores before that work — at production scale the corpus
    * has thousands of splits and this repartition is a no-op to remove,
    * but a single-block file must be spread explicitly or every
    * signature computes on one thread.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
}
