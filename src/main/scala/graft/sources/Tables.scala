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

  /** `events.ts` has shipped in two parquet layouts: TIMESTAMP(NANOS),
    * which Spark only reads as a raw long
    * (`spark.sql.legacy.parquet.nanosAsLong`), and plain TIMESTAMP(MICROS)
    * (read as TIMESTAMP/TIMESTAMP_NTZ). Branch on the decoded type and
    * expose the same contract either way: exact integer epoch-micros
    * (`ts_us`/`ts_ns`, used by every oracle-checked computation — the
    * DuckDB twin is `epoch_us(ts)`) and a usable timestamp column (`ts`).
    * The micros extraction uses the same `unix_micros(CAST(… AS
    * TIMESTAMP))` idiom as the orders/lineitem date math (UTC session,
    * GraftSession.scala:27), so both engines see identical integers.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ =>
        raw.withColumn("ts_us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
          .withColumn("ts_ns", expr("ts_us * 1000"))
    }
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
