package graft

import org.apache.spark.sql.SparkSession

/** Builds the tuned SparkSession used by tests and mains.
  *
  * Tuned for the driver's local[N] harness but every knob is the one you'd
  * set on a real 1000-executor cluster too: AQE on (runtime coalesce +
  * skew-join), shuffle partitions sized to the parallelism, small
  * broadcast threshold left at default (dims here are tiny; at 100 TB the
  * TPC-H dims still broadcast).
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def build(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    spark
  }
}
