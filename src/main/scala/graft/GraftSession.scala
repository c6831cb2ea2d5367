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
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString)

  def build(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable-checkpoint home for iterative state (Materialize.iteration);
    // on a real cluster this is an HDFS/S3 path
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    graft.expressions.GraftFunctions.register(spark)
    spark
  }

  /** Expose every graft table (plus the synthesized manifest and its
    * change-detection snapshots) as temp views, so the whole engine is
    * reachable from plain `spark.sql` — the graft_* kernel functions
    * are registered by build()/Tables.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => sources.Tables.load(spark, sfDir, t).createOrReplaceTempView(t))
    sources.Tables.events(spark, sfDir).createOrReplaceTempView("events")
    sources.Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    sources.Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    sources.Manifest.manifest(spark, sfDir).createOrReplaceTempView("manifest")
    sources.Manifest.snapshotPrev(spark, sfDir).createOrReplaceTempView("manifest_prev")
    sources.Manifest.snapshotCur(spark, sfDir).createOrReplaceTempView("manifest_cur")
  }
}
