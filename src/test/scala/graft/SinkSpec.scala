package graft

import java.nio.file.Files
import graft.sources.HivePartitionedSink

/** HivePartitionedSink: write events date-partitioned, read back with a
  * partition filter, and assert the plan actually PRUNES (SURVEY §2
  * infra row: "assert PushedFilters / PartitionFilters in plan").
  */
class SinkSpec extends SparkSpec {

  test("partitioned write + pruned read") {
    val out = Files.createTempDirectory("graft_sink").toString
    HivePartitionedSink.writeEvents(spark, sfDir, out)

    // layout: hive-style k=v dirs
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("year="))
    assert(dirs.nonEmpty, "expected year=... partition dirs")

    val day = HivePartitionedSink.readDay(spark, out, 2024, 1, 15)
    val n = day.count()
    assert(n > 0, "day partition should have rows")

    // the partition filter must land in PartitionFilters, not post-scan
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("year#") || plan.contains("(year")), s"no partition pruning in:\n$plan")

    // pruned read touches only 1 of 30 day-dirs: count full vs pruned files
    val prunedFiles = day.select(org.apache.spark.sql.functions
      .input_file_name()).distinct().count()
    val allFiles = spark.read.parquet(out).select(org.apache.spark.sql.functions
      .input_file_name()).distinct().count()
    assert(prunedFiles < allFiles, s"pruning read $prunedFiles of $allFiles files")
  }

  test("zorder write: 2-d predicate overlaps fewer files than a lexicographic layout") {
    import org.apache.spark.sql.functions._
    val files = 16
    val e = graft.sources.Tables.events(spark, sfDir)
      .withColumn("x", expr("user_id % 256"))
      .withColumn("y", expr("(ts_us div 86400000000) % 256"))
      .select("event_id", "x", "y")

    // how many of the layout's files could contain x∈[xr], y∈[yr]?
    // file-level min/max is exactly what parquet footer stats / a lake
    // manifest give a scan planner — count bounding-box overlaps.
    def overlapping(df: org.apache.spark.sql.DataFrame, xr: (Long, Long), yr: (Long, Long)): Long = {
      val out = Files.createTempDirectory("graft_layout").toString
      df.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .filter(col("min_x") <= xr._2 && col("max_x") >= xr._1 &&
          col("min_y") <= yr._2 && col("max_y") >= yr._1)
        .count()
    }

    // the discriminating predicate is a band on the SECONDARY dimension
    // (all x, narrow y): a lexicographic (x, y) layout is tight on x but
    // every file spans the full y domain, so the band overlaps every
    // file; the z-order layout localizes BOTH dims, so only the files
    // whose y-tiles meet the band can match (data y domain is 11..40)
    val box = ((0L, 255L), (20L, 23L))
    val lex = overlapping(
      e.repartitionByRange(files, col("x"), col("y")).sortWithinPartitions("x", "y"),
      box._1, box._2)
    val z = overlapping(
      e.withColumn("z", graft.operators.Maintenance.zvalue("x", "y"))
        .repartitionByRange(files, col("z")).sortWithinPartitions("z").drop("z"),
      box._1, box._2)
    info(s"files overlapping the y-band box: lexicographic=$lex, zorder=$z of $files")
    assert(z * 2 <= lex, s"z-order must touch at most half the files the lexicographic layout does ($z vs $lex)")
  }
}
