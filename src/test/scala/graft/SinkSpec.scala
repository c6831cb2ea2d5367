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
}
