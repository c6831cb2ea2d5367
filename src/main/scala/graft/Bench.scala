package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * prints one JSON line of per-query seconds. A warmup action first —
  * session/codegen/parquet-footer costs land there, not on whichever
  * query the map happens to iterate first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.build("graft-bench")
    sources.Tables.lineitem(spark, sfDir).count()
    sources.Tables.events(spark, sfDir).count()
    sources.Tables.documents(spark, sfDir).count()
    // two timed runs per query, report the min — JIT/codegen-cache
    // first-touch costs are not steady-state throughput (a long-lived
    // cluster pays them once); a failed query still reports its time
    // with count -1 semantics
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: $t"); Double.NaN }
      }
      // a failed query reports -1, never its time-to-fail
      name -> (if (times.exists(_.isNaN)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // bare-file copy so the harness never has to fish the line out of
    // sbt/log4j output
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
