package graft

import graft.operators.{Dedup, Materialize}

/** `spark.graft.materialize` is load-bearing for the 1000-executor
  * story (persist keeps lineage so lost blocks recompute;
  * localCheckpoint truncates it for single-JVM speed) — so the switch
  * must be exercised, not just documented: the SAME dedup query under
  * both settings must produce bit-identical output.
  */
class MaterializeSpec extends SparkSpec {

  private def withMaterialize[A](mode: Option[String])(body: => A): A = {
    val key = "spark.graft.materialize"
    val prev = spark.conf.getOption(key)
    mode match {
      case Some(m) => spark.conf.set(key, m)
      case None => spark.conf.unset(key)
    }
    try body
    finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
      spark.catalog.clearCache()
    }
  }

  test("dedup_minhash output is identical under persist and localCheckpoint") {
    val underPersist = withMaterialize(None) {
      Dedup.dedupMinhash(spark, sfDir).collect().map(_.toString).toSeq
    }
    val underCheckpoint = withMaterialize(Some("localCheckpoint")) {
      Dedup.dedupMinhash(spark, sfDir).collect().map(_.toString).toSeq
    }
    assert(underPersist.nonEmpty, "materialize probe query returned no rows")
    assert(underPersist == underCheckpoint,
      "persist vs localCheckpoint diverged — Materialize.stable must be semantically invisible")
  }

  test("snapshot dirs are tracked and reaped by cleanupSnapshots") {
    import spark.implicits._
    // drain anything earlier suites left behind so the count is ours
    Materialize.cleanupSnapshots(spark)
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-snap-spec").toString)
    val base = spark.sparkContext.getCheckpointDir
    assert(base.isDefined)
    def snapDirs(): Set[String] = {
      val d = new java.io.File(new java.net.URI(base.get).getPath)
      Option(d.list()).map(_.toSet.filter(_.startsWith("snap_"))).getOrElse(Set.empty)
    }
    val before = snapDirs()
    val snapped = Materialize.snapshot((1 to 5).toDF("x"))
    assert(snapped.count() == 5)
    val during = snapDirs() -- before
    assert(during.size == 1, s"expected one new snap dir, saw $during")
    val reaped = Materialize.cleanupSnapshots(spark)
    assert(reaped >= 1, "cleanupSnapshots must delete the tracked snapshot")
    assert((snapDirs() -- before).isEmpty, "snap dir must be gone after cleanup")
  }

  test("iteration() default preserves schema+rows, truncates lineage, leaves no cache entry") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-iter-spec").toString)
    spark.catalog.clearCache()
    // a groupBy-shaped frame — the state shape every ladder rung feeds
    // through iteration()
    val base = (1 to 100).toDF("x")
      .groupBy(expr("x % 7").as("k")).agg(count(lit(1)).as("n"))
    val it = Materialize.iteration(base)
    // checkpoint semantics: same schema, same row multiset, lineage gone
    assert(it.schema == base.schema, s"schema drifted: ${it.schema} vs ${base.schema}")
    assert(it.collect().map(_.toString).sorted.toSeq ==
      base.collect().map(_.toString).sorted.toSeq)
    assert(it.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      it.queryExecution.optimizedPlan.toString)
    // the persist that fed the checkpoint write must NOT linger — a
    // leaked entry per rung would accumulate across a ladder exactly
    // like the round-4 CacheManager pile-up
    assert(spark.sharedState.cacheManager.isEmpty,
      "cachedCheckpoint leaked a cache entry")
  }

  test("stable() honors the switch: localCheckpoint truncates lineage, persist keeps it") {
    import spark.implicits._
    val base = (1 to 10).toDF("x")
    withMaterialize(Some("localCheckpoint")) {
      val m = Materialize.stable(base)
      // a localCheckpoint plan is a LogicalRDD scan — the parquet/local
      // lineage is gone
      assert(m.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
        m.queryExecution.optimizedPlan.toString)
    }
    withMaterialize(None) {
      val m = Materialize.stable(base)
      // persist keeps the original logical plan (InMemoryRelation wraps
      // it at execution; the analyzed tree still shows the source)
      assert(!m.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
        m.queryExecution.optimizedPlan.toString)
      m.unpersist()
    }
  }
}
