package graft.tools

import graft.GraftSession
import graft.operators.{Materialize, Skew}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planted-hot-key skew probe (round-9 verdict task 6): replicate the
  * events fact ×100 and collapse 90% of rows onto one user, then join
  * against a non-broadcastable per-user dim three ways —
  *
  *   plain/skewOff  — sort-merge join, AQE skew-join disabled: one
  *                    reducer owns the hot key's whole row set (the
  *                    straggler a 1000-executor cluster stalls on)
  *   plain/AQEskew  — AQE skew-join enabled with thresholds scaled to
  *                    the probe's data volume (defaults target 256 MB
  *                    partitions; the probe plants ~tens of MB): shows
  *                    the built-in runtime split handling it alone
  *   salted(16)     — Skew.saltedJoin: the shuffle key becomes
  *                    (user_id, salt), spreading the hot key over 16
  *                    partitions regardless of AQE
  *
  * Broadcast is disabled throughout — the probe models the dim-too-big
  * / fact-vs-fact regime where skew actually bites; a broadcastable
  * dim needs none of this. Results recorded in SCALE.md.
  *
  * Usage: sbt "runMain graft.tools.SkewProbe [sfDir]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-skew-probe")
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val big = (0 until 100).map(i =>
      ev.withColumn("event_id", col("event_id") + lit(i * 100000000L)))
      .reduce(_ union _)
    // plant: 90% of the replicated fact lands on user 42
    val fact = Materialize.stable(big.withColumn("user_id",
      when(pmod(col("event_id"), lit(10L)) < 9, lit(42L)).otherwise(col("user_id"))))
    // deliberately NOT cached: a cached post-distinct dim carries
    // hashpartitioning(user_id) through the cache, EnsureRequirements
    // then skips the right-side Exchange, and OptimizeSkewedJoin — which
    // can only split when BOTH join children are shuffle stages — never
    // fires (measured: first probe run had the cache and AQE left the
    // hot partition whole). Salting has no such precondition.
    // the trailing repartition(w) ALSO matters: a dim whose lineage ends
    // in a user_id-hash exchange (distinct does) satisfies the join's
    // distribution requirement outright, and OptimizeSkewedJoin only
    // matches a join whose children read their OWN shuffle stages
    val dim = ev.select("user_id").distinct()
      .withColumn("w", pmod(col("user_id"), lit(97L)).cast("double"))
      .repartition(8, col("w"))
    println(s"[skew-probe] fact=${fact.count()} rows, dim=${dim.count()} users, hot key = 90%")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE re-checks broadcastability with ITS OWN threshold at runtime —
    // disable that too, or it quietly broadcasts the dim and the probe
    // measures nothing (first run of this probe did exactly that)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // per-run max TASK duration — the straggler a wall-clock total hides
    // on local[32] (one slow task among 32 lanes barely moves the total;
    // on a 1000-executor cluster it IS the job time). Reset per run.
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = t.taskInfo.duration
        nTasks.incrementAndGet()
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    })
    def run(label: String)(joined: => DataFrame): DataFrame = {
      // inspect the EXECUTED aggregate's plan — AQE's final plan (and
      // its skew-split rewrite) exists only after execution
      val agg = joined.agg(sum(col("w") * col("value")))
      maxTaskMs.set(0L); nTasks.set(0L)
      val t0 = System.nanoTime()
      // collect(), not head(): head() plans a separate limit query and
      // leaves THIS frame's AQE plan undriven (isFinalPlan=false)
      val got = agg.collect()(0).getDouble(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[skew-probe] $label%-14s sec=$sec%6.2f max_task_ms=${maxTaskMs.get()}%6d tasks=${nTasks.get()}%4d sum=$got%.3f")
      agg
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("plain/skewOff")(fact.join(dim, Seq("user_id")))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    if (sys.env.contains("SKEW_PROBE_FORCE"))
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val aqe = run("plain/AQEskew")(fact.join(dim, Seq("user_id")))
    val plan = aqe.queryExecution.executedPlan.toString
    if (sys.env.contains("SKEW_PROBE_DEBUG"))
      println(plan.linesIterator.filterNot(l => l.contains("Project [") ||
        l.contains("FileScan") || l.contains("ColumnarToRow")).take(45).mkString("\n"))
    val skewMark = plan.linesIterator.find(_.toLowerCase.contains("skew"))
    println(s"[skew-probe] AQE skew split in final plan: " +
      skewMark.map(l => "YES (" + l.trim.take(90) + ")").getOrElse("NO"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("salted(16)")(
      Skew.saltedJoin(fact, dim, "user_id", "event_id", 16))
    spark.stop()
  }
}
