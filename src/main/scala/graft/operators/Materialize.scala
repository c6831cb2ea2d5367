package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization point for expensive expression trees (minhash/simhash
  * signatures, cast embeddings) that downstream LSH joins reference two
  * or three times — without one, Catalyst re-evaluates the whole
  * signature tree per join reference.
  *
  * Two spellings, switched by `spark.graft.materialize`:
  *
  *  - `persist` (default): `persist(DISK_ONLY)`. Lineage is kept, so a
  *    lost executor's blocks are recomputed from the parquet scan —
  *    the 1000-executor-safe choice. DISK_ONLY because signature sets
  *    at 100 TB scale are themselves TB-sized; they must not compete
  *    with shuffle/exec memory.
  *  - `localCheckpoint`: truncates lineage and pins blocks to
  *    executors — fastest on local[N] where executor loss cannot
  *    happen, fragile on a real cluster.
  */
object Materialize {
  def stable(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.materialize").getOrElse("persist") match {
      case "localCheckpoint" => df.localCheckpoint()
      // storage-level gate: composed operators (knn_recall, knn_degree,
      // corpus_curate) pass already-persisted frames back through here;
      // re-persisting is a CacheManager no-op but logs a warning per
      // call, and hundreds of them drown real warnings in bench logs
      case _ if df.storageLevel != StorageLevel.NONE => df
      case _ => df.persist(StorageLevel.DISK_ONLY)
    }

  /** Materialization for ITERATIVE state (label propagation, k-means
    * rounds): unlike [[stable]], this must TRUNCATE lineage, because a
    * loop whose next state self-joins the previous state doubles the
    * logical plan per round — persist alone keeps the (exponentially
    * growing) plan tree and overflows the optimizer's stack after ~10
    * rounds.
    *
    * Spelling (round-16 measurement, reverting the round-15 default):
    * a reliable `Dataset.checkpoint()`. All three spellings were
    * probed solo at sf0.1 / 32 cores on the same tree
    * (tools.BenchProbe fresh-JVM medians, OPTIMIZATION_r16.md has the
    * full table): `checkpoint` won on 8 of 9 iterative keys — e.g.
    * web_domain_components 3.77s vs 5.91 (snapshot) vs 7.54 (cached),
    * sketch_kll 2.36 vs 4.04 vs 4.51, bpe_train_converge 1.83 vs 2.60
    * vs 3.67. Why the alternatives lose here:
    *  - `snapshot` (the r15 default — the driver's suite went 0.566×
    *    with clean controls and ANTI-SCALED 8c→32c): a per-rung
    *    parquet write/list/read cycle whose file count scales with
    *    the core count, and the read-back loses `LogicalRDD`'s
    *    preserved outputPartitioning, so groupBy-shaped state re-enters
    *    the next rung's join behind one extra full-state Exchange.
    *  - `cachedCheckpoint` (persist → checkpoint → unpersist, so the
    *    checkpoint write reads blocks instead of recomputing): the
    *    columnar cache build costs MORE than recomputing these
    *    broadcast-join + partial-agg rungs twice.
    * `spark.graft.iteration=snapshot|cachedCheckpoint` select the
    * alternatives; no checkpoint dir ⇒ `localCheckpoint()`
    * (single-process sessions only). On a real cluster the checkpoint
    * dir is HDFS/S3 (GraftSession sets a local tmp dir).
    */
  def iteration(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isEmpty) df.localCheckpoint()
    else df.sparkSession.conf.getOption("spark.graft.iteration")
      .getOrElse("checkpoint") match {
      case "snapshot" => snapshot(df)
      case "cachedCheckpoint" => cachedCheckpoint(df)
      case _ => df.checkpoint()
    }

  /** reliable checkpoint that computes its input ONCE: persist →
    * checkpoint (the eager action materializes the cache; the
    * RDD-checkpoint write job then reads blocks, not the plan) →
    * unpersist (the rung state lives on as checkpoint files — the
    * cache served exactly the write). Measured SLOWER than the bare
    * double-computing checkpoint on every contract ladder (see
    * [[iteration]] scaladoc) — the rungs are cheap broadcast-join +
    * partial-agg plans and the InMemoryRelation build is not free —
    * kept as a conf spelling for state whose recompute is genuinely
    * expensive.
    */
  private def cachedCheckpoint(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df.checkpoint()
    else {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint() finally df.unpersist(false)
    }

  /** ONE-adaptive-evaluation materialization for an EXPENSIVE frame a
    * downstream plan references more than once (the component engine's
    * edge frame): write the result to the session checkpoint dir as
    * parquet and read it back. Unlike [[stable]] (lazy persist — a
    * frame unioned with itself builds the cache TWICE) or a reliable
    * `checkpoint()` (computes the RDD twice by contract), the
    * datasource write is a single ordinary adaptive action, and every
    * re-read is a plain file scan. Measured on embed_clusters' ×10
    * edge frame: 579s (persisted union) → ~27s (snapshot). On a real
    * cluster the snapshot lands in the shared checkpoint dir and
    * survives executor loss.
    */
  def snapshot(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.sparkContext.getCheckpointDir match {
      case Some(base) =>
        val path = s"$base/snap_${java.util.UUID.randomUUID().toString.take(12)}"
        df.write.parquet(path)
        snapPaths.add(path)
        if (hookRegistered.compareAndSet(false, true)) {
          // mirror reliable-checkpoint cleanup: reap every snapshot at
          // JVM exit (priority 30 — before Hadoop's FileSystem-cache
          // close at 10), so a session that never calls
          // cleanupSnapshots still leaves no disk behind
          val conf = spark.sparkContext.hadoopConfiguration
          org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
            new Runnable { def run(): Unit = deletePaths(conf) }, 30)
        }
        spark.read.parquet(path)
      case None => df.localCheckpoint()
    }
  }

  // snapshot(): each call writes a snap_<uuid> parquet dir that nothing
  // would otherwise remove (localCheckpoint state at least dies with the
  // SparkContext) — a long-lived session running the dedup/cluster query
  // family repeatedly would accumulate unbounded checkpoint-dir disk.
  private val snapPaths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val hookRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deletePaths(conf: org.apache.hadoop.conf.Configuration): Long = {
    var n = 0L
    var p = snapPaths.poll()
    while (p != null) {
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        if (hp.getFileSystem(conf).delete(hp, true)) n += 1
      } catch { case _: java.io.IOException => } // best-effort, like cleanCheckpoints
      p = snapPaths.poll()
    }
    n
  }

  /** Delete every snapshot written so far; returns the count removed.
    * Safe to call between query families in a long-lived session — a
    * snapshot is only read by the job that wrote it, so once that
    * query's action has completed its snapshot is dead weight. The
    * JVM shutdown hook reaps anything not explicitly cleaned.
    */
  def cleanupSnapshots(spark: org.apache.spark.sql.SparkSession): Long =
    deletePaths(spark.sparkContext.hadoopConfiguration)
}
