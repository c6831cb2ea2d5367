package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Manifest

/** Lake-maintenance planners over the file manifest — the operations a
  * 100 TB Hive-partitioned lake needs between writes and reads:
  * small-file compaction planning, incremental aggregate maintenance
  * from a change feed, and Z-order layout analysis for
  * multi-dimensional file skipping. The reference stops at listing /
  * matching / change detection (reference src/index.ts:798
  * `S3PathMatcher`, :390 `ChangeDetectionEngine`); these are the
  * natural next ops a user of that toolkit runs on its outputs.
  *
  * All three are manifest-shaped: at 10⁸ objects the manifest is big
  * data, so every plan here is a DataFrame op whose only shuffle is
  * keyed by the partition directory (compaction, incremental agg) or
  * the Z-bin (layout) — never a global sort, never a driver loop.
  */
object Maintenance {

  // ---- small-file compaction planner ------------------------------------

  /** Target compacted output size. The synthesized manifest has files of
    * 1 KiB..4 MiB, so 8 MiB bins force real multi-file packing; a real
    * lake would use 128 MiB (one HDFS/S3 block-ish output per bin).
    */
  val CompactTarget: Long = 8L * 1024 * 1024

  /** Greedy first-fit compaction bins per partition directory: files are
    * ordered by key within their partition dir, and each file joins the
    * bin at `floor(bytes-before-it / target)`. Because every file is
    * smaller than the target, consecutive files land in consecutive
    * bins and each bin closes within one file of the target — the
    * classic sharded greedy packer (same shape as [[Corpus]] pack_bins,
    * applied to bytes instead of tokens).
    *
    * Scale: the cumsum window partitions by partition dir — thousands
    * of independent shards, each a few thousand files — so the shuffle
    * is one hash exchange on pdir and no shard ever concentrates the
    * manifest. Output is one row per partition dir (bounded by the
    * partition count, not the file count).
    */
  def compactPlan(s: SparkSession, dir: String): DataFrame =
    compactPlanFor(Manifest.manifest(s, dir), CompactTarget).orderBy("pdir")

  /** [[compactPlan]] over ANY manifest frame (`key`, `size`) with a
    * caller-chosen target — the library entry point.
    */
  def compactPlanFor(manifest: DataFrame, target: Long): DataFrame = {
    val files = manifest
      .withColumn("pdir", regexp_replace(col("key"), "/part-[^/]*$", ""))
    val w = Window.partitionBy("pdir").orderBy("key")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = files
      .withColumn("cum", sum("size").over(w))
      .withColumn("bin", expr(s"(cum - size) div $target"))
    binned
      .groupBy("pdir", "bin")
      .agg(count(lit(1)).as("bin_files"), sum("size").as("bin_bytes"))
      .groupBy("pdir")
      .agg(
        sum("bin_files").as("n_files"),
        sum("bin_bytes").as("total_bytes"),
        count(lit(1)).as("n_bins"),
        max("bin_bytes").as("max_bin_bytes"))
  }

  val compactPlanSql: String =
    s"""${Manifest.duckWith}, files AS (
       |  SELECT regexp_replace(key, '/part-[^/]*$$', '') AS pdir, key, size FROM manifest
       |), binned AS (
       |  SELECT pdir, size,
       |    (CAST(SUM(size) OVER (PARTITION BY pdir ORDER BY key
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - size)
       |      // $CompactTarget AS bin
       |  FROM files
       |), bins AS (
       |  SELECT pdir, bin, COUNT(*) AS bin_files, CAST(SUM(size) AS BIGINT) AS bin_bytes
       |  FROM binned GROUP BY 1, 2
       |)
       |SELECT pdir, CAST(SUM(bin_files) AS BIGINT) AS n_files,
       |  CAST(SUM(bin_bytes) AS BIGINT) AS total_bytes,
       |  COUNT(*) AS n_bins, MAX(bin_bytes) AS max_bin_bytes
       |FROM bins GROUP BY pdir ORDER BY pdir""".stripMargin

  // ---- incremental aggregate maintenance ---------------------------------

  private val DayDirRe = "^(data/year=\\d+/month=\\d+/day=\\d+)"

  /** Incremental maintenance of a per-day-partition (file count, byte
    * total) aggregate: instead of re-scanning the current listing, the
    * maintained value is previous aggregate + deltas from the prev⋈cur
    * change feed (Added +size, Deleted −size, Modified size diff) —
    * exactly the state the reference's ChangeDetectionEngine
    * (src/index.ts:390, `commitChanges`) hands a caller after a sweep.
    * The query computes BOTH paths and emits a `consistent` flag per
    * partition, so the oracle pins incremental ≡ full recompute.
    *
    * Scale: at 10⁸ objects the full recompute scans the whole listing
    * every sweep; the incremental path shuffles only the change feed
    * (|changes| ≪ |manifest|) against an aggregate table whose
    * cardinality is the partition count. That asymmetry — touch the
    * changes, not the lake — is the entire point of maintaining state.
    */
  def incrAgg(s: SparkSession, dir: String): DataFrame =
    incrAggFor(Manifest.snapshotPrev(s, dir), Manifest.snapshotCur(s, dir), DayDirRe)
      .orderBy("day_dir")

  /** [[incrAgg]] over ANY two snapshot frames (`key`, `size`) with a
    * caller-chosen partition-extraction regex — the library entry point.
    */
  def incrAggFor(prevSnap: DataFrame, curSnap: DataFrame, dirRe: String): DataFrame = {
    val prev = prevSnap.select(col("key"), col("size").as("psize"))
    val cur = curSnap.select(col("key"), col("size").as("csize"))
    val dayDir = regexp_extract(col("key"), dirRe, 1)

    val prevAgg = prev.groupBy(dayDir.as("day_dir"))
      .agg(count(lit(1)).as("n_prev"), sum("psize").as("bytes_prev"))
    val fullAgg = cur.groupBy(dayDir.as("day_dir"))
      .agg(count(lit(1)).as("n_files_full"), sum("csize").as("bytes_full"))

    val deltas = prev.join(cur, Seq("key"), "full_outer")
      .groupBy(dayDir.as("day_dir"))
      .agg(
        sum(when(col("psize").isNull, 1L).when(col("csize").isNull, -1L).otherwise(0L))
          .as("d_files"),
        sum(coalesce(col("csize"), lit(0L)) - coalesce(col("psize"), lit(0L)))
          .as("d_bytes"))

    val incr = prevAgg.join(deltas, Seq("day_dir"), "full_outer")
      .select(col("day_dir"),
        (coalesce(col("n_prev"), lit(0L)) + coalesce(col("d_files"), lit(0L))).as("n_files_incr"),
        (coalesce(col("bytes_prev"), lit(0L)) + coalesce(col("d_bytes"), lit(0L))).as("bytes_incr"))

    fullAgg.join(incr, Seq("day_dir"), "full_outer")
      .select(col("day_dir"),
        coalesce(col("n_files_full"), lit(0L)).as("n_files_full"),
        coalesce(col("bytes_full"), lit(0L)).as("bytes_full"),
        col("n_files_incr"), col("bytes_incr"))
      .withColumn("consistent",
        col("n_files_full") === col("n_files_incr") && col("bytes_full") === col("bytes_incr"))
  }

  val incrAggSql: String =
    s"""${Manifest.duckSnapshots}, prev_agg AS (
       |  SELECT regexp_extract(key, '$DayDirRe', 1) AS day_dir,
       |    COUNT(*) AS n_prev, CAST(SUM(size) AS BIGINT) AS bytes_prev
       |  FROM prev GROUP BY 1
       |), full_agg AS (
       |  SELECT regexp_extract(key, '$DayDirRe', 1) AS day_dir,
       |    COUNT(*) AS n_files_full, CAST(SUM(size) AS BIGINT) AS bytes_full
       |  FROM cur GROUP BY 1
       |), deltas AS (
       |  SELECT regexp_extract(COALESCE(p.key, c.key), '$DayDirRe', 1) AS day_dir,
       |    CAST(SUM(CASE WHEN p.key IS NULL THEN 1 WHEN c.key IS NULL THEN -1 ELSE 0 END) AS BIGINT) AS d_files,
       |    CAST(SUM(COALESCE(c.size, 0) - COALESCE(p.size, 0)) AS BIGINT) AS d_bytes
       |  FROM prev p FULL OUTER JOIN cur c ON p.key = c.key
       |  GROUP BY 1
       |), incr AS (
       |  SELECT COALESCE(pa.day_dir, d.day_dir) AS day_dir,
       |    COALESCE(pa.n_prev, 0) + COALESCE(d.d_files, 0) AS n_files_incr,
       |    COALESCE(pa.bytes_prev, 0) + COALESCE(d.d_bytes, 0) AS bytes_incr
       |  FROM prev_agg pa FULL OUTER JOIN deltas d ON pa.day_dir = d.day_dir
       |)
       |SELECT COALESCE(f.day_dir, i.day_dir) AS day_dir,
       |  COALESCE(f.n_files_full, 0) AS n_files_full,
       |  COALESCE(f.bytes_full, 0) AS bytes_full,
       |  i.n_files_incr, i.bytes_incr,
       |  COALESCE(f.n_files_full, 0) = i.n_files_incr
       |    AND COALESCE(f.bytes_full, 0) = i.bytes_incr AS consistent
       |FROM full_agg f FULL OUTER JOIN incr i ON f.day_dir = i.day_dir
       |ORDER BY day_dir""".stripMargin

  // ---- Z-order layout analysis -------------------------------------------

  val ZBits = 8        // 8 bits per dimension → 16-bit Z-value
  val ZBinWidth = 1024 // 65536 / 1024 = 64 layout bins

  /** Bit-interleave Z-value of two 8-bit dimensions as pure integer
    * arithmetic: z = Σᵢ bitᵢ(x)·4ⁱ + 2·bitᵢ(y)·4ⁱ. Identical `%`/div
    * chains on both engines — no shifts (DuckDB range-checks signed
    * `<<` where Spark wraps), no HOF needed.
    */
  private def zExpr(x: String, y: String, intDiv: String): String =
    (0 until ZBits).map { i =>
      val p = 1L << i
      s"(($x $intDiv $p) % 2) * ${1L << (2 * i)} + (($y $intDiv $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Z-order layout analysis over events keyed by (user bucket, day):
    * assign each row its interleaved Z-value and aggregate per layout
    * bin (the file a `repartitionByRange(zbin)` write would produce),
    * emitting each bin's bounding box on BOTH dimensions. Z-ordering's
    * value proposition is that those per-file min/max ranges are tight
    * on every interleaved dimension at once — which is exactly what
    * parquet zone-map skipping consumes — versus a lexicographic
    * layout, where the secondary dimension's range per file is the full
    * domain. `bbox_area` makes that measurable per bin.
    *
    * Scale: the Z-value is map-side integer math on the scan; the only
    * shuffle is the partial-agg groupBy on the 64 bins. A production
    * writer would `repartitionByRange(col("z"))` and write — same
    * exchange, data-volume invariant.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.events(s, dir)
      .withColumn("x", expr("user_id % 256"))
      .withColumn("y", expr("(ts_us div 86400000000) % 256"))
      .withColumn("z", expr(zExpr("x", "y", "div")))
      .withColumn("zbin", expr(s"z div $ZBinWidth"))
    e.groupBy("zbin")
      .agg(
        count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .withColumn("bbox_area",
        (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
      .orderBy("zbin")
  }

  val zorderLayoutSql: String =
    s"""WITH dims AS (
       |  SELECT user_id % 256 AS x, (epoch_us(ts) // 86400000000) % 256 AS y FROM events
       |), zvals AS (
       |  SELECT x, y, ${zExpr("x", "y", "//")} AS z FROM dims
       |)
       |SELECT z // $ZBinWidth AS zbin, COUNT(*) AS n,
       |  MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
       |  (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS bbox_area
       |FROM zvals GROUP BY 1 ORDER BY 1""".stripMargin

  /** Append a Z-value column interleaving `xCol` and `yCol` (each taken
    * mod 2^[[ZBits]]) — the write-side companion of [[zorderLayout]]:
    * `df.withColumn("z", …)` then `repartitionByRange(n, col("z"))`
    * gives every output file a tight bounding box on BOTH dimensions,
    * which parquet zone-map / file-stats skipping consumes directly
    * (SinkSpec measures the file-count win vs a lexicographic layout).
    */
  def zvalue(xCol: String, yCol: String): org.apache.spark.sql.Column =
    expr(zExpr(s"($xCol % 256)", s"($yCol % 256)", "div"))

  /** Small-file threshold for the skew report: files under 64 KiB are
    * the metadata-pressure population a compaction pass exists to fix.
    */
  val SmallFileBytes: Long = 64L * 1024

  /** Partition-dir skew report: per-dir file count, byte volume, the
    * small-file population, and a `skewed` flag for dirs holding more
    * than 4× the mean bytes — the planner's view of WHERE compaction /
    * repartitioning is needed before a query hits the hot dirs. The
    * mean never becomes a double: the flag cross-multiplies in BIGINT
    * (bytes · n_dirs > 4 · total). Shape: one pdir-keyed partial agg
    * over the manifest + ONE-ROW totals broadcast back (1×n) — at 10⁸
    * objects the listing aggregates map-side to directory cardinality.
    */
  def partitionSkew(s: SparkSession, dir: String): DataFrame =
    partitionSkewFor(Manifest.manifest(s, dir)).orderBy("pdir")

  /** [[partitionSkew]] over ANY manifest frame (`key`, `size`). */
  def partitionSkewFor(manifest: DataFrame): DataFrame = {
    val perDir = Materialize.stable(manifest
      .withColumn("pdir", regexp_replace(col("key"), "/part-[^/]*$", ""))
      .groupBy("pdir")
      .agg(count(lit(1)).as("n_files"),
        sum("size").as("bytes"),
        sum(when(col("size") < SmallFileBytes, 1L).otherwise(0L)).as("n_small_files")))
    val totals = perDir.agg(
      count(lit(1)).as("n_dirs"), sum("bytes").as("total_bytes"))
    perDir.join(broadcast(totals))
      .withColumn("skewed", col("bytes") * col("n_dirs") > col("total_bytes") * 4)
      .select("pdir", "n_files", "bytes", "n_small_files", "skewed")
  }

  val partitionSkewSql: String =
    s"""${Manifest.duckWith}, per_dir AS (
       |  SELECT regexp_replace(key, '/part-[^/]*$$', '') AS pdir,
       |    COUNT(*) AS n_files, CAST(SUM(size) AS BIGINT) AS bytes,
       |    CAST(SUM(CASE WHEN size < $SmallFileBytes THEN 1 ELSE 0 END) AS BIGINT) AS n_small_files
       |  FROM manifest GROUP BY 1),
       |t AS (SELECT COUNT(*) AS n_dirs, CAST(SUM(bytes) AS BIGINT) AS total_bytes FROM per_dir)
       |SELECT pdir, n_files, bytes, n_small_files,
       |  bytes * n_dirs > total_bytes * 4 AS skewed
       |FROM per_dir, t ORDER BY pdir""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compact_plan" -> (compactPlan _),
    "incr_agg" -> (incrAgg _),
    "zorder_layout" -> (zorderLayout _),
    "partition_skew" -> (partitionSkew _))

  val oracles: Map[String, String] = Map(
    "compact_plan" -> compactPlanSql,
    "incr_agg" -> incrAggSql,
    "zorder_layout" -> zorderLayoutSql,
    "partition_skew" -> partitionSkewSql)
}
