package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The file-manifest table: the reference's S3 object listing
  * (reference src/index.ts:340 `ObjectMetadata` — key/size/etag/
  * lastModified) re-expressed as a DataFrame.
  *
  * At 100 TB an object listing is itself big data (10⁸ keys), so every
  * manifest operation (glob match, hive parse, change detect, stats) is a
  * DataFrame op — never a driver-side loop. The testdata has no real
  * bucket, so the manifest is synthesized **deterministically** from the
  * `events` table with arithmetic that is portable between Spark and the
  * DuckDB oracle (`duckWith` is the same derivation in DuckDB SQL).
  *
  * Layout mirrors a Hive-partitioned lake:
  *   data/year=YYYY/month=MM/day=DD/event_type=T/part-<id>.<ext>
  */
object Manifest {
  val extensions: Seq[String] =
    Seq("parquet", "json", "csv", "txt", "log", "png", "jpg", "gz", "bin", "html")

  /** key/size/etag/last_modified_us manifest derived from events. */
  def manifest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val ext = element_at(
      array(extensions.map(lit): _*),
      (pmod(col("event_id"), lit(10)) + 1).cast("int"))
    e.select(
      col("event_id"),
      concat(
        lit("data/year="), year(col("ts")).cast("string"),
        lit("/month="), lpad(month(col("ts")).cast("string"), 2, "0"),
        lit("/day="), lpad(dayofmonth(col("ts")).cast("string"), 2, "0"),
        lit("/event_type="), col("event_type"),
        lit("/part-"), col("event_id").cast("string"),
        lit("."), ext
      ).as("key"),
      // event_id is pre-reduced mod the modulus before each multiply so
      // the product never wraps Long / overflows DuckDB BIGINT at very
      // large ids — identical residues by modular arithmetic
      (lit(1024L) + pmod(pmod(col("event_id"), lit(4194304L)) * lit(2654435761L), lit(4194304L))).as("size"),
      pmod(pmod(col("event_id"), lit(2147483647L)) * lit(1103515245L) + lit(12345L), lit(2147483647L))
        .cast("string").as("etag"),
      (col("ts_us").divide(lit(1000000L)).cast("long") * lit(1000000L)).as("last_modified_us")
    )
  }

  /** Identical derivation as a DuckDB CTE body (oracle side). */
  val duckManifest: String =
    """SELECT event_id,
      |  'data/year=' || CAST(year(ts) AS VARCHAR) ||
      |  '/month=' || lpad(CAST(month(ts) AS VARCHAR), 2, '0') ||
      |  '/day=' || lpad(CAST(day(ts) AS VARCHAR), 2, '0') ||
      |  '/event_type=' || event_type ||
      |  '/part-' || CAST(event_id AS VARCHAR) || '.' ||
      |  (['parquet','json','csv','txt','log','png','jpg','gz','bin','html'])[CAST(event_id % 10 + 1 AS INT)] AS key,
      |  1024 + ((event_id % 4194304) * 2654435761) % 4194304 AS size,
      |  CAST(((event_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS VARCHAR) AS etag,
      |  (epoch_us(ts) // 1000000) * 1000000 AS last_modified_us
      |FROM events""".stripMargin

  val duckWith: String = s"WITH manifest AS (\n$duckManifest\n)"

  /** Two deterministic snapshots of the manifest for change detection
    * (reference src/index.ts:390 ChangeDetectionEngine previous/current
    * state maps). `prev` drops every 13th key (→ Added in cur), mutates
    * size/etag/mtime on every 7th (→ Modified); `cur` drops every 11th
    * (→ Deleted from prev).
    */
  def snapshotPrev(s: SparkSession, dir: String): DataFrame =
    manifest(s, dir)
      .filter(pmod(col("event_id"), lit(13)) =!= 0)
      .withColumn("size",
        when(pmod(col("event_id"), lit(7)) === 0, col("size") + 17).otherwise(col("size")))
      .withColumn("etag",
        when(pmod(col("event_id"), lit(7)) === 0, concat(col("etag"), lit("x")))
          .otherwise(col("etag")))
      .withColumn("last_modified_us",
        when(pmod(col("event_id"), lit(7)) === 0, col("last_modified_us") - 3600000000L)
          .otherwise(col("last_modified_us")))

  def snapshotCur(s: SparkSession, dir: String): DataFrame =
    manifest(s, dir).filter(pmod(col("event_id"), lit(11)) =!= 0)

  val duckSnapshots: String =
    s"""WITH manifest AS (
       |$duckManifest
       |), prev AS (
       |  SELECT event_id, key,
       |    CASE WHEN event_id % 7 = 0 THEN size + 17 ELSE size END AS size,
       |    CASE WHEN event_id % 7 = 0 THEN etag || 'x' ELSE etag END AS etag,
       |    CASE WHEN event_id % 7 = 0 THEN last_modified_us - 3600000000 ELSE last_modified_us END AS last_modified_us
       |  FROM manifest WHERE event_id % 13 <> 0
       |), cur AS (
       |  SELECT * FROM manifest WHERE event_id % 11 <> 0
       |)""".stripMargin
}
