package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.sources.Tables

/** Probabilistic sketches as PORTABLE ARITHMETIC (SURVEY §2): a
  * HyperLogLog distinct-count and a Count-Min frequency sketch built
  * from the same poly-hash family as the dedup signatures — no
  * engine-native approx functions (Spark's approx_count_distinct and
  * DuckDB's are different HLL implementations and can never
  * hash-match; these are bit-identical on both engines).
  *
  * Portability discipline: every sketch internal is an INTEGER
  * (bucket maxima, 2^(R-M) numerators, counter minima). The only
  * double math is literal-constant multiplication/division at the very
  * end (correctly-rounded IEEE ops) — never ln/pow/libm calls, whose
  * last-ulp behavior differs across runtimes.
  *
  * Scale shape = the textbook distributed sketch merge: partial
  * aggregation computes per-partition bucket maxima / counter sums
  * map-side, the shuffle carries ONE row per (group, bucket) — the
  * sketch merge IS the aggregate. At 100 TB the shuffle volume is the
  * sketch size (KBs per group), not the data.
  */
object Sketches {
  import PortableHash.P

  // ---- HyperLogLog ------------------------------------------------------

  val HllP = 9 // 2^9 = 512 buckets
  val HllM = 1 << HllP
  val HllWBits = 22 // 31-bit hash - 9 bucket bits
  // alpha for m >= 128 (Flajolet et al.): literal-only arithmetic so the
  // constant folds identically on both engines
  def alphaExpr(m: Int) = s"(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($m AS DOUBLE)))"

  /** distinct active user-days per event_type: exact vs portable-HLL
    * estimate. The cardinality (users × days, thousands) sits in the
    * raw-estimate regime (n > 2.5m), where HLL needs NO ln-based
    * small-range correction — which matters here because ln is a libm
    * call whose last ulp differs across runtimes, while the raw
    * estimate is all exactly-rounded mult/div. rank = leading zeros of
    * the 22-bit suffix + 1, via binary string length (integer-exact on
    * both engines); the harmonic denominator is an exact BIGINT
    * numerator over the implicit 2^23. The hash is the char-wise
    * poly-31 kernel over the key's decimal string — an affine
    * (a·x+b) mod P hash has structured high bits and blows up HLL
    * variance (measured: 24% vs 10% max error). This is the RAW
    * estimator (no HLL++ bias table, whose ln-based small-range
    * correction would drag libm's last-ulp differences into the
    * oracle): expect +5-10% in the n≈3m regime; n_present is emitted
    * so a consumer can apply linear counting themselves.
    */
  def sketchHll(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"),
        expr("user_id * 1000003 + ts_us div 86400000000").as("user_day"))
      .withColumn("h", expr(PortableHash.sparkWordHash("CAST(user_day AS STRING)")))
      .withColumn("bucket", expr(s"h % $HllM"))
      .withColumn("w", expr(s"h div $HllM"))
      .withColumn("rank", expr(s"CASE WHEN w = 0 THEN ${HllWBits + 1} ELSE ${HllWBits + 1} - length(bin(w)) END"))
    val buckets = e.groupBy("event_type", "bucket").agg(max("rank").as("mr"))
    buckets.groupBy("event_type")
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllWBits + 1 - mr)")).as("present_num"))
      .withColumn("numerator",
        expr(s"present_num + (CAST($HllM AS BIGINT) - n_present) * CAST(${1L << (HllWBits + 1)} AS BIGINT)"))
      .withColumn("hll_estimate", expr(
        s"floor(${alphaExpr(HllM)} * CAST($HllM AS DOUBLE) * CAST($HllM AS DOUBLE) * CAST(${1L << (HllWBits + 1)} AS DOUBLE) / CAST(numerator AS DOUBLE) * 1000000) / CAST(1000000 AS DOUBLE)"))
      .join(Tables.events(s, dir).groupBy("event_type")
        .agg(countDistinct(expr("user_id * 1000003 + ts_us div 86400000000")).as("n_exact")),
        Seq("event_type"))
      .select("event_type", "n_exact", "n_present", "numerator", "hll_estimate")
      .orderBy("event_type")
  }

  val sketchHllSql: String =
    s"""WITH hashed AS (
       |  SELECT event_type,
       |    ${PortableHash.duckWordHash("CAST(user_id * 1000003 + epoch_us(ts) // 86400000000 AS VARCHAR)")} AS h
       |  FROM events
       |), ranked AS (
       |  SELECT event_type, h % $HllM AS bucket,
       |    CASE WHEN h // $HllM = 0 THEN ${HllWBits + 1}
       |         ELSE ${HllWBits + 1} - length(bin(h // $HllM)) END AS rank
       |  FROM hashed
       |), buckets AS (
       |  SELECT event_type, bucket, MAX(rank) AS mr FROM ranked GROUP BY 1, 2
       |), merged AS (
       |  SELECT event_type,
       |    COUNT(*) AS n_present,
       |    CAST(SUM(CAST(1 AS BIGINT) << ($HllWBits + 1 - mr)) AS BIGINT)
       |      + (CAST($HllM AS BIGINT) - COUNT(*)) * ${1L << (HllWBits + 1)} AS numerator
       |  FROM buckets GROUP BY 1
       |)
       |SELECT m.event_type, x.n_exact, m.n_present, m.numerator,
       |  floor(${alphaExpr(HllM)} * CAST($HllM AS DOUBLE) * CAST($HllM AS DOUBLE) * CAST(${1L << (HllWBits + 1)} AS DOUBLE) / CAST(numerator AS DOUBLE) * 1000000) / CAST(1000000 AS DOUBLE) AS hll_estimate
       |FROM merged m JOIN (
       |  SELECT event_type,
       |    COUNT(DISTINCT user_id * 1000003 + epoch_us(ts) // 86400000000) AS n_exact
       |  FROM events GROUP BY 1) x
       |  USING (event_type)
       |ORDER BY event_type""".stripMargin

  // ---- Count-Min --------------------------------------------------------

  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-Min frequency sketch over user_id traffic: build depth×width
    * integer counters from the whole events table, then point-query the
    * heaviest users. Estimate = min over rows — pure integer ops; the
    * output pins estimate vs exact count (estimate >= exact always; the
    * spec-visible property of CMS).
    */
  def sketchCms(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"))
    val rows = e
      .withColumn("i", explode(expr(s"sequence(0, ${CmsDepth - 1})")))
      .withColumn("bucket", expr(s"((1 + i * 604297) * (user_id % $P) + (i * 8191 + 12289)) % $P % $CmsWidth"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))
    val heavy = e.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(20)
    val probes = heavy
      .withColumn("i", explode(expr(s"sequence(0, ${CmsDepth - 1})")))
      .withColumn("bucket", expr(s"((1 + i * 604297) * (user_id % $P) + (i * 8191 + 12289)) % $P % $CmsWidth"))
    probes.join(rows, Seq("i", "bucket"))
      .groupBy("user_id", "n_exact")
      .agg(min("c").as("cms_estimate"))
      .withColumn("overestimate", col("cms_estimate") - col("n_exact"))
      .select("user_id", "n_exact", "cms_estimate", "overestimate")
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  val sketchCmsSql: String =
    s"""WITH rows_ AS (
       |  SELECT i, ((1 + i * 604297) * (user_id % $P) + (i * 8191 + 12289)) % $P % $CmsWidth AS bucket,
       |    COUNT(*) AS c
       |  FROM events CROSS JOIN (SELECT unnest(range(0, $CmsDepth)) AS i) d
       |  GROUP BY 1, 2
       |), heavy AS (
       |  SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY 1
       |  ORDER BY n_exact DESC, user_id LIMIT 20
       |), probes AS (
       |  SELECT user_id, n_exact, i,
       |    ((1 + i * 604297) * (user_id % $P) + (i * 8191 + 12289)) % $P % $CmsWidth AS bucket
       |  FROM heavy CROSS JOIN (SELECT unnest(range(0, $CmsDepth)) AS i) d
       |)
       |SELECT p.user_id, p.n_exact, MIN(r.c) AS cms_estimate,
       |  MIN(r.c) - p.n_exact AS overestimate
       |FROM probes p JOIN rows_ r ON p.i = r.i AND p.bucket = r.bucket
       |GROUP BY p.user_id, p.n_exact
       |ORDER BY p.n_exact DESC, p.user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll" -> (sketchHll _),
    "sketch_cms" -> (sketchCms _))

  val oracles: Map[String, String] = Map(
    "sketch_hll" -> sketchHllSql,
    "sketch_cms" -> sketchCmsSql)
}
