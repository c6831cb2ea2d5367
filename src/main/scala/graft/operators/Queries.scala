package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core analytics queries (TPC-H-ish + events time series).
  *
  * Determinism-for-oracle rules used across the engine:
  *   - money math is done in DECIMAL (exact, order-independent), rounded
  *     to 2 decimals, then cast to double — bit-identical between Spark
  *     and the DuckDB oracle regardless of aggregation order;
  *   - time math is done in integer epoch MICROSECONDS (`unix_micros` /
  *     DuckDB `epoch_us`) — exact parity, no ns-vs-us truncation drift;
  *   - every query has a total deterministic sort for stable output.
  *
  * Scale notes: dims (region/nation/supplier/customer) stay under the
  * broadcast threshold at any SF where they're dims; the lineitem/orders
  * fact joins shuffle on their join keys once, AQE handles skew/coalesce.
  */
object Queries {
  // decimal casts shared by the money queries
  private def dec(c: String) = col(c).cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(3,2)")

  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_base_price"),
        round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2).cast("double").as("sum_disc_price"),
        round(sum(dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax"))), 2).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(12,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority: revenue of undelivered orders for one segment.
    * customer is a dim → broadcast; orders⋈lineitem shuffles on orderkey.
    */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-03-15"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-03-15"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2).cast("double").as("revenue"))
      .select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Local-supplier revenue per nation in one region & year window.
    * region→nation→supplier/customer are all broadcast dims; the only
    * shuffle is lineitem⋈orders on orderkey.
    */
  def q5Region(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val sup = Tables.supplier(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5RegionSql: String =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Forecast-revenue-change: the pure pushed-filter scan + single agg. */
  def q6Filter(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(round(sum(dec("l_extendedprice") * dec("l_discount")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  val q6FilterSql: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Per-customer order rank + running spend (window functions). */
  def qWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rank_in_cust", row_number().over(w).cast("long"))
      .withColumn("running_spend",
        sum(dec("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rank_in_cust") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rank_in_cust"),
        round(col("running_spend"), 2).cast("double").as("running_spend"))
      .orderBy("o_custkey", "rank_in_cust")
  }

  val qWindowSql: String =
    """SELECT o_custkey, o_orderkey, rank_in_cust,
      |  CAST(ROUND(running_spend, 2) AS DOUBLE) AS running_spend
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rank_in_cust,
      |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend
      |  FROM orders) t
      |WHERE rank_in_cust <= 3 ORDER BY o_custkey, rank_in_cust""".stripMargin

  /** Global top-k (TakeOrderedAndProject — no full sort at scale). */
  def qTopk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        round(dec("o_totalprice"), 2).cast("double").as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val qTopkSql: String =
    """SELECT o_orderkey, o_custkey, CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ---- events time series ----------------------------------------------

  /** Tumbling 1-hour window aggregate per event type (integer-micros
    * bucketing for exact oracle parity).
    */
  def eventsWindowAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("hour_bucket", expr("ts_us div 3600000000"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(dec("value")), 2).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_bucket", "event_type")
  }

  val eventsWindowAggSql: String =
    """SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min inactivity) — lag + cumulative sum
    * windows, all integer micros.  At 100 TB this is one shuffle on
    * user_id; state never leaves the executors.
    */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
            .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_seq", sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts_us")).as("session_start_us"), max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(dec("value")), 2).cast("double").as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  val eventsSessionizeSql: String =
    """SELECT user_id, session_seq, MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
      |  COUNT(*) AS n_events, CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT user_id, value, ts_us,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM (
      |    SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
      |      CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
      |        OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
      |        THEN 1 ELSE 0 END AS is_new
      |    FROM events) a) b
      |GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin

  /** 15-minute downsample per event type. */
  def eventsDownsample(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("bucket_15m", expr("ts_us div 900000000"))
      .groupBy("bucket_15m", "event_type")
      .agg(count(lit(1)).as("n"),
        (sum(dec("value")).cast("double") / count(lit(1))).as("avg_value"),
        round(max(dec("value")), 2).cast("double").as("max_value"))
      .orderBy("bucket_15m", "event_type")
  }

  val eventsDownsampleSql: String =
    """SELECT CAST(FLOOR(epoch_us(ts) / 900000000) AS BIGINT) AS bucket_15m, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
      |  CAST(ROUND(MAX(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS max_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Semi-structured extraction from the JSON props column. */
  def eventsJson(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"), max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  val eventsJsonSql: String =
    """SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n, MAX(k) AS max_k
      |FROM (SELECT event_type, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** AS-OF join, Spark-first: each purchase picks the user's most
    * recent click at-or-before it. NOT a per-row subquery or a
    * cartesian: both event streams merge into ONE user-partitioned
    * window pass, and `last(click-only column, ignoreNulls)` carries
    * the running "most recent click" forward — one shuffle on user_id,
    * linear scan within each user, identical cost to sessionize. This
    * is how an as-of join stays O(n) at 100 TB; an inequality join
    * would be O(n·m) per user. (DuckDB spells the same thing ASOF
    * JOIN; the oracle uses the window form so tie-break semantics —
    * order by (ts, event_id) — are bit-identical.)
    */
  def eventsAsof(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("click_ts", when(col("event_type") === "click", col("ts_us")))
      .withColumn("click_val", when(col("event_type") === "click", dec("value")))
      .withColumn("last_click_ts_us", last(col("click_ts"), ignoreNulls = true).over(w))
      .withColumn("last_click_value",
        round(last(col("click_val"), ignoreNulls = true).over(w), 2).cast("double"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("last_click_ts_us"),
        (col("ts_us") - col("last_click_ts_us")).as("gap_us"),
        col("last_click_value"))
      .orderBy("user_id", "event_id")
  }

  val eventsAsofSql: String =
    """SELECT user_id, event_id, ts_us, last_click_ts_us,
      |  ts_us - last_click_ts_us AS gap_us, last_click_value
      |FROM (
      |  SELECT user_id, event_id, event_type, ts_us,
      |    last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts_us,
      |    CAST(ROUND(last_value(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS last_click_value
      |  FROM (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us FROM events) e) t
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, event_id""".stripMargin

  /** RANGE join, Spark-first: clicks within the 5 minutes before each
    * error, per user. The naive formulation is an inequality join
    * (cartesian within user); the scale shape is BANDED: bucket both
    * sides by ts div W, probe each error's bucket AND the previous one
    * (two equi-join keys cover any window that spans a bucket edge),
    * then filter the exact range. Join volume is bounded by events per
    * 2W of time per user — never user-cartesian.
    */
  val RangeWindowUs = 300000000L // 5 minutes

  def eventsRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id"), col("ts_us"),
        expr(s"ts_us div $RangeWindowUs").as("b0"))
      .withColumn("e_bucket", explode(array(col("b0") - 1, col("b0"))))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("click_ts"),
        dec("value").as("cv"), expr(s"ts_us div $RangeWindowUs").as("c_bucket"))
    // the range predicate is part of the JOIN condition (a left join
    // followed by a range filter would drop errors whose candidate
    // clicks all miss the window); each matching click lands in exactly
    // one of the two probe buckets, so the groupBy merges both probes
    // without double counting
    errors.join(clicks,
        col("e_user") === col("c_user") && col("e_bucket") === col("c_bucket") &&
          col("click_ts") < col("ts_us") && col("click_ts") >= col("ts_us") - RangeWindowUs,
        "left")
      .groupBy(col("e_user").as("user_id"), col("event_id"), col("ts_us"))
      .agg(count(col("click_ts")).as("n_clicks_5m"),
        coalesce(round(sum(col("cv")), 2).cast("double"), lit(0.0)).as("sum_click_value"))
      .orderBy("user_id", "event_id")
  }

  val eventsRangeJoinSql: String =
    s"""SELECT e.user_id, e.event_id, e.ts_us,
       |  CAST(COUNT(c.click_ts) AS BIGINT) AS n_clicks_5m,
       |  COALESCE(CAST(ROUND(SUM(c.cv), 2) AS DOUBLE), 0.0) AS sum_click_value
       |FROM (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error') e
       |LEFT JOIN (
       |  SELECT user_id, epoch_us(ts) AS click_ts, CAST(value AS DECIMAL(12,2)) AS cv
       |  FROM events WHERE event_type = 'click') c
       |  ON e.user_id = c.user_id
       |  AND c.click_ts < e.ts_us AND c.click_ts >= e.ts_us - $RangeWindowUs
       |GROUP BY e.user_id, e.event_id, e.ts_us
       |ORDER BY e.user_id, e.event_id""".stripMargin

  /** staged conversion funnel: signup → first click after signup →
    * first purchase after that click, per user. Each stage is a
    * filtered partial-agg (min ts) plus an equi-join on user_id — the
    * strictly-sequential semantics ("after the previous stage") without
    * any ordered collect_list, whose struct ordering isn't portable
    * across engines. Three small shuffles on user_id, all
    * AQE-coalesced; no windows, no per-user arrays.
    */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def stage(tpe: String) = e.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts_us"))
    // each stage frame feeds the NEXT stage's join AND its own one-row
    // summary — materialize (user-cardinality, DISK_ONLY) so the events
    // scan behind s1/s2 doesn't re-run per consumer
    val s1 = Materialize.stable(
      stage("signup").groupBy("user_id").agg(min("ts_us").as("t1")))
    val s2 = Materialize.stable(stage("click").join(s1, Seq("user_id"))
      .filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"), first("t1").as("t1")))
    val s3 = stage("purchase").join(s2, Seq("user_id"))
      .filter(col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"), first("t2").as("t2"))
    // the three ONE-ROW stage summaries combine via crossJoin — a 1×1
    // broadcast, intentionally allowlisted in the PlanSpec sweep (the
    // sweep exists to catch accidental DATA-sized cartesians)
    s1.agg(count(lit(1)).as("n_signup")).crossJoin(
      s2.agg(count(lit(1)).as("n_click_after"),
        expr("floor(CAST(sum(t2 - t1) AS DOUBLE) / count(1) * 1000000) / CAST(1000000 AS DOUBLE)")
          .as("avg_signup_to_click_us"))).crossJoin(
      s3.agg(count(lit(1)).as("n_purchase_after"),
        expr("floor(CAST(sum(t3 - t2) AS DOUBLE) / count(1) * 1000000) / CAST(1000000 AS DOUBLE)")
          .as("avg_click_to_purchase_us")))
  }

  val eventsFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events WHERE event_type = 'signup' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, MIN(s1.t1) AS t1
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1
      |), s3 AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3, MIN(s2.t2) AS t2
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1
      |)
      |SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
      |  (SELECT COUNT(*) FROM s2) AS n_click_after,
      |  (SELECT floor(CAST(SUM(t2 - t1) AS DOUBLE) / COUNT(*) * 1000000) / CAST(1000000 AS DOUBLE) FROM s2) AS avg_signup_to_click_us,
      |  (SELECT COUNT(*) FROM s3) AS n_purchase_after,
      |  (SELECT floor(CAST(SUM(t3 - t2) AS DOUBLE) / COUNT(*) * 1000000) / CAST(1000000 AS DOUBLE) FROM s3) AS avg_click_to_purchase_us""".stripMargin

  /** Per-type value anomaly counts: z-score against the group's own
    * mean/stddev, |z| > 2 flags. Parity discipline: the first and
    * second moments are EXACT DECIMAL sums (associative — partition
    * order can't change them), cast to DOUBLE only once at the end, so
    * Spark's partial aggregation and DuckDB's serial sum agree
    * bit-for-bit; a naive DOUBLE sum would drift in the last ulp and
    * flip boundary rows.
    *
    * Scale shape: one partial-agg pass builds the per-type stats (rows
    * shuffled = one per (partition, type)); the stats table (|types|
    * rows) broadcasts back onto the scan for the flag pass — the
    * corpus is read twice but never shuffled on data volume.
    */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val stats = e.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").as("s1"),
        expr("CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE)").as("s2"))
      .withColumn("mean", expr("s1 / CAST(n AS DOUBLE)"))
      .withColumn("std", expr(
        "sqrt(s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))"))
      .select("event_type", "n", "mean", "std")
    e.join(broadcast(stats), Seq("event_type"))
      .groupBy("event_type")
      .agg(max(col("n")).as("n"),
        expr("floor(max(mean) * 1000000) / CAST(1000000 AS DOUBLE)").as("mean"),
        expr("floor(max(std) * 1000000) / CAST(1000000 AS DOUBLE)").as("std"),
        sum(expr("CASE WHEN abs(value - mean) > CAST(2 AS DOUBLE) * std THEN 1L ELSE 0L END"))
          .as("n_anomalies"))
      .orderBy("event_type")
  }

  val eventsAnomalySql: String =
    """WITH stats AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
      |  FROM events GROUP BY 1
      |), enriched AS (
      |  SELECT e.event_type, e.value, st.n,
      |    st.s1 / CAST(st.n AS DOUBLE) AS mean,
      |    sqrt(st.s2 / CAST(st.n AS DOUBLE) - (st.s1 / CAST(st.n AS DOUBLE)) * (st.s1 / CAST(st.n AS DOUBLE))) AS std
      |  FROM events e JOIN stats st USING (event_type)
      |)
      |SELECT event_type, MAX(n) AS n,
      |  floor(MAX(mean) * 1000000) / CAST(1000000 AS DOUBLE) AS mean,
      |  floor(MAX(std) * 1000000) / CAST(1000000 AS DOUBLE) AS std,
      |  CAST(SUM(CASE WHEN abs(value - mean) > CAST(2 AS DOUBLE) * std THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      |FROM enriched GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Cohort retention: users grouped by their FIRST active day, with
    * day-1 and day-7 return rates. The distinct (user, day) grid and
    * the min-day cohort are both partial-aggregated; the cohort join is
    * an equi-join on user_id (co-partitioned with the grid's own
    * shuffle — AQE broadcasts the cohort at small SF, degrades to a
    * shuffled hash join at 100 TB). All integer day arithmetic; the
    * only doubles are the final q6 rate ratios.
    */
  def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day")).distinct()
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .groupBy("cohort_day")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("day") === col("cohort_day") + 1, col("user_id")))
          .as("d1_retained"),
        countDistinct(when(col("day") === col("cohort_day") + 7, col("user_id")))
          .as("d7_retained"))
      .withColumn("d1_rate", expr(
        "floor(CAST(d1_retained AS DOUBLE) / CAST(n_users AS DOUBLE) * 1000000) / CAST(1000000 AS DOUBLE)"))
      .withColumn("d7_rate", expr(
        "floor(CAST(d7_retained AS DOUBLE) / CAST(n_users AS DOUBLE) * 1000000) / CAST(1000000 AS DOUBLE)"))
      .orderBy("cohort_day")
  }

  val eventsRetentionSql: String =
    """WITH days_ AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), cohort AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM days_ GROUP BY 1
      |)
      |SELECT cohort_day,
      |  COUNT(DISTINCT d.user_id) AS n_users,
      |  COUNT(DISTINCT CASE WHEN d.day = c.cohort_day + 1 THEN d.user_id END) AS d1_retained,
      |  COUNT(DISTINCT CASE WHEN d.day = c.cohort_day + 7 THEN d.user_id END) AS d7_retained,
      |  floor(CAST(COUNT(DISTINCT CASE WHEN d.day = c.cohort_day + 1 THEN d.user_id END) AS DOUBLE) / CAST(COUNT(DISTINCT d.user_id) AS DOUBLE) * 1000000) / CAST(1000000 AS DOUBLE) AS d1_rate,
      |  floor(CAST(COUNT(DISTINCT CASE WHEN d.day = c.cohort_day + 7 THEN d.user_id END) AS DOUBLE) / CAST(COUNT(DISTINCT d.user_id) AS DOUBLE) * 1000000) / CAST(1000000 AS DOUBLE) AS d7_rate
      |FROM days_ d JOIN cohort c USING (user_id)
      |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin

  /** Pricing summary with subtotals at every grouping level — the
    * ROLLUP lattice (flag×status, per-flag, grand total) in ONE pass.
    * Spark expands the lattice BEFORE the partial aggregate (Expand →
    * partial HashAggregate), so the shuffle carries one partial row per
    * (group, level) — at 100 TB that's 3× the group cardinality, not 3
    * scans of the fact table. `gid` (grouping_id) disambiguates the
    * subtotal levels; group keys are coalesced to 'ALL' so the output
    * carries no NULL-vs-value ambiguity into the sort.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("gid"), col("sum_qty"), col("sum_disc_price"), col("count_order"))
      .orderBy("gid", "l_returnflag", "l_linestatus")
  }

  val qRollupSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join: orders
    * in a quarter having at least one lineitem shipped more than 90
    * days after the order date. The semi join deduplicates on the
    * build side's first match — no row explosion for multi-lineitem
    * orders, and the shuffle is one co-partitioned exchange on
    * orderkey. Date math is interval arithmetic on the NTZ timestamps
    * (exact on both engines — no epoch conversion, no timezone).
    */
  def q4Semijoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-04-01"))
    val l = Tables.lineitem(s, dir)
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          expr("l_shipdate > o_orderdate + INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")
  }

  val q4SemijoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_late_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q17 shape — the correlated scalar subquery (per-part average
    * quantity) decorrelated to an aggregate + self-join: revenue of
    * small-quantity line items (quantity < half the part's average),
    * per brand. The average never materializes as a double — the
    * predicate cross-multiplies (2·qty·n < Σqty) in exact DECIMAL, so
    * both engines evaluate the same exact rational comparison.
    *
    * Scale: the per-part aggregate and the probe co-partition on
    * partkey (one shuffle each side, AQE-coalesced); part is a dim →
    * broadcast.
    */
  def q17Smallqty(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val avgq = l.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"),
        count(lit(1)).as("n_items"))
    val p = Tables.part(s, dir)
    l.join(avgq, Seq("l_partkey"))
      .filter(expr(
        "CAST(2 AS DECIMAL(3,0)) * CAST(l_quantity AS DECIMAL(12,2)) * n_items < sum_qty"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        round(sum(dec("l_extendedprice")), 2).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  val q17SmallqtySql: String =
    """SELECT p_brand, COUNT(*) AS n_small,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN (
      |  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS sum_qty,
      |    COUNT(*) AS n_items
      |  FROM lineitem GROUP BY 1) a USING (l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |WHERE CAST(2 AS DECIMAL(3,0)) * CAST(l_quantity AS DECIMAL(12,2)) * n_items < sum_qty
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Daily event matrix via the Dataset `pivot` API with an EXPLICIT
    * value list — with the values declared, pivot compiles to one
    * partial-aggregated pass (no extra distinct-values job, which at
    * 100 TB would be a full extra scan); the shuffle carries one row
    * per (day, 5 counters).
    */
  def eventsPivot(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("day", expr("ts_us div 86400000000"))
    e.groupBy("day").pivot("event_type", EventTypes).count()
      .select(col("day") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .withColumn("n_total", EventTypes.map(t => col(s"n_$t")).reduce(_ + _))
      .orderBy("day")
  }

  val eventsPivotSql: String = {
    val counts = EventTypes.map(t =>
      s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t").mkString(",\n      |  ")
    val total = EventTypes.map(t => s"n_$t").mkString(" + ")
    s"""SELECT day, $counts,
       |  $total AS n_total
       |FROM (SELECT epoch_us(ts) // 86400000000 AS day, event_type FROM events) t
       |GROUP BY day ORDER BY day""".stripMargin
  }

  /** TPC-H Q13 shape — outer-join count distribution: how many
    * customers placed 0, 1, 2, … urgent orders (the zero bucket is the
    * point — only an outer join finds customers the fact table never
    * mentions). Spark-first
    * decorrelation: the fact side pre-aggregates to (custkey, count)
    * partials BEFORE touching customer, so the join shuffles one row
    * per customer instead of one per order — the LEFT OUTER is against
    * a customer-cardinality frame and `coalesce(cnt, 0)` restores the
    * zero-order customers the filter excluded. At 100 TB the orders
    * scan never reaches the join unaggregated.
    */
  def q13Custdist(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === lit("1-URGENT"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    Tables.customer(s, dir)
      .join(counts, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustdistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q22 shape — NOT EXISTS decorrelated to a LEFT ANTI join:
    * above-average-balance customers with no urgent orders, per
    * nation. The global average never materializes as a double — the
    * one-row (total, n) aggregate broadcasts onto the customer scan
    * and the predicate cross-multiplies (bal·n > Σbal) in exact
    * DECIMAL, so both engines evaluate the same exact rational
    * comparison. The anti join co-partitions on custkey and the
    * urgent-order side carries only its join key.
    */
  def q22Antijoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val bal = c.filter(col("c_acctbal") > 0)
      .agg(sum(dec("c_acctbal")).cast("decimal(22,2)").as("total"),
        count(lit(1)).as("n"))
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === lit("1-URGENT"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(bal))
      .filter(expr("CAST(c_acctbal AS DECIMAL(12,2)) * n > total"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        round(sum(dec("c_acctbal")), 2).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  val q22AntijoinSql: String =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
      |FROM customer c JOIN (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS total,
      |    COUNT(*) AS n
      |  FROM customer WHERE c_acctbal > 0) s ON TRUE
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n > total
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Rolling 7-day distinct active users per day, exactly — the DAU /
    * WAU curve. Spark-first shape: the corpus collapses to the
    * (user, day) activity grid first (partial-agg dedup — the only
    * pass over the events), then each grid row EXPLODES into the ≤7
    * window-end days it contributes to and a count-distinct per day
    * finishes the job. The fanout is over the grid (users × active
    * days), never over raw events, and there is no per-day range scan
    * — everything after the dedup is equi-keyed. A days semi-join
    * drops window ends past the data's edge.
    */
  def eventsDauRolling(s: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(s, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val days = grid.select(col("day").as("d")).distinct()
    grid.select(col("user_id"), col("day"),
        explode(expr("sequence(day, day + 6)")).as("d"))
      .join(broadcast(days), Seq("d"), "left_semi")
      .groupBy("d")
      .agg(countDistinct(when(col("day") === col("d"), col("user_id"))).as("dau"),
        countDistinct(col("user_id")).as("dau7"))
      .select(col("d").as("day"), col("dau"), col("dau7"))
      .orderBy("day")
  }

  val eventsDauRollingSql: String =
    """WITH grid AS (
      |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day AS d FROM grid)
      |SELECT d AS day,
      |  COUNT(DISTINCT CASE WHEN g.day = d THEN g.user_id END) AS dau,
      |  COUNT(DISTINCT g.user_id) AS dau7
      |FROM days JOIN grid g ON g.day BETWEEN d - 6 AND d
      |GROUP BY d ORDER BY d""".stripMargin

  /** TPC-H Q21 shape — EXISTS and NOT EXISTS collapsed into ONE
    * co-partitioned pass: suppliers that were the SOLE late shipper on
    * a multi-supplier order. Instead of two correlated subqueries
    * (another supplier EXISTS; another late supplier does NOT), the
    * per-(order, supplier) grain aggregates once on orderkey and a
    * window over the same key derives both counts — no self-join, no
    * second scan, and the window reuses the aggregation's partitioning
    * (lateness = shipped > 90 days after order date, as q4).
    */
  def q21LateSupp(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        (col("l_shipdate") > expr("o_orderdate + INTERVAL 90 DAYS")).cast("int"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("supp_late"))
    // ONE more aggregate over the same orderkey partitioning captures
    // both correlated-subquery counts AND the identity of the lone late
    // supplier (max over the one qualifying suppkey) — no window, no
    // per-orderkey sort, no join back; the exchange from the first agg
    // is reused as-is
    perSupp
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(col("supp_late")).as("n_late_supp"),
        max(when(col("supp_late") === 1, col("l_suppkey"))).as("suppkey"))
      .filter(col("n_late_supp") === 1 && col("n_supp") >= 2)
      .groupBy("suppkey")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("suppkey"))
      .limit(20)
  }

  val q21LateSuppSql: String =
    """WITH ls AS (
      |  SELECT l_orderkey, l_suppkey,
      |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS supp_late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT l_suppkey AS suppkey, COUNT(*) AS numwait
      |FROM ls a
      |WHERE supp_late = 1
      |  AND EXISTS (
      |    SELECT 1 FROM ls b
      |    WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM ls c
      |    WHERE c.l_orderkey = a.l_orderkey AND c.l_suppkey <> a.l_suppkey
      |      AND c.supp_late = 1)
      |GROUP BY 1 ORDER BY numwait DESC, suppkey LIMIT 20""".stripMargin

  /** hourly OHLC per event type — the first/last-by-event-time
    * aggregate shape (time-series downsampling for dashboards):
    * `min_by`/`max_by` pick open/close in ONE partial-aggregated pass —
    * no per-group sort, no window, no self-join; ties break on
    * (ts, event_id) via a zero-padded composite string key (exactly
    * what the DuckDB `arg_min`/`arg_max` twin orders by).
    */
  def eventsOhlc(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("hour_bucket", expr("ts_us div 3600000000"))
      .withColumn("ord", format_string("%020d-%012d", col("ts_us"), col("event_id")))
      .groupBy("hour_bucket", "event_type")
      .agg(min_by(col("value"), col("ord")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ord")).as("close"),
        count(lit(1)).as("n"))
      .orderBy("hour_bucket", "event_type")
  }

  val eventsOhlcSql: String =
    """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
      |  arg_min(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS open,
      |  MAX(value) AS high, MIN(value) AS low,
      |  arg_max(value, printf('%020d-%012d', epoch_us(ts), event_id)) AS close,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_late_supp" -> (q21LateSupp _),
    "events_ohlc" -> (eventsOhlc _),
    "q13_custdist" -> (q13Custdist _),
    "q22_antijoin" -> (q22Antijoin _),
    "events_dau_rolling" -> (eventsDauRolling _),
    "q_rollup" -> (qRollup _),
    "q4_semijoin" -> (q4Semijoin _),
    "q17_smallqty" -> (q17Smallqty _),
    "events_pivot" -> (eventsPivot _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_retention" -> (eventsRetention _),
    "events_asof" -> (eventsAsof _),
    "events_range_join" -> (eventsRangeJoin _),
    "events_funnel" -> (eventsFunnel _),
    "q1_agg" -> (q1Agg _),
    "q3_join" -> (q3Join _),
    "q5_region" -> (q5Region _),
    "q6_filter" -> (q6Filter _),
    "q_window" -> (qWindow _),
    "q_topk" -> (qTopk _),
    "events_window_agg" -> (eventsWindowAgg _),
    "events_sessionize" -> (eventsSessionize _),
    "events_downsample" -> (eventsDownsample _),
    "events_json" -> (eventsJson _)
  )

  val oracles: Map[String, String] = Map(
    "q21_late_supp" -> q21LateSuppSql,
    "events_ohlc" -> eventsOhlcSql,
    "q13_custdist" -> q13CustdistSql,
    "q22_antijoin" -> q22AntijoinSql,
    "events_dau_rolling" -> eventsDauRollingSql,
    "q_rollup" -> qRollupSql,
    "q4_semijoin" -> q4SemijoinSql,
    "q17_smallqty" -> q17SmallqtySql,
    "events_pivot" -> eventsPivotSql,
    "events_anomaly" -> eventsAnomalySql,
    "events_retention" -> eventsRetentionSql,
    "q1_agg" -> q1AggSql,
    "q3_join" -> q3JoinSql,
    "q5_region" -> q5RegionSql,
    "q6_filter" -> q6FilterSql,
    "q_window" -> qWindowSql,
    "q_topk" -> qTopkSql,
    "events_window_agg" -> eventsWindowAggSql,
    "events_sessionize" -> eventsSessionizeSql,
    "events_downsample" -> eventsDownsampleSql,
    "events_json" -> eventsJsonSql,
    "events_asof" -> eventsAsofSql,
    "events_range_join" -> eventsRangeJoinSql,
    "events_funnel" -> eventsFunnelSql
  )
}
