package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Growth accounting over the events stream — the user-lifecycle
  * decomposition every product-analytics stack maintains (the
  * "growth accounting" identity popularized by Social Capital's
  * reporting: active(t) = new + retained + resurrected), plus the
  * user-tenure distribution and the inter-purchase cadence on orders.
  *
  * Reference scope: rehiver (TimMikeladze/rehiver, src/index.ts) feeds
  * S3-partitioned event data into downstream analytics; these are the
  * standard lifecycle queries that consumer runs on what it serves.
  *
  * Scale shapes: everything collapses the raw stream with ONE
  * user-keyed shuffle (distinct day set or per-user agg) before any
  * window; windows are always user- or customer-partitioned (the
  * per-partition frame is one entity's day/order list, calendar- or
  * basket-bounded) — never a global order. Integer epoch-day
  * arithmetic end to end; no date functions, no doubles until a final
  * floor-quantized share.
  */
object Growth {

  private val DayUs = 86400L * 1000000

  /** Per-day growth accounting: every active (user, day) classified as
    * `new` (first-ever day), `retained` (active the previous day too),
    * or `resurrected` (returning after a gap ≥ 2 days) — the identity
    * n_active = n_new + n_retained + n_resurrected holds by
    * construction. One distinct over (user, day) bounds the frame by
    * active-user-days; the lag window is user-partitioned.
    */
  def eventsLifecycle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      .distinct()
      .withColumn("prev_day", lag("day", 1).over(w))
      .withColumn("status", when(col("prev_day").isNull, "new")
        .when(col("prev_day") === col("day") - 1, "retained")
        .otherwise("resurrected"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
      .orderBy("day")
  }

  val eventsLifecycleSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events
       |), tagged AS (
       |  SELECT day,
       |    LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
       |  FROM days
       |)
       |SELECT day, COUNT(*) AS n_active,
       |  CAST(SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |  CAST(SUM(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       |  CAST(SUM(CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
       |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin

  /** User-tenure distribution: per user, the span in whole weeks
    * between first and last activity and the count of distinct active
    * days; histogrammed by tenure. Two partial aggregations — the
    * per-user one is the only user-keyed shuffle; the histogram frame
    * is calendar-bounded (span//7 buckets).
    */
  def userTenure(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      .groupBy("user_id")
      .agg(min("day").as("first_day"), max("day").as("last_day"),
        countDistinct("day").as("active_days"))
      .withColumn("tenure_weeks", expr("(last_day - first_day) div 7"))
      .groupBy("tenure_weeks")
      .agg(count(lit(1)).as("n_users"),
        sum("active_days").as("sum_active_days"))
      .orderBy("tenure_weeks")

  val userTenureSql: String =
    s"""WITH per_user AS (
       |  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day,
       |    COUNT(DISTINCT day) AS active_days
       |  FROM (SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events) t
       |  GROUP BY 1
       |)
       |SELECT (last_day - first_day) // 7 AS tenure_weeks,
       |  COUNT(*) AS n_users,
       |  CAST(SUM(active_days) AS BIGINT) AS sum_active_days
       |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin

  /** Inter-purchase cadence: the gap in days between a customer's
    * consecutive orders, log2-bucketed (the events_dwell shape lifted
    * to the orders table — same-day repeat orders land in bucket −1).
    * One customer-keyed shuffle; histogram-bounded output.
    */
  def ordersReorderGap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div $DayUs").as("day"))
      .withColumn("prev_day", lag("day", 1).over(w))
      .filter(col("prev_day").isNotNull)
      .withColumn("gap_days", col("day") - col("prev_day"))
      .withColumn("bucket",
        expr("CASE WHEN gap_days <= 0 THEN -1 ELSE CAST(length(bin(gap_days)) - 1 AS INT) END"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_gaps"), sum("gap_days").as("sum_gap_days"))
      .orderBy("bucket")
  }

  val ordersReorderGapSql: String =
    s"""WITH gaps AS (
       |  SELECT day - prev_day AS gap_days FROM (
       |    SELECT epoch_us(o_orderdate) // $DayUs AS day,
       |      LAG(epoch_us(o_orderdate) // $DayUs) OVER (PARTITION BY o_custkey
       |        ORDER BY epoch_us(o_orderdate) // $DayUs, o_orderkey) AS prev_day
       |    FROM orders) t
       |  WHERE prev_day IS NOT NULL
       |)
       |SELECT CASE WHEN gap_days <= 0 THEN -1
       |            ELSE CAST(length(bin(gap_days)) - 1 AS INT) END AS bucket,
       |  COUNT(*) AS n_gaps, CAST(SUM(gap_days) AS BIGINT) AS sum_gap_days
       |FROM gaps GROUP BY 1 ORDER BY 1""".stripMargin

  /** Cumulative daily revenue curve per event type: exact-cents daily
    * totals, the running cumulative within each type, and the share of
    * the type's grand total reached by each day — "how fast does each
    * channel accumulate its year". The raw stream collapses to the
    * (type × day) frame in ONE partial agg; both windows are
    * type-partitioned (calendar-bounded frames), so nothing here is a
    * global sort. Cents stay integral; one floored division at output.
    *
    * Overflow bound: cum_cents itself is safe BIGINT (≤ total type
    * revenue ≈ 10¹⁶ cents at 10¹² events × $100), but cum_cents·10⁶
    * reaches 10²² — past 2⁶³ — so the ppm numerator widens to
    * DECIMAL(38,0) before the floored division; the quotient (< 10⁶)
    * casts back to BIGINT. DuckDB mirrors via HUGEINT.
    */
  def eventsCumShare(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("event_type")
    Tables.events(s, dir)
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .groupBy(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
      .agg(sum("cents").as("day_cents"))
      .withColumn("cum_cents", sum("day_cents").over(byDay))
      .withColumn("total_cents", sum("day_cents").over(whole))
      .withColumn("cum_ppm", expr(
        "CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000 div total_cents AS BIGINT)"))
      .select("event_type", "day", "day_cents", "cum_cents", "cum_ppm")
      .orderBy("event_type", "day")
  }

  val eventsCumShareSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // $DayUs AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS day_cents
       |  FROM events GROUP BY 1, 2
       |), cum AS (
       |  SELECT event_type, day, day_cents,
       |    CAST(SUM(day_cents) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
       |    CAST(SUM(day_cents) OVER (PARTITION BY event_type) AS BIGINT) AS total_cents
       |  FROM daily
       |)
       |SELECT event_type, day, day_cents, cum_cents,
       |  CAST(CAST(cum_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT) AS cum_ppm
       |FROM cum ORDER BY 1, 2""".stripMargin

  /** Gini coefficient of user value concentration — the single-number
    * summary of events_value_pareto's whale curve (0 = spend spread
    * evenly, →1 = one user is the whole business). Uses the standard
    * rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σᵢ xᵢ) / (n·Σᵢ xᵢ) over the
    * ascending-sorted spend vector: the sort is
    * [[Ranks.distributedRank]] over the user-cardinality frame (the
    * exact shape a global `Window.orderBy` would single-task at 10⁸
    * users), and everything after is ONE single-row aggregate.
    *
    * Overflow bound: rn·user_cents ≈ 10⁹ · 10⁹ = 10¹⁸ per row at 10⁹
    * users × $10M lifetime spend, and the SUM of those terms reaches
    * ~10²⁷ — far past 2⁶³ ≈ 9.2×10¹⁸ — so `wsum_cents` and the Gini
    * numerator `2W − (n+1)T` accumulate in DECIMAL(38,0) (exact to
    * 10³⁸, headroom ≥10¹⁰× at the design point; DuckDB reaches the
    * same values via HUGEINT promotion). `total_cents` itself is safe
    * BIGINT: 10⁹ users × 10⁹ cents = 10¹⁸ < 2⁶³. Only the final ratio
    * is IEEE, floor-quantized to ppm (the events_value_pareto idiom).
    */
  def eventsGini(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(s, dir)
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .groupBy("user_id").agg(sum("cents").as("user_cents"))
    val ranked = Ranks.distributedRank(spend, "rn", col("user_cents").asc, col("user_id").asc)
    // rn·cents ≈ 10¹⁴ per row at the 10⁸-user design point; the sum crosses
    // 2⁶³ around 10⁴ such rows, so the weighted sum and the Gini numerator
    // stay in DECIMAL(38,0) (exact to 10³⁸) and only the final ratio is IEEE.
    ranked.agg(count(lit(1)).as("n_users"), sum("user_cents").as("total_cents"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * user_cents")).as("wsum_cents"))
      .withColumn("gini", expr(
        "floor(CAST(2 * wsum_cents - (CAST(n_users AS DECIMAL(38,0)) + 1) * total_cents AS DOUBLE) / (CAST(n_users AS DOUBLE) * CAST(total_cents AS DOUBLE)) * 1000000) / CAST(1000000 AS DOUBLE)"))
      .select("n_users", "total_cents", "gini")
  }

  val eventsGiniSql: String =
    """WITH spend AS (
      |  SELECT user_id,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS user_cents
      |  FROM events GROUP BY 1
      |), ranked AS (
      |  SELECT user_cents, ROW_NUMBER() OVER (ORDER BY user_cents, user_id) AS rn
      |  FROM spend
      |)
      |SELECT COUNT(*) AS n_users, CAST(SUM(user_cents) AS BIGINT) AS total_cents,
      |  floor(CAST(2 * SUM(rn * user_cents) - (COUNT(*) + 1) * SUM(user_cents) AS DOUBLE)
      |    / CAST(COUNT(*) * SUM(user_cents) AS DOUBLE) * 1000000) / CAST(1000000 AS DOUBLE) AS gini
      |FROM ranked""".stripMargin

  /** Per-day DAU / WAU(7) / MAU(28) and the DAU/MAU stickiness ratio —
    * the engagement-depth headline every consumer product tracks.
    * events_dau_rolling's explode-forward shape extended to the 28-day
    * horizon: each row of the distinct (user, day) grid fans out to the
    * ≤28 window-end days it can serve (fanout bounded by 28 × grid, not
    * corpus²; no day⋈grid range join), one semi-join prunes phantom
    * days, and ONE day-keyed partial agg computes all three distinct
    * counts. Integer ppm ratio at output.
    */
  def eventsStickiness(s: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(s, dir)
      .select(expr(s"ts_us div $DayUs").as("day"), col("user_id"))
      .distinct()
    val days = grid.select(col("day").as("d")).distinct()
    grid.select(col("user_id"), col("day"),
        explode(expr("sequence(day, day + 27)")).as("d"))
      .join(broadcast(days), Seq("d"), "left_semi")
      .groupBy("d")
      .agg(countDistinct(when(col("day") === col("d"), col("user_id"))).as("dau"),
        countDistinct(when(col("day") >= col("d") - 6, col("user_id"))).as("wau"),
        countDistinct(col("user_id")).as("mau"))
      .withColumn("stickiness_ppm", expr("dau * 1000000 div mau"))
      .select(col("d").as("day"), col("dau"), col("wau"), col("mau"),
        col("stickiness_ppm"))
      .orderBy("day")
  }

  val eventsStickinessSql: String =
    s"""WITH grid AS (
       |  SELECT DISTINCT epoch_us(ts) // $DayUs AS day, user_id FROM events
       |), days AS (
       |  SELECT DISTINCT day AS d FROM grid
       |), fan AS (
       |  SELECT user_id, day, unnest(generate_series(day, day + 27)) AS d FROM grid
       |)
       |SELECT d AS day,
       |  COUNT(DISTINCT CASE WHEN fan.day = fan.d THEN user_id END) AS dau,
       |  COUNT(DISTINCT CASE WHEN fan.day >= fan.d - 6 THEN user_id END) AS wau,
       |  COUNT(DISTINCT user_id) AS mau,
       |  COUNT(DISTINCT CASE WHEN fan.day = fan.d THEN user_id END) * 1000000
       |    // COUNT(DISTINCT user_id) AS stickiness_ppm
       |FROM fan JOIN days USING (d)
       |GROUP BY d ORDER BY day""".stripMargin

  /** Most-common 3-event behavioural paths: every consecutive
    * event-type trigram per user (ordered by time), counted corpus-wide
    * with user reach — the "what do users actually do" sequence-mining
    * query. ONE user-keyed shuffle + in-partition sort feeds both lead
    * windows (events_markov's shape, one step deeper); the partial agg
    * lands on the \|types\|³-bounded path frame; top-20 ships as
    * TakeOrdered, never a global sort.
    */
  def eventsPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_paths"), countDistinct("user_id").as("n_users"))
      .orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  val eventsPathsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS e1,
      |    LEAD(event_type, 1) OVER w AS e2,
      |    LEAD(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |)
      |SELECT e1, e2, e3, COUNT(*) AS n_paths, COUNT(DISTINCT user_id) AS n_users
      |FROM seq WHERE e3 IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY n_paths DESC, e1, e2, e3 LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_stickiness" -> (eventsStickiness _),
    "events_paths" -> (eventsPaths _),
    "events_lifecycle" -> (eventsLifecycle _),
    "user_tenure" -> (userTenure _),
    "orders_reorder_gap" -> (ordersReorderGap _),
    "events_cum_share" -> (eventsCumShare _),
    "events_gini" -> (eventsGini _))

  val oracles: Map[String, String] = Map(
    "events_stickiness" -> eventsStickinessSql,
    "events_paths" -> eventsPathsSql,
    "events_lifecycle" -> eventsLifecycleSql,
    "user_tenure" -> userTenureSql,
    "orders_reorder_gap" -> ordersReorderGapSql,
    "events_cum_share" -> eventsCumShareSql,
    "events_gini" -> eventsGiniSql)
}
