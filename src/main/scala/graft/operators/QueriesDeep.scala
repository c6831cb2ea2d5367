package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TPC-H-depth analytics: the multi-join / conditional-aggregate /
  * having / disjunctive-predicate query shapes that stress join
  * planning at scale. Same determinism discipline as [[Queries]]:
  * money in DECIMAL → round(2) → double, integer years, and a total
  * deterministic sort on every output.
  *
  * Scale notes, per shape:
  *   - fact⋈fact (lineitem⋈orders) shuffles ONCE on orderkey; every
  *     dim (nation/region/supplier/part at dim-like cardinality) rides
  *     a broadcast — at a 1000-executor SF the same logical plan keeps
  *     the single fact exchange and AQE picks broadcast vs shuffle per
  *     dim from runtime sizes.
  *   - conditional aggregation (q8 market share, q14 promo share)
  *     computes numerator and denominator in ONE pass over the joined
  *     fact — never two scans subtracted.
  *   - the q18 `HAVING` pre-aggregates the fact to order cardinality
  *     BEFORE touching orders/customer, so the expensive join inputs
  *     are already collapsed.
  *
  * The testdata schema has no partsupp table and no
  * shipmode/commitdate/container columns, so the classic predicates
  * are adapted to the columns that exist (noted per query).
  */
object QueriesDeep {
  private def dec(c: String) = col(c).cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(3,2)")
  // revenue = extendedprice * (1 - discount), exact
  private def rev = dec("l_extendedprice") * (one - dec("l_discount"))
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  /** TPC-H Q7 (volume shipping): bilateral trade volume between every
    * ordered pair of distinct nations, by shipment year. Supplier
    * nation comes off lineitem.l_suppkey, customer nation off
    * orders→customer. lineitem⋈orders is the one big shuffle
    * (orderkey); customer joins on custkey (AQE broadcasts it at small
    * SF, shuffles at scale); supplier + both nation copies broadcast.
    */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") <= lit("1996-12-31"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), rev.as("volume"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("snk"))
      .join(broadcast(n2), col("c_nationkey") === col("cnk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(round(sum(col("volume")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  CAST(ROUND(SUM($revSql), 2) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
       |  AND n1.n_name <> n2.n_name
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 (market share): of all PROMO-part revenue billed to ASIA
    * customers in 1995-1996, the share supplied by NATION_5, per order
    * year. Numerator and denominator are conditional aggregates of the
    * SAME one-pass joined fact (a `CASE` inside `sum`) — the naive
    * two-query spelling would scan the fact twice. The share division
    * happens AFTER both DECIMAL sums are rounded, as a double — the one
    * IEEE op is bit-identical on both engines.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), rev.as("volume"))
    val p = Tables.part(s, dir).filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") <= lit("1996-12-31"))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA").select(col("r_regionkey"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val sn = Tables.nation(s, dir).select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .groupBy("o_year")
      .agg(
        round(sum(when(col("supp_nation") === "NATION_5", col("volume"))
          .otherwise(lit(0).cast("decimal(12,2)"))), 2).cast("double").as("nation_rev"),
        round(sum(col("volume")), 2).cast("double").as("total_rev"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    s"""WITH joined AS (
       |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n1.n_name AS supp_nation,
       |    $revSql AS volume
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
       |), agg AS (
       |  SELECT o_year,
       |    CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS nation_rev,
       |    CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_rev
       |  FROM joined GROUP BY 1)
       |SELECT o_year, nation_rev, total_rev, nation_rev / total_rev AS mkt_share
       |FROM agg ORDER BY o_year""".stripMargin

  /** TPC-H Q10 (returned items): top-20 customers by revenue lost to
    * returns (l_returnflag = 'R') in 1995-Q4. The fact side filters
    * BEFORE the joins (returnflag on the lineitem scan, the quarter on
    * the orders scan — both show as PushedFilters); customer joins on
    * custkey and nation broadcasts. Deterministic top-k: revenue desc,
    * custkey asc tiebreak → TakeOrderedAndProject, no global sort.
    */
  def q10Returned(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), rev.as("volume"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-10-01") && col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("volume")), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedSql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  CAST(ROUND(SUM($revSql), 2) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1995-10-01' AND o_orderdate < TIMESTAMP '1996-01-01'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q14 (promo effect): share of September-1995 revenue that
    * came from PROMO parts. One broadcast join (part is the dim), one
    * conditional aggregate pass; the share is a single double division
    * of two rounded DECIMAL sums.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-09-01") && col("l_shipdate") < lit("1995-10-01"))
      .select(col("l_partkey"), rev.as("volume"))
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", col("volume"))
          .otherwise(lit(0).cast("decimal(12,2)"))), 2).cast("double").as("promo_rev"),
        round(sum(col("volume")), 2).cast("double").as("total_rev"))
      .withColumn("promo_share", col("promo_rev") / col("total_rev"))
  }

  val q14PromoSql: String =
    s"""WITH agg AS (
       |  SELECT
       |    CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS promo_rev,
       |    CAST(ROUND(SUM($revSql), 2) AS DOUBLE) AS total_rev
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01')
       |SELECT promo_rev, total_rev, promo_rev / total_rev AS promo_share FROM agg""".stripMargin

  /** TPC-H Q15 (top supplier): supplier(s) with the maximum 1996-Q1
    * revenue. Per-supplier DECIMAL revenue (one suppkey shuffle), then
    * the max rides back as a ONE-ROW broadcast join — the classic
    * "view + scalar subquery" without materializing a view, and the
    * equality is exact because both sides stay DECIMAL until output.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    // feeds BOTH the max and the equality join — materialize once so
    // the lineitem scan + suppkey aggregate don't run twice (supplier-
    // cardinality frame, DISK_ONLY with lineage)
    val revBySupp = Materialize.stable(Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("total_rev_dec")))
    val mx = revBySupp.agg(max(col("total_rev_dec")).as("mx"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
    revBySupp
      .join(broadcast(mx), col("total_rev_dec") === col("mx"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey").as("suppkey"), col("s_name"),
        round(col("total_rev_dec"), 2).cast("double").as("total_rev"))
      .orderBy("suppkey")
  }

  val q15TopSupplierSql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, SUM($revSql) AS total_rev_dec
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey AS suppkey, s_name,
       |  CAST(ROUND(total_rev_dec, 2) AS DOUBLE) AS total_rev
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
       |ORDER BY suppkey""".stripMargin

  /** TPC-H Q18 (large-volume orders): orders whose total quantity
    * exceeds 300, with their customer. The fact pre-aggregates to
    * (orderkey, sum_qty) and applies the HAVING *before* any join — at
    * 100 TB the surviving set is tiny, so the orders/customer joins see
    * a filtered build side (AQE broadcasts it), never the raw fact.
    */
  def q18BigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("qty_dec"))
      .filter(col("qty_dec") > lit(300).cast("decimal(12,2)"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("qty_dec").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18BigOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(300 AS DECIMAL(12,2)))
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(qty_dec AS DOUBLE) AS sum_qty
      |FROM big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q19 (discounted revenue): revenue matched by an OR of three
    * (brand, size-range, quantity-range) AND-blocks — the disjunctive-
    * predicate shape that breaks naive pushdown. The lineitem side of
    * the disjunction collapses to one pushable range
    * (qty ∈ [1,30] — the union of the three blocks) so the scan still
    * prunes; the exact OR evaluates after the broadcast part join.
    * (Classic Q19 also tests shipmode/container; those columns don't
    * exist in this schema, so brand × size × quantity carry the shape.)
    */
  def q19Disjunct(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"), rev.as("volume"))
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    val block = (brand: String, s1: Int, s2: Int, q1: Int, q2: Int) =>
      col("p_brand") === brand &&
        col("p_size").between(s1, s2) && col("l_quantity").between(q1, q2)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(block("Brand#12", 1, 15, 1, 11) ||
        block("Brand#23", 10, 25, 10, 20) ||
        block("Brand#3", 20, 35, 20, 30))
      .agg(round(sum(col("volume")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19DisjunctSql: String =
    s"""SELECT CAST(ROUND(SUM($revSql), 2) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Unshipped line items per day over 1995 (ordered, not yet shipped)
    * — the interval-concurrency question ("how many orders are open /
    * parcels in flight / sessions active at time t") answered as a
    * SWEEP LINE, not a range join: +1 at each line's order day, −1 at
    * its ship day, one partial-aggregated groupBy per endpoint, then a
    * running sum over the DAY-GRANULAR delta frame. The corpus never
    * joins an axis — the cumulative pass is [[Ranks.boundedRunningSum]]
    * over ~2500 calendar-bounded aggregate rows (one-row fold +
    * explode, no global-order window, no SinglePartition sort), so the
    * 100 TB cost is the one orderkey equi-join (the interval's two
    * endpoints live in different tables) + two partial aggs + a
    * calendar-sized fold, where the naive day⋈interval range join is
    * |days|×|lineitem|. The year filter applies to the OUTPUT days;
    * deltas accumulate from all of history via the fold (the backlog
    * carried into Jan 1 is counted, not zeroed).
    */
  def lineitemTransit(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    def dayOf(c: String) = expr(s"unix_micros(CAST($c AS TIMESTAMP)) div $dayUs")
    val opens = li.groupBy(dayOf("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n")).select(col("day"), col("n").as("delta"))
    val ships = li.groupBy(dayOf("l_shipdate").as("day"))
      .agg(count(lit(1)).as("n")).select(col("day"), (-col("n")).as("delta"))
    val merged = opens.union(ships)
      .groupBy("day").agg(sum("delta").as("delta"))
    Ranks.boundedRunningSum(merged, "day", "delta", "open_lines")
      .filter(col("day").between(9131L, 9495L)) // 1995-01-01 .. 1995-12-31
      .select("day", "delta", "open_lines")
      .orderBy("day")
  }

  val lineitemTransitSql: String =
    """WITH li AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS open_day,
      |    epoch_us(l_shipdate) // 86400000000 AS ship_day
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), deltas AS (
      |  SELECT open_day AS day, COUNT(*) AS delta FROM li GROUP BY 1
      |  UNION ALL
      |  SELECT ship_day AS day, -COUNT(*) AS delta FROM li GROUP BY 1
      |), merged AS (
      |  SELECT day, CAST(SUM(delta) AS BIGINT) AS delta FROM deltas GROUP BY 1
      |)
      |SELECT day, delta,
      |  CAST(SUM(delta) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_lines
      |FROM merged QUALIFY day BETWEEN 9131 AND 9495
      |ORDER BY day""".stripMargin

  /** Supply-chain lead time by supplier nation: order-date →
    * ship-date gap distribution per nation — item count, exact mean
    * (milli-days), EXACT median, and worst case. The fulfillment-SLA
    * readout next to orders_backlog's intake/completion sweep.
    *
    * Scale shape: lineitem⋈orders is the ONE fact-fact shuffle
    * (orderkey); supplier + nation broadcast. The distribution then
    * collapses to the (nation, days) GRID — lead days are
    * calendar-bounded, so the grid is \|nations\|×\|days\| regardless
    * of corpus size, and the exact median comes from a cumulative
    * window over that bounded grid: no data-sized sort anywhere
    * (contrast events_median_exact, which documents the sort-window
    * price for UNBUCKETABLE doubles; integer day gaps bucket for
    * free). Day math in integer epoch-day differences; Σ days·c ≤
    * 10³·corpus — the milli-mean numerator accumulates DECIMAL(38,0)
    * past 10¹⁶ rows per the numeric-bounds rule.
    */
  def nationLeadTime(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
      expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $dayUs").as("ship_day"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"),
      expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div $dayUs").as("order_day"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    // the bounded grid feeds BOTH the moment rollup and the median
    // sweep — materialize so the fact-fact join runs ONCE
    val grid = Materialize.stable(
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), (col("ship_day") - col("order_day")).as("days"))
        .agg(count(lit(1)).as("c")))
    val stats = grid.groupBy("n_name")
      .agg(sum("c").as("n_items"),
        expr("CAST(SUM(CAST(days AS DECIMAL(38,0)) * c) * 1000 div SUM(c) AS BIGINT)")
          .as("mean_milli_days"),
        max("days").as("max_days"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("n_name").orderBy("days")
    val med = grid
      .withColumn("cum", sum("c").over(w))
      .join(broadcast(stats.select(col("n_name"), col("n_items"))), Seq("n_name"))
      .filter(col("cum") >= expr("(n_items + 1) div 2") &&
        col("cum") - col("c") < expr("(n_items + 1) div 2"))
      .select(col("n_name"), col("days").as("p50_days"))
    stats.join(med, Seq("n_name"))
      .select("n_name", "n_items", "mean_milli_days", "p50_days", "max_days")
      .orderBy("n_name")
  }

  val nationLeadTimeSql: String =
    """WITH grid AS (
      |  SELECT n.n_name,
      |    epoch_us(l.l_shipdate) // 86400000000 - epoch_us(o.o_orderdate) // 86400000000 AS days,
      |    COUNT(*) AS c
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY 1, 2
      |), stats AS (
      |  SELECT n_name, CAST(SUM(c) AS BIGINT) AS n_items,
      |    CAST(SUM(CAST(days AS HUGEINT) * c) * 1000 // CAST(SUM(c) AS BIGINT) AS BIGINT) AS mean_milli_days,
      |    MAX(days) AS max_days
      |  FROM grid GROUP BY 1
      |), med AS (
      |  SELECT g.n_name, g.days AS p50_days
      |  FROM (SELECT n_name, days, c,
      |          CAST(SUM(c) OVER (PARTITION BY n_name ORDER BY days
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |        FROM grid) g
      |  JOIN stats t ON g.n_name = t.n_name
      |  WHERE g.cum >= (t.n_items + 1) // 2 AND g.cum - g.c < (t.n_items + 1) // 2
      |)
      |SELECT s.n_name, s.n_items, s.mean_milli_days, m.p50_days, s.max_days
      |FROM stats s JOIN med m ON s.n_name = m.n_name
      |ORDER BY s.n_name""".stripMargin

  /** Unit-price trend per part brand: the OLS slope of yearly mean
    * unit price (milli-dollars per unit per year) over the shipping
    * calendar — the pricing-drift monitor a procurement team runs
    * (which brands are getting more expensive, and how fast).
    *
    * Fully integer determinism — stronger than the zipf_slope
    * convention: the (brand, year) grid is calendar×brand-bounded, x
    * spans ≤ 7 years and y is a milli-dollar BIGINT, so ALL four OLS
    * moment sums are exact BIGINTs and the slope is ONE integer
    * division (truncation identical on both engines) — no doubles
    * anywhere. The cents numerator Σcents·10 per cell accumulates
    * DECIMAL(38,0) (passes 2⁶³ at 10¹³ corpus rows per the
    * numeric-bounds rule); y ≤ 10⁸ milli keeps nΣxy < 10¹⁰ forever.
    */
  def brandPriceTrend(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
    val grid = Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), (year(col("l_shipdate")) - 1995).cast("long").as("x"))
      .agg(expr(
        """CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS DECIMAL(38,0)) * 10)
          |  div SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
        .as("y"))
    grid.groupBy("p_brand")
      .agg(count(lit(1)).as("n_years"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        expr("CAST(SUM(y) div COUNT(1) AS BIGINT)").as("avg_milli"))
      .withColumn("slope_milli", expr(
        """CASE WHEN n_years * sxx - sx * sx > 0
          |THEN (n_years * sxy - sx * sy) div (n_years * sxx - sx * sx) END"""
          .stripMargin.replaceAll("\\s+", " ")))
      .select("p_brand", "n_years", "avg_milli", "slope_milli")
      .orderBy("p_brand")
  }

  val brandPriceTrendSql: String =
    """WITH grid AS (
      |  SELECT p.p_brand, CAST(year(l.l_shipdate) - 1995 AS BIGINT) AS x,
      |    CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) * 10)
      |      // CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS BIGINT) AS y
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2
      |), m AS (
      |  SELECT p_brand, COUNT(*) AS n_years,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(CAST(SUM(y) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_milli
      |  FROM grid GROUP BY 1
      |)
      |SELECT p_brand, n_years, avg_milli,
      |  CASE WHEN n_years * sxx - sx * sx > 0
      |    THEN (n_years * sxy - sx * sy) // (n_years * sxx - sx * sx) END AS slope_milli
      |FROM m ORDER BY p_brand""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "brand_price_trend" -> (brandPriceTrend _),
    "nation_lead_time" -> (nationLeadTime _),
    "q7_volume" -> (q7Volume _),
    "q8_marketshare" -> (q8MarketShare _),
    "q10_returned" -> (q10Returned _),
    "q14_promo" -> (q14Promo _),
    "q15_topsupplier" -> (q15TopSupplier _),
    "q18_bigorders" -> (q18BigOrders _),
    "q19_disjunct" -> (q19Disjunct _),
    "lineitem_transit" -> (lineitemTransit _)
  )

  val oracles: Map[String, String] = Map(
    "brand_price_trend" -> brandPriceTrendSql,
    "nation_lead_time" -> nationLeadTimeSql,
    "q7_volume" -> q7VolumeSql,
    "q8_marketshare" -> q8MarketShareSql,
    "q10_returned" -> q10ReturnedSql,
    "q14_promo" -> q14PromoSql,
    "q15_topsupplier" -> q15TopSupplierSql,
    "q18_bigorders" -> q18BigOrdersSql,
    "q19_disjunct" -> q19DisjunctSql,
    "lineitem_transit" -> lineitemTransitSql
  )
}
