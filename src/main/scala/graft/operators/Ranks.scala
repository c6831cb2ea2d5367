package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed exact order statistics — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition spec, which plans as an
  * `Exchange SinglePartition` + one-task sort of the whole frame (the
  * pattern that is fine at 10⁵ rows and fatal at 10⁸: one executor
  * sorts everything while 999 idle).
  *
  * [[distributedRank]] is the two-level rank: range-repartition on the
  * sort key (each partition owns a contiguous key range), a
  * partition-local row number (imperative, zero extra shuffles), then
  * global rank = local rank + the partition's prefix offset. Offsets
  * are computed from the P-row per-partition counts (P = shuffle
  * partitions — cluster metadata size, never data size) via a one-row
  * prefix-sum fold, NOT a global-order window — a window here would
  * re-introduce the exact SinglePartition sort this helper exists to
  * eliminate, and would re-trip the `WindowExec: No Partition Defined`
  * warning the plan sweep treats as a defect signal.
  *
  * Used by events_value_pareto (user-cardinality spend rank); the same
  * shape serves any future exact top-down ranking whose frame is
  * unbounded (per-source deciles stay on their source-partitioned
  * window — bounded per group — and global top-k stays TakeOrdered).
  */
object Ranks {

  /** Appends `rankCol` = exact global 1-based row number of each row
    * under the total order `order` (make it total — include a unique
    * tiebreak column — or ranks of tied rows are partitioner-placement
    * dependent). The input is evaluated ONCE: the sorted+numbered frame
    * is materialized ([[Materialize.stable]]) because the counts pass
    * and the output both read it.
    */
  /** Singleton local pass — same canonical-plan-stability reasoning as
    * [[rankSumLocalPass]] (a non-capturing lambda is already a
    * call-site singleton under LambdaMetaFactory, but a val makes the
    * identity guarantee explicit rather than a compiler detail).
    */
  private val rankLocalPass: Iterator[Row] => Iterator[Row] = { it =>
    val pid = TaskContext.getPartitionId()
    var i = 0L
    it.map { r => i += 1; Row.fromSeq(r.toSeq :+ pid :+ i) }
  }

  def distributedRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema2 = sorted.schema
      .add("_rank_pid", IntegerType, nullable = false)
      .add("_rank_lrn", LongType, nullable = false)
    val local = sorted.mapPartitions(rankLocalPass)(Encoders.row(schema2))
    val pinned = Materialize.stable(local)
    val counts = pinned.groupBy(col("_rank_pid")).agg(count(lit(1)).as("c"))
    // P rows -> one sorted array -> exclusive prefix sums -> P rows.
    // A fold over cluster-partition-count entries, never data-sized.
    val offsets = counts
      .agg(sort_array(collect_list(struct(col("_rank_pid").as("p"), col("c")))).as("cs"))
      .select(explode(expr(
        "aggregate(cs, " +
          "named_struct('acc', CAST(0 AS BIGINT), 'out', CAST(array() AS ARRAY<STRUCT<p: INT, o: BIGINT>>)), " +
          "(s, x) -> named_struct('acc', s.acc + x.c, 'out', array_append(s.out, named_struct('p', x.p, 'o', s.acc))), " +
          "s -> s.out)")).as("e"))
      .select(col("e.p").as("_rank_pid"), col("e.o").as("_rank_off"))
    pinned.join(broadcast(offsets), Seq("_rank_pid"))
      .withColumn(rankCol, col("_rank_off") + col("_rank_lrn"))
      .drop("_rank_pid", "_rank_lrn", "_rank_off")
  }

  /** [[distributedRank]] extended with an exact running SUM: appends
    * both `rankCol` (global 1-based row number) and `cumCol` (inclusive
    * cumulative sum of `valueCol`, a BIGINT column) under the total
    * order `order` — the distributed sweep-line for Pareto/ABC curves
    * over DATA-SIZED frames, where a global-order window would
    * single-task the sort. Same two-level shape as distributedRank:
    * partition-local running sums, then per-partition (count, sum)
    * prefix offsets folded from P metadata rows. The fold accumulates
    * in BigDecimal and the offset column is DECIMAL(38,0): at 10¹²
    * lineitems × 10⁸ 10⁻⁴-dollar units the grand total passes 2⁶³
    * mid-fold even though each LOCAL sum stays bounded.
    */
  /** The partition-local numbering pass, lifted to a SINGLETON val: a
    * per-call closure (the original spelling captured the value-column
    * index) makes every invocation's `MapPartitions` node canonically
    * UNEQUAL to the previous one, so the CacheManager can never dedupe
    * the persisted frame across repeated runs of the same query — each
    * run re-computed the whole upstream agg + range exchange and
    * persisted ANOTHER copy (measured: orders_abc 6.7s in-suite, ~4×
    * its intrinsic cost). A singleton function reference + the value
    * column moved to a FIXED position (last) keeps the plan
    * capture-free and canonically stable, so re-running the query hits
    * the existing materialized blocks like any other cached plan.
    */
  private val rankSumLocalPass: Iterator[Row] => Iterator[Row] = { it =>
    val pid = TaskContext.getPartitionId()
    var i = 0L
    var s = java.math.BigDecimal.ZERO
    it.map { r =>
      i += 1; s = s.add(java.math.BigDecimal.valueOf(r.getLong(r.length - 1)))
      Row.fromSeq(r.toSeq :+ pid :+ i :+ new java.math.BigDecimal(s.toBigInteger))
    }
  }

  def distributedRankSum(df: DataFrame, rankCol: String, valueCol: String,
      cumCol: String, order: Column*): DataFrame = {
    // move the value column last so the local pass needs no captured
    // index (see rankSumLocalPass); original column order is restored
    // in the final select
    val moved = (df.columns.filterNot(_ == valueCol) :+ valueCol).map(col(_))
    val sorted = df.select(moved: _*)
      .repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema2 = sorted.schema
      .add("_rank_pid", IntegerType, nullable = false)
      .add("_rank_lrn", LongType, nullable = false)
      .add("_rank_lcs", org.apache.spark.sql.types.DecimalType(38, 0), nullable = false)
    val local = sorted.mapPartitions(rankSumLocalPass)(Encoders.row(schema2))
    val pinned = Materialize.stable(local)
    val counts = pinned.groupBy(col("_rank_pid"))
      // the partition's total = its LAST local cumsum (max row number),
      // NOT max(lcs): with negative values the running sum is not
      // monotone, so max(lcs) over-counts every later partition's offset
      // (caught by the negative-amount RanksSpec case; all-positive
      // frames like orders_abc's revenue masked it)
      .agg(count(lit(1)).as("c"), max_by(col("_rank_lcs"), col("_rank_lrn")).as("t"))
    val offsets = counts
      .agg(sort_array(collect_list(struct(col("_rank_pid").as("p"), col("c"), col("t")))).as("cs"))
      .select(explode(expr(
        "aggregate(cs, " +
          "named_struct('acc', CAST(0 AS BIGINT), 'accs', CAST(0 AS DECIMAL(38,0)), " +
          "  'out', CAST(array() AS ARRAY<STRUCT<p: INT, o: BIGINT, os: DECIMAL(38,0)>>)), " +
          "(s, x) -> named_struct('acc', s.acc + x.c, 'accs', CAST(s.accs + x.t AS DECIMAL(38,0)), " +
          "  'out', array_append(s.out, named_struct('p', x.p, 'o', s.acc, 'os', s.accs))), " +
          "s -> s.out)")).as("e"))
      .select(col("e.p").as("_rank_pid"), col("e.o").as("_rank_off"), col("e.os").as("_rank_soff"))
    pinned.join(broadcast(offsets), Seq("_rank_pid"))
      .withColumn(rankCol, col("_rank_off") + col("_rank_lrn"))
      .withColumn(cumCol, expr("CAST(_rank_soff + _rank_lcs AS DECIMAL(38,0))"))
      .select((df.columns :+ rankCol :+ cumCol).map(col(_)): _*)
  }

  /** Running (inclusive) cumulative sum over a PROVABLY BOUNDED frame —
    * day-granular sweep lines, source-cardinality shares: frames whose
    * row count is calendar- or vocabulary-bounded, not data-bounded.
    * Collapses the frame to ONE row (`sort_array(collect_list(...))`),
    * folds exclusive→inclusive prefix sums in a single HOF pass, and
    * explodes back — the plan is partial-agg → one-row fold → explode,
    * with no SinglePartition sort and no global-order window. Do NOT
    * point this at an unbounded frame; that is [[distributedRank]]'s
    * job (the one-row array here must fit in a single task).
    */
  def boundedRunningSum(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String): DataFrame =
    df.agg(sort_array(collect_list(struct(col(orderCol).as("k"), col(valueCol).as("v")))).as("cs"))
      .select(explode(expr(
        "aggregate(cs, " +
          "named_struct('acc', CAST(0 AS BIGINT), 'out', CAST(array() AS ARRAY<STRUCT<k: BIGINT, v: BIGINT, c: BIGINT>>)), " +
          "(s, x) -> named_struct('acc', s.acc + x.v, 'out', array_append(s.out, named_struct('k', x.k, 'v', x.v, 'c', s.acc + x.v))), " +
          "s -> s.out)")).as("e"))
      .select(col("e.k").as(orderCol), col("e.v").as(valueCol), col("e.c").as(cumCol))
}
