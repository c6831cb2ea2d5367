package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Ranks

/** Ranks.distributedRank must equal the global row_number() it
  * replaces, for any partition placement — and boundedRunningSum must
  * equal the running-sum window on a bounded frame.
  */
class RanksSpec extends SparkSpec {

  test("distributedRank == global row_number under a total order") {
    import spark.implicits._
    // values with heavy ties (the tiebreak column does the work) and a
    // skewed distribution (one value dominates a range partition)
    val df = (1 to 997).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v")
    val got = Ranks.distributedRank(df, "rn", col("v").desc, col("id"))
      .select("id", "rn")
    val want = df.select(col("id"),
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long").as("rn"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // ranks are a permutation of 1..n (no gaps, no duplicates)
    assert(got.agg(countDistinct("rn"), max("rn"), min("rn")).head() ==
      org.apache.spark.sql.Row(997L, 997L, 1L))
  }

  test("distributedRank on the real spend frame, and empty input") {
    import spark.implicits._
    val spend = graft.sources.Tables.events(spark, sfDir)
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      .groupBy("user_id").agg(sum("cents").as("user_cents"))
    val got = Ranks.distributedRank(spend, "rn", col("user_cents").desc, col("user_id"))
    val want = spend.select(col("user_id"),
      row_number().over(Window.orderBy(col("user_cents").desc, col("user_id")))
        .cast("long").as("rn"))
    assert(got.select("user_id", "rn").except(want).isEmpty)
    assert(Ranks.distributedRank(spend.filter(lit(false)), "rn",
      col("user_cents").desc).count() == 0)
  }

  test("distributedRankSum == rank + running-sum windows, preserves column order") {
    import spark.implicits._
    // value column deliberately FIRST (the singleton local pass reads
    // it from the moved-last position; the output must restore the
    // caller's order), negatives included, ties on v
    val df = (1 to 499).map(i => ((i % 7).toLong - 3L, i.toLong, s"k$i"))
      .toDF("amt", "id", "tag")
    val got = Ranks.distributedRankSum(df, "rn", "amt", "cum",
      col("amt").desc, col("id"))
    assert(got.columns.toSeq == Seq("amt", "id", "tag", "rn", "cum"),
      s"column order must be input ++ (rank, cum): ${got.columns.toSeq}")
    val w = Window.orderBy(col("amt").desc, col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum("amt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(38,0)"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("boundedRunningSum == running-sum window on a day frame") {
    import spark.implicits._
    val days = Seq((5L, 3L), (1L, 10L), (9L, -4L), (2L, -1L), (7L, 0L))
      .toDF("day", "delta")
    val got = Ranks.boundedRunningSum(days, "day", "delta", "cum")
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = days.withColumn("cum", sum("delta").over(w))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }
}
