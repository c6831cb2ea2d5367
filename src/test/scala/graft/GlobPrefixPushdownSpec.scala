package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.plans.GlobPrefixPushdown
import graft.sources.Manifest

/** GlobPrefixPushdown: anchored glob regexes gain a pushable
  * StartsWith conjunct; semantics unchanged; the prefix reaches the
  * parquet scan as StringStartsWith.
  */
class GlobPrefixPushdownSpec extends SparkSpec {

  test("literalPrefix extraction") {
    import GlobPrefixPushdown.{literalPrefix => p}
    assert(p("^data/year=2024/[^/]*") == Some("data/year=2024/"))
    assert(p("^(?:data/year=2024/[^/]*)$") == Some("data/year=2024/"))
    assert(p("^data\\.csv$") == Some("data.csv"))
    // quantifier makes the last literal optional → dropped
    assert(p("^datax*") == Some("data"))
    // top-level alternation / unanchored / leading metachar → none
    assert(p("^(?:a/b|c/d)$").isEmpty)
    assert(p("data/x").isEmpty)
    assert(p("^[^/]*x").isEmpty)
    assert(p("^\\d+x").isEmpty)
  }

  /** the shared test session has no extensions — inject the rule via
    * the public per-session hook (GraftSession.build wires it through
    * SparkSessionExtensions for fresh sessions).
    */
  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(GlobPrefixPushdown)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  test("rlike filter over a parquet manifest gains a pushed StringStartsWith") {
    val dir = Files.createTempDirectory("graft_push").toString
    Manifest.manifest(spark, sfDir).write.mode("overwrite").parquet(dir)
    val re = "^data/year=2024/month=01/day=15/.*"

    val (n, plan) = withRule {
      val df = spark.read.parquet(dir).filter(col("key").rlike(re))
      (df.count(), df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("StringStartsWith"), plan)

    // semantics unchanged vs the rule-less session
    val plainN = spark.read.parquet(dir).filter(col("key").rlike(re)).count()
    assert(n == plainN && n > 0)
  }

  test("no rewrite for alternation regexes; no infinite re-wrapping") {
    val dir = Files.createTempDirectory("graft_push2").toString
    Manifest.manifest(spark, sfDir).write.mode("overwrite").parquet(dir)
    withRule {
      val alt = spark.read.parquet(dir)
        .filter(col("key").rlike("^(?:data/a|data/b)$"))
      assert(!alt.queryExecution.optimizedPlan.toString.contains("StartsWith"))

      // a rewritten filter stays stable across re-optimization (fixpoint)
      val df = spark.read.parquet(dir).filter(col("key").rlike("^data/year=2024/.*"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.split("StartsWith").length == 2, opt) // exactly one conjunct
    }
  }
}
