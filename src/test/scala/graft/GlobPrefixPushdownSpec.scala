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

  /** the shared test session now installs GraftExtensions (the
    * string-conf path), so the rule is always active; withRule is kept
    * to document the per-session hook and to prove idempotence when
    * the rule is registered TWICE (extensions + experimental).
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

  test("glob_match-shaped query over a sorted manifest: compiled glob prefix reaches PushedFilters") {
    // end-to-end: a USER glob (not a hand regex) through the actual glob
    // compiler, filtered over a key-SORTED manifest parquet — the layout
    // where parquet column statistics make StringStartsWith prune whole
    // row groups at 100 TB. The assert reads the SCAN line itself: the
    // prefix must appear as a pushed data filter, not only as a post-scan
    // Filter conjunct.
    val dir = Files.createTempDirectory("graft_push3").toString
    Manifest.manifest(spark, sfDir).orderBy("key").write.mode("overwrite").parquet(dir)
    // the glob_match anchoring idiom (PathMatching.globMatch)
    val re = "^(?:" + graft.functions.Globs.compile("data/year=2024/month=01/**") + ")$"
    val df = spark.read.parquet(dir).filter(col("key").rlike(re))
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(l => l.contains("FileScan parquet")).getOrElse("")
    assert(scanLine.contains("PushedFilters:") &&
      scanLine.contains("StringStartsWith(key,data/year=2024/month=01/"),
      s"prefix not pushed to the scan: $scanLine")
    assert(df.count() > 0)
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
