package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.{ChangeDetector, ChangeDetectionOptions, CorpusOps, PathMatcher}
import graft.sources.{FileManifest, HivePartitionedSink, Tables}

/** The whole library in one runnable story — the Spark twin of the
  * reference's examples/basic-usage.ts + change-detection.ts walk:
  *
  *   1. lay out a Hive-partitioned lake (HivePartitionedSink)
  *   2. list it as a manifest and glob-prune the listing (FileManifest
  *      + PathMatcher)
  *   3. detect changes between two listings (ChangeDetector)
  *   4. curate the document corpus: domain-blocklist + canonical-URL
  *      dedup gate, then quality score + connected-component near-dup
  *      keep-list (WebCorpus + CorpusOps)
  *   5. pack survivors into token-budget bins (CorpusOps.packBins)
  *   6. write the curated corpus Hive-partitioned by bin shard and read
  *      a single shard back through partition pruning
  *   7. maintenance sweep: plan small-file compaction over the listing
  *      and reconcile the incremental per-day aggregate against a full
  *      recompute (Maintenance.compactPlanFor / incrAggFor)
  *
  * Every stage asserts its row counts, so this doubles as an e2e smoke:
  *
  *   sbt "runMain graft.tools.Demo /root/testdata/sf0.01"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("graft-demo")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val lake = s"$root/lake"

    // 1. lake layout: events partitioned year=/month=/day=
    HivePartitionedSink.writeEvents(spark, sfDir, lake)

    // 2. manifest + glob prune: parquet data files only, no _SUCCESS etc.
    val listing = FileManifest.list(spark, lake)
      .withColumn("etag", concat(col("size"), lit("-"), col("last_modified_us")))
    val pm = new PathMatcher
    val dataFiles = pm.filterMatching(listing, Seq("**/year=*/month=*/day=*/*.parquet"))
    val nAll = listing.count()
    val nData = dataFiles.count()
    require(nData == nAll && nData > 0,
      s"every listed file is a partitioned data file ($nData of $nAll)")
    // glob-prune to one day's partition dir — a strict subset
    val nDay1 = pm.filterMatching(dataFiles, Seq("**/day=1/*.parquet")).count()
    require(nDay1 > 0 && nDay1 < nData,
      s"day=1 glob must prune the listing ($nDay1 of $nData)")

    // 3. change detection: append one more day of data, relist, diff
    Tables.events(spark, sfDir).limit(500)
      .withColumn("year", lit(1999)).withColumn("month", lit(1)).withColumn("day", lit(1))
      .write.mode("append").partitionBy("year", "month", "day").parquet(lake)
    val relisting = FileManifest.list(spark, lake)
      .withColumn("etag", concat(col("size"), lit("-"), col("last_modified_us")))
    val cd = new ChangeDetector(ChangeDetectionOptions(compareMode = "quick"))
    val added = cd.filterChangesByType(
      cd.detectChanges(dataFiles,
        pm.filterMatching(relisting, Seq("**/year=*/month=*/day=*/*.parquet"))),
      "added").count()
    require(added > 0, "the appended day=1999 partition must surface as added")

    // 4. corpus curation: URL origin gate (blocklist + canonical-URL
    //    dedup), then quality + component-dedup keep list
    val docsAll = Tables.documents(spark, sfDir).select("doc_id", "text")
      .withColumn("url", graft.operators.WebCorpus.urlCol)
    val nRaw = docsAll.count()
    val unblocked = CorpusOps.canonicalizeUrls(docsAll)
      .join(broadcast(graft.operators.WebCorpus.Blocklist.toDF("blocked_domain")),
        col("domain") === col("blocked_domain"), "left_anti")
    val urlKeepers = CorpusOps.urlDedupGroups(unblocked).select(col("keeper").as("doc_id"))
    val docs = docsAll.join(urlKeepers, "doc_id").select("doc_id", "text")
    val nDocs = docs.count()
    require(nDocs > 0 && nDocs < nRaw,
      s"URL gate must drop blocked domains and URL variants ($nDocs of $nRaw)")
    val kept = CorpusOps.dedupKeepList(docs).filter(col("keep"))
      .join(CorpusOps.qualityScore(docs).select("doc_id", "n_words", "score"), Seq("doc_id"))
      .filter(col("n_words") >= 20 && col("score") >= 0.27)
    val nKept = kept.count()
    require(nKept > 0 && nKept < nDocs,
      s"curation must keep a strict subset ($nKept of $nDocs)")

    // 5. token-budget packing of the survivors
    val packed = CorpusOps.packBins(kept.select("doc_id", "text"))
    require(packed.count() == nKept, "packing assigns every survivor")

    // 6. curated corpus to a Hive-partitioned store, pruned read-back
    val corpusOut = s"$root/corpus"
    packed.select(col("doc_id"), col("text"), col("n_tokens"), col("shard"), col("bin"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(corpusOut)
    val shard0 = spark.read.parquet(corpusOut).filter(col("shard") === 0)
    val nShard0 = shard0.count()
    val plan = shard0.queryExecution.executedPlan.toString
    require(plan.contains("PartitionFilters") && nShard0 > 0,
      "shard read-back must prune partitions")

    // 7. maintenance sweep over the (grown) lake listing: compaction
    //    plan + incremental aggregate reconciled against full recompute
    val compaction = graft.operators.Maintenance
      .compactPlanFor(relisting, target = 4L * 1024 * 1024)
    val nPdirs = compaction.count()
    require(nPdirs > 0 && compaction.filter(col("n_bins") < 1).count() == 0,
      "every partition dir gets at least one compaction bin")
    val recon = graft.operators.Maintenance
      .incrAggFor(dataFiles, relisting, "^(.*/year=\\d+/month=\\d+/day=\\d+)")
    require(recon.filter(!col("consistent")).count() == 0,
      "incremental aggregate must reconcile with the full recompute")
    val skew = graft.operators.Maintenance.partitionSkewFor(relisting)
    require(skew.count() > 0 && skew.filter(col("n_files") < 1).count() == 0,
      "skew report covers every partition dir")

    println(s"[demo] lake files=$nAll data=$nData day1=$nDay1 added=$added " +
      s"raw=$nRaw urlKept=$nDocs kept=$nKept shard0=$nShard0 pdirs=$nPdirs — all stages asserted OK")
    spark.stop()
  }
}
