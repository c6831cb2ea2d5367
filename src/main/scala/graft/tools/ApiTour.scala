package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api._
import graft.sources.{Manifest, Tables}

/** The executable form of API_MAP.md: every public `graft.api` entry
  * point invoked once on real sf data, each stage asserting a
  * non-degenerate result — so the documented library surface cannot
  * silently rot while the contract queries stay green.
  *
  *   sbt "runMain graft.tools.ApiTour /root/testdata/sf0.01"
  *
  * Exit 0 = every entry point ran and produced sane output. Unlike
  * Demo (a narrative pipeline), this is breadth coverage: one call per
  * export, reference twins per API_MAP.md. ApiTourSpec runs [[run]]
  * inside `sbt test`, so the surface is exercised every round, not
  * only when someone remembers to invoke the main.
  */
object ApiTour {
  private var checks = 0
  private def check(name: String)(cond: Boolean): Unit = {
    checks += 1
    require(cond, s"ApiTour: $name failed")
    println(s"[apitour] ok $name")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.build("graft-api-tour")
    run(spark, sfDir)
    spark.stop()
  }

  /** Executes every check; returns how many ran (all passed, or threw). */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String): Int = {
    checks = 0
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir).cache()
    val manifest = Manifest.manifest(spark, sfDir).cache()

    // ---- Graft.matcher / PathMatcher (reference: minimatch surface) ----
    val pm = Graft.matcher()
    check("matcher.getRegex")(pm.getRegex("data/**/*.parquet").nonEmpty)
    check("matcher.isMatch")(
      manifest.filter(pm.isMatch(col("key"), "**/*.parquet")).count() > 0)
    check("matcher.all")(
      manifest.filter(pm.all(col("key"), "data/**", "**/part-*")).count() > 0)
    check("matcher.filterMatching strict subset")({
      val n = pm.filterMatching(manifest, Seq("**/event_type=click/*")).count()
      n > 0 && n < manifest.count()
    })
    check("matcher.filterNot complements filterMatching")(
      pm.filterNot(manifest, Seq("**/event_type=click/*")).count()
        == manifest.count() - pm.filterMatching(manifest, Seq("**/event_type=click/*")).count())
    check("matcher.capture")(
      manifest.select(pm.capture("data/:y/:m/:d/:t/*", col("key")).as("c"))
        .filter(col("c").isNotNull).count() > 0)
    check("matcher.captureStruct")(
      manifest.select(pm.captureStruct("data/:y/:m/:d/:t/*", col("key")).as("c"))
        .filter(col("c.y").startsWith("year=")).count() > 0)
    check("matcher nocase")(Graft.matcher(nocase = true)
      .filterMatching(manifest.select(upper(col("key")).as("key")), Seq("data/**"))
      .count() == manifest.count())
    check("matcher extglobs: @() selects, !() hoisted negation excludes")({
      // @(…|…) one-of over real manifest keys; !(…) must equal the
      // complement computed by the plain glob pair (the hoisted
      // column-level negation path, since RE2 has no lookahead)
      val all = manifest.filter(pm.isMatch(col("key"),
        "data/@(year=2024)/**")).count()
      val clicks = manifest.filter(pm.isMatch(col("key"),
        "data/year=2024/month=01/*/@(event_type=click)/*")).count()
      val notClicks = manifest.filter(pm.isMatch(col("key"),
        "data/year=2024/month=01/*/!(event_type=click)/*")).count()
      all == manifest.count() && clicks > 0 && notClicks > 0 &&
        clicks + notClicks == all
    })

    // ---- Graft.partition / HivePartitionParser ----
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val parser = Graft.partition.create(
      PartitionField("year", IntegerType), PartitionField("month", IntegerType),
      PartitionField("day", IntegerType), PartitionField("event_type", StringType))
    val parsed = manifest.select(col("key"), parser.parse(col("key")).as("p"))
    check("partitions.parse")(parsed.filter(col("p.year").isNotNull).count() == manifest.count())
    check("partitions.isValid")(
      manifest.filter(parser.isValid(col("key"))).count() == manifest.count())
    check("partitions.validationErrors empty on valid paths")(
      manifest.select(parser.validationErrors(col("key")).as("e"))
        .filter(size(col("e")) === 0).count() == manifest.count())
    check("partitions.missingKeys flags truncated path")(
      spark.range(1).select(parser.missingKeys(lit("data/year=2024/month=01")).as("m"))
        .filter(array_contains(col("m"), "day")).count() == 1)
    check("partitions.format round-trips")(
      spark.range(1).select(parser.format(Map(
        "year" -> lit(2024), "month" -> lit(1), "day" -> lit(2),
        "event_type" -> lit("click"))).as("p"))
        .filter(col("p") === "year=2024/month=1/day=2/event_type=click").count() == 1)
    check("partitions.createGlobPattern")(
      parser.createGlobPattern(Map("year" -> 2024)) == "year=2024/month=*/day=*/event_type=*")
    check("partitions.matchesGlob")(
      manifest.filter(parser.matchesGlob(col("key"),
        "data/year=*/month=*/day=*/event_type=click/*")).count() > 0)
    check("partitions.extractKeys")(
      manifest.select(parser.extractKeys(col("key"), Seq("year", "event_type")).as("k"))
        .filter(col("k.year").isNotNull && col("k.event_type").isNotNull)
        .count() == manifest.count())
    check("partitions.transform rewrites a key in place")(
      // bump year by one; the re-formatted path's parsed year must track
      manifest.select(col("key"),
          parser.transform(col("key"), Map("year" -> (y => y + 1))).as("t"))
        .filter(parser.parse(col("t")).getField("year")
          =!= parser.parse(col("key")).getField("year") + 1)
        .count() == 0)

    // ---- Graft.time / TimePartitionGenerator ----
    val daily = Graft.time.daily()
    check("time.daily.generatePath")(
      docs.limit(1).select(daily.generatePath(lit("2024-03-05").cast("timestamp")).as("p"))
        .head().getString(0) == "year=2024/month=03/day=05")
    check("time.hourly.generatePath has hour segment")(
      docs.limit(1).select(Graft.time.hourly()
        .generatePath(lit("2024-03-05 07:00:00").cast("timestamp")).as("p"))
        .head().getString(0).contains("hour=07"))
    check("time.monthly/yearly")(
      docs.limit(1).select(
        Graft.time.monthly().generatePath(lit("2024-03-05").cast("timestamp")).as("m"),
        Graft.time.yearly().generatePath(lit("2024-03-05").cast("timestamp")).as("y"))
        .head() match { case r => r.getString(0) == "year=2024/month=03" && r.getString(1) == "year=2024" })
    check("time.custom path format drops key=")(
      docs.limit(1).select(Graft.time.custom(
        TimePartitionConfig(TimeGranularity.Daily, format = "path"))
        .generatePath(lit("2024-03-05").cast("timestamp")).as("p"))
        .head().getString(0) == "2024/03/05")
    check("time.generateCurrentPath(clock)")(
      daily.generateCurrentPath(java.time.Clock.fixed(
        java.time.Instant.parse("2024-03-05T00:00:00Z"), java.time.ZoneOffset.UTC))
        == "year=2024/month=03/day=05")
    check("time.generatePathsForRange")(
      daily.generatePathsForRange(spark, "2024-03-01", "2024-03-05").count() == 5)

    // ---- Graft.changes / ChangeDetector ----
    val cd = Graft.changes.detect()
    val prev = Manifest.snapshotPrev(spark, sfDir)
    val cur = Manifest.snapshotCur(spark, sfDir)
    val changes = cd.detectChanges(prev, cur).cache()
    check("changes.detectChanges finds all four types")(
      changes.select("change_type").distinct().count() == 4)
    check("changes.filterChangesByType")(
      cd.filterChangesByType(changes, "added").select("change_type").distinct().count() == 1)
    val stateDir = java.nio.file.Files.createTempDirectory("apitour-state").toString
    val statePath = s"$stateDir/state"
    cd.snapshot(cur, statePath)
    check("changes.snapshot/loadSnapshot round-trip")(
      cd.loadSnapshot(spark, statePath).count() == cur.count())
    cd.commitChanges(cur, statePath)
    check("changes.commitChanges -> no diffs vs committed state")(
      cd.detectChanges(cd.loadSnapshot(spark, statePath), cur)
        .filter(col("change_type") =!= "unchanged").count() == 0)
    cd.resetState(spark, statePath)
    check("changes.resetState clears the snapshot")(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(statePath)))

    // ---- ContentTypes ----
    check("contentTypes.detect/extension/charset/isText/isBinary")({
      val ct = manifest.select(ContentTypes.detect(col("key")).as("ct"))
      ct.filter(col("ct").isNotNull).count() == manifest.count() &&
        ct.select(ContentTypes.extension(col("ct")).as("e")).filter(col("e").isNotNull).count() > 0 &&
        ct.filter(ContentTypes.charset(col("ct")).isNotNull).count() > 0 &&
        ct.filter(ContentTypes.isText(col("ct"))).count() > 0 &&
        ct.filter(ContentTypes.isBinary(col("ct"))).count() > 0
    })

    // ---- S3Keys ----
    check("s3keys.encode/decode round-trip (Column)")(
      manifest.select(S3Keys.decodeS3Key(S3Keys.encodeS3Key(col("key"))).as("k"), col("key"))
        .filter(col("k") =!= col("key")).count() == 0)
    check("s3keys.encode/decode round-trip (String)")(
      S3Keys.decodeS3Key(S3Keys.encodeS3Key("a b/c+d&e.txt")) == "a b/c+d&e.txt")
    check("s3keys.isValidBucketName")(
      spark.createDataset(Seq("valid-bucket", "Invalid_Bucket", "ab")).toDF("b")
        .filter(S3Keys.isValidBucketName(col("b"))).count() == 1)

    // ---- CorpusOps: dedup family ----
    check("corpus.fingerprint")(
      docs.select(CorpusOps.fingerprint().as("fp")).distinct().count() > 1)
    check("corpus.exactDupGroups collapse")({
      // the corpus has no byte-identical docs; plant copies (the same
      // shape the dedup_exact contract query uses) and find them
      val planted = docs.select("doc_id", "text").union(
        docs.filter(pmod(col("doc_id"), lit(10)) === 3)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      CorpusOps.exactDupGroups(planted).filter(col("n_copies") =!= 2).count() == 0 &&
        CorpusOps.exactDupGroups(planted).count() > 0
    })
    check("corpus.nearDupPairs")(CorpusOps.nearDupPairs(docs).count() > 0)
    check("corpus.dedupKeepList drops non-representatives")({
      val kl = CorpusOps.dedupKeepList(docs)
      kl.count() == docs.count() && kl.filter(col("keep") === false).count() > 0
    })
    check("corpus.spanDedupStats")(
      CorpusOps.spanDedupStats(docs).filter(col("dup_frac") > 0).count() > 0)
    check("corpus.semanticKeepList drops planted near-duplicates")({
      // the embeddings have no semantic near-dups at the default tau;
      // plant exact copies under fresh ids (offset ≡ 0 mod 50 so the
      // IVF seed residues are preserved) — the keep list must flag
      // them, and must keep at least one representative per pair
      val emb = Tables.embeddings(spark, sfDir)
      val planted = emb.union(emb.filter(pmod(col("vec_id"), lit(10)) === 3)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      val kl = CorpusOps.semanticKeepList(planted)
      // a planted copy can never be its component's min-label
      // representative (its original has the smaller id), so EVERY
      // planted id must be keep=false — a falsifiable drop assertion
      kl.count() == planted.count() &&
        kl.filter(col("vec_id") >= 1000000L && col("keep") === true).count() == 0 &&
        kl.filter(col("vec_id") >= 1000000L).count() > 0
    })
    check("corpus.neighborGraph")({
      val g = CorpusOps.neighborGraph(Tables.embeddings(spark, sfDir), k = 2)
      g.groupBy("vec_id").count().filter(col("count") > 2).count() == 0 && g.count() > 0
    })

    // ---- CorpusOps: quality / text family ----
    check("corpus.qualityScore in [0,1]")(
      CorpusOps.qualityScore(docs)
        .filter(col("score") < 0 || col("score") > 1).count() == 0)
    check("corpus.chunk covers every doc")(
      CorpusOps.chunk(docs, words = 64, stride = 48)
        .select("doc_id").distinct().count() == docs.count())
    check("corpus.repetitionMetrics")(
      CorpusOps.repetitionMetrics(docs)
        .filter(col("top_share") >= 0 && col("dup_frac") >= 0).count() == docs.count())
    check("corpus.lmScore")(
      CorpusOps.lmScore(docs).filter(col("lm_score").isNotNull).count() == docs.count())
    check("corpus.piiScrub redacts")({
      val scrubbed = CorpusOps.piiScrub(
        Seq((1L, "mail me at a@b.com or ping 10.0.0.1")).toDF("doc_id", "text"))
      scrubbed.filter(col("n_emails") === 1 && col("n_ips") === 1 &&
        col("text").contains("<EMAIL>") && col("text").contains("<IP>")).count() == 1
    })

    // ---- CorpusOps: sampling / packing / mixing ----
    check("corpus.sampleStratified respects rates")({
      val sampled = CorpusOps.sampleStratified(docs, "doc_id", "source",
        Map("src0" -> 1000000L), defaultPpm = 0L)
      sampled.select("source").distinct().count() == 1
    })
    check("corpus.packBins: greedy bound sum(bin) ≤ budget + largest doc")({
      val packed = CorpusOps.packBins(docs, budgetTokens = 4096L)
      packed.groupBy("shard", "bin")
        .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
        .filter(col("t") - col("m") > 4096L).count() == 0
    })
    check("corpus.mixPlan serves every requested source")(
      CorpusOps.mixPlan(docs, "source", Map("src0" -> 500000L, "src1" -> 500000L))
        .filter(col("n_take") > 0).count() == 2)

    // ---- CorpusOps: web/url family ----
    val withUrl = docs.withColumn("url", graft.operators.WebCorpus.urlCol)
    check("corpus.canonicalizeUrls strips scheme/www/port")(
      CorpusOps.canonicalizeUrls(withUrl)
        .filter(col("canonical_url").rlike("^[a-z]+://|^www\\.|:(443|80)/")).count() == 0)
    check("corpus.urlDedupGroups collapses variants")(
      CorpusOps.urlDedupGroups(withUrl).filter(col("n_variants") > 1).count() > 0)
    check("corpus.groupSimilarity: estimate tracks exact")({
      val sim = CorpusOps.groupSimilarity(docs, "lang")
      // sketch estimate must be in [0,1] and exact present on all pairs
      sim.count() > 0 && sim.filter(col("jaccard_est") < 0 || col("jaccard_est") > 1)
        .count() == 0
    })
    check("corpus.blocklistFilter removes blocked domains")({
      val dom = CorpusOps.canonicalizeUrls(withUrl).select("domain").head().getString(0)
      CorpusOps.blocklistFilter(withUrl, Seq(dom))
        .filter(col("domain") === dom).count() == 0
    })

    // ---- EventOps ----
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"), col("value"))
      .cache()
    val anchor = ev.agg(max("ts_us")).head().getLong(0)
    check("events.decayScore bounded by undecayed mean")({
      val d = EventOps.decayScore(ev, "user_id", "ts_us", "value", anchorUs = anchor)
      d.count() > 0 && d.filter(col("decayed_score") < 0).count() == 0
    })
    check("events.gapFill dense per group")({
      val g = EventOps.gapFill(ev, "event_type", "ts_us")
      g.count() > 0 && g.groupBy("event_type")
        .agg((max("bucket") - min("bucket") + 1).as("span"), count(lit(1)).as("n"))
        .filter(col("span") =!= col("n")).count() == 0
    })
    check("events.hopWindow multiplies coverage")(
      EventOps.hopWindow(ev, "event_type", "ts_us", hops = 4)
        .count() > ev.select(expr("ts_us div 900000000")).distinct().count())
    check("events.markovTransitions includes start state")(
      EventOps.markovTransitions(ev, "user_id", "event_type", "ts_us", "event_id")
        .filter(col("from_state") === "<start>").count() > 0)
    check("events.cohortMatrix age-0 diagonal present")(
      EventOps.cohortMatrix(ev, "user_id", "ts_us")
        .filter(col("age") === 0).count() > 0)
    check("events.dwellHistogram buckets partition all gaps")({
      val h = EventOps.dwellHistogram(ev, "user_id", "ts_us", "event_id")
      val nGaps = h.agg(sum("n_gaps")).head().getLong(0)
      val nEvents = ev.count()
      val nUsers = ev.select("user_id").distinct().count()
      h.count() > 0 && nGaps == nEvents - nUsers // one gap per event after each user's first
    })
    check("events.burstiness gap census ties out, B bounded")({
      val b = EventOps.burstiness(ev, "event_type", "user_id", "ts_us", "event_id")
      val nGaps = b.agg(sum("n_gaps")).head().getLong(0)
      val census = ev.groupBy("event_type", "user_id").count()
        .agg(sum(expr("count - 1"))).head().getLong(0)
      nGaps == census &&
        b.filter(col("burst_ppm") < -1000000L || col("burst_ppm") > 1000000L).count() == 0
    })
    check("events.entropyHistogram mass equals the key count")({
      val h = EventOps.entropyHistogram(ev, "user_id", "event_type")
      h.agg(sum("n_keys")).head().getLong(0) ==
        ev.select("user_id").distinct().count() &&
        h.filter(col("ent_bin") < 0).count() == 0
    })
    check("events.concentration: monopoly group hits hhi 1e6")({
      // every user's traffic concentrated on itself → per-user HHI is
      // exactly 10⁶; across types HHI must sit strictly below
      val mono = EventOps.concentration(ev.withColumn("one", lit(1L)),
        "user_id", "user_id", "one")
      val spread = EventOps.concentration(ev.withColumn("one", lit(1L)),
        "event_type", "user_id", "one")
      mono.filter(col("hhi_ppm") =!= 1000000L).count() == 0 &&
        spread.filter(col("hhi_ppm") >= 1000000L).count() == 0
    })
    check("corpus.zipfSlope non-positive with r2 in [0,1]")({
      val z = CorpusOps.zipfSlope(docs, "source", "text")
      z.count() > 0 && z.filter(col("slope_milli") > 0).count() == 0 &&
        z.filter(col("r2_milli") < 0 || col("r2_milli") > 1005).count() == 0
    })
    check("corpus.embeddingDimStats one row per dim, sd within range")({
      val s = CorpusOps.embeddingDimStats(Tables.embeddings(spark, sfDir))
      s.count() == graft.functions.VectorFns.Dim &&
        s.filter(col("sd_ppm") > (col("max_milli") - col("min_milli")) * 500 + 1000).count() == 0
    })
    check("events.forecastSkill: WAPE of an exactly-weekly series is 0")({
      // synthetic exactly-periodic series: bucket = day index, same
      // count every day → seasonal-naive error mass must be exactly 0
      val period = spark.range(0, 28).selectExpr("CAST(id AS BIGINT) * 86400000000 AS ts_us",
        "'a' AS g")
      val f = EventOps.forecastSkill(period, "g", "ts_us")
      f.head().getAs[Long]("wape_ppm") == 0L &&
        EventOps.forecastSkill(ev, "event_type", "ts_us")
          .filter(col("wape_ppm") < 0).count() == 0
    })
    check("events.backlogSweep telescopes to opens minus closes")({
      val opens = ev.select(expr("ts_us div 86400000000").as("day"))
      val closes = ev.filter(col("event_type") === "purchase")
        .select(expr("ts_us div 86400000000").as("day"))
      val b = EventOps.backlogSweep(opens, closes, "day")
      val last = b.orderBy(col("day").desc).head()
      last.getAs[Long]("backlog") == opens.count() - closes.count()
    })
    check("corpus.bpePairCounts descend and stay positive")({
      val p = CorpusOps.bpePairCounts(docs)
      val ns = p.collect().map(_.getAs[Long]("n_pairs")).toSeq
      ns.nonEmpty && ns == ns.sorted.reverse && ns.forall(_ > 0)
    })
    check("corpus.sourceDrift: single-group corpus has zero drift")({
      val one = CorpusOps.sourceDrift(docs.withColumn("source", lit("all")))
      // KL(P‖P) = 0 exactly; floor slack can only go a hair negative
      val kl = one.head().getAs[Long]("kl_ppb")
      kl <= 0 && kl >= -one.head().getAs[Long]("n_vocab")
    })
    check("corpus.pageRankStep conserves bounded rank mass")({
      val ranks = docs.select(col("doc_id").as("id"))
        .withColumn("r_ppb", lit(1000L))
      val edges = docs.select(col("doc_id").as("src"),
        expr("(doc_id * 7 + 1) % 1000").as("dst"))
      val next = CorpusOps.pageRankStep(edges, ranks, "src", "dst", "id", "r_ppb")
      next.count() == ranks.count() &&
        next.filter(col("r_ppb") < 0).count() == 0
    })
    check("corpus.pcaPowerStep components normalized to |ppm| <= 1e6")({
      val p = CorpusOps.pcaPowerStep(Tables.embeddings(spark, sfDir))
      p.count() == graft.functions.VectorFns.Dim &&
        p.filter(expr("abs(comp_ppm) > 1000000")).count() == 0
    })
    check("corpus.triangleLoops counts the hand-built directed triangle")({
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L)).toDF("a", "b")
      val out = CorpusOps.triangleLoops(edges, "a", "b").collect()
        .map(r => r.getAs[Long]("src") -> r.getAs[Long]("n_ffl")).toMap
      out.getOrElse(1L, 0L) == 1L
    })
    check("corpus.minhashRecallGate: hits bounded by both sides, ppm sane")({
      val g = CorpusOps.minhashRecallGate(docs).collect().head
      val (ex, det, h) = (g.getAs[Long]("n_exact_pairs"),
        g.getAs[Long]("n_detected_pairs"), g.getAs[Long]("n_hits"))
      h <= math.min(ex, det) && g.getAs[Long]("recall_ppm") <= 1000000L &&
        g.getAs[Long]("precision_ppm") <= 1000000L
    })
    check("corpus.slidingDistinct: one row per active day, exact positive")({
      val act = Tables.events(spark, sfDir)
        .select(expr("ts_us div 86400000000").as("d"), col("user_id").as("k"))
      val out = CorpusOps.slidingDistinct(act, "d", "k")
      out.count() == act.select("d").distinct().count() &&
        out.filter(col("n_exact") <= 0).count() == 0
    })
    check("corpus.dsirWeights: one weight per doc; en target slice outscores the rest on average")({
      val w = CorpusOps.dsirWeights(docs, col("lang") === "en")
      val joined = w.join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .groupBy(expr("lang = 'en'").as("t")).agg(avg("w_ppb").as("m"))
        .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      w.count() == docs.count() && joined(true) > joined(false)
    })
    check("corpus.bandingSweep: one row per (bands, rows) config, counts bounded")({
      val rows = CorpusOps.bandingSweep(docs.limit(300)).collect()
      rows.length == graft.operators.Dedup.BandingConfigs.length &&
        rows.forall(r => r.getAs[Long]("n_hits") <=
          math.min(r.getAs[Long]("n_detected"), r.getAs[Long]("n_exact")))
    })
    check("corpus.reciprocalLinks finds exactly the hand-built mutual pair")({
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("u", "v")
      CorpusOps.reciprocalLinks(edges, "u", "v").collect()
        .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet ==
        Set((1L, 2L), (2L, 1L))
    })
    check("corpus.binaryCodes: two bounded sign words per vector")({
      val c = CorpusOps.binaryCodes(Tables.embeddings(spark, sfDir))
      c.count() == Tables.embeddings(spark, sfDir).count() &&
        c.filter(expr("w0 < 0 OR w0 > 4294967295 OR w1 < 0 OR w1 > 4294967295"))
          .count() == 0
    })
    check("corpus.hammingNeighbors: k rows per query, distances within 64")({
      val c = CorpusOps.binaryCodes(Tables.embeddings(spark, sfDir))
      val nn = CorpusOps.hammingNeighbors(c, col("vec_id") < 5, 3)
      nn.count() == 15L &&
        nn.filter(expr("hamming < 0 OR hamming > 64")).count() == 0
    })
    check("corpus.dedupImpact conserves docs and flags the planted near-dup mass")({
      val pairs = CorpusOps.nearDupPairs(docs).select("doc_a", "doc_b")
      val imp = CorpusOps.dedupImpact(docs, pairs)
      imp.agg(sum("n_docs")).head.getLong(0) == docs.count() &&
        imp.filter(expr("n_dropped > n_docs OR tokens_dropped > tokens_total"))
          .count() == 0
    })
    check("corpus.containmentPairs catches a hand-built embedded doc, J < 0.5 on every pair")({
      import spark.implicits._
      val small = (1 to 30).map(i => s"tok$i").mkString(" ")
      val host = small + " " + (100 to 190).map(i => s"pad$i").mkString(" ")
      val other = (200 to 290).map(i => s"far$i").mkString(" ")
      val cp = CorpusOps.containmentPairs(
        Seq((1L, small), (2L, host), (3L, other)).toDF("doc_id", "text")).collect()
      cp.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet ==
        Set((1L, 2L)) &&
        cp.forall(r => 3 * r.getAs[Long]("i") <
          r.getAs[Long]("na") + r.getAs[Long]("nb"))
    })
    check("corpus.quotaSample: exactly min(q, group size) rows per group, deterministic")({
      val s1 = CorpusOps.quotaSample(docs, "source", 5)
      val perGroup = s1.groupBy("source").count().collect()
      val sizes = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      perGroup.forall(r => r.getLong(1) == math.min(5L, sizes(r.getString(0)))) &&
        s1.agg(sum("doc_id")).head.getLong(0) ==
          CorpusOps.quotaSample(docs, "source", 5).agg(sum("doc_id")).head.getLong(0)
    })
    check("corpus.rerankNeighbors: k exact-cosine rows per query from the binary shortlist")({
      val emb = Tables.embeddings(spark, sfDir)
      val cands = CorpusOps.hammingNeighbors(
        CorpusOps.binaryCodes(emb), col("vec_id") < 5, 10)
        .select("query_id", "neighbor_id")
      val rr = CorpusOps.rerankNeighbors(emb, cands, 3)
      rr.count() == 15L &&
        rr.filter(expr("rrank < 1 OR rrank > 3 OR cosine > 1.000001")).count() == 0
    })
    check("corpus.components merges a hand-built chain into one min-labeled cluster")({
      import spark.implicits._
      val pairs = Seq((5L, 9L), (9L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
      CorpusOps.components(pairs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap ==
        Map(5L -> 2L, 9L -> 2L, 2L -> 2L, 7L -> 7L, 8L -> 7L)
    })
    check("corpus.containmentCandidates: both schemes surface a middle-embedded doc; cap keeps coverage")({
      import spark.implicits._
      val small = (1 to 30).map(i => s"ctok$i").mkString(" ")
      val host = "q1 q2 q3 q4 q5 " + small + " " + (300 to 360).map(i => s"cpad$i").mkString(" ")
      val frame = Seq((1L, small), (2L, host), (3L, (500 to 540).map(i => s"other$i").mkString(" ")))
        .toDF("doc_id", "text")
      Seq("manber", "winnow").forall { scheme =>
        val c = CorpusOps.containmentCandidates(frame, scheme).collect()
          .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
        val capped = CorpusOps.containmentCandidates(frame, scheme, printCap = 1L, anchors = 1L)
          .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
        c.contains((1L, 2L)) && capped.contains((1L, 2L)) && capped.subsetOf(c)
      }
    })
    check("corpus.containmentDedup verifies the embedded pair with exact intersection counts")({
      import spark.implicits._
      val small = (1 to 30).map(i => s"dtok$i").mkString(" ")
      val host = "h1 h2 h3 " + small + " " + (700 to 760).map(i => s"dpad$i").mkString(" ")
      val out = CorpusOps.containmentDedup(
        Seq((1L, small), (2L, host)).toDF("doc_id", "text")).collect()
      out.length == 1 && out.head.getAs[Long]("doc_a") == 1L &&
        out.head.getAs[Long]("doc_b") == 2L &&
        out.head.getAs[Long]("i") == out.head.getAs[Long]("na") &&
        out.head.getAs[Long]("containment_ppm") == 1000000L
    })
    check("corpus.containmentRecallGate finds a middle-embedded doc a stride grid would miss")({
      import spark.implicits._
      val small = (1 to 30).map(i => s"tok$i").mkString(" ")
      // embed at odd word offset 3 — content-defined prints must still hit
      val host = "p1 p2 p3 " + small + " " + (100 to 190).map(i => s"pad$i").mkString(" ")
      val g = CorpusOps.containmentRecallGate(
        Seq((1L, small), (2L, host)).toDF("doc_id", "text")).collect()
      g.map(_.getAs[String]("scheme")).toSet == Set("manber", "winnow") &&
        g.forall(r => r.getAs[Long]("n_exact_pairs") == 1L &&
          r.getAs[Long]("n_hits") == 1L && r.getAs[Long]("recall_ppm") == 1000000L)
    })
    check("corpus.bitextMine: k scored candidates per query, mutual/aligned flags coherent")({
      val emb = Tables.embeddings(spark, sfDir)
      val a = emb.filter(pmod(col("vec_id"), lit(2L)) === 0)
      val b = emb.filter(pmod(col("vec_id"), lit(2L)) === 1)
      val m = CorpusOps.bitextMine(a, b, a.filter(col("vec_id") < 10), 3).cache()
      m.groupBy("query_id").count().filter(col("count") =!= 3).count() == 0 &&
        m.filter(expr("is_aligned = 1 AND margin_ppm <= 1000000")).count() == 0 &&
        m.filter(expr("is_mutual NOT IN (0, 1)")).count() == 0
    })
    check("corpus.weightedKeep: w_ppm a valid probability, kept iff hash under it")({
      val wk = CorpusOps.weightedKeep(docs).cache()
      wk.filter(expr("w_ppm < 0 OR w_ppm > 1000000")).count() == 0 &&
        wk.filter(expr(
          s"kept != CASE WHEN ${graft.operators.Corpus.mixHashSql("doc_id", 1000000007L)} % 1000000 < w_ppm THEN 1L ELSE 0L END"))
          .count() == 0 &&
        wk.filter(col("kept") === 1L).count() > 0
    })
    check("corpus.temperatureShares: tempered shares sum to ~1e6 and compress the head")({
      val ts = CorpusOps.temperatureShares(docs, "source", "n_chars").cache()
      val sums = ts.agg(sum("temp_share_ppm"), sum("raw_share_ppm"), count(lit(1))).head
      val (st, n) = (sums.getLong(0), sums.getLong(2))
      st > 1000000L - n && st <= 1000000L &&
        ts.filter(expr("boost_permille <= 0 OR epochs_permille <= 0")).count() == 0
    })

    // ---- graft_* kernels from pure SQL text (the injectFunction path:
    // a SQL-only user on a cluster with
    // spark.sql.extensions=graft.plans.GraftExtensions, no Scala API) ----
    docs.limit(200).select(col("doc_id"), col("text")).createOrReplaceTempView("tour_docs")
    Tables.embeddings(spark, sfDir).limit(200)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .createOrReplaceTempView("tour_vecs")
    def sql1(q: String): Long = spark.sql(q).head().getLong(0)
    check("sql graft_polyhash: deterministic non-null hash per doc")(
      sql1("SELECT COUNT(DISTINCT graft_polyhash(text)) FROM tour_docs") > 100)
    check("sql graft_shingle_hashes: distinct 3-gram hashes, ≤ |text| per doc")(
      sql1("""SELECT COUNT(*) FROM tour_docs
             |WHERE size(graft_shingle_hashes(text)) <= 0
             |   OR size(graft_shingle_hashes(text)) > length(text)""".stripMargin) == 0)
    check("sql graft_minhash: 12-long signature")(
      sql1("SELECT COUNT(*) FROM tour_docs WHERE size(graft_minhash(graft_shingle_hashes(text))) != 12") == 0)
    check("sql graft_simhash_bands: 4 bands, each < 2^16")(
      sql1("""SELECT COUNT(*) FROM tour_docs
             |WHERE size(graft_simhash_bands(graft_shingle_hashes(text))) != 4
             |   OR exists(graft_simhash_bands(graft_shingle_hashes(text)),
             |             b -> b < 0 OR b >= 65536)""".stripMargin) == 0)
    check("sql graft_jaccard: self-similarity is 1, range [0,1]")(
      sql1("""SELECT COUNT(*) FROM tour_docs
             |WHERE graft_jaccard(graft_shingle_hashes(text), graft_shingle_hashes(text)) != 1.0D""".stripMargin) == 0)
    check("sql graft_cosine: self-similarity ≈ 1 for nonzero vectors")(
      sql1("""SELECT COUNT(*) FROM tour_vecs
             |WHERE abs(graft_cosine(v, v) - 1.0D) > 1e-9D""".stripMargin) == 0)
    check("sql graft_lsh_buckets: 16 buckets per vector")(
      sql1("SELECT COUNT(*) FROM tour_vecs WHERE size(graft_lsh_buckets(v)) != 16") == 0)
    check("sql graft_project: 16-dim projection, finite")(
      sql1("""SELECT COUNT(*) FROM tour_vecs
             |WHERE size(graft_project(v)) != 16
             |   OR exists(graft_project(v), x -> isnan(x))""".stripMargin) == 0)
    check("corpus.curationPipeline: one row per doc, every gate populated")({
      val evalSet = docs.filter(pmod(col("doc_id"), lit(10L)) === 7)
        .select("doc_id", "text").limit(50)
      val out = CorpusOps.curationPipeline(docs.select("doc_id", "text"), evalSet).cache()
      val total = docs.count()
      out.count() == total &&
        out.filter(col("keep_neardup")).count() > 0 &&
        out.filter(col("contaminated")).count() > 0 && // eval ⊂ corpus → self-hits
        out.filter(col("split").isin("train", "val", "test")).count() == total &&
        out.filter(col("bin") < 0 || col("score") < 0 || col("score") > 1).count() == 0
    })

    check("corpus.curateMultimodal: cross-modality keep/drop with per-modality reasons")({
      // one multimodal frame: text from documents, audio/video payloads
      // from the REAL codecs (the modality corpora share the doc_id
      // space), plus the modality plants so every family has drops
      import spark.implicits._
      val aBase = graft.operators.Audio.encodeAudio(spark, sfDir)
      val audio = aBase.union(graft.operators.Audio.offsetCopies(aBase))
        .map(p => (p.doc_id, p.payload)).toDF("doc_id", "audio")
      val vBase = graft.operators.Video.encodeVideos(spark, sfDir)
      val video = vBase.union(graft.operators.Video.cornerSwappedCopies(vBase))
        .map(p => (p.doc_id, p.container)).toDF("doc_id", "video")
      val frame = docs.select("doc_id", "text")
        .join(audio, Seq("doc_id"), "full_outer")
        .join(video, Seq("doc_id"), "full_outer")
      val out = CorpusOps.curateMultimodal(frame).cache()
      val reasons = out.select(explode(col("reasons")).as("r"))
        .distinct().collect().map(_.getString(0)).toSet
      out.count() == frame.select("doc_id").distinct().count() &&
        out.filter(col("keep")).count() > 0 &&
        out.filter(!col("keep")).count() > 0 &&
        reasons.nonEmpty &&
        reasons.subsetOf(Set("text_exact", "text_neardup", "text_containment",
          "audio_exact", "audio_neardup", "video_exact", "video_neardup")) &&
        // the planted modality copies guarantee all three families fire
        Set("text_neardup", "audio_neardup", "video_neardup").subsetOf(reasons) &&
        out.filter(col("keep") && size(col("reasons")) > 0).count() == 0
    })

    check("corpus.scrubBoilerplate/dedupWeights: census-driven line scrub + soft-dedup mass")({
      // plant line structure over the real docs (the CorpusClean
      // convention): a footer on ~75% of each source crosses the 50%
      // share bar; scrubbing must strip EXACTLY that line and nothing
      // from the df=1 body lines
      val lined = graft.operators.CorpusClean.lined(spark, sfDir)
        .select(col("doc_id"), col("source"), col("lt").as("text"))
      val census = CorpusOps.boilerplateCensus(lined).cache()
      val scrubbed = CorpusOps.scrubBoilerplate(lined).cache()
      val w = CorpusOps.dedupWeights(
        docs.select("doc_id", "source", "text")
          .union(docs.select("doc_id", "source", "text").limit(40)))
      census.count() > 0 &&
        census.filter(!col("line").startsWith("subscribe to ")).count() == 0 &&
        scrubbed.filter(col("text").contains("subscribe to ")).count() == 0 &&
        // the 10%-share copyright line sits UNDER the bar — it survives
        scrubbed.filter(col("text").contains("copyright ")).count() ==
          lined.filter(col("text").contains("copyright ")).count() &&
        w.filter(col("cluster_size") === 2 && col("weight_ppm") =!= 500000L).count() == 0 &&
        w.filter(col("cluster_size") === 1 && col("weight_ppm") =!= 1000000L).count() == 0 &&
        w.filter(col("cluster_size") === 2).count() == 80
    })

    check("corpus.neardupWeights: every near-dup component keeps total mass ~1e6 ppm")({
      val w = CorpusOps.neardupWeights(docs.select("doc_id", "text")).cache()
      val perCluster = w.groupBy("cluster_id")
        .agg(sum("weight_ppm").as("mass"), max("cluster_size").as("cs"))
      w.count() == docs.count() &&
        w.filter(col("cluster_size") > 1).count() > 0 && // corpus has near-dups
        w.filter(col("cluster_size") === 1 && col("weight_ppm") =!= 1000000L).count() == 0 &&
        // integer-floor invoice only: 1e6 - cs < Σ(1e6 div cs)·1 ≤ 1e6
        perCluster.filter(col("mass") > 1000000L || col("mass") <= lit(1000000L) - col("cs")).count() == 0
    })

    check("corpus.neardupWeightsFor: shared component frame — pay the census once, every consumer agrees")({
      // the parameterized entry consumes a PRE-COMPUTED component frame;
      // weights through it must equal the self-deriving path exactly,
      // and the same frame feeds the impact rollup without re-derivation
      val d = docs.select("doc_id", "text")
      val comp = CorpusOps.components(
        CorpusOps.nearDupPairs(d).select("doc_a", "doc_b")).cache()
      val viaFor = CorpusOps.neardupWeightsFor(comp, d)
        .select("doc_id", "cluster_id", "cluster_size", "weight_ppm")
      val viaSelf = CorpusOps.neardupWeights(d)
        .select("doc_id", "cluster_id", "cluster_size", "weight_ppm")
      viaFor.exceptAll(viaSelf).isEmpty && viaSelf.exceptAll(viaFor).isEmpty &&
        graft.operators.Dedup.dedupImpactFor(
          docs.select(col("doc_id"), col("source"), col("n_chars").as("n_tokens")),
          comp).count() > 0
    })

    // ---- KLL sketch surface (the mergeable unbounded-range quantile
    // entry the Sketches scaladoc promises) + the parameterized
    // attribution lattice ----
    val kllCap = graft.operators.Sketches.KllCapacity
    val evRows = Tables.events(spark, sfDir)
      .select(col("event_type").as("group"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("value"),
        col("event_id").as("tie"))
      .cache()
    val kllNBy = evRows.groupBy("group").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kllExact = evRows.select("group", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    def kllRankErrs(state: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] = {
      // (group, rank error, state top weight) per graded quantile
      val wmax = state.collect().groupBy(_.getString(0))
        .map { case (g, rs) => g -> rs.map(r => 1L << r.getLong(3).toInt).max }
      CorpusOps.kllQuantiles(state).collect().toSeq.map { r =>
        val (g, q, n, est) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val target = (n * q + 999999L) / 1000000L
        val vs = kllExact(g)
        val lo = vs.count(_ < est) + 1L
        val hi = vs.count(_ <= est).toLong
        val err = if (target >= lo && target <= hi) 0L
          else math.min(math.abs(target - lo), math.abs(target - hi))
        (g, err, wmax(g))
      }
    }
    val kllFull = CorpusOps.kllSketch(evRows).cache()
    check("corpus.kllSketch: capacity-bounded state conserving corpus mass per group")({
      val st = kllFull.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      st.groupBy(r => (r._1, r._4)).forall(_._2.size <= kllCap) &&
        st.groupBy(_._1).forall { case (g, rs) =>
          rs.map(r => 1L << r._4.toInt).sum == kllNBy(g) }
    })
    check("corpus.kllQuantiles: every estimate within the top-weight rank bar")(
      kllRankErrs(kllFull).forall { case (_, err, w) => err <= w })
    check("corpus.kllMerge: half-built states union+re-compact under the 2x bar")({
      val a = CorpusOps.kllSketch(evRows.filter(pmod(col("tie"), lit(2)) === 0))
      val b = CorpusOps.kllSketch(evRows.filter(pmod(col("tie"), lit(2)) === 1))
      val merged = CorpusOps.kllMerge(a, b).cache()
      val st = merged.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      st.groupBy(r => (r._1, r._4)).forall(_._2.size <= kllCap) &&
        st.groupBy(_._1).forall { case (g, rs) =>
          rs.map(r => 1L << r._4.toInt).sum == kllNBy(g) } &&
        kllRankErrs(merged).forall { case (_, err, w) => err <= 2L * w }
    })
    check("corpus.attributionFor: custom lattice — first-to-fire partition with exact masses")({
      val frame = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L))
        .toDF("doc_id", "n_tokens")
      val out = CorpusOps.attributionFor(frame, Seq(
          "cheap" -> Seq(2L, 3L).toDF("doc_id"),
          "deep" -> Seq(3L, 4L).toDF("doc_id"))).collect()
        .map(r => r.getString(1) -> ((r.getInt(0), r.getLong(2), r.getLong(3)))).toMap
      // doc 3 fires BOTH stages → attributed to 'cheap' (first in order)
      out("cheap") == ((1, 2L, 50L)) && out("deep") == ((2, 1L, 40L)) &&
        out("kept") == ((3, 2L, 60L))
    })

    check("sql kernels survive newSession (injected, not temp-registered)")({
      // a temp-function-only registration dies with the session; the
      // extensions-injected one is part of the cloned function registry
      val fresh = spark.newSession()
      fresh.sql("SELECT graft_polyhash('abc')").head().getLong(0) ==
        spark.sql("SELECT graft_polyhash('abc')").head().getLong(0)
    })

    println(s"[apitour] PASS $checks checks on $sfDir")
    checks
  }
}
