package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Scale-stress harness: replicates the corpus N× (with id offsets so
  * the planted near-dup structure replicates too) into a temp sf dir,
  * then times the signature-heavy queries there. Not part of the driver
  * contract — run ad hoc to check the LSH pipelines stay candidate-
  * bounded instead of going quadratic as the corpus grows.
  *
  *   sbt "runMain graft.tools.ScaleSmoke /root/testdata/sf0.1 10"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    // "glob-only": skip the query sweep, run just the pushdown probe
    val globOnly = args.contains("glob-only")
    val outDir = s"/tmp/graft_scale_x$factor"
    val spark = GraftSession.build("graft-scale-smoke")
    // partitions track DATA VOLUME (≈128 MB targets), not the raw
    // factor: the corpus is ~300 MB/× so ×10 stays at 32 partitions
    // and ×30 roughly doubles. (Measured: blindly multiplying
    // partitions by the factor made the many-stage LSH pipelines 4×
    // slower — tiny-task overhead — while the ×30 OOM risk is actually
    // the verification join buffers in ONE shared local JVM; on a real
    // cluster each executor brings its own heap. Run big factors with
    // SPARK_DRIVER_MEM=32g.)
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(32, 32 * factor / 15).toString)

    // optional "only=a,b,c" arg: rerun a subset; reuse an existing
    // replicated dir instead of rebuilding it
    val only: Option[Set[String]] =
      args.find(_.startsWith("only=")).map(_.drop(5).split(',').toSet)
    if (!globOnly &&
        !(only.isDefined && new java.io.File(s"$outDir/documents.parquet").exists)) {
      val docs = Tables.documents(spark, srcDir)
      val embs = Tables.embeddings(spark, srcDir)
      val bigDocs = (0 until factor).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))).reduce(_ union _)
      val bigEmbs = (0 until factor).map(i =>
        embs.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))).reduce(_ union _)
      bigDocs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      bigEmbs.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      // events replicate with offset ids too (user population grows ×N,
      // timestamps stay — the time-series ops see N× traffic density).
      // Raw read passes ts through untouched in whichever layout the
      // testdata ships (nano INT64 or TIMESTAMP_NTZ micros) —
      // Tables.events branches on the decoded type either way.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$srcDir/events.parquet")
      (0 until factor).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i * 100000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    val targets = Seq("dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram",
      "dedup_clusters", "embed_neardup", "knn_bruteforce", "knn_ivf",
      "text_fingerprint", "text_quality", "text_chunk", "pack_bins", "corpus_curate",
      "events_asof", "events_range_join", "events_funnel", "events_sessionize",
      "sketch_hll", "sketch_cms", "sample_stratified",
      "tfidf_topterms", "events_retention", "events_anomaly",
      "sketch_bloom", "sketch_quantile", "embed_project", "corpus_mix",
      "text_contamination",
      // round 4 (q_rollup excluded: lineitem isn't replicated here)
      "text_repetition", "text_ngram_lm", "knn_pq",
      "compact_plan", "incr_agg", "zorder_layout", "events_pivot",
      "dedup_semantic", "corpus_source_stats", "sketch_hll_setops",
      // round 4b: span dedup + rolling distinct + audio codec path
      "dedup_spans", "events_dau_rolling", "audio_meta",
      // round 4c: event-series depth, URL curation, video codec path
      // (TPC-H additions q7..q19/orders_rfm/q3_bloom_prejoin use the
      // un-replicated lineitem/orders — covered by bench + PLANS)
      "events_decay", "events_gap_fill", "events_hop_window",
      "events_markov", "events_cohort_matrix",
      "dedup_url", "web_domains", "corpus_blocklist", "video_meta",
      "partition_skew", "sample_topk", "corpus_split", "events_median_exact",
      "knn_join",
      // round 5: streaks/overlap grids, charclass map math, bigram agg,
      // label voting + centroid table (lineitem_transit is TPC-H-fed —
      // covered by bench + PLANS like the other un-replicated ops)
      "events_streaks", "events_type_overlap", "text_charclass",
      "corpus_bigrams", "knn_classify", "embed_centroid",
      "events_dwell", "source_similarity", "source_deciles",
      "events_seasonality", "events_value_pareto",
      "events_attribution", "text_readability",
      // round 6: lifecycle grids, ANN recall audit, vocabulary stats
      // (orders_reorder_gap uses un-replicated orders — bench + PLANS)
      "events_lifecycle", "user_tenure", "events_cum_share",
      "knn_recall", "text_zipf", "source_diversity",
      "events_gini", "knn_pq_recall", "embed_outlier",
      "events_stickiness", "events_paths", "corpus_lm_buckets",
      "dedup_cross_source",
      // round 6 cont.: series stats, robust gate, graph + vocab audits
      // (orders_basket_pairs uses un-replicated lineitem/part — bench + PLANS)
      "events_autocorr", "events_cube", "events_mad",
      "text_hapax", "knn_degree",
      // round 6 cont.: temporal fingerprint + diversity histogram,
      // Zipf fit and the per-dimension embedding audit
      "events_burstiness", "events_entropy",
      "text_zipf_slope", "embed_dim_stats",
      // round 8: changepoint triage, crawl novelty, Lloyd step,
      // silhouette audit (orders_abc uses un-replicated lineitem —
      // covered by bench + PLANS)
      "events_changepoint", "corpus_novelty",
      "embed_kmeans_step", "knn_silhouette",
      "audio_envelope", "video_ahash",
      // round 8: forecast skill, BPE pair scan, KL drift, PCA step,
      // page authority (orders_backlog uses un-replicated
      // orders/lineitem — covered by bench + PLANS)
      "events_forecast", "bpe_pair_step", "source_kl_drift",
      "embed_pca_power", "web_pagerank_step",
      // round 8 cont. (nation_lead_time / brand_price_trend use
      // un-replicated orders/lineitem/part — covered by bench + PLANS)
      "events_abtest", "events_daily_topk", "events_ttconvert",
      "knn_ivf_balance", "sketch_quantile_error", "source_label_trust",
      // round 9: graph audit, dup-lift calibration, DSIR weights, the
      // LSH acceptance gate (its exact side is Σdf² — watch it track
      // candidate volume, not corpus²), visual dedup, sliding HLL,
      // IVFADC composite + its recall gate
      "web_triangles", "quality_dup_lift", "corpus_dsir_weights",
      "dedup_minhash_recall", "video_dedup", "sketch_hll_sliding",
      "knn_ivf_pq", "knn_ivf_pq_recall", "events_srm",
      "split_leakage", "dedup_clusters_hist", "audio_dedup",
      // round 10: rolling alert, ANN evidence tables + the binary
      // tier (sweep/hamming/rerank), prefix/containment/length-bias
      // dedup (the last two are Σdf² audit-path like the recall gate
      // — watch candidate volume, not corpus²), quota cap, dedup
      // impact, intra-domain components + reciprocity
      // (lineitem-fed rows stay bench+PLANS-covered as before)
      "events_rolling_anomaly", "knn_probe_sweep", "knn_hamming_recall",
      "knn_rerank_gain", "knn_mrl_recall", "dedup_prefix",
      "dedup_containment", "dedup_len_bias", "dedup_banding_sweep",
      "corpus_quota_sample", "corpus_dedup_impact",
      "web_domain_components", "web_reciprocity",
      // round-10 batch 5: the containment production-path gate (Σdf²
      // audit side — watch candidate volume), margin bitext mining
      // (query-bounded), and the two map-side samplers
      "dedup_containment_recall", "embed_bitext",
      "sample_weighted", "corpus_temp_mix",
      // round-10 batch 6: component census over LSH-bounded pairs,
      // shard/lang-mix audits (map-side + bounded rollups)
      "embed_clusters", "corpus_shards", "text_lang_mix",
      // round-10 batch 7: corpus-shuffle histogram (watch the hash agg),
      // map-side fertility rollup, HITS mat-vec step
      "corpus_ngram_inflation", "token_fertility", "web_hits_step",
      // round-10 batch 8: LSH index probe (batch-sized shuffles only),
      // threshold rollup over the paid-once pair frame, IVF drift audit
      "dedup_incremental_lsh", "dedup_threshold_sweep", "knn_ivf_drift",
      // round-10 batch 9: vocab-frame rank rollup, types-bounded probe fold
      "text_vocab_coverage", "sketch_bloom_fpr",
      // round-12: line-census boilerplate pass (fp-keyed partial agg +
      // broadcast anti-join scrub), the soft-dedup weight window, and
      // the codec-pass scene-cut lag (watch: stays one pass, no global sort)
      "text_boilerplate", "text_boilerplate_scrub", "corpus_dedup_weights",
      "video_scene_cut",
      // transitive near-dup soft dedup: rides the component census —
      // watch that the window stays cluster-bounded
      "corpus_neardup_weights",
      // round 13: the whole-lattice attribution census (watch: three
      // NARROW-row key shuffles after text is dropped + the family's
      // paid-once pair frames), the Lloyd convergence ladder and PQ
      // training (K-bounded broadcast fanout per rung — watch rung
      // count stays log-bounded), the KLL compactor build + its rank
      // gate (per-(group, level) windows over geometrically shrinking
      // state — watch rung 0 dominates and the tail rungs are no-ops)
      "dedup_attribution", "embed_kmeans_converge",
      "knn_pq_train", "knn_pq_train_gain",
      "sketch_kll", "sketch_kll_error",
      // round 14: the PQ training ladder (watch: K-bounded broadcast
      // fanout per rung, rung count fixed at PqTrainIters) and the
      // codebook-staleness gate (watch: the exact side stays
      // query-slice-bounded — 100 mode probes at any ×N — and every
      // codebook assign is the map-side K-bounded argmin, linear in
      // the union grid)
      "knn_pq_train_converge", "knn_ivf_pq_refresh",
      // round 15: the embedding admission gate (watch: probe shuffles
      // stay BATCH-sized, candidates bounded by the census bit
      // geometry + one cell per probe), the image-modality dedup
      // (watch: one codec pass, class collapse before banding, star
      // output stays Σ(k−1)) and the BPE training ladder (watch:
      // corpus → vocab partial agg ONCE, every rung vocab-bounded,
      // rung count fixed at BpeTrainIters)
      "dedup_incremental_semantic", "image_dedup", "bpe_train_converge")
    val times: Seq[(String, Double)] = if (globOnly) Seq.empty
    else targets.filter(t => only.forall(_.contains(t))).map { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, outDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale x$factor] $name%-16s $sec%8.2fs  rows=$n")
      name -> sec
    }
    // composed curation pipeline at ×N: the whole chain (signatures →
    // exact/near dup → quality → decontamination → split → pack) as ONE
    // job, timed against the sum of its stages run separately — the
    // composition must cost ≈ the signature pass + cheap joins, not a
    // re-materialization per stage.
    if (!globOnly && only.isEmpty) {
      import graft.api.CorpusOps
      val big = spark.read.parquet(s"$outDir/documents.parquet")
      val evalSet = big.filter(pmod(col("doc_id"), lit(10L)) === 7)
        .select("doc_id", "text").limit(500)
      def time[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
      }
      spark.catalog.clearCache()
      val (nComposed, composedSec) = time(CorpusOps.curationPipeline(big, evalSet).count())
      spark.catalog.clearCache()
      val (_, s1) = time(CorpusOps.exactDupGroups(big).count())
      spark.catalog.clearCache()
      val (_, s2) = time(CorpusOps.dedupKeepList(big).count())
      spark.catalog.clearCache()
      val (_, s3) = time(CorpusOps.qualityScore(big).count())
      spark.catalog.clearCache()
      val (_, s4) = time(graft.SparkEntry.queries("text_contamination")(spark, outDir).count())
      spark.catalog.clearCache()
      val (_, s5) = time(graft.SparkEntry.queries("corpus_split")(spark, outDir).count())
      spark.catalog.clearCache()
      val (_, s6) = time(CorpusOps.packBins(big).count())
      val stagesSec = s1 + s2 + s3 + s4 + s5 + s6
      println(f"""{"curation_pipeline":{"rows":$nComposed,"composed_sec":$composedSec%.2f,"stages_sum_sec":$stagesSec%.2f}}""")
    }

    // glob prefix pushdown at scale: a key-SORTED replicated manifest in
    // ONE file with ~64 KB row groups (hundreds of groups), filtered by a
    // compiled user glob. GlobPrefixPushdown turns the rlike into
    // StartsWith ∧ rlike; the StartsWith reaches the parquet reader as
    // StringStartsWith and row groups outside the prefix's min/max range
    // never decompress — scan_rows << total_rows is the evidence.
    locally {
      val man = graft.sources.Manifest.manifest(spark, srcDir)
      val bigMan = (0 until factor).map(i =>
        man.withColumn("key", concat(lit(f"rep=$i%02d/"), col("key")))).reduce(_ union _)
      val manDir = s"$outDir/manifest_sorted.parquet"
      bigMan.orderBy("key").coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024).parquet(manDir)
      val re = "^(?:" + graft.functions.Globs.compile(
        f"rep=${factor / 2}%02d/data/year=2024/month=01/**") + ")$"
      val fdf = spark.read.parquet(manDir).filter(col("key").rlike(re))
      // execute THIS queryExecution (count() would plan a metrics-less
      // copy), then read the scan's row metric off the executed plan
      val matched = fdf.queryExecution.toRdd.count()
      val scanRows = fdf.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.headOption.getOrElse(-1L)
      val total = spark.read.parquet(manDir).count()
      println(s"""{"glob_pushdown":{"total_rows":$total,"scan_rows":$scanRows,"matched":$matched}}""")
    }
    println(s"""{"scale_factor":$factor,"total_sec":${times.map(_._2).sum}}""")
    spark.stop()
  }
}
