package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q3Join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ QueriesDeep.queries ++ EventsMore.queries ++ WebCorpus.queries ++ AnalyticsPlus.queries ++ PathMatching.queries ++ ContentTypes.queries ++
      HivePartitions.queries ++ TimePartitions.queries ++ ChangeDetection.queries ++ S3Utils.queries ++ Lifecycle.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ Audio.queries ++ Video.queries ++ Corpus.queries ++ Sketches.queries ++
      Maintenance.queries ++ CorpusQuality.queries ++ Growth.queries ++ AnalyticsMore.queries ++ CorpusClean.queries

  /** AUDIT-tier keys: operators whose contract is a deliberately
    * expensive evidence table — an exact grading side (recall gates,
    * Σ df², exact order statistics), a parameter sweep, or a full-graph
    * census — run on a SLICE at production cadence, not per-ingest
    * (DEPLOY.md "Audit tier"). Bench reports this tier's total
    * separately so cross-round diffs of the always-on contract tier
    * aren't diluted every time a new audit gate lands; benchdiff
    * compares within tiers. Membership is by CONTRACT (the operator's
    * documented operating discipline), not by cost.
    */
  val auditTier: Set[String] = Set(
    // exact-recall gates (brute-force / exact side paid by contract)
    "knn_recall", "knn_pq_recall", "knn_ivf_pq_recall", "knn_mrl_recall",
    "knn_hamming_recall", "knn_rerank_gain", "knn_probe_sweep",
    "knn_ivf_drift", "knn_ivf_refresh", "knn_silhouette",
    "dedup_minhash_recall", "dedup_containment_recall",
    // Σ df² exact enumeration (Dedup.scala documents it run-on-a-slice;
    // the PRODUCTION path is dedup_containment_lsh, which stays contract)
    "dedup_containment",
    // parameter sweeps / evidence tables (Σ df² exact sides)
    "dedup_banding_sweep", "dedup_threshold_sweep", "dedup_len_bias",
    "embed_geometry_sweep", "embed_bits_rule", "video_band_sweep",
    // full-graph / full-corpus censuses and exact-vs-sketch graders
    "embed_clusters", "web_domain_components", "corpus_dedup_impact",
    "sketch_bloom_fpr", "sketch_quantile_error", "events_median_exact",
    "text_vocab_coverage", "corpus_ngram_inflation",
    // round 13: dedup_attribution is the whole-lattice census
    // (corpus_dedup_impact's family); embed_kmeans_converge pays
    // KmeansConvIters full Lloyd passes by contract (the when-to-stop
    // evidence ladder); knn_pq_train_gain scores the exact
    // nearest-codeword side twice; sketch_kll/_error materialize the
    // compactor with per-(group, level) rank windows so the oracle can
    // replay it (the production path is executor-local compactors)
    "dedup_attribution", "embed_kmeans_converge", "knn_pq_train_gain",
    "sketch_kll", "sketch_kll_error",
    // round 14: knn_pq_train_converge pays PqTrainIters full Lloyd
    // passes by contract (the PQ when-to-stop ladder); knn_ivf_pq_refresh
    // pays the shared exact side + two codebook builds + the warm
    // retrain ladder over the drifted union (knn_ivf_refresh's family)
    "knn_pq_train_converge", "knn_ivf_pq_refresh",
    // round 15: bpe_train_converge pays BpeTrainIters full vocab-pair
    // recounts by contract (the converge-ladder family — tokenizer
    // training cadence, not per-ingest)
    "bpe_train_converge")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ QueriesDeep.oracles ++ EventsMore.oracles ++ WebCorpus.oracles ++ AnalyticsPlus.oracles ++ PathMatching.oracles ++ ContentTypes.oracles ++
      HivePartitions.oracles ++ TimePartitions.oracles ++ ChangeDetection.oracles ++ S3Utils.oracles ++ Lifecycle.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++ Audio.oracles ++ Video.oracles ++ Corpus.oracles ++ Sketches.oracles ++
      Maintenance.oracles ++ CorpusQuality.oracles ++ Growth.oracles ++ AnalyticsMore.oracles ++ CorpusClean.oracles
}
