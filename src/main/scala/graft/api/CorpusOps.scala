package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash._

/** User-facing corpus operators over ARBITRARY DataFrames — the same
  * column math the oracle-checked queries run on the test corpus,
  * parameterized so a library user points them at their own tables.
  * Contract: `docs` carries (`doc_id`: long, `text`: string); outputs
  * are deterministic (hash-based, no RNG) and engine-portable.
  */
object CorpusOps {

  /** graft_* kernels must parse in the caller's session (idempotent). */
  private def prepared(df: DataFrame): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df
  }

  /** content fingerprint column (rolling poly hash over word hashes). */
  def fingerprint(textCol: String = "text") = expr(sparkFingerprint(textCol))

  /** exact-dup groups: one row per duplicated fingerprint with the
    * representative (min doc_id) and copy count.
    */
  def exactDupGroups(docs0: DataFrame): DataFrame = {
    val docs = prepared(docs0)
    docs.withColumn("fp", fingerprint())
      .groupBy("fp")
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
  }

  /** MinHash-LSH verified near-dup pairs (est. Jaccard >= 0.5). */
  def nearDupPairs(docs: DataFrame): DataFrame =
    graft.operators.Dedup.minhashPairs(prepared(docs).select(col("doc_id"), col("text")))

  /** keep-list by CONNECTED COMPONENT of the near-dup graph: transitive
    * closure of the verified pairs (A~B, B~C ⇒ {A,B,C} is one cluster
    * even when A~C is below threshold), keep exactly the representative
    * (min doc_id) of each cluster; docs in no pair keep. Components via
    * [[graft.operators.Dedup.connectedComponents]] (pointer-doubled
    * min-label propagation, O(log diameter) rounds).
    */
  def dedupKeepList(docs: DataFrame): DataFrame = {
    val labels = graft.operators.Dedup.connectedComponents(
      nearDupPairs(docs).select("doc_a", "doc_b"))
    docs.join(labels, Seq("doc_id"), "left")
      .withColumn("keep", col("cluster_id").isNull || col("doc_id") === col("cluster_id"))
      .drop("cluster_id")
  }

  /** quality features + composite score (same formula as text_quality /
    * corpus_curate).
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    def q6(e: String) = s"floor(($e) * 1000000) / CAST(1000000 AS DOUBLE)"
    docs
      .withColumn("words", expr("filter(split(text, ' '), w -> w <> '')"))
      .withColumn("n_words", expr("CAST(size(words) AS BIGINT)"))
      .withColumn("distinct_ratio",
        expr(q6("CAST(size(array_distinct(words)) AS DOUBLE) / n_words")))
      .withColumn("stop_ratio",
        expr(q6("CAST(size(filter(words, w -> array_contains(array('the', 'a', 'and', 'of', 'to'), w))) AS DOUBLE) / n_words")))
      .withColumn("score",
        expr(q6("CAST(0.4 AS DOUBLE) * least(CAST(1 AS DOUBLE), CAST(n_words AS DOUBLE) / CAST(200 AS DOUBLE)) + CAST(0.3 AS DOUBLE) * distinct_ratio + CAST(0.3 AS DOUBLE) * stop_ratio")))
      .drop("words")
  }

  /** fixed-size overlapping context-window chunks; one output row per
    * chunk with an arithmetic chunk id (no ordering shuffle).
    */
  def chunk(docs: DataFrame, words: Int = 64, stride: Int = 48): DataFrame =
    docs
      .withColumn("__words", expr("filter(split(text, ' '), w -> w <> '')"))
      .withColumn("start", explode(expr(s"sequence(1, greatest(1, size(__words)), $stride)")))
      .withColumn("chunk_words", expr(s"slice(__words, start, $words)"))
      .withColumn("chunk_idx", expr(s"CAST((start - 1) div $stride AS BIGINT)"))
      .withColumn("chunk_text", expr("array_join(chunk_words, ' ')"))
      .drop("__words", "chunk_words")
}
