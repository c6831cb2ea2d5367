package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash._
import graft.sources.Tables

/** Corpus cleaning beyond whole-document dedup (LLM-pipeline surface,
  * SURVEY §2): line-level boilerplate removal (the CCNet / RefinedWeb
  * production pass — navigation chrome, subscribe footers, cookie
  * banners repeat VERBATIM across most pages of a domain while never
  * being whole-document duplicates) and duplication-aware sampling
  * weights (soft dedup: down-weight 1/cluster-size instead of dropping,
  * preserving the corpus distribution's mass).
  *
  * The synthetic corpus is single-line word salad, so (the repo's
  * planting convention — text_pii_scrub, dedup_exact) deterministic
  * line structure is injected first: every doc keeps its own text as
  * line 1 (df = 1 per source, never boilerplate); docs with
  * (doc_id div 20) % 4 != 1 gain a source-specific subscribe footer
  * (~75 % of each source → flagged); docs with (doc_id div 20) % 10 == 0
  * gain a rarer copyright line (10 % of each source → df ≥ 3 but BELOW
  * the 50 % share bar, proving the share threshold governs, not the
  * absolute count). Plants key on `doc_id div 20`, never `doc_id % k`:
  * source == doc_id % 20 in the testdata, so a %-plant would land
  * all-or-nothing per source.
  *
  * 100 TB shapes: line hashes are map-side HOF column math inside the
  * scan projection; the census is ONE (source, line_fp) hash-partition
  * carrying count partials; the flagged set is tiny by construction
  * (lines crossing a 50 % doc-frequency bar within a source) and
  * BROADCASTS into the scrub's anti-join, which is therefore map-side;
  * the scrub's only shuffle is the doc_id regroup. Weights: one
  * fingerprint window (cluster-bounded partitions) + one source-keyed
  * agg — no joins, no candidate pairs.
  */
object CorpusClean {

  /** share-of-docs bar (percent) a line must cross within its source
    * to be boilerplate, plus an absolute floor so tiny sources can't
    * flag on noise.
    */
  val BoilerSharePct = 50
  val BoilerMinDf = 3

  // ---- planted line structure ---------------------------------------------

  /** documents with injected line structure: text + deterministic
    * source-derived footer lines, '\n'-separated.
    */
  def lined(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"), col("source"),
      concat(
        col("text"),
        when(pmod(expr("doc_id div 20"), lit(4)) =!= 1,
          concat(lit("\nsubscribe to "), col("source"), lit(" updates today")))
          .otherwise(lit("")),
        when(pmod(expr("doc_id div 20"), lit(10)) === 0,
          concat(lit("\ncopyright "), col("source"))).otherwise(lit(""))
      ).as("lt"))

  /** the same derivation as a DuckDB CTE body (oracle side). */
  private val duckLined: String =
    """SELECT doc_id, source,
      |  text ||
      |  CASE WHEN (doc_id // 20) % 4 <> 1
      |       THEN chr(10) || 'subscribe to ' || source || ' updates today'
      |       ELSE '' END ||
      |  CASE WHEN (doc_id // 20) % 10 = 0
      |       THEN chr(10) || 'copyright ' || source
      |       ELSE '' END AS lt
      |FROM documents""".stripMargin

  /** GENERIC: explode ANY (doc_id, source, text) frame into per-line
    * rows with fingerprints — the shape both the census and the scrub
    * consume, and the one the `stream_boilerplate` twin feeds from. All
    * map-side codegen column math inside the scan projection.
    */
  def lineFrame(docs: DataFrame, idCol: String = "doc_id",
      sourceCol: String = "source", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        split(col(textCol), "\n").as("ls"))
      .select(col("doc_id"), col("source"),
        size(col("ls")).cast("long").as("n_lines"),
        posexplode(col("ls")))
      .withColumnRenamed("pos", "ln")
      .withColumnRenamed("col", "line")
      .withColumn("line_fp", expr(sparkFingerprint("line")))

  /** GENERIC census over ANY doc frame: lines whose within-source DOC
    * frequency (distinct documents containing the line — NOT line
    * occurrences; a doc repeating a line, e.g. blank lines from
    * consecutive newlines, counts once) crosses the share bar and the
    * df floor. df ≤ n_docs by construction, so share_pct ≤ 100.
    */
  def censusFrame(docs: DataFrame, idCol: String = "doc_id",
      sourceCol: String = "source", textCol: String = "text",
      sharePct: Int = BoilerSharePct, minDf: Int = BoilerMinDf): DataFrame = {
    val perSource = docs
      .groupBy(col(sourceCol).as("source")).agg(count(lit(1)).as("n_docs"))
    lineFrame(docs, idCol, sourceCol, textCol)
      // dedup intra-doc repeats BEFORE the census agg: partial agg on
      // (source, line_fp, doc_id) collapses repeats map-side, so the
      // second shuffle carries one row per (line, doc) pair.
      .groupBy("source", "line_fp", "doc_id")
      .agg(min("line").as("line"))
      .groupBy("source", "line_fp")
      .agg(min("line").as("line"), count(lit(1)).as("df"))
      .join(perSource, Seq("source")) // sources-bounded — auto-broadcast
      .filter(col("df") >= minDf &&
        col("df") * 100 >= col("n_docs") * sharePct)
  }

  /** GENERIC scrub over ANY doc frame: drop census-flagged lines and
    * reassemble each doc's text (lines rejoined in order). The census
    * crossed a share bar so it is tiny by construction → broadcast
    * anti-join; only shuffle is the doc_id regroup. Output cardinality
    * EQUALS input cardinality: a doc whose every line is flagged comes
    * back with empty text (left join + coalesce ''), never silently
    * dropped — callers joining the scrubbed frame back lose nothing.
    */
  def scrubFrame(docs: DataFrame, idCol: String = "doc_id",
      sourceCol: String = "source", textCol: String = "text",
      sharePct: Int = BoilerSharePct, minDf: Int = BoilerMinDf): DataFrame = {
    val flagged = censusFrame(docs, idCol, sourceCol, textCol, sharePct, minDf)
      .select("source", "line_fp")
    val kept = lineFrame(docs, idCol, sourceCol, textCol)
      .join(broadcast(flagged), Seq("source", "line_fp"), "left_anti")
      .groupBy("doc_id")
      .agg(
        expr("array_join(transform(sort_array(collect_list(struct(ln, line))), x -> x.line), char(10))")
          .as("__scrubbed"))
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol), col("source").as(sourceCol),
        coalesce(col("__scrubbed"), lit("")).as(textCol))
  }

  /** GENERIC soft-dedup weights over ANY doc frame: every row gains
    * `cluster_size` (byte-exact duplicate cluster cardinality by
    * content fingerprint) and `weight_ppm` = 1e6/cluster_size — the
    * sampler-facing column. One fp window, cluster-bounded partitions.
    */
  def weightFrame(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("fp", expr(sparkFingerprint(textCol)))
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("fp")))
      .withColumn("weight_ppm", expr("1000000 div cluster_size"))
  }

  /** exploded (doc_id, source, ln, line) rows of the planted corpus. */
  def lines(s: SparkSession, dir: String): DataFrame =
    lineFrame(lined(s, dir), "doc_id", "source", "lt")

  private val duckLines: String =
    s"""SELECT doc_id, source, CAST(len(ls) AS BIGINT) AS n_lines, ln, ls[ln + 1] AS line,
       |  ${duckFingerprint("ls[ln + 1]")} AS line_fp
       |FROM (
       |  SELECT doc_id, source, ls, unnest(range(0, len(ls))) AS ln
       |  FROM (SELECT doc_id, source, string_split(lt, chr(10)) AS ls FROM lined))""".stripMargin

  /** the flagged-line census as a reusable frame: lines whose
    * doc-frequency within a source crosses [[BoilerSharePct]] and
    * [[BoilerMinDf]]. Grouping is by (source, line FINGERPRINT) — hash
    * collisions (identical on both engines) merge identically, and at
    * 100 TB the shuffle key is the 64-bit fp, never the raw line.
    */
  private def boilerCensus(s: SparkSession, dir: String): DataFrame =
    censusFrame(lined(s, dir), "doc_id", "source", "lt")

  private val duckBoilerCensus: String =
    s"""SELECT c.source, c.line_fp, c.line, c.df, n.n_docs
       |FROM (
       |  SELECT source, line_fp, min(line) AS line, COUNT(DISTINCT doc_id) AS df
       |  FROM lines GROUP BY source, line_fp) c
       |JOIN (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source) n
       |  USING (source)
       |WHERE c.df >= $BoilerMinDf AND c.df * 100 >= n.n_docs * $BoilerSharePct""".stripMargin

  // ---- text_boilerplate: the census ---------------------------------------

  /** Boilerplate-line census per source: every line whose within-source
    * doc frequency crosses the share bar, with its df and share. The
    * planted subscribe footer (75 % of each source) is flagged; the
    * planted copyright line (10 %, df ≥ 3) is NOT — the share
    * threshold, not the count floor, is what separates them.
    */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    boilerCensus(s, dir)
      .select(col("source"), col("line_fp"), col("line"), col("df"),
        col("n_docs"), expr("df * 100 div n_docs").as("share_pct"))
      .orderBy("source")

  val textBoilerplateSql: String =
    s"""WITH lined AS ($duckLined),
       |lines AS ($duckLines),
       |census AS ($duckBoilerCensus)
       |SELECT source, line_fp, line, df, n_docs, df * 100 // n_docs AS share_pct
       |FROM census ORDER BY source""".stripMargin

  // ---- text_boilerplate_scrub: the application -----------------------------

  /** Apply the census: drop every flagged line from every document and
    * prove the rewrite with a fingerprint of the retained text (lines
    * rejoined in order). The census frame is tiny (it crossed a 50 %
    * share bar) → broadcast anti-join, map-side; the only shuffle is
    * the doc_id regroup.
    */
  def textBoilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    val flagged = boilerCensus(s, dir).select("source", "line_fp")
    lines(s, dir)
      .join(broadcast(flagged), Seq("source", "line_fp"), "left_anti")
      .groupBy("doc_id")
      .agg(
        min("n_lines").as("n_lines"),
        count(lit(1)).as("n_kept"),
        expr(sparkFingerprint(
          "array_join(transform(sort_array(collect_list(struct(ln, line))), x -> x.line), ' ')"))
          .as("scrub_fp"))
      .orderBy("doc_id")
  }

  val textBoilerplateScrubSql: String =
    s"""WITH lined AS ($duckLined),
       |lines AS ($duckLines),
       |census AS ($duckBoilerCensus)
       |SELECT doc_id, min(n_lines) AS n_lines, COUNT(*) AS n_kept,
       |  ${duckFingerprint("string_agg(line, ' ' ORDER BY ln)")} AS scrub_fp
       |FROM lines ANTI JOIN census USING (source, line_fp)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- corpus_dedup_weights: soft dedup ------------------------------------

  /** Duplication-aware sampling weights (soft dedup): weight each doc
    * 1/cluster-size (ppm fixed point — BIGINT-safe, engine-identical)
    * instead of dropping duplicates, so the training sampler sees every
    * cluster with total mass 1. The corpus has no byte-exact dups, so
    * (dedup_exact's convention) it runs on the corpus UNION planted
    * re-ingestions: (doc_id div 20) % 10 == 3 docs land twice
    * (cluster 2), % 10 == 7 docs land three times (cluster 3) — every
    * source gets both cluster sizes. Output is the per-source mass
    * audit: raw docs vs effective (weighted) docs.
    */
  def corpusDedupWeights(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
    def copy(m: Int, shift: Long) =
      d.filter(pmod(expr("doc_id div 20"), lit(10)) === m)
        .select((col("doc_id") + shift).as("doc_id"), col("source"), col("text"))
    val all = d.union(copy(3, 100000L)).union(copy(7, 200000L)).union(copy(7, 300000L))
    weightFrame(all)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum("weight_ppm").as("effective_docs_ppm"),
        max("cluster_size").as("max_cluster"))
      .orderBy("source")
  }

  val corpusDedupWeightsSql: String =
    s"""WITH all_docs AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, source, text FROM documents WHERE (doc_id // 20) % 10 = 3
       |  UNION ALL
       |  SELECT doc_id + 200000, source, text FROM documents WHERE (doc_id // 20) % 10 = 7
       |  UNION ALL
       |  SELECT doc_id + 300000, source, text FROM documents WHERE (doc_id // 20) % 10 = 7
       |), w AS (
       |  SELECT source,
       |    COUNT(*) OVER (PARTITION BY fp) AS cluster_size
       |  FROM (SELECT doc_id, source, ${duckFingerprint("text")} AS fp FROM all_docs)
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       |  CAST(SUM(1000000 // cluster_size) AS BIGINT) AS effective_docs_ppm,
       |  max(cluster_size) AS max_cluster
       |FROM w GROUP BY source ORDER BY source""".stripMargin

  // ---- corpus_neardup_weights: soft dedup over TRANSITIVE near-dup clusters

  /** The near-dup sibling of [[corpusDedupWeights]]: weight =
    * 1/component-size over the TRANSITIVE closure of the verified
    * minhash pairs (A~B, B~C ⇒ one cluster of 3 even when A~C is below
    * threshold) — the SlimPajama-style soft dedup where near-dup
    * family members are down-weighted rather than dropped, keeping the
    * mixture's mass while removing its duplication skew. Docs in no
    * pair are singletons at full weight. Output is the same per-source
    * raw-vs-effective mass audit.
    *
    * 100 TB shape: the pair frame is the LSH-bounded candidate set the
    * dedup family already pays (paid ONCE, snapshot inside
    * connectedComponents); label propagation is O(log diameter) keyed
    * joins; then ONE component-keyed window (cluster-bounded
    * partitions) + ONE source-keyed agg — no new corpus-sized shuffle
    * beyond the component census dedup_clusters already prices.
    */
  def corpusNeardupWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    // the component frame is the family's shared invoice — derived
    // once here and passed through the parameterized library entry
    // (graft.api.CorpusOps.neardupWeightsFor), the same frame impact /
    // histogram consumers reuse
    val comp = Dedup.connectedComponents(
      Dedup.dedupMinhash(s, dir).select(col("doc_a"), col("doc_b")))
    graft.api.CorpusOps.neardupWeightsFor(comp, docs)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L)).as("n_neardup_docs"),
        sum("weight_ppm").as("effective_docs_ppm"),
        max("cluster_size").as("max_cluster"))
      .orderBy("source")
  }

  val corpusNeardupWeightsSql: String =
    s"""WITH comp AS (${Dedup.dedupClustersSql}),
       |lab AS (
       |  SELECT d.doc_id, d.source, COALESCE(c.cluster_id, d.doc_id) AS cid
       |  FROM documents d LEFT JOIN comp c USING (doc_id)),
       |w AS (SELECT source, COUNT(*) OVER (PARTITION BY cid) AS csize FROM lab)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_docs,
       |  CAST(SUM(1000000 // csize) AS BIGINT) AS effective_docs_ppm,
       |  CAST(MAX(csize) AS BIGINT) AS max_cluster
       |FROM w GROUP BY source ORDER BY source""".stripMargin

  // ---- registration --------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_boilerplate" -> (textBoilerplate _),
    "text_boilerplate_scrub" -> (textBoilerplateScrub _),
    "corpus_dedup_weights" -> (corpusDedupWeights _),
    "corpus_neardup_weights" -> (corpusNeardupWeights _))

  val oracles: Map[String, String] = Map(
    "text_boilerplate" -> textBoilerplateSql,
    "text_boilerplate_scrub" -> textBoilerplateScrubSql,
    "corpus_dedup_weights" -> corpusDedupWeightsSql,
    "corpus_neardup_weights" -> corpusNeardupWeightsSql)
}
