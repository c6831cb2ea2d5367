package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Web-corpus curation by URL: canonicalization-based dedup and
  * per-domain stats — the RefinedWeb/C4-style origin-level passes that
  * run BEFORE content-level dedup (a crawl sees the same page as
  * http/https, with/without www, with tracking params; URL canon
  * collapses those for free without touching the text).
  *
  * The documents table has no URL column, so one is synthesized
  * deterministically from doc_id (same convention as the PII-scrub
  * injection, TextAnalysis.scala): every 4 consecutive docs share a
  * page, each with a different noise variant — scheme case, www,
  * explicit :443, trailing slash, utm/ref query params. The operators
  * then have planted ground truth: every canonical group has exactly
  * 4 variants (or fewer at corpus tail), and the scrub must find all.
  *
  * Scale shape: both ops are map-side string math + ONE key-partial
  * aggregation (canonical URL / domain). The canonicalizer is the
  * library entry point a user would aim at a real `url` column.
  */
object WebCorpus {

  val Domains = Seq(
    "alpha.example.com", "beta.example.org", "gamma.example.net",
    "delta.example.io", "epsilon.example.dev", "zeta.example.co",
    "eta.example.app", "theta.example.site")

  /** Synthesized raw URL per doc: page id = doc_id div 4, variant =
    * doc_id % 4. Spark column twin of [[duckUrl]].
    */
  def urlCol: org.apache.spark.sql.Column = {
    val dom = element_at(
      array(Domains.map(lit): _*),
      (pmod(expr("doc_id div 4"), lit(8)) + 1).cast("int"))
    val page = concat(lit("/p"), expr("doc_id div 4").cast("string"))
    val v = pmod(col("doc_id"), lit(4))
    when(v === 0, concat(lit("https://"), dom, page))
      .when(v === 1, concat(lit("HTTP://WWW."), dom, page, lit("/")))
      .when(v === 2, concat(lit("https://"), dom, lit(":443"), page, lit("?utm_source=feed")))
      .otherwise(concat(lit("https://www."), dom, page, lit("?ref=rss")))
  }

  /** Identical synthesis in DuckDB SQL (oracle side). */
  val duckUrl: String =
    """CASE doc_id % 4
      |  WHEN 0 THEN 'https://' || dom || page
      |  WHEN 1 THEN 'HTTP://WWW.' || dom || page || '/'
      |  WHEN 2 THEN 'https://' || dom || ':443' || page || '?utm_source=feed'
      |  ELSE 'https://www.' || dom || page || '?ref=rss' END""".stripMargin

  val duckUrlWith: String = {
    val arr = Domains.map(d => s"'$d'").mkString("[", ",", "]")
    s"""SELECT doc_id, n_chars,
       |  ($arr)[CAST((doc_id // 4) % 8 + 1 AS INT)] AS dom,
       |  '/p' || CAST(doc_id // 4 AS VARCHAR) AS page
       |FROM documents""".stripMargin
  }

  /** URL canonicalizer: lowercase → strip scheme → strip leading www.
    * → strip explicit default port → strip the query string → strip a
    * trailing slash. Chained `regexp_replace` with patterns valid in
    * both Java regex and RE2 — pure codegen'd column math, usable on
    * any url column.
    *
    * The port strip is ANCHORED TO THE HOST (`^host:port`), so a
    * `:80`/`:443` appearing later in the path is never touched, and
    * anchoring makes Spark's replace-all and DuckDB's replace-first
    * semantics coincide (at most one match). Deliberately
    * scheme-INSENSITIVE: by the time the port is stripped the scheme is
    * gone, so `http://h:443` also collapses to `h` — acceptable for
    * dedup canonicalization (the goal is a stable key, not a resolvable
    * URL), noted here for `CorpusOps.canonicalizeUrls` callers.
    */
  def canonicalize(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val c1 = lower(url)
    val c2 = regexp_replace(c1, "^[a-z]+://", "")
    val c3 = regexp_replace(c2, "^www\\.", "")
    val c4 = regexp_replace(c3, "^([^/:?]+):(443|80)(/|\\?|$)", "$1$3")
    val c5 = regexp_replace(c4, "\\?.*$", "")
    regexp_replace(c5, "/$", "")
  }

  /** The same canonicalization chain over a DuckDB expression. */
  def duckCanon(expr: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |  lower($expr),
       |  '^[a-z]+://', ''), '^www\\.', ''), '^([^/:?]+):(443|80)(/|\\?|$$)', '\\1\\3'), '\\?.*$$', ''), '/$$', '')""".stripMargin

  /** URL-canonicalization dedup: group by canonical URL, keep the
    * min-doc_id variant, report the variant count. With the planted
    * synthesis every full group collapses 4 → 1 (the oracle pins the
    * exact distribution). ONE canonical-key shuffle; the text column
    * never moves.
    */
  def dedupUrl(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("canonical_url", canonicalize(urlCol))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_variants"), min("doc_id").as("keeper_doc"))
      .orderBy("canonical_url")
  }

  val dedupUrlSql: String =
    s"""WITH u AS ($duckUrlWith),
       |raw AS (SELECT doc_id, $duckUrl AS url FROM u)
       |SELECT ${duckCanon("url")} AS canonical_url,
       |  COUNT(*) AS n_variants, MIN(doc_id) AS keeper_doc
       |FROM raw GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-domain corpus stats + origin-level keep decision: page count,
    * doc count, char volume per registrable domain, and a keep flag
    * (drop domains contributing more than twice the per-domain mean of
    * chars — the "single origin dominating the corpus" filter). The
    * mean never becomes a double: the predicate cross-multiplies in
    * BIGINT (domain_chars · n_domains ≤ 2 · total_chars).
    */
  def webDomains(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("canonical_url", canonicalize(urlCol))
      .withColumn("domain", regexp_extract(col("canonical_url"), "^([^/]+)", 1))
    // feeds BOTH the one-row totals and the final join — materialize the
    // domain-cardinality frame once so the corpus canon+agg runs once
    val perDomain = Materialize.stable(d.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("canonical_url").as("n_pages"),
        sum("n_chars").as("domain_chars")))
    // corpus totals ride back as a ONE-ROW broadcast (1×n, the
    // decorrelated-scalar shape q22 uses): at web scale the domain
    // frame is 10⁸ rows, and a global window over it would funnel all
    // of them through one partition — the exact anti-pattern pack_bins
    // avoids. A one-row broadcast costs O(1) network per executor.
    val totals = perDomain.agg(
      count(lit(1)).as("n_domains"), sum("domain_chars").as("total_chars"))
    perDomain.join(broadcast(totals))
      .withColumn("keep", col("domain_chars") * col("n_domains") <= col("total_chars") * 2)
      .select("domain", "n_docs", "n_pages", "domain_chars", "keep")
      .orderBy("domain")
  }

  val webDomainsSql: String =
    s"""WITH u AS ($duckUrlWith),
       |raw AS (SELECT doc_id, n_chars, $duckUrl AS url FROM u),
       |canon AS (
       |  SELECT doc_id, n_chars, ${duckCanon("url")} AS canonical_url FROM raw),
       |per_domain AS (
       |  SELECT regexp_extract(canonical_url, '^([^/]+)', 1) AS domain,
       |    COUNT(*) AS n_docs, COUNT(DISTINCT canonical_url) AS n_pages,
       |    CAST(SUM(n_chars) AS BIGINT) AS domain_chars
       |  FROM canon GROUP BY 1),
       |t AS (SELECT COUNT(*) AS n_domains, CAST(SUM(domain_chars) AS BIGINT) AS total_chars FROM per_domain)
       |SELECT domain, n_docs, n_pages, domain_chars,
       |  domain_chars * n_domains <= total_chars * 2 AS keep
       |FROM per_domain, t ORDER BY domain""".stripMargin

  /** Domains a curation pass refuses to ingest (stands in for the
    * operator-maintained blocklist every web pipeline carries).
    */
  val Blocklist: Seq[String] =
    Seq("gamma.example.net", "zeta.example.co", "theta.example.site")

  /** Domain-blocklist filter: keep only docs whose URL domain is NOT
    * on the blocklist — the first gate of web-corpus curation. The
    * blocklist is a TABLE (not an `isin` literal) joined LEFT ANTI:
    * at any scale the blocklist side broadcasts (thousands of rows at
    * most) and the corpus streams through map-side — no corpus
    * shuffle, no driver collect. Output is the kept keep-list plus
    * domain, ordered for the oracle.
    */
  def corpusBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blocked = Blocklist.toDF("blocked_domain")
    Tables.documents(s, dir)
      .withColumn("canonical_url", canonicalize(urlCol))
      .withColumn("domain", regexp_extract(col("canonical_url"), "^([^/]+)", 1))
      .join(broadcast(blocked), col("domain") === col("blocked_domain"), "left_anti")
      .select("doc_id", "domain")
      .orderBy("doc_id")
  }

  val corpusBlocklistSql: String = {
    val list = Blocklist.map(d => s"'$d'").mkString(", ")
    s"""WITH u AS ($duckUrlWith),
       |raw AS (SELECT doc_id, $duckUrl AS url FROM u),
       |canon AS (
       |  SELECT doc_id,
       |    regexp_extract(${duckCanon("url")}, '^([^/]+)', 1) AS domain
       |  FROM raw)
       |SELECT doc_id, domain FROM canon
       |WHERE domain NOT IN ($list)
       |ORDER BY doc_id""".stripMargin
  }

  /** One PageRank power-iteration step over the crawl's page graph —
    * the authority signal web-corpus curation mixes into quality
    * weighting (OpenWebText/RefinedWeb keep pages that LOOK linked-to).
    * Pages are the url-dedup page groups (doc_id div 4, same synthesis
    * as [[urlCol]]); the link structure is synthesized deterministically
    * (page u → (7u+1, 13u+5, 29u+11) mod P, outdegree 3) so the oracle
    * can restate it — on a real crawl the edge frame comes from href
    * extraction and everything downstream is unchanged. The seed rank
    * r₀ is proportional to page char volume (a data-dependent seed, so
    * the step is a genuine sparse mat-vec, not indegree counting), and
    * one damped step emits r₁ = (1−d)/P + d·Σ_in r₀/outdeg with
    * d = 0.85, all in ppb fixed point.
    *
    * Scale shape: docs collapse to the page frame in ONE partial agg;
    * P and total chars ride back as a one-row broadcast; edges are a
    * map-side 3× explode of the page frame; inflow is ONE dst-keyed
    * partial agg; the re-attach is a co-partitioned page equi-join and
    * the top-20 is TakeOrdered — no global sort, no window. Numeric
    * bounds: Σ r₀_ppb = 10⁹ by construction, so EVERY inflow sum is
    * ≤ 10⁹ regardless of corpus size; the only product is
    * page_chars·10⁹, safe while a 4-doc page holds < 9.2 GB of text
    * (synthesis max ~10⁴ chars; a real crawl page group is ≤ MB).
    */
  def webPagerankStep(s: SparkSession, dir: String): DataFrame = {
    val pages = Materialize.stable(Tables.documents(s, dir)
      .groupBy(expr("doc_id div 4").as("page"))
      .agg(sum("n_chars").as("chars")))
    val totals = pages.agg((max("page") + 1).as("p_count"),
      sum("chars").as("total_chars"))
    val r0 = pages.join(broadcast(totals))
      .withColumn("r0_ppb", expr("chars * 1000000000 div total_chars"))
    val inflow = r0
      .select(explode(expr(
        "array((page*7+1) % p_count, (page*13+5) % p_count, (page*29+11) % p_count)"))
        .as("page"), expr("r0_ppb div 3").as("contrib"))
      .groupBy("page").agg(sum("contrib").as("inflow_ppb"))
    r0.join(inflow, Seq("page"), "left")
      .withColumn("inflow_ppb", coalesce(col("inflow_ppb"), lit(0L)))
      .withColumn("r1_ppb",
        expr("150000000 div p_count + inflow_ppb * 85 div 100"))
      .select("page", "chars", "r0_ppb", "inflow_ppb", "r1_ppb")
      .orderBy(col("r1_ppb").desc, col("page")).limit(20)
  }

  val webPagerankStepSql: String =
    """WITH pages AS (
      |  SELECT doc_id // 4 AS page, CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY 1
      |), t AS (
      |  SELECT CAST(MAX(page) + 1 AS BIGINT) AS p_count,
      |    CAST(SUM(chars) AS BIGINT) AS total_chars FROM pages
      |), r0 AS (
      |  SELECT page, chars, chars * 1000000000 // total_chars AS r0_ppb
      |  FROM pages, t
      |), edges AS (
      |  SELECT unnest([(page*7+1) % p_count, (page*13+5) % p_count,
      |                 (page*29+11) % p_count]) AS page,
      |    r0_ppb // 3 AS contrib
      |  FROM r0, t
      |), inflow AS (
      |  SELECT page, CAST(SUM(contrib) AS BIGINT) AS inflow_ppb
      |  FROM edges GROUP BY 1
      |)
      |SELECT r0.page, r0.chars, r0.r0_ppb,
      |  COALESCE(i.inflow_ppb, 0) AS inflow_ppb,
      |  150000000 // p_count + COALESCE(i.inflow_ppb, 0) * 85 // 100 AS r1_ppb
      |FROM r0 LEFT JOIN inflow i ON r0.page = i.page, t
      |ORDER BY r1_ppb DESC, r0.page LIMIT 20""".stripMargin

  /** One HITS iteration (Kleinberg 1999) over the crawl's page graph —
    * the hub/authority decomposition PageRank can't give: a link
    * aggregator (high hub, low authority) and a canonical reference
    * page (high authority, low hub) both rank high under PageRank, but
    * curation treats them oppositely (keep the reference, drop the
    * directory page). Same deterministic edge synthesis as
    * [[webPagerankStep]] (page u → (7u+1, 13u+5, 29u+11) mod P) so the
    * oracle restates the graph; the hub seed h₀ is proportional to
    * page char volume (data-dependent — a genuine sparse mat-vec, not
    * degree counting). One iteration emits a₁ = Eᵀh₀ and h₁ = E·a₁,
    * all in ppb fixed point; top 20 by authority.
    *
    * Scale shape: docs collapse to the page frame in ONE partial agg;
    * edges are the map-side 3× explode carrying h₀; authority is ONE
    * dst-keyed partial agg; the hub recombination is a co-partitioned
    * page equi-join (edges ⋈ a₁ on dst) + ONE src-keyed partial agg;
    * the top-20 is TakeOrdered. Numeric bounds: Σ h₀ = 10⁹ by
    * construction ⇒ Σ a₁ ≤ 3·10⁹ ⇒ Σ h₁ ≤ 9·10⁹ — every sum BIGINT-
    * safe at ANY corpus size (the pagerank-step mass-conservation
    * argument, squared once).
    */
  def webHitsStep(s: SparkSession, dir: String): DataFrame = {
    val pages = Materialize.stable(Tables.documents(s, dir)
      .groupBy(expr("doc_id div 4").as("page"))
      .agg(sum("n_chars").as("chars")))
    val totals = pages.agg((max("page") + 1).as("p_count"),
      sum("chars").as("total_chars"))
    val h0 = pages.join(broadcast(totals))
      .withColumn("h0_ppb", expr("chars * 1000000000 div total_chars"))
    val edges = Materialize.stable(h0.select(col("page").as("src"), col("h0_ppb"),
      explode(expr(
        "array((page*7+1) % p_count, (page*13+5) % p_count, (page*29+11) % p_count)"))
        .as("dst")))
    val auth = edges.groupBy(col("dst").as("page"))
      .agg(sum("h0_ppb").as("auth_ppb"))
    val hub = edges.select("src", "dst")
      .join(auth.withColumnRenamed("page", "dst"), Seq("dst"))
      .groupBy(col("src").as("page")).agg(sum("auth_ppb").as("hub_ppb"))
    h0.join(auth, Seq("page"), "left").join(hub, Seq("page"), "left")
      .select(col("page"), col("chars"), col("h0_ppb"),
        coalesce(col("auth_ppb"), lit(0L)).as("auth_ppb"),
        coalesce(col("hub_ppb"), lit(0L)).as("hub_ppb"))
      .orderBy(col("auth_ppb").desc, col("page")).limit(20)
  }

  val webHitsStepSql: String =
    """WITH pages AS (
      |  SELECT doc_id // 4 AS page, CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY 1
      |), t AS (
      |  SELECT CAST(MAX(page) + 1 AS BIGINT) AS p_count,
      |    CAST(SUM(chars) AS BIGINT) AS total_chars FROM pages
      |), h0 AS (
      |  SELECT page, chars, chars * 1000000000 // total_chars AS h0_ppb
      |  FROM pages, t
      |), edges AS (
      |  SELECT page AS src, h0_ppb,
      |    unnest([(page*7+1) % p_count, (page*13+5) % p_count,
      |            (page*29+11) % p_count]) AS dst
      |  FROM h0, t
      |), auth AS (
      |  SELECT dst AS page, CAST(SUM(h0_ppb) AS BIGINT) AS auth_ppb
      |  FROM edges GROUP BY 1
      |), hub AS (
      |  SELECT e.src AS page, CAST(SUM(a.auth_ppb) AS BIGINT) AS hub_ppb
      |  FROM edges e JOIN auth a ON e.dst = a.page GROUP BY 1
      |)
      |SELECT h0.page, h0.chars, h0.h0_ppb,
      |  COALESCE(auth.auth_ppb, 0) AS auth_ppb,
      |  COALESCE(hub.hub_ppb, 0) AS hub_ppb
      |FROM h0 LEFT JOIN auth ON h0.page = auth.page
      |        LEFT JOIN hub ON h0.page = hub.page
      |ORDER BY auth_ppb DESC, h0.page LIMIT 20""".stripMargin

  /** Hub cap for the triangle pass: pages with out-degree above this
    * are excluded from the wedge MIDDLE role, which is what bounds the
    * wedge join at Σ min(outdeg, cap)² instead of Σ outdeg² — the
    * standard mitigation for crawl hubs (a link-aggregator page with
    * 10⁵ out-links would otherwise mint 10¹⁰ wedges alone). The
    * synthesized graph's out-degree is ≤ 3, so the cap never binds in
    * the contract query — it exists for real edge frames.
    */
  val TriangleDegreeCap = 64L

  /** Feed-forward loops (directed triangles a→b→c with a→c) per source
    * vertex over ANY (src, dst) edge frame — the library entry point.
    * Dedups parallel edges and drops self-loops first, then counts via
    * the wedge join + edge semi-join. Returns (src, n_ffl).
    *
    * Scale shape: two equi-joins, both key-partitioned — the wedge join
    * shuffles edges on their endpoint keys (volume Σ capped-outdeg² —
    * see [[TriangleDegreeCap]]), the closing check is a LEFT SEMI join
    * on the (a, c) pair key. No broadcast of anything corpus-sized, no
    * window, no collect; the count rolls up in ONE src-keyed partial
    * agg.
    */
  def feedForwardLoops(edges0: DataFrame): DataFrame = {
    val edges = Materialize.stable(edges0
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct())
    val mid = edges.groupBy(col("src").as("b"))
      .agg(count(lit(1)).as("outdeg"))
      .filter(col("outdeg") <= TriangleDegreeCap)
      .select("b")
    val wedges = edges.select(col("src").as("a"), col("dst").as("b"))
      .join(mid, Seq("b"))
      .join(edges.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
      .filter(col("c") =!= col("a"))
      .select("a", "b", "c")
    wedges
      .join(edges.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"), "left_semi")
      .groupBy(col("a").as("src"))
      .agg(count(lit(1)).as("n_ffl"))
  }

  /** Per-domain feed-forward-loop profile of the crawl's page graph —
    * the link-farm / mutual-promotion audit (organic link graphs are
    * triangle-sparse; SEO rings and template cross-link blocks are
    * triangle-dense, so a domain whose loop density is an outlier is a
    * curation flag). Same deterministic edge synthesis as
    * [[webPagerankStep]] (page u → (7u+1, 13u+5, 29u+11) mod P), so
    * the oracle restates the graph; on a real crawl the edge frame
    * comes from href extraction and [[feedForwardLoops]] is unchanged.
    *
    * Output: one row per domain — pages, loop count, loops-per-million
    * -pages density. Domain of a loop = domain of its SOURCE vertex
    * (each directed loop counted exactly once).
    */
  def webTriangles(s: SparkSession, dir: String): DataFrame = {
    val pages = Materialize.stable(Tables.documents(s, dir)
      .groupBy(expr("doc_id div 4").as("page")).agg(count(lit(1)).as("n_docs")))
    val totals = pages.agg((max("page") + 1).as("p_count"))
    val edges = pages.join(broadcast(totals))
      .select(col("page").as("src"), explode(expr(
        "array((page*7+1) % p_count, (page*13+5) % p_count, (page*29+11) % p_count)"))
        .as("dst"))
    val loops = feedForwardLoops(edges)
    val dom = element_at(array(Domains.map(lit): _*),
      (pmod(col("page"), lit(8)) + 1).cast("int"))
    pages.select(col("page"), dom.as("domain"))
      .join(loops.select(col("src").as("page"), col("n_ffl")), Seq("page"), "left")
      .withColumn("n_ffl", coalesce(col("n_ffl"), lit(0L)))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"), sum("n_ffl").as("n_loops"))
      .withColumn("loop_ppm", expr("n_loops * 1000000 div n_pages"))
      .select("domain", "n_pages", "n_loops", "loop_ppm")
      .orderBy("domain")
  }

  val webTrianglesSql: String = {
    val arr = Domains.map(d => s"'$d'").mkString("[", ",", "]")
    s"""WITH pages AS (
       |  SELECT doc_id // 4 AS page FROM documents GROUP BY 1
       |), t AS (
       |  SELECT CAST(MAX(page) + 1 AS BIGINT) AS p_count FROM pages
       |), edges0 AS (
       |  -- lateral-unnest form: DuckDB 1.0's binder ICEs when a
       |  -- select-list unnest alias is referenced downstream alongside
       |  -- a second cross-joined CTE — unnest as a table function binds
       |  SELECT page AS src, u.dst AS dst
       |  FROM pages, t, unnest([(page*7+1) % p_count, (page*13+5) % p_count,
       |                         (page*29+11) % p_count]) AS u(dst)
       |), edges AS (
       |  SELECT DISTINCT src, dst FROM edges0 WHERE src <> dst
       |), mid AS (
       |  SELECT src AS b FROM edges GROUP BY 1 HAVING COUNT(*) <= $TriangleDegreeCap
       |), wedges AS (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM edges e1 JOIN mid ON e1.dst = mid.b
       |    JOIN edges e2 ON e1.dst = e2.src
       |  WHERE e2.dst <> e1.src
       |), loops AS (
       |  -- edges is DISTINCT, so the closing join matches ≤1 row per wedge
       |  SELECT w.a AS src, CAST(COUNT(*) AS BIGINT) AS n_ffl
       |  FROM wedges w JOIN edges e ON e.src = w.a AND e.dst = w.c
       |  GROUP BY 1
       |)
       |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_pages,
       |  CAST(SUM(n_ffl) AS BIGINT) AS n_loops,
       |  CAST(SUM(n_ffl) AS BIGINT) * 1000000 // COUNT(*) AS loop_ppm
       |FROM (
       |  SELECT p.page, ($arr)[CAST(p.page % 8 + 1 AS INT)] AS domain,
       |    COALESCE(l.n_ffl, 0) AS n_ffl
       |  FROM pages p LEFT JOIN loops l ON p.page = l.src) d
       |GROUP BY domain ORDER BY domain""".stripMargin
  }

  /** Reciprocal edges of ANY (src, dst) frame: the edge set that also
    * exists reversed. Two linear passes — dedup + ONE (src, dst)-keyed
    * self-semi-join on the swapped key; never touches page content.
    */
  def reciprocalEdges(edges0: DataFrame): DataFrame = {
    val edges = Materialize.stable(edges0
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct())
    edges.join(
      edges.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
  }

  /** Per-domain link reciprocity of the crawl's page graph — the
    * mutual-promotion / link-exchange audit that pairs with
    * [[webTriangles]] (organic webs are directional: A cites B without
    * B citing A back; reciprocal-heavy domains are trading links).
    * Same deterministic edge synthesis as [[webPagerankStep]], so the
    * oracle restates the graph; on a real crawl the edge frame comes
    * from href extraction and [[reciprocalEdges]] is unchanged.
    *
    * Scale: the reciprocity semi-join shuffles edges on (src, dst) —
    * linear in |E|, no degree term at all (cheaper than the wedge
    * join); rollup is domain-bounded. An edge is "reciprocal" if its
    * reverse exists; each direction counts once in its own source
    * domain.
    */
  def webReciprocity(s: SparkSession, dir: String): DataFrame = {
    val pages = Materialize.stable(Tables.documents(s, dir)
      .groupBy(expr("doc_id div 4").as("page")).agg(count(lit(1)).as("n_docs")))
    val totals = pages.agg((max("page") + 1).as("p_count"))
    val edges = Materialize.stable(pages.join(broadcast(totals))
      .select(col("page").as("src"), explode(expr(
        "array((page*7+1) % p_count, (page*13+5) % p_count, (page*29+11) % p_count)"))
        .as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct())
    val recip = reciprocalEdges(edges)
      .groupBy(col("src").as("page")).agg(count(lit(1)).as("n_recip"))
    val outdeg = edges.groupBy(col("src").as("page")).agg(count(lit(1)).as("n_out"))
    val dom = element_at(array(Domains.map(lit): _*),
      (pmod(col("page"), lit(8)) + 1).cast("int"))
    pages.select(col("page"), dom.as("domain"))
      .join(outdeg, Seq("page"), "left")
      .join(recip, Seq("page"), "left")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        sum(coalesce(col("n_out"), lit(0L))).as("n_edges"),
        sum(coalesce(col("n_recip"), lit(0L))).as("n_reciprocal"))
      .withColumn("recip_ppm", expr(
        "CASE WHEN n_edges = 0 THEN 0 ELSE n_reciprocal * 1000000 div n_edges END"))
      .orderBy("domain")
  }

  val webReciprocitySql: String = {
    val arr = Domains.map(d => s"'$d'").mkString("[", ",", "]")
    s"""WITH pages AS (
       |  SELECT doc_id // 4 AS page FROM documents GROUP BY 1
       |), t AS (
       |  SELECT CAST(MAX(page) + 1 AS BIGINT) AS p_count FROM pages
       |), edges0 AS (
       |  SELECT page AS src, u.dst AS dst
       |  FROM pages, t, unnest([(page*7+1) % p_count, (page*13+5) % p_count,
       |                         (page*29+11) % p_count]) AS u(dst)
       |), edges AS (
       |  SELECT DISTINCT src, dst FROM edges0 WHERE src <> dst
       |), recip AS (
       |  SELECT e.src AS page, CAST(COUNT(*) AS BIGINT) AS n_recip
       |  FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src
       |  GROUP BY 1
       |), outdeg AS (
       |  SELECT src AS page, CAST(COUNT(*) AS BIGINT) AS n_out FROM edges GROUP BY 1
       |)
       |SELECT ($arr)[(page % 8) + 1] AS domain,
       |  CAST(COUNT(*) AS BIGINT) AS n_pages,
       |  CAST(SUM(COALESCE(n_out, 0)) AS BIGINT) AS n_edges,
       |  CAST(SUM(COALESCE(n_recip, 0)) AS BIGINT) AS n_reciprocal,
       |  CASE WHEN CAST(SUM(COALESCE(n_out, 0)) AS BIGINT) = 0 THEN 0
       |       ELSE CAST(SUM(COALESCE(n_recip, 0)) AS BIGINT) * 1000000
       |            // CAST(SUM(COALESCE(n_out, 0)) AS BIGINT) END AS recip_ppm
       |FROM pages LEFT JOIN outdeg USING (page) LEFT JOIN recip USING (page)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Per-domain link-graph fragmentation: connected components of each
    * domain's INTRA-domain link subgraph — the site-structure audit
    * behind host-level curation (a domain whose pages form one
    * connected blob is a real site; one that fragments into thousands
    * of single-page islands is a link farm, parked-domain cluster, or
    * a crawl that only grabbed orphan pages). Cross-domain edges are
    * excluded by definition: the question is how each site hangs
    * together internally.
    *
    * Domain key = page mod 7 (NOT the mod-8 key the directed-graph ops
    * use): the synthesized edge strides (7u+1 / 13u+5 / 29u+11) all
    * flip parity — dst − u is always odd — so any EVEN domain modulus
    * makes the intra-domain subgraph provably empty whenever p_count
    * is even (u and dst can never agree mod 2, hence never mod 8).
    * An odd modulus is immune to the parity argument at every corpus
    * size. Found when the sf0.1 run (P = 1250, even) produced zero
    * edges where sf0.01 (P = 125, odd) had plenty; the empty frame
    * also hardened [[Dedup.connectedComponents]] against edgeless
    * graphs. On a real crawl the domain key is the host string and
    * none of this synthesis arithmetic exists.
    *
    * Scale shape: the component pass is [[Dedup.connectedComponents]]
    * (min-label propagation + pointer doubling, O(log d) rounds, label
    * state checkpointed per round) over the intra-domain edge frame —
    * which is a FILTERED subgraph, so the per-round joins carry only
    * same-domain edges; pages with no intra-domain edge never enter
    * the propagation and are restored as singletons by one LEFT JOIN +
    * coalesce(label, page). Rollup is (domain, cluster) then domain —
    * both output-bounded. Same deterministic edge synthesis as
    * [[webPagerankStep]]; on a real crawl the edge frame comes from
    * href extraction filtered to same-host pairs.
    */
  def webDomainComponents(s: SparkSession, dir: String): DataFrame = {
    val pages = Materialize.stable(Tables.documents(s, dir)
      .groupBy(expr("doc_id div 4").as("page")).agg(count(lit(1)).as("n_docs")))
    val totals = pages.agg((max("page") + 1).as("p_count"))
    val edges = pages.join(broadcast(totals))
      .select(col("page").as("src"), explode(expr(
        "array((page*7+1) % p_count, (page*13+5) % p_count, (page*29+11) % p_count)"))
        .as("dst"))
      .filter(col("src") =!= col("dst"))
      .filter(pmod(col("src"), lit(7)) === pmod(col("dst"), lit(7)))
      .distinct()
    val comp = Dedup.connectedComponents(
        edges.select(col("src").as("doc_a"), col("dst").as("doc_b")))
      .select(col("doc_id").as("page"), col("cluster_id"))
    val dom = element_at(array(Domains.map(lit): _*),
      (pmod(col("page"), lit(7)) + 1).cast("int"))
    val clusters = pages.select("page")
      .join(comp, Seq("page"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("page")))
      .select(dom.as("domain"), col("cluster_id"))
      .groupBy("domain", "cluster_id").agg(count(lit(1)).as("csize"))
    clusters.groupBy("domain")
      .agg(sum("csize").as("n_pages"),
        count(lit(1)).as("n_components"),
        max("csize").as("largest"),
        sum(when(col("csize") === 1, 1L).otherwise(0L)).as("n_singletons"))
      .withColumn("frag_ppm", expr("n_components * 1000000 div n_pages"))
      .orderBy("domain")
  }

  val webDomainComponentsSql: String = {
    val arr = Domains.map(d => s"'$d'").mkString("[", ",", "]")
    s"""WITH RECURSIVE pages AS (
       |  SELECT doc_id // 4 AS page FROM documents GROUP BY 1
       |), t AS (
       |  SELECT CAST(MAX(page) + 1 AS BIGINT) AS p_count FROM pages
       |), edges0 AS (
       |  SELECT page AS src, u.dst AS dst
       |  FROM pages, t, unnest([(page*7+1) % p_count, (page*13+5) % p_count,
       |                         (page*29+11) % p_count]) AS u(dst)
       |), edges1 AS (
       |  SELECT DISTINCT src, dst FROM edges0
       |  WHERE src <> dst AND src % 7 = dst % 7
       |), edges AS (
       |  SELECT src, dst FROM edges1 UNION SELECT dst, src FROM edges1
       |), reach(node, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
       |), comp AS (
       |  SELECT node AS page, MIN(label) AS cluster_id FROM reach GROUP BY node
       |), clusters AS (
       |  SELECT ($arr)[(p.page % 7) + 1] AS domain,
       |    COALESCE(c.cluster_id, p.page) AS cluster_id,
       |    CAST(COUNT(*) AS BIGINT) AS csize
       |  FROM pages p LEFT JOIN comp c ON p.page = c.page
       |  GROUP BY 1, 2
       |)
       |SELECT domain, CAST(SUM(csize) AS BIGINT) AS n_pages,
       |  CAST(COUNT(*) AS BIGINT) AS n_components,
       |  CAST(MAX(csize) AS BIGINT) AS largest,
       |  CAST(SUM(CASE WHEN csize = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
       |  CAST(COUNT(*) AS BIGINT) * 1000000 // CAST(SUM(csize) AS BIGINT) AS frag_ppm
       |FROM clusters GROUP BY domain ORDER BY domain""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_url" -> (dedupUrl _),
    "web_domain_components" -> (webDomainComponents _),
    "web_domains" -> (webDomains _),
    "web_pagerank_step" -> (webPagerankStep _),
    "web_hits_step" -> (webHitsStep _),
    "web_triangles" -> (webTriangles _),
    "web_reciprocity" -> (webReciprocity _),
    "corpus_blocklist" -> (corpusBlocklist _)
  )

  val oracles: Map[String, String] = Map(
    "dedup_url" -> dedupUrlSql,
    "web_domain_components" -> webDomainComponentsSql,
    "web_domains" -> webDomainsSql,
    "web_pagerank_step" -> webPagerankStepSql,
    "web_hits_step" -> webHitsStepSql,
    "web_triangles" -> webTrianglesSql,
    "web_reciprocity" -> webReciprocitySql,
    "corpus_blocklist" -> corpusBlocklistSql
  )
}
