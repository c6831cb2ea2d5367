package graft

/** The whole engine is reachable from plain spark.sql: tables as temp
  * views, kernels as graft_* functions.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views + graft_* kernels") {
    GraftSession.registerTables(spark, sfDir)
    val dup = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT graft_polyhash(text) AS fp FROM documents GROUP BY 1 HAVING count(*) > 1)
        |""".stripMargin).collect()(0).getLong(0)
    assert(dup == 0) // corpus has no byte-exact dups

    val manifest = spark.sql(
      "SELECT count(*) AS n FROM manifest WHERE key LIKE 'data/year=2024/%'")
      .collect()(0).getLong(0)
    assert(manifest > 0)

    val sig = spark.sql(
      "SELECT size(graft_minhash(graft_shingle_hashes(text))) FROM documents LIMIT 1")
      .collect()(0).getInt(0)
    assert(sig == 12)
  }

  test("a full operator expressed in pure SQL matches its DataFrame twin") {
    GraftSession.registerTables(spark, sfDir)
    // glob_not in pure SQL over the manifest view: same compiled regex
    // (same glob list as the operator), same aggregate — a SQL-first
    // user gets identical results. The regex goes through a SQL string
    // literal, so its backslashes double.
    val re = ("^(?:" + graft.functions.Globs.compileAny(
      Seq("**/*.parquet", "**/*.json", "**/*.csv")) + ")$").replace("\\", "\\\\")
    val sqlSide = spark.sql(
      s"""SELECT regexp_extract(key, 'event_type=([^/]+)', 1) AS event_type,
         |  COUNT(*) AS n, CAST(SUM(size) AS BIGINT) AS total_size
         |FROM manifest WHERE NOT key RLIKE '$re'
         |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val dfSide = graft.operators.PathMatching.globNot(spark, sfDir).collect()
    assert(sqlSide.map(_.toString).toSeq == dfSide.map(_.toString).toSeq)

    // similarity kernels compose in SQL too
    val cos = spark.sql(
      """SELECT graft_cosine(transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |                    transform(b.embedding, x -> CAST(x AS DOUBLE))) AS c
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 0
        |LIMIT 1""".stripMargin).collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9) // self-cosine
  }
}
