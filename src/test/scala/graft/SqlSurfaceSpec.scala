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
}
