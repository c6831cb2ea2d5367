package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** DuckDB-oracle parity for the √n IVF cell rule OFF its 50-floor
  * (round-9 verdict finding 2): every contract scale (500 / 2000
  * vectors) pins `centroidModFor` at MinCentroidMod, so the
  * cross-engine `floor(sqrt(n))` bit-identity claim and the off-floor
  * seed arithmetic had zero parity coverage. This spec generates a
  * 10,100-vector corpus (mod = 100 — off the floor), runs the REAL
  * contract queries (knn_ivf + knn_ivf_balance, which share the assign
  * CTE every IVF path leans on) against it, and replays the oracle SQL
  * in DuckDB via tools/parity.py — the driver's own comparator (column
  * types, sorted rows, exact values).
  *
  * duckdb lives in the driver-side python3 only (a tool, never a
  * library dependency) — the same place the correctness gate runs it.
  */
class IvfOffFloorSpec extends SparkSpec {

  test("off-floor sqrt(n) rule: knn_ivf + knn_ivf_balance hash-equal vs DuckDB at n=10100") {
    val n = 10100L
    assert(Similarity.centroidModFor(n) == 100L,
      "corpus sized to move the rule off its 50-floor")
    val sf = "/tmp/graft_offfloor_sf"
    val out = "/tmp/graft_offfloor_out"
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    Seq(sf, out).foreach(d => rmrf(new java.io.File(d)))
    // synthetic embeddings with the testdata schema (vec_id BIGINT,
    // embedding FLOAT[], label INT); values are arbitrary-but-fixed —
    // both engines read the SAME parquet, parity tests the MATH
    spark.range(n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> " +
          "CAST((pmod(hash(id, j), 2001) - 1000) / CAST(1000 AS DOUBLE) AS FLOAT))")
          .as("embedding"),
        expr("CAST(pmod(id, 5) AS INT)").as("label"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$sf/staging")
    // parity.py (like the testdata) expects embeddings.parquet as a
    // FILE — promote the single part file Spark wrote
    val part = new java.io.File(s"$sf/staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.copy(part,
      java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val keys = Seq("knn_ivf", "knn_ivf_balance")
    keys.foreach { k =>
      SparkEntry.queries(k)(spark, sf)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$k")
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      keys.map(k => s"${esc(k)}: ${esc(SparkEntry.oracleSql(k))}")
        .mkString("{", ",", "}"))
    val buf = new StringBuilder
    val rc = scala.sys.process.Process(Seq("python3", "tools/parity.py", sf, out))
      .!(scala.sys.process.ProcessLogger(l => buf.append(l).append('\n')))
    assert(rc == 0 && buf.toString.contains("2 ok, 0 fail"),
      s"off-floor DuckDB parity failed:\n$buf")
  }
}
