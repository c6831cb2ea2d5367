package graft

import graft.operators.Multimodal

/** Multimodal plumbing: the stubbed per-partition decoder must be
  * deterministic in the payload bytes and preserve the typed schema.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeStub: typed mapPartitions pipeline over binary payloads") {
    val ds = Multimodal.decodeStub(spark, sfDir)
    val rows = ds.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.decoder == "stub-v0"))
    assert(rows.forall(r => r.byte_len > 0 && r.width >= 16 && r.n_frames >= 1))
    // deterministic: same payload → same fake dims
    val again = Multimodal.decodeStub(spark, sfDir).collect()
    assert(rows.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }

  test("binary metadata matches text-derived expectations") {
    val df = Multimodal.multimodalMeta(spark, sfDir)
    val r = df.filter(org.apache.spark.sql.functions.col("doc_id") === 0).collect()(0)
    // ascii text: byte_len == char length
    val txt = graft.sources.Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0)
      .select("text").collect()(0).getString(0)
    assert(r.getAs[Int]("byte_len") == txt.length)
    assert(r.getAs[String]("magic_hex").length == 8) // 4 bytes → 8 hex chars
  }
}
