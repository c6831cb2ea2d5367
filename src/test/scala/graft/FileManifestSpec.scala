package graft

import java.nio.file.{Files, Paths}
import graft.sources.FileManifest

/** FileManifest: distributed listing over a real filesystem with glob
  * filtering — and the plan must NOT read file contents when only
  * metadata is selected (column pruning on the binaryFile source).
  */
class FileManifestSpec extends SparkSpec {

  test("list + findMatching over a real directory tree") {
    val root = Files.createTempDirectory("graft_fm")
    val day1 = Files.createDirectories(root.resolve("year=2024/month=01/day=01"))
    val day2 = Files.createDirectories(root.resolve("year=2024/month=01/day=02"))
    Files.write(day1.resolve("a.json"), "{}".getBytes)
    Files.write(day1.resolve("b.csv"), "x,y".getBytes)
    Files.write(day2.resolve("c.json"), "{}".getBytes)

    val all = FileManifest.list(spark, root.toString + "/*/*/*")
    assert(all.count() == 3)
    assert(all.columns.toSeq == Seq("key", "size", "last_modified_us"))

    val json = FileManifest.findMatching(spark, root.toString + "/*/*/*", Seq("**/*.json"))
      .collect().map(_.getString(0)).toSet
    assert(json.size == 2 && json.forall(_.endsWith(".json")))

    // metadata-only projection: no content column in the scan schema
    val plan = all.queryExecution.executedPlan.toString
    assert(!plan.contains("content"), plan)
  }

  test("put -> list/getObjects round-trip (putObject twin)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fm_put").toString
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
      .selectExpr("concat('shard=', doc_id % 4, '/doc_', doc_id, '.txt') AS key",
        "encode(text, 'UTF-8') AS payload")
    val receipts = FileManifest.put(docs, dir)
    assert(receipts.count() == 20)
    assert(receipts.columns.toSeq == Seq("key", "etag", "size"))
    // every receipt etag is an md5 hex
    assert(receipts.collect().forall(_.getString(1).matches("[0-9a-f]{32}")))

    // round-trip through the listing: same keys, same sizes
    val listed = FileManifest.list(spark, dir + "/*")
      .selectExpr("regexp_extract(key, '(shard=.*)$', 1) AS key", "size")
    val exp = receipts.select("key", "size")
    assert(listed.except(exp).count() == 0 && exp.except(listed).count() == 0)

    // and through getObjects: payload bytes identical
    val back = FileManifest.getObjects(spark, dir + "/*")
      .selectExpr("regexp_extract(key, '(shard=.*)$', 1) AS key", "decode(payload, 'UTF-8') AS text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val orig = docs.selectExpr("key", "decode(payload, 'UTF-8') AS text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == orig)

    // put is an overwrite (putObject semantics): second put, same state
    FileManifest.put(docs, dir)
    assert(FileManifest.list(spark, dir + "/*").count() == 20)
  }

  test("Formats: orders round-trips parquet/json/csv with schema fidelity") {
    import graft.sources.Formats
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val n = orders.count()
    for (fmt <- Seq("parquet", "json", "csv")) {
      val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toString + "/t"
      Formats.write(orders, dir, fmt)
      val back = Formats.read(spark, dir, fmt, orders.schema)
      assert(back.schema == orders.schema, s"$fmt schema drift")
      assert(back.count() == n, s"$fmt row count")
      assert(back.except(orders).count() == 0 && orders.except(back).count() == 0,
        s"$fmt values drift")
    }
    // csv refuses nested columns instead of mangling them
    val nested = orders.selectExpr("o_orderkey", "array(o_custkey) AS arr")
    val err = intercept[IllegalArgumentException] {
      Formats.write(nested, Files.createTempDirectory("graft_fmt_bad").toString, "csv")
    }
    assert(err.getMessage.contains("arr"))
  }

  test("stream: file-source manifest stream drives the change feed end-to-end") {
    import spark.implicits._
    import graft.streaming.EventStreams
    val dir = Files.createTempDirectory("graft_fm_stream").toString
    val obs1 = Seq(("a", 10L, "e1"), ("b", 20L, "e2")).toDF("key", "size", "etag")
    obs1.write.parquet(dir + "/batch1")

    val stream = FileManifest.stream(spark, dir + "/*", obs1.schema)
      .as[EventStreams.FileObs]
    implicit val s = spark
    val q = EventStreams.changeFeed(stream).writeStream
      .format("memory").queryName("fm_feed").outputMode("append").start()
    try {
      q.processAllAvailable()
      // second listing batch: a modified, c added
      Seq(("a", 11L, "e9"), ("c", 30L, "e3")).toDF("key", "size", "etag")
        .write.parquet(dir + "/batch2")
      q.processAllAvailable()
      val rows = spark.table("fm_feed").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows.contains(("a", "added")) && rows.contains(("b", "added")))
      assert(rows.contains(("a", "modified")) && rows.contains(("c", "added")))
    } finally q.stop()
  }
}
