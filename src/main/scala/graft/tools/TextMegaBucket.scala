package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.functions.PortableHash.{sparkMinhash, sparkShingleHashes, MinhashBands}
import graft.operators.Materialize
import graft.sources.Tables

/** Mega-bucket audit for the TEXT LSH path (round-9 verdict task 5):
  * the minhash band-bucket join has the same Σ C(k,2) exposure as
  * audio_dedup on a corpus of near-identical template families (exact
  * dedup removes identical text; a boilerplate family with per-doc
  * variations survives into one band bucket).
  *
  * Part 1 measures the REAL corpus's band-bucket occupancy histogram
  * at ×10 — the evidence for whether the default (uncapped) contract
  * path is bounded in practice. Part 2 plants a k-member template
  * family and measures minhashPairs uncapped vs capped
  * (bucketCap=32 / anchors=16 — audio_dedup's rule), asserting the
  * capped output still covers every family member (connectivity for
  * the dedup_clusters consumer).
  *
  *   sbt "runMain graft.tools.TextMegaBucket /root/testdata/sf0.1 10 2000 20000"
  */
object TextMegaBucket {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val ks = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(2000, 20000)
    val spark = GraftSession.build("graft-text-megabucket")
    import spark.implicits._

    // ---- part 1: real-corpus band-bucket occupancy at ×factor ----
    val docs = Tables.documents(spark, srcDir)
    val big = (0 until factor).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))).reduce(_ union _)
    val sig = big.select(col("doc_id"), expr(sparkMinhash(sparkShingleHashes("text"))).as("mh"))
    val bands = sig
      .select(col("doc_id"), explode(expr(s"sequence(0, ${MinhashBands - 1})")).as("b"), col("mh"))
      .select(col("b"), expr(graft.functions.PortableHash.sparkBandValue("mh", "b")).as("bv"))
    val occ = bands.groupBy("b", "bv").count()
    val hist = occ.select(expr("CAST(length(bin(count)) AS INT) - 1").as("log2occ"))
      .groupBy("log2occ").agg(count(lit(1)).as("buckets"), sum(lit(1)).as("_"))
      .orderBy("log2occ").collect()
    val maxOcc = occ.agg(max("count")).first().getLong(0)
    println(s"[real x$factor] band buckets by log2(occupancy):")
    hist.foreach(r => println(f"  2^${r.getAs[Int]("log2occ")}%2d  ${r.getAs[Long]("buckets")}%9d buckets"))
    println(s"[real x$factor] max bucket occupancy = $maxOcc")

    // ---- part 2: planted template family ----
    val boiler = (1 to 50).map(i => s"clause$i standard boilerplate segment").mkString(" ")
    def family(k: Int) = spark.range(k.toLong).select(
      col("id").as("doc_id"),
      concat(lit(boiler + " customer ref "), col("id"),
        lit(" variant "), pmod(col("id"), lit(7))).as("text"))
    def run(label: String, k: Int, cap: Long): Unit = {
      val fam = Materialize.stable(family(k)
        .select(col("doc_id"), expr(sparkMinhash(sparkShingleHashes("text"))).as("mh")))
      val t0 = System.nanoTime()
      val out = Dedup.minhashPairsFromSigs(fam, bucketCap = cap)
      val pairs = out.count()
      val covered = out.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[$label] k=$k%6d cap=$cap%19d elapsed=$secs%7.2fs pairs=$pairs%10d covered_docs=$covered%6d")
    }
    ks.foreach { k =>
      if (k <= 4000) run("family-uncapped", k, Long.MaxValue)
      run("family-capped", k, 32L)
    }
    spark.stop()
  }
}
