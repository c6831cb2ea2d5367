package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Dedup, Similarity, Video, Materialize}
import graft.functions.VectorFns.sparkLshBuckets
import graft.sources.Tables

/** Bucket-occupancy audit for the three LSH candidate joins that did
  * NOT yet have a measured mega-bucket verdict (round-10 verdict
  * findings 2 and 8; text minhash bands and audio envelope bands were
  * measured in TextMegaBucket / AudioMegaBucket):
  *
  *   1. containment PRINT buckets (Dedup.containmentCandidatesFor) —
  *      real-corpus ×N occupancy histogram for BOTH schemes (manber /
  *      winnow), plus a planted k-doc boilerplate-prefix family
  *      measured uncapped vs capped (the Dedup.cappedPairs rule).
  *   2. video FIRST-FRAME aHash band buckets (videoDedup's candidate
  *      join) — real-corpus occupancy AFTER exact-class collapse (the
  *      join only ever sees class representatives), plus a synthetic
  *      k-class one-bucket family through cappedPairs.
  *   3. embedding HYPERPLANE buckets (embedNeardup's candidate join) —
  *      real-corpus occupancy after collapse (byte-identical replicas
  *      provably share every bucket and are collapsed first — the ×10
  *      harness is absorbed by construction, measured in SCALE.md round
  *      10), plus a planted k-member positive-scaled family (distinct
  *      vectors, cosine 1.0, identical signs ⇒ one bucket per table)
  *      through embedNeardupFor uncapped vs capped.
  *
  *   sbt "runMain graft.tools.BandOccupancy /root/testdata/sf0.1 10 4000"
  */
object BandOccupancy {
  private def histo(label: String, occ: DataFrame): Unit = {
    // occ: one row per bucket with a `count` column
    val hist = occ.select(expr("CAST(length(bin(count)) AS INT) - 1").as("log2occ"))
      .groupBy("log2occ").agg(count(lit(1)).as("buckets"))
      .orderBy("log2occ").collect()
    val maxOcc = occ.agg(max("count")).first().getLong(0)
    println(s"[$label] buckets by log2(occupancy):")
    hist.foreach(r => println(f"  2^${r.getAs[Int]("log2occ")}%2d  ${r.getAs[Long]("buckets")}%9d buckets"))
    println(s"[$label] max bucket occupancy = $maxOcc")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val famK = if (args.length > 2) args(2).toInt else 4000
    val spark = GraftSession.build("graft-band-occupancy")
    import spark.implicits._

    // ---- 1. containment prints: real corpus ×factor ----
    val docs = Tables.documents(spark, srcDir).select(col("doc_id"), col("text"))
    val big = (0 until factor).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))).reduce(_ union _)
    Seq("manber" -> Dedup.sparkContainmentPrints("text"),
        "winnow" -> Dedup.sparkWinnowPrints("text")).foreach { case (scheme, pe) =>
      val occ = big.select(explode(expr(pe)).as("pr")).groupBy("pr").count()
      histo(s"prints/$scheme real x$factor", occ)
    }
    // planted boilerplate-prefix family: k docs sharing a 30-word
    // template prefix (hot prints, occupancy k) + a unique tail
    val boiler = (1 to 30).map(i => s"tpl$i clause").mkString(" ")
    val fam = Materialize.stable(spark.range(famK.toLong).select(
      col("id").as("doc_id"),
      concat(lit(boiler + " ref "), col("id"), lit(" tail "),
        pmod(col("id"), lit(13)), lit(" suffix "), col("id") * 7).as("text")))
    Seq("manber", "winnow").foreach { scheme =>
      def run(label: String, cap: Long): Unit = {
        val t0 = System.nanoTime()
        val out = Dedup.containmentCandidatesFor(fam, scheme, cap)
        val pairs = out.count()
        val covered = out.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
          .distinct().count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[prints/$scheme family $label] k=$famK%6d elapsed=$secs%7.2fs pairs=$pairs%10d covered_docs=$covered%6d")
      }
      run("uncapped", Long.MaxValue)
      run("capped-32", 32L)
    }

    // ---- 2. video first-frame bands: real corpus after collapse ----
    val base = Video.encodeVideos(spark, srcDir)
    val allSigs = Materialize.stable(Video.aHashLoHi(base))
    val reps = Video.signatureClasses(allSigs)
      .filter(col("doc_id") === col("rep")).select("doc_id")
    val f0 = allSigs.join(reps, Seq("doc_id"))
      .filter(col("frame_idx") === 0)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 15), b -> named_struct('b', b, 'v', " +
          "CASE WHEN b < 8 THEN shiftright(ahash_lo, b * 4) % 16 " +
          "ELSE shiftright(ahash_hi, (b - 8) * 4) % 16 END))")).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.v").as("v"))
    histo("video/f0-bands real (class reps)", f0.groupBy("b", "v").count())
    // synthetic one-bucket family: k distinct classes sharing frame-0
    // hash (same footage, different later frames) — the collapse can't
    // merge them, so all k land in the same bucket of all 16 bands
    def vidBands(k: Long) = spark.range(k).select(col("id").as("doc_id"),
      explode(expr("transform(sequence(0, 15), b -> named_struct('b', b, 'v', CAST(7 AS BIGINT)))")).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.v").as("v"))
    def runVid(label: String, k: Long, cap: Long): Unit = {
      val t0 = System.nanoTime()
      val out = Dedup.cappedPairs(vidBands(k), Seq("b", "v"), "doc_id", cap)
      val pairs = out.count()
      val covered = out.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[video/f0-bands family $label] k=$k%6d elapsed=$secs%7.2fs pairs=$pairs%10d covered_docs=$covered%6d")
    }
    runVid("uncapped", famK.toLong.min(4000L), Long.MaxValue)
    runVid("capped-32", famK.toLong, 32L)
    runVid("capped-32", 3L * famK, 32L) // linearity check

    // ---- 3. embedding hyperplane buckets: real corpus after collapse ----
    val vecs = Tables.embeddings(spark, srcDir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val vreps = vecs.groupBy("v").agg(min("vec_id").as("vec_id"))
    val buckets = vreps
      .select(col("vec_id"), posexplode(expr(sparkLshBuckets("v"))).as(Seq("t", "bucket")))
    histo("embed/hyperplane real (class reps)", buckets.groupBy("t", "bucket").count())
    // planted family: positive per-member scaling keeps every
    // hyperplane sign (identical buckets in all tables) while the
    // vectors stay distinct (collapse can't merge) and cosine = 1.0
    // (every pair verifies) — k re-embeddings of one boilerplate doc
    val vbase = vecs.orderBy("vec_id").limit(1).select(col("v").as("v0"))
    def vfam(k: Long) = Materialize.stable(spark.range(k).crossJoin(broadcast(vbase))
      .select(col("id").as("vec_id"),
        expr("transform(v0, x -> x * (1.0 + CAST(id AS DOUBLE) * 1e-6))").as("v")))
    def runEmb(label: String, k: Long, cap: Long): Unit = {
      val t0 = System.nanoTime()
      val out = Similarity.embedNeardupFor(vfam(k), cap)
      val pairs = out.count()
      val covered = out.select(explode(array(col("vec_a"), col("vec_b"))).as("d"))
        .distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[embed/hyperplane family $label] k=$k%6d elapsed=$secs%7.2fs pairs=$pairs%10d covered_docs=$covered%6d")
    }
    runEmb("uncapped", famK.toLong.min(2000L), Long.MaxValue)
    runEmb("capped-32", famK.toLong, 32L)
    spark.stop()
  }
}
