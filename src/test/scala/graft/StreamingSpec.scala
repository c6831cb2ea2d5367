package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, FileObs}

/** Structured-Streaming operators driven through MemoryStream with
  * known inputs; semantics asserted against hand-computed expectations
  * (these have no SQL oracle — SURVEY §2 streaming rows).
  */
class StreamingSpec extends SparkSpec {
  import scala.collection.JavaConverters._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("stream_window_agg: tumbling 1h window counts match batch semantics") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowAgg(df).writeStream
      .format("memory").queryName("wagg").outputMode("update").start()
    try {
      mem.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0),
        (ts(70), "click", 4.0), (ts(30), "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("wagg")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set((0L, "click", 2L, 3.0), (60L, "click", 1L, 4.0), (0L, "view", 1L, 8.0)))
    } finally q.stop()
  }

  test("stream_window_agg == batch events_window_agg on the real events table") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect()

    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.windowAgg(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wagg_eq").outputMode("complete").start()
    try {
      mem.addData(events.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("wagg_eq")
        .select((unix_micros(col("window_start")) / 3600000000L).cast("long").as("hour_bucket"),
          col("event_type"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.operators.Queries.eventsWindowAgg(spark, sfDir)
        .select("hour_bucket", "event_type", "n_events")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream_hop_window == batch events_hop_window on the real events table") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect()

    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.hopWindowAgg(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hop_eq").outputMode("complete").start()
    try {
      mem.addData(events.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("hop_eq")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.operators.EventsMore.eventsHopWindow(spark, sfDir)
        .select("window_start_us", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream_gap_fill: zeros for silent buckets, batch-boundary invariant, == batch on real events") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case across TWO batches: type a sees buckets 0 and 3 (batch 1)
    // then 5 (batch 2) — silent 1,2 fill in batch 1, silent 4 in batch 2
    val hourUs = 3600000000L
    val mem = MemoryStream[(String, Long)]
    val q = EventStreams.gapFillStream(mem.toDS(), hourUs)
      .toDF("event_type", "bucket", "n")
      .writeStream.format("memory").queryName("gapf").outputMode("append").start()
    try {
      mem.addData(("a", 0L * hourUs), ("a", 3L * hourUs + 5), ("a", 3L * hourUs + 9))
      q.processAllAvailable()
      mem.addData(("a", 5L * hourUs))
      q.processAllAvailable()
      val got = spark.table("gapf")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((0L, 1L), (1L, 0L), (2L, 0L), (3L, 2L), (4L, 0L), (5L, 1L)))
    } finally q.stop()

    // one bucket's events STRADDLE a batch boundary: bucket 2 gets 3
    // events in batch 1 and 2 more in batch 2. The correction row must
    // carry the CUMULATIVE count (5), so a downstream upsert by
    // (type, bucket) — last write wins — lands on the true total, not
    // the second batch's partial.
    val mem3 = MemoryStream[(String, Long)]
    val q3 = EventStreams.gapFillStream(mem3.toDS(), hourUs)
      .toDF("event_type", "bucket", "n")
      .writeStream.format("memory").queryName("gapf_straddle").outputMode("append").start()
    try {
      mem3.addData(("a", 2L * hourUs), ("a", 2L * hourUs + 1), ("a", 2L * hourUs + 2))
      q3.processAllAvailable()
      mem3.addData(("a", 2L * hourUs + 3), ("a", 2L * hourUs + 4))
      q3.processAllAvailable()
      val rows3 = spark.table("gapf_straddle")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      // batch 1 emitted (2,3); batch 2's correction re-emitted (2,5)
      assert(rows3.toSet == Set((2L, 3L), (2L, 5L)))
      // the upsert view: MAX per bucket here equals last-write-wins
      // (counts only grow) — and equals the true total
      val upserted = rows3.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(upserted == Map(2L -> 5L))
    } finally q3.stop()

    // equivalence with the batch operator on the real events table
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_us")).as[(String, Long)].collect()
    val mem2 = MemoryStream[(String, Long)]
    val q2 = EventStreams.gapFillStream(mem2.toDS(), hourUs)
      .toDF("event_type", "bucket", "n")
      .writeStream.format("memory").queryName("gapf_eq").outputMode("append").start()
    try {
      mem2.addData(events.toSeq)
      q2.processAllAvailable()
      val streamed = spark.table("gapf_eq")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.EventsMore.eventsGapFill(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getAs[Long]("hour_bucket"), r.getAs[Long]("n_events"))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_dwell: boundary gaps survive the batch split, == batch events_dwell") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1 events at 0s, 3s (batch 1) then 10s, 10s (batch 2)
    // — the 3s→10s gap SPANS the batch boundary and must come from state
    val mem = MemoryStream[(Long, Long, Long)]
    val q = EventStreams.dwellStream(mem.toDS())
      .toDF("user_id", "bucket", "gap_s")
      .writeStream.format("memory").queryName("dwell").outputMode("append").start()
    try {
      mem.addData((1L, 0L, 1L), (1L, 3000000L, 2L))
      q.processAllAvailable()
      mem.addData((1L, 10000000L, 3L), (1L, 10000000L, 4L))
      q.processAllAvailable()
      val got = spark.table("dwell")
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq.sorted
      // gaps: 3s (bucket 1), 7s (bucket 2, ACROSS the boundary), 0s (bucket -1)
      assert(got == Seq((-1, 0L), (1, 3L), (2, 7L)), s"got $got")
    } finally q.stop()

    // equivalence with the batch operator: real events split into TWO
    // micro-batches at the median timestamp; the aggregated stream
    // output must equal events_dwell's histogram exactly
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long, Long)]
    val q2 = EventStreams.dwellStream(mem2.toDS())
      .toDF("user_id", "bucket", "gap_s")
      .writeStream.format("memory").queryName("dwell_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("dwell_eq")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_gaps"), sum("gap_s").as("sum_gap_s"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.EventsMore.eventsDwell(spark, sfDir)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_sessionize: 30-min gap splits sessions per user") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(mem.toDS()).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    try {
      val us = 60000000L // 1 min in micros
      // user 1: events at 0,10min (one session), then 60min (gap>30 → new)
      mem.addData(Ev(1, 0, 1.0), Ev(1, 10 * us, 2.0), Ev(1, 60 * us, 4.0))
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      // first session closed when the 60min event arrived
      assert(rows == Set((1L, 0L, 10 * us, 2L, 3.0)))
    } finally q.stop()
  }

  test("stream_dedup: first doc per fingerprint passes, dups flagged across batches") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.Doc
    val mem = MemoryStream[Doc]
    val q = EventStreams.dedupStream(mem.toDS()).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    try {
      // batch 1: fp 100 arrives twice (doc 5 and 3 — smaller id wins)
      mem.addData(Doc(5, 100), Doc(3, 100), Doc(7, 200))
      q.processAllAvailable()
      // batch 2: fp 100 again (dup across batches), fp 300 new
      mem.addData(Doc(9, 100), Doc(11, 300))
      q.processAllAvailable()
      val rows = spark.table("dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(rows == Set(
        (3L, 100L, true), (5L, 100L, false), (7L, 200L, true),
        (9L, 100L, false), (11L, 300L, true)))
    } finally q.stop()
  }

  test("stream_dedup_bounded: watermark admits one doc per fp, bounded state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.StampedDoc
    val mem = MemoryStream[StampedDoc]
    val q = EventStreams.dedupStreamBounded(mem.toDS(), "30 minutes").writeStream
      .format("memory").queryName("dedup_wm").outputMode("append").start()
    try {
      // fp 100 twice within the window -> one admit
      mem.addData(StampedDoc(1, 100, ts(10)), StampedDoc(2, 100, ts(15)),
        StampedDoc(3, 200, ts(12)))
      q.processAllAvailable()
      mem.addData(StampedDoc(4, 100, ts(20))) // still within watermark -> dup
      q.processAllAvailable()
      val admitted = spark.table("dedup_wm").select("fp").collect().map(_.getLong(0)).toSeq
      assert(admitted.sorted == Seq(100L, 200L), s"got $admitted")
    } finally q.stop()
  }

  test("stream_dedup == batch dedup_exact on the real documents table") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.Doc
    import graft.functions.PortableHash
    // same corpus+copies construction as the batch dedup_exact query
    val d = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(PortableHash.sparkFingerprint("text")).as("fp"))
    val copies = d.filter(pmod(col("doc_id"), lit(10)) === 3)
      .select((col("doc_id") + 100000).as("doc_id"), col("fp"))
    val docs = d.union(copies).as[Doc].collect()

    val mem = MemoryStream[Doc]
    val q = EventStreams.dedupStream(mem.toDS()).writeStream
      .format("memory").queryName("dedup_eq").outputMode("append").start()
    try {
      // two micro-batches: originals, then the re-ingested copies
      val (orig, dup) = docs.partition(_.doc_id < 100000)
      mem.addData(orig.toSeq); q.processAllAvailable()
      mem.addData(dup.toSeq); q.processAllAvailable()
      // every copy-group representative in the batch answer must be the
      // admitted doc in the stream, and each group's other members rejected
      val admitted = spark.table("dedup_eq").filter(col("is_first"))
        .groupBy("fp").agg(min("doc_id").as("rep"), count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(admitted.values.forall(_._2 == 1L)) // exactly one admit per fp
      val batch = graft.operators.Dedup.dedupExact(spark, sfDir)
        .collect().map(r => (r.getAs[Long]("fp"), r.getAs[Long]("rep_id"))).toMap
      batch.foreach { case (fp, rep) =>
        assert(admitted(fp)._1 == rep, s"fp $fp: stream admitted ${admitted(fp)._1}, batch keeps $rep")
      }
      val nRejected = spark.table("dedup_eq").filter(!col("is_first")).count()
      assert(nRejected == dup.length) // each re-ingested copy rejected
    } finally q.stop()
  }

  test("stream_dedup_lsh == batch dedup_incremental_lsh admit/reject set, median split") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.functions.PortableHash._
    import graft.streaming.EventStreams.LshBandRow
    graft.expressions.GraftFunctions.register(spark)
    val d = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def bandRows(docs: org.apache.spark.sql.DataFrame, idCol: String, kind: Int): Seq[LshBandRow] =
      docs.select(col(idCol), expr(sparkMinhash(sparkShingleHashes("text"))).as("mh"))
        .select(col(idCol), explode(expr(s"sequence(0, ${MinhashBands - 1})")).as("b"), col("mh"))
        .select(col(idCol), col("b"), expr(sparkBandValue("mh", "b")).as("bv"), col("mh"))
        .collect().map(r => LshBandRow(kind, r.getLong(0), r.getInt(1), r.getLong(2),
          r.getSeq[Long](3)))
    // index = the corpus; probes = the SAME synthetic batch the batch
    // operator plants (tail edits %4, reversed >=3-word docs %8)
    val idxRows = bandRows(d, "doc_id", 0)
    val probeDocs = d.filter(pmod(col("doc_id"), lit(10)) === 4)
      .select((col("doc_id") + operators.Dedup.NearBatchShift).as("new_id"),
        concat(col("text"), lit(" appendix")).as("text"))
      .union(d.filter(pmod(col("doc_id"), lit(10)) === 8)
        .filter(expr("size(filter(split(text, ' '), w -> w <> '')) >= 3"))
        .select((col("doc_id") + operators.Dedup.NearBatchShift).as("new_id"),
          array_join(reverse(split(col("text"), " ")), " ").as("text")))
    val probeRows = bandRows(probeDocs, "new_id", 1)
    assert(idxRows.nonEmpty && probeRows.nonEmpty)

    val mem = MemoryStream[LshBandRow]
    val q = EventStreams.dedupLshStream(mem.toDS())
      .toDF("new_id", "cand", "matches")
      .writeStream.format("memory").queryName("lshdd").outputMode("append").start()
    try {
      // median split on BOTH sides: index rows across batches 1-2,
      // probe rows across batches 3-4 — admission must not depend on
      // either split point
      val idMed = idxRows.map(_.id).sorted.apply(idxRows.size / 2)
      val (i1, i2) = idxRows.partition(_.id < idMed)
      val pMed = probeRows.map(_.id).sorted.apply(probeRows.size / 2)
      val (p1, p2) = probeRows.partition(_.id < pMed)
      Seq(i1, i2, p1, p2).foreach { b => mem.addData(b); q.processAllAvailable() }

      val got = spark.table("lshdd").groupBy("new_id")
        .agg(min(when(col("cand") >= 0, col("cand"))).as("dup_of"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val expected = operators.Dedup.dedupIncrementalLsh(spark, sfDir)
        .collect().map(r => r.getAs[Long]("new_id") ->
          Option(r.get(r.fieldIndex("dup_of"))).map(_.asInstanceOf[Long])).toMap
      assert(got.keySet == expected.keySet,
        s"probe coverage: stream ${got.size} docs vs batch ${expected.size}")
      expected.foreach { case (id, dup) =>
        assert(got(id) == dup, s"new_id $id: stream dup_of=${got(id)}, batch dup_of=$dup")
      }
      // the planted structure must actually exercise both verdicts
      assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty))
      // state-cardinality contract: ONE record per occupied (band,
      // band-value) bucket of the INDEX — probes write nothing
      val occupied = idxRows.map(r => (r.b, r.bv)).distinct.size.toLong
      val stateRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal).max
      assert(stateRows == occupied, s"state rows $stateRows != occupied buckets $occupied")
    } finally q.stop()
  }

  test("stream_dedup_containment == batch dedup_incremental_containment admit/reject set, median split") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.functions.PortableHash._
    import graft.streaming.EventStreams.ContainPrintRow
    graft.expressions.GraftFunctions.register(spark)
    val d = graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def printRows(docs: org.apache.spark.sql.DataFrame, idCol: String, kind: Int): Seq[ContainPrintRow] =
      docs.select(col(idCol),
          expr(operators.Dedup.sparkWinnowPrints("text")).as("prs"),
          expr(s"array_distinct(${sparkShingleHashes("text")})").as("sh"))
        .select(col(idCol), explode(col("prs")).as("pr"), col("sh"))
        .collect().map(r => ContainPrintRow(kind, r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    // index = the corpus; probes = the SAME synthetic batch the batch
    // operator plants (digest composites %10==6, reversed docs %10==1)
    val idxRows = printRows(d, "doc_id", 0)
    val probeDocs = d.filter(pmod(col("doc_id"), lit(10)) === 6)
      .join(d.select(col("doc_id").as("id1"), col("text").as("t1")),
        col("id1") === col("doc_id") + 1)
      .join(d.select(col("doc_id").as("id2"), col("text").as("t2")),
        col("id2") === col("doc_id") + 2)
      .select((col("doc_id") + operators.Dedup.ContainBatchShift).as("new_id"),
        concat_ws(" ", col("text"), col("t1"), col("t2")).as("text"))
      .union(d.filter(pmod(col("doc_id"), lit(10)) === 1)
        .select((col("doc_id") + operators.Dedup.ContainBatchShift).as("new_id"),
          array_join(reverse(split(col("text"), " ")), " ").as("text")))
    val probeRows = printRows(probeDocs, "new_id", 1)
    assert(idxRows.nonEmpty && probeRows.nonEmpty)

    val mem = MemoryStream[ContainPrintRow]
    val q = EventStreams.dedupContainmentStream(mem.toDS())
      .toDF("new_id", "cand", "i")
      .writeStream.format("memory").queryName("cntdd").outputMode("append").start()
    try {
      // median split on BOTH sides: index rows across batches 1-2,
      // probe rows across batches 3-4 — admission must not depend on
      // either split point
      val idMed = idxRows.map(_.id).sorted.apply(idxRows.size / 2)
      val (i1, i2) = idxRows.partition(_.id < idMed)
      val pMed = probeRows.map(_.id).sorted.apply(probeRows.size / 2)
      val (p1, p2) = probeRows.partition(_.id < pMed)
      Seq(i1, i2, p1, p2).foreach { b => mem.addData(b); q.processAllAvailable() }

      val got = spark.table("cntdd").groupBy("new_id")
        .agg(min(when(col("cand") >= 0, col("cand"))).as("dup_of"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val expected = operators.Dedup.dedupIncrementalContainment(spark, sfDir)
        .collect().map(r => r.getAs[Long]("new_id") ->
          Option(r.get(r.fieldIndex("dup_of"))).map(_.asInstanceOf[Long])).toMap
      // stream coverage = batch docs WITH ≥1 winnow print; a printless
      // doc produces no stream rows and the batch gate provably admits
      // it (no posting → no candidate)
      assert(got.keySet.subsetOf(expected.keySet),
        s"stream emitted unknown ids: ${got.keySet -- expected.keySet}")
      expected.foreach { case (id, dup) =>
        if (got.contains(id))
          assert(got(id) == dup, s"new_id $id: stream dup_of=${got(id)}, batch dup_of=$dup")
        else
          assert(dup.isEmpty, s"new_id $id rejected by batch but absent from stream")
      }
      // the planted structure must exercise both verdicts, and every
      // REJECTION must have flowed through the stream
      assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty))
      assert(expected.collect { case (id, Some(_)) => id }.toSet.subsetOf(got.keySet))
      // state-cardinality contract: ONE record per occupied print
      // bucket of the INDEX — probes write nothing
      val occupied = idxRows.map(_.pr).distinct.size.toLong
      val stateRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal).max
      assert(stateRows == occupied, s"state rows $stateRows != occupied print buckets $occupied")
    } finally q.stop()
  }

  test("stream_dedup_semantic == batch dedup_incremental_semantic admit/reject set, median split") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.SemPostRow
    graft.expressions.GraftFunctions.register(spark)
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr(graft.functions.VectorFns.sparkToDouble("embedding")).as("v"))
    val batch = graft.operators.Similarity.semanticPlantBatch(vecs)
    def postRows(frame: org.apache.spark.sql.DataFrame, idCol: String,
        kind: Int): Seq[SemPostRow] =
      graft.operators.Similarity.semanticPostings(vecs, frame, idCol)
        .collect().map(r => SemPostRow(kind, r.getLong(0), r.getInt(1),
          r.getLong(2), r.getSeq[Double](3)))
    // index = the corpus postings; probes = the SAME synthetic batch
    // the batch operator plants (paraphrases %10==2, new modes %10==6)
    val idxRows = postRows(vecs, "vec_id", 0)
    val probeRows = postRows(batch, "new_id", 1)
    assert(idxRows.nonEmpty && probeRows.nonEmpty)

    val mem = MemoryStream[SemPostRow]
    val q = EventStreams.dedupSemanticStream(mem.toDS())
      .toDF("new_id", "cand", "cos_ppm")
      .writeStream.format("memory").queryName("semdd").outputMode("append").start()
    try {
      // median split on BOTH sides: index rows across batches 1-2,
      // probe rows across batches 3-4 — admission must not depend on
      // either split point
      val idMed = idxRows.map(_.id).sorted.apply(idxRows.size / 2)
      val (i1, i2) = idxRows.partition(_.id < idMed)
      val pMed = probeRows.map(_.id).sorted.apply(probeRows.size / 2)
      val (p1, p2) = probeRows.partition(_.id < pMed)
      Seq(i1, i2, p1, p2).foreach { b => mem.addData(b); q.processAllAvailable() }

      val got = spark.table("semdd").groupBy("new_id")
        .agg(min(when(col("cand") >= 0, col("cand"))).as("dup_of"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val expected = graft.operators.Similarity.dedupIncrementalSemantic(spark, sfDir)
        .collect().map(r => r.getAs[Long]("new_id") ->
          Option(r.get(r.fieldIndex("dup_of"))).map(_.asInstanceOf[Long])).toMap
      assert(got.keySet == expected.keySet,
        s"probe coverage: stream ${got.size} docs vs batch ${expected.size}")
      expected.foreach { case (id, dup) =>
        assert(got(id) == dup, s"new_id $id: stream dup_of=${got(id)}, batch dup_of=$dup")
      }
      // the planted structure must exercise both verdicts
      assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty))
      // state-cardinality contract: ONE record per occupied (space,
      // key) slot of the INDEX — probes write nothing
      val occupied = idxRows.map(r => (r.space, r.key)).distinct.size.toLong
      val stateRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal).max
      assert(stateRows == occupied, s"state rows $stateRows != occupied slots $occupied")
    } finally q.stop()
  }

  test("stream_boilerplate: cross-batch doc REDELIVERY inflates df — the documented at-least-once behavior") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long, Long)]
    val q = EventStreams.boilerplateStream(mem.toDS())
      .toDF("source", "line_fp", "df")
      .writeStream.format("memory").queryName("bpredeliver").outputMode("append").start()
    try {
      // one doc, one line, repeated WITHIN a batch: counts once
      mem.addData(Seq(("web", 42L, 7L), ("web", 42L, 7L)))
      q.processAllAvailable()
      // the SAME doc redelivered in a LATER batch: the state carries no
      // doc evidence, so df inflates to 2 — one-sided (a line is
      // flagged early, never missed); exactly-once delivery is the
      // twin's documented precondition
      mem.addData(Seq(("web", 42L, 7L)))
      q.processAllAvailable()
      val dfs = spark.table("bpredeliver").collect()
        .map(r => r.getLong(2)).sorted.toSeq
      assert(dfs == Seq(1L, 2L),
        s"expected intra-batch distinct then cross-batch inflation, got $dfs")
    } finally q.stop()
  }

  test("ingest pipeline: fingerprint -> dedup -> quality gate, end to end") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.IngestPipeline
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = IngestPipeline.curate(mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    try {
      val longText = (1 to 100).map(i => s"word$i the a of").mkString(" ")
      mem.addData(
        (1L, longText, ts(10)),
        (2L, longText, ts(11)), // exact dup of doc 1 -> dropped by dedup
        (3L, "too short", ts(12)))
      q.processAllAvailable()
      val rows = spark.table("ingest")
        .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(!rows.contains(2L), "duplicate fingerprint must not pass the dedup stage")
      assert(rows(1L), "long diverse doc passes the quality gate")
      assert(!rows(3L), "short doc is flagged keep=false")
      // stream fingerprints == batch fingerprints (same kernel)
      val fp = spark.table("ingest").filter(col("doc_id") === 1).select("fp").collect()(0).getLong(0)
      val batchFp = Seq(longText).toDF("text")
        .select(org.apache.spark.sql.functions.expr(
          graft.functions.PortableHash.sparkFingerprint("text"))).collect()(0).getLong(0)
      assert(fp == batchFp)
    } finally q.stop()
  }

  test("ingest pipeline: restart from checkpoint is exactly-once (state + sink)") {
    // The scaladoc's exactly-once claim, exercised: run the curate
    // stream over a file source with a file sink + checkpoint, STOP the
    // query between micro-batches (the deterministic spelling of a
    // crash — recovery reads the same offset log either way), then feed
    // duplicates of already-admitted docs and restart. The recovered
    // run must (a) not re-emit wave-1 rows (sink transaction log),
    // (b) still drop wave-2 dups of wave-1 fingerprints (state store
    // recovery), (c) admit genuinely new docs.
    import spark.implicits._
    import graft.streaming.IngestPipeline
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-restart").toString
    val (inDir, outDir, ckDir) = (s"$root/in", s"$root/out", s"$root/ck")
    val schema = "doc_id LONG, text STRING, ts TIMESTAMP"
    val longA = (1 to 100).map(i => s"alpha$i the a of").mkString(" ")
    val longB = (1 to 100).map(i => s"beta$i the a of").mkString(" ")
    val longC = (1 to 100).map(i => s"gamma$i the a of").mkString(" ")

    def start() = IngestPipeline.curate(
      spark.readStream.schema(schema).json(inDir), watermarkDelay = "1 hour")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir).outputMode("append").start()

    // wave 1: two distinct docs
    Seq((1L, longA, ts(10)), (2L, longB, ts(11)))
      .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").json(inDir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // "crash" between batches

    // wave 2, while the query is DOWN: a dup of doc 1 (same text, new
    // id), an exact re-send of doc 2, and a genuinely new doc
    Seq((3L, longA, ts(12)), (2L, longB, ts(11)), (4L, longC, ts(13)))
      .toDF("doc_id", "text", "ts").coalesce(1).write.mode("append").json(inDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out.sorted == Seq(1L, 2L, 4L),
      s"exactly-once: wave-1 admissions once, recovered state drops dups, new doc admitted; got $out")
    // and the admitted set matches the batch dedup_exact answer on the union
    val batch = Seq((1L, longA), (2L, longB), (3L, longA), (2L, longB), (4L, longC))
      .toDF("doc_id", "text")
      .withColumn("fp", org.apache.spark.sql.functions.expr(
        graft.functions.PortableHash.sparkFingerprint("text")))
      .groupBy("fp").agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out.sorted == batch.sorted, "stream admissions == batch first-per-fingerprint")
  }

  test("stream_entropy: restart from checkpoint recovers the count-map state") {
    // the map-valued state (the only one in the twin family) must
    // survive the state store round trip: stop between batches, feed
    // repeat events, restart — the recovered run must emit counts that
    // CONTINUE from the pre-crash census, not re-seed at 1
    import spark.implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-entropy-restart").toString
    val (inDir, outDir, ckDir) = (s"$root/in", s"$root/out", s"$root/ck")
    val schema = "user_id LONG, event_type STRING"
    def start() = EventStreams.entropyStream(
      spark.readStream.schema(schema).json(inDir).as[(Long, String)])
      .toDF("user_id", "event_type", "c")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir).outputMode("append").start()

    Seq((1L, "click"), (1L, "view"), (2L, "click"))
      .toDF("user_id", "event_type").coalesce(1).write.mode("append").json(inDir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // "crash" between batches

    Seq((1L, "click"), (2L, "purchase"))
      .toDF("user_id", "event_type").coalesce(1).write.mode("append").json(inDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val finalCounts = spark.read.parquet(outDir)
      .groupBy("user_id", "event_type").agg(max("c").as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(finalCounts == Set((1L, "click", 2L), (1L, "view", 1L),
      (2L, "click", 1L), (2L, "purchase", 1L)),
      s"recovered census must continue from pre-crash state; got $finalCounts")
  }

  test("restart harness: every per-user stateful twin recovers its state from checkpoint") {
    // one parameterized harness for the whole flatMapGroupsWithState
    // family: run each twin over the SAME two real-event waves twice —
    // once in a single uninterrupted query, once stopping the query
    // between waves and restarting from the checkpoint — and assert the
    // emitted row multisets are identical. Any state-recovery defect
    // (missed carry, re-seeded state, double emission) diverges the two.
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.DataFrame
    val dayUs = 86400L * 1000000
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .orderBy("ts_us", "event_id").limit(3000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val (w1, w2) = ev.splitAt(ev.length / 2)
    def full(rows: Array[(Long, Long, Long, String)]): DataFrame =
      rows.toSeq.toDF("user_id", "ts_us", "event_id", "event_type")
    def typed(rows: Array[(Long, Long, Long, String)]): DataFrame =
      rows.map(r => (r._4, r._1, r._2, r._3)).toSeq.toDF("event_type", "user_id", "ts_us", "event_id")
    def userDay(rows: Array[(Long, Long, Long, String)]): DataFrame =
      rows.map(r => (r._1, r._2 / dayUs)).toSeq.toDF("user_id", "day")

    def ohlcRows(rows: Array[(Long, Long, Long, String)]): DataFrame =
      rows.map(r => (r._4, r._2 / 3600000000L, r._2, r._3, (r._3 % 100).toDouble)).toSeq
        .toDF("event_type", "hour_bucket", "ts_us", "event_id", "value")
    // hour buckets as the twin's "days": the 3000-event sample spans
    // only ~2 calendar days, which would leave the lag-7 predictor with
    // zero scored pairs; hours give it a populated season
    def typeDay(rows: Array[(Long, Long, Long, String)]): DataFrame =
      rows.map(r => (r._4, r._2 / 3600000000L)).toSeq.toDF("event_type", "day")

    val fullSchema = "user_id LONG, ts_us LONG, event_id LONG, event_type STRING"
    val typedSchema = "event_type STRING, user_id LONG, ts_us LONG, event_id LONG"
    val daySchema = "user_id LONG, day LONG"
    val ohlcSchema = "event_type STRING, hour_bucket LONG, ts_us LONG, event_id LONG, value DOUBLE"
    val cases: Seq[(String, String, DataFrame, DataFrame, DataFrame => DataFrame)] = Seq(
      ("markov", fullSchema, full(w1), full(w2),
        (df: DataFrame) => EventStreams.markovStream(
          df.as[(Long, Long, Long, String)]).toDF("from_type", "to_type")),
      ("paths", fullSchema, full(w1), full(w2),
        (df: DataFrame) => EventStreams.pathsStream(
          df.as[(Long, Long, Long, String)]).toDF("user_id", "e1", "e2", "e3")),
      ("burstiness", typedSchema, typed(w1), typed(w2),
        (df: DataFrame) => EventStreams.burstinessStream(
          df.as[(String, Long, Long, Long)]).toDF("event_type", "gap_min")),
      ("streaks", daySchema, userDay(w1), userDay(w2),
        (df: DataFrame) => EventStreams.streaksStream(
          df.as[(Long, Long)]).toDF("user_id", "start_day", "streak_days")),
      ("lifecycle", daySchema, userDay(w1), userDay(w2),
        (df: DataFrame) => EventStreams.lifecycleStream(
          df.as[(Long, Long)]).toDF("day", "user_id", "cls")),
      ("stickiness", daySchema, userDay(w1), userDay(w2),
        (df: DataFrame) => EventStreams.stickinessStream(
          df.as[(Long, Long)]).toDF()),
      ("ohlc", ohlcSchema, ohlcRows(w1), ohlcRows(w2),
        (df: DataFrame) => EventStreams.ohlcStream(
          df.as[(String, Long, Long, Long, Double)])
          .toDF("event_type", "hour_bucket", "open", "high", "low", "close", "n")),
      ("forecast", "event_type STRING, day LONG", typeDay(w1), typeDay(w2),
        (df: DataFrame) => EventStreams.forecastStream(
          df.as[(String, Long)]).toDF("event_type", "day", "n_so_far", "n_pred")),
      ("abtest", "user_id LONG, event_type STRING",
        w1.map(r => (r._1, r._4)).toSeq.toDF("user_id", "event_type"),
        w2.map(r => (r._1, r._4)).toSeq.toDF("user_id", "event_type"),
        (df: DataFrame) => EventStreams.abtestStream(
          df.as[(Long, String)]).toDF("exposure_type", "d_users", "d_conv")),
      ("daily_topk", "event_type STRING, day LONG, event_id LONG, value DOUBLE",
        w1.map(r => (r._4, r._2 / dayUs, r._3, (r._3 % 100).toDouble)).toSeq
          .toDF("event_type", "day", "event_id", "value"),
        w2.map(r => (r._4, r._2 / dayUs, r._3, (r._3 % 100).toDouble)).toSeq
          .toDF("event_type", "day", "event_id", "value"),
        (df: DataFrame) => EventStreams.dailyTopkStream(
          df.as[(String, Long, Long, Double)])
          .toDF("event_type", "day", "upd", "rk", "event_id", "value")),
      ("hll_daily", "day LONG, user_id LONG",
        w1.map(r => (r._2 / dayUs, r._1)).toSeq.toDF("day", "user_id"),
        w2.map(r => (r._2 / dayUs, r._1)).toSeq.toDF("day", "user_id"),
        (df: DataFrame) => EventStreams.hllDailyStream(
          df.as[(Long, Long)]).toDF("day", "bucket", "upd", "mr")),
      ("srm", fullSchema,
        full(w1.filter(r => r._4 == "click" || r._4 == "view")),
        full(w2.filter(r => r._4 == "click" || r._4 == "view")),
        (df: DataFrame) => EventStreams.srmStream(
          df.as[(Long, Long, Long, String)]).toDF("arm", "d")))

    cases.foreach { case (name, schema, b1, b2, twin) =>
      val root = Files.createTempDirectory(s"graft-restart-$name").toString
      def run(in: String, out: String, ck: String) =
        twin(spark.readStream.schema(schema).json(in))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck).outputMode("append").start()
      // A: both waves inside one query lifetime
      b1.coalesce(1).write.mode("append").json(s"$root/inA")
      val qa = run(s"$root/inA", s"$root/outA", s"$root/ckA")
      try {
        qa.processAllAvailable()
        b2.coalesce(1).write.mode("append").json(s"$root/inA")
        qa.processAllAvailable()
      } finally qa.stop()
      // B: "crash" between the waves, restart from checkpoint
      b1.coalesce(1).write.mode("append").json(s"$root/inB")
      val qb1 = run(s"$root/inB", s"$root/outB", s"$root/ckB")
      try qb1.processAllAvailable() finally qb1.stop()
      b2.coalesce(1).write.mode("append").json(s"$root/inB")
      val qb2 = run(s"$root/inB", s"$root/outB", s"$root/ckB")
      try qb2.processAllAvailable() finally qb2.stop()

      val a = spark.read.parquet(s"$root/outA").collect().map(_.toString).sorted.toSeq
      val b = spark.read.parquet(s"$root/outB").collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$name: harness produced no rows")
      assert(a == b,
        s"$name: restarted run diverges from uninterrupted run (${a.length} vs ${b.length} rows)")
    }
  }

  test("restart harness: native stateful ops (range join, hop window, bounded dedup) recover watermark state") {
    // the flatMapGroupsWithState family's restart harness (above) covers
    // user-authored state; these three keep their state in Spark's OWN
    // stateful operators (stream-stream join buffers, windowed-agg
    // partials, dropDuplicatesWithinWatermark's fp set) — the round-8
    // verdict asked for in-test proof that THAT state also survives a
    // checkpoint restart. Same A/B shape: two file-source waves through
    // one uninterrupted query vs a stop-and-restart between waves; the
    // emitted multisets must match exactly.
    import java.nio.file.Files
    import org.apache.spark.sql.DataFrame

    def ab(name: String, schemas: Seq[String], wave1: Seq[DataFrame],
        wave2: Seq[DataFrame], twin: Seq[String] => DataFrame): Seq[String] = {
      val root = Files.createTempDirectory(s"graft-native-restart-$name").toString
      def srcDirs(run: String) = schemas.indices.map(i => s"$root/in$run$i")
      def write(dirs: Seq[String], waves: Seq[DataFrame]): Unit =
        waves.zip(dirs).foreach { case (w, d) => w.coalesce(1).write.mode("append").json(d) }
      def start(run: String) =
        twin(srcDirs(run))
          .writeStream.format("parquet").option("path", s"$root/out$run")
          .option("checkpointLocation", s"$root/ck$run").outputMode("append").start()
      // A: both waves inside one query lifetime
      write(srcDirs("A"), wave1)
      val qa = start("A")
      try {
        qa.processAllAvailable()
        write(srcDirs("A"), wave2)
        qa.processAllAvailable()
      } finally qa.stop()
      // B: "crash" between the waves, restart from checkpoint
      write(srcDirs("B"), wave1)
      val qb1 = start("B")
      try qb1.processAllAvailable() finally qb1.stop()
      write(srcDirs("B"), wave2)
      val qb2 = start("B")
      try qb2.processAllAvailable() finally qb2.stop()
      val a = spark.read.parquet(s"$root/outA").collect().map(_.toString).sorted.toSeq
      val b = spark.read.parquet(s"$root/outB").collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$name: harness produced no rows")
      assert(a == b,
        s"$name: restarted run diverges from uninterrupted run (${a.length} vs ${b.length} rows)")
      a
    }
    def reader(schema: String)(dir: String): DataFrame =
      spark.readStream.schema(schema).json(dir)

    // events sorted by time, split at the midpoint so wave 2 is never
    // late relative to wave 1's committed watermark (late-drop would
    // otherwise make A/B sensitive to batch boundaries by design)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("value"), col("event_type"))
      .orderBy("ts", "event_id").limit(3000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3), r.getString(4)))
    val maxTs = ev.map(_._3.getTime).max
    val mid = ev(ev.length / 2)._3.getTime
    val (w1, w2) = ev.partition(_._3.getTime < mid)
    import spark.implicits._

    // stream_hop_window: watermarked sliding-window agg; a far-future
    // sentinel in wave 2 pushes the watermark (2h delay) past every
    // real window's end so append mode finalizes them in both runs
    val hopSchema = "ts TIMESTAMP, event_type STRING, value DOUBLE"
    def hopRows(rows: Array[(Long, Long, Timestamp, Double, String)]) =
      rows.map(r => (r._3, r._5, r._4)).toSeq.toDF("ts", "event_type", "value")
    val hopFlush = Seq((new Timestamp(maxTs + 4 * 3600 * 1000L), "flush", 0.0))
      .toDF("ts", "event_type", "value")
    ab("hop_window", Seq(hopSchema),
      Seq(hopRows(w1)), Seq(hopRows(w2).union(hopFlush)),
      dirs => EventStreams.hopWindowAgg(reader(hopSchema)(dirs.head)))

    // stream_range_join: two watermarked sources, state in the
    // stream-stream join buffers; flush sentinels on BOTH sides emit
    // the outer (click-less) rows before the final comparison
    val clickSchema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    val errSchema = "user_id LONG, event_id LONG, ts TIMESTAMP"
    def clicks(rows: Array[(Long, Long, Timestamp, Double, String)]) =
      rows.filter(_._5 == "click").map(r => (r._1, r._3, r._4)).toSeq
        .toDF("user_id", "ts", "value")
    def errs(rows: Array[(Long, Long, Timestamp, Double, String)]) =
      rows.filter(_._5 == "error").map(r => (r._1, r._2, r._3)).toSeq
        .toDF("user_id", "event_id", "ts")
    val flushTs = new Timestamp(maxTs + 3600 * 1000L)
    val rjRows = ab("range_join", Seq(clickSchema, errSchema),
      Seq(clicks(w1), errs(w1)),
      Seq(clicks(w2).union(Seq((-1L, flushTs, 0.0)).toDF("user_id", "ts", "value")),
        errs(w2).union(Seq((-1L, -1L, flushTs)).toDF("user_id", "event_id", "ts"))),
      dirs => EventStreams.rangeJoinStream(
        reader(clickSchema)(dirs.head), reader(errSchema)(dirs(1))))
    // the restart split the join mid-stream: clicks buffered in wave 1
    // must still match wave-2 errors, i.e. some matched rows exist
    assert(rjRows.exists(!_.contains("null")), "range_join: no matched rows survived the restart")

    // stream_dedup_bounded: dropDuplicatesWithinWatermark's fingerprint
    // set must survive the restart — wave 2 redelivers an admitted fp
    // within the watermark window; only the new fp may pass
    val docSchema = "doc_id LONG, fp LONG, ts TIMESTAMP"
    val d1 = Seq((1L, 100L, ts(10)), (2L, 100L, ts(15)), (3L, 200L, ts(12)))
      .toDF("doc_id", "fp", "ts")
    val d2 = Seq((4L, 100L, ts(20)), (5L, 300L, ts(22))).toDF("doc_id", "fp", "ts")
    val admitted = ab("dedup_bounded", Seq(docSchema), Seq(d1), Seq(d2),
      dirs => EventStreams.dedupStreamBounded(
        reader(docSchema)(dirs.head).as[EventStreams.StampedDoc], "30 minutes").toDF())
    assert(admitted.length == 3 && !admitted.exists(_.contains("4,")),
      s"dedup_bounded: fp state lost across restart — admitted $admitted")
  }

  test("streamMatchingObjects onProgress twin: StreamingQueryListener batch stats") {
    // The reference's onProgress({processed, total, matched}) callback
    // (src/index.ts:1390) maps to Spark's StreamingQueryListener:
    // numInputRows per micro-batch is `processed`, the filtered sink
    // count is `matched`. This is the documented 1:1 in API_MAP.md —
    // here it runs: a file-source stream with a glob filter, two
    // arrival waves, and the listener's per-batch stats observed.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    import spark.implicits._
    val progressed = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        if (e.progress.numInputRows > 0) batches.incrementAndGet()
        progressed.addAndGet(e.progress.numInputRows)
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val root = java.nio.file.Files.createTempDirectory("graft-progress").toString
    try {
      val pm = new graft.api.PathMatcher
      Seq("data/a.json", "logs/x.log").toDF("key")
        .write.mode("append").parquet(root)
      val q = graft.sources.FileManifest.stream(spark, root,
          org.apache.spark.sql.types.StructType.fromDDL("key STRING"))
        .filter(pm.isMatch(col("key"), "data/**"))
        .writeStream.format("memory").queryName("progress_t").outputMode("append").start()
      try {
        q.processAllAvailable()
        Seq("data/b.json", "data/c.json", "logs/y.log").toDF("key")
          .write.mode("append").parquet(root)
        q.processAllAvailable()
        // matched: the glob kept exactly the data/ keys
        assert(spark.table("progress_t").count() == 3)
        // processed: listener saw every arriving row, across >= 2 batches
        // (listener bus is async — poll briefly)
        val deadline = System.nanoTime() + 10e9.toLong
        while (progressed.get() < 5 && System.nanoTime() < deadline) Thread.sleep(50)
        assert(progressed.get() == 5, s"listener processed ${progressed.get()} of 5")
        assert(batches.get() >= 2, "two arrival waves -> two non-empty batches")
      } finally q.stop()
    } finally spark.streams.removeListener(listener)
  }

  test("stream_stickiness: bitmask deltas across batches == batch events_stickiness") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1 active days 3 (batch 1) then 3 (dup), 5, 40 (batch 2).
    // Day 3 re-arriving must be a state-carried no-op; day 5's WAU/MAU joins
    // must see day 3 in the carried mask (e.g. no new MAU join at e=5..30);
    // day 40 is >27 past day 5's window so it re-joins everything.
    val mem = MemoryStream[(Long, Long)]
    val q = EventStreams.stickinessStream(mem.toDS())
      .writeStream.format("memory").queryName("stick").outputMode("append").start()
    try {
      mem.addData((1L, 3L)); q.processAllAvailable()
      mem.addData((1L, 3L), (1L, 5L), (1L, 40L)); q.processAllAvailable()
      val rows = spark.table("stick").as[EventStreams.StickDelta].collect()
      val mauJoins = rows.filter(_.mau == 1L).map(_.day).sorted
      // day 3 joins MAU(3..30); day 5 extends coverage only at 31, 32
      // (day 3 already covers 5..30); day 40 re-joins everything
      assert(mauJoins.toSeq == ((3L to 32L) ++ (40L to 67L)), s"mau joins: ${mauJoins.toSeq}")
      val wauJoins = rows.filter(_.wau == 1L).map(_.day).sorted
      // day 3 joins WAU(3..9); day 5 extends coverage only at 10, 11
      assert(wauJoins.toSeq == Seq(3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L) ++ (40L to 46L),
        s"wau joins: ${wauJoins.toSeq}")
      assert(rows.filter(_.dau == 1L).map(_.day).sorted.toSeq == Seq(3L, 5L, 40L))
    } finally q.stop()

    // equivalence with the batch operator: the real (user, day) activity
    // split into TWO micro-batches at the median timestamp; summing the
    // monotone membership deltas per observed day must equal the batch
    // DAU/WAU/MAU (and hence stickiness_ppm) exactly
    val dayUs = 86400L * 1000000
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us div $dayUs").as("day"), col("ts_us"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long)]
    val q2 = EventStreams.stickinessStream(mem2.toDS())
      .writeStream.format("memory").queryName("stick_eq").outputMode("append").start()
    try {
      mem2.addData(first.map(r => (r._1, r._2)).toSeq); q2.processAllAvailable()
      mem2.addData(second.map(r => (r._1, r._2)).toSeq); q2.processAllAvailable()
      val observed = ev.map(_._2).distinct.toSet
      val streamed = spark.table("stick_eq")
        .groupBy("day")
        .agg(sum("dau").as("dau"), sum("wau").as("wau"), sum("mau").as("mau"))
        .collect()
        .map(r => (r.getAs[Long]("day"), r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Long]("mau")))
        .filter(t => observed(t._1)).toSet
      val batch = graft.operators.Growth.eventsStickiness(spark, sfDir)
        .select("day", "dau", "wau", "mau")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch,
        s"stream-only=${(streamed -- batch).take(3)}, batch-only=${(batch -- streamed).take(3)}")
    } finally q2.stop()
  }

  test("contamination stream: static eval index flags arriving dup docs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val shared = (1 to 40).map(i => s"bench$i").mkString(" ")
    val evalDocs = Seq((900L, shared)).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.contaminationStream(
        mem.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("contam").outputMode("update").start()
    try {
      mem.addData(
        (1L, shared + " extra tail words here"), // near-copy of the benchmark doc
        (2L, (1 to 40).map(i => s"clean$i").mkString(" "))) // disjoint
      q.processAllAvailable()
      val rows = spark.table("contam").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_doc"))).toSet
      assert(rows == Set((1L, 900L)),
        s"only the benchmark near-copy is flagged, got ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("stream_range_join == batch events_range_join on the real events table") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), col("event_type"))
      .as[(Long, Long, Timestamp, Double, String)].collect()
    val maxTs = ev.map(_._3.getTime).max

    val clicksMem = MemoryStream[(Long, Timestamp, Double)]
    val errorsMem = MemoryStream[(Long, Long, Timestamp)]
    val joined = EventStreams.rangeJoinStream(
      clicksMem.toDF().toDF("user_id", "ts", "value"),
      errorsMem.toDF().toDF("user_id", "event_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("srj").outputMode("append").start()
    try {
      clicksMem.addData(ev.filter(_._5 == "click").map(e => (e._1, e._3, e._4)).toSeq)
      errorsMem.addData(ev.filter(_._5 == "error").map(e => (e._1, e._2, e._3)).toSeq)
      q.processAllAvailable()
      // flush: a far-future sentinel on BOTH sides pushes the watermark
      // past every real error so their outer (null-click) rows emit
      val flush = new Timestamp(maxTs + 3600 * 1000L)
      clicksMem.addData((-1L, flush, 0.0))
      errorsMem.addData((-1L, -1L, flush))
      q.processAllAvailable()

      val streamed = spark.table("srj").filter(col("e_user") >= 0)
        .groupBy(col("e_user").as("user_id"), col("event_id"))
        .agg(count(col("c_ts")).as("n_clicks_5m"),
          coalesce(round(sum(col("c_value").cast("decimal(12,2)")), 2).cast("double"), lit(0.0))
            .as("sum_click_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.operators.Queries.eventsRangeJoin(spark, sfDir)
        .select("user_id", "event_id", "n_clicks_5m", "sum_click_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream_change_feed: added → modified → silence for unchanged") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[FileObs]
    val q = EventStreams.changeFeed(mem.toDS()).writeStream
      .format("memory").queryName("feed").outputMode("append").start()
    try {
      mem.addData(FileObs("a", 10, "e1"), FileObs("b", 20, "e2"))
      q.processAllAvailable()
      mem.addData(FileObs("a", 11, "e3"), FileObs("b", 20, "e2"))
      q.processAllAvailable()
      val rows = spark.table("feed").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(("a", "added", 10L), ("b", "added", 20L), ("a", "modified", 11L)))
    } finally q.stop()
  }

  test("stream_anomaly: outliers flagged against prior-batch moments only") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.ValEv
    val mem = MemoryStream[ValEv]
    val q = EventStreams.anomalyStream(mem.toDS()).writeStream
      .format("memory").queryName("anom").outputMode("append").start()
    try {
      // batch 1: 40 baseline points around 10.0 (incl. a wild value —
      // no flags yet: the baseline hasn't reached AnomalyMinN before
      // this batch, and a batch can't vote on itself)
      mem.addData((1 to 40).map(i => ValEv("m", 10.0 + (i % 5 - 2) * 0.1)) :+ ValEv("m", 99.0): _*)
      q.processAllAvailable()
      assert(spark.table("anom").filter(col("flagged")).count() == 0)
      // batch 2: a clear outlier + a normal point, scored against the
      // 41-point baseline (whose σ the batch-1 outlier inflated — 50
      // still sits far outside)
      mem.addData(ValEv("m", 50.0), ValEv("m", 10.1))
      q.processAllAvailable()
      val decisions = spark.table("anom")
        .filter(col("value").isin(50.0, 10.1))
        .collect().map(r => r.getDouble(1) -> r.getBoolean(2)).toMap
      assert(decisions(50.0), "outlier must flag")
      assert(!decisions(10.1), "normal value must pass")
      // a fresh type has no baseline — never flags
      mem.addData(ValEv("fresh", 1e9))
      q.processAllAvailable()
      assert(spark.table("anom")
        .filter(col("event_type") === "fresh" && col("flagged")).count() == 0)
    } finally q.stop()
  }

  test("stream_incr_agg: foreachBatch-merged deltas equal a recompute of the final listing") {
    implicit val s = spark
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStreams.SweepObs
    val mem = MemoryStream[SweepObs]
    // the maintained aggregate, re-materialized per micro-batch (in
    // production this is a MERGE into a table; here a collected Seq)
    var agg: Seq[(String, Long, Long)] = Seq.empty
    val q = EventStreams.deltaFeed(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreams.FileDelta], _: Long) =>
        agg = EventStreams.mergeDeltas(
          agg.toDF("pdir", "n_files", "total_bytes"), batch.toDF())
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      }
      .start()
    try {
      // sweep 1: three files in two partitions
      mem.addData(
        SweepObs("a/part-1.parquet", 100, "e1", deleted = false),
        SweepObs("a/part-2.parquet", 200, "e2", deleted = false),
        SweepObs("b/part-1.parquet", 50, "e3", deleted = false))
      q.processAllAvailable()
      assert(agg.toSet == Set(("a", 2L, 300L), ("b", 1L, 50L)))
      // sweep 2: modify, delete, keep, add
      mem.addData(
        SweepObs("a/part-1.parquet", 150, "e4", deleted = false),
        SweepObs("a/part-2.parquet", 0, "", deleted = true),
        SweepObs("b/part-1.parquet", 50, "e3", deleted = false),
        SweepObs("b/part-2.parquet", 75, "e5", deleted = false))
      q.processAllAvailable()
      // final listing: a = {part-1: 150}, b = {part-1: 50, part-2: 75}
      assert(agg.toSet == Set(("a", 1L, 150L), ("b", 2L, 125L)),
        s"maintained aggregate drifted: $agg")
    } finally q.stop()
  }

  test("stream_gap_fill: beyond-horizon correction is DROPPED, not a partial overwrite") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600000000L
    // retainBuckets=3: after batch 1 advances to bucket 10, the horizon
    // is bucket 7; a late event for bucket 5 has lost its cumulative
    // (batch 1 emitted (5, 2)) and MUST NOT re-emit a partial (5, 1) —
    // last-write-wins downstream would regress 2 -> 1
    val mem = MemoryStream[(String, Long)]
    val q = EventStreams.gapFillStream(mem.toDS(), hourUs, retainBuckets = 3)
      .toDF("event_type", "bucket", "n")
      .writeStream.format("memory").queryName("gapf_hzn").outputMode("append").start()
    try {
      mem.addData(("a", 5L * hourUs), ("a", 5L * hourUs + 1), ("a", 10L * hourUs))
      q.processAllAvailable()
      mem.addData(("a", 5L * hourUs + 2), ("a", 9L * hourUs)) // 5: beyond horizon; 9: within
      q.processAllAvailable()
      val rows = spark.table("gapf_hzn")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      // batch 2 emitted ONLY the in-horizon correction (9, 1) — nothing
      // for bucket 5, so the upsert view keeps the correct (5, 2)
      assert(rows.count(_._1 == 5L) == 1 && rows.contains((5L, 2L)), s"got ${rows.toSeq}")
      assert(rows.contains((9L, 1L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("stream_attribution: cross-batch last touch, == batch events_attribution") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1's click lands in batch 1, the purchase in batch
    // 2 — the credit must come from carried state, not fall to 'direct';
    // user 2 purchases with no prior touch at all -> 'direct'
    val mem = MemoryStream[(Long, Long, Long, String, Long)]
    val q = EventStreams.attributionStream(mem.toDS())
      .toDF("user_id", "channel", "cents")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      mem.addData((1L, 0L, 1L, "click", 0L), (2L, 1L, 2L, "purchase", 500L))
      q.processAllAvailable()
      mem.addData((1L, 2L, 3L, "purchase", 900L), (1L, 3L, 4L, "view", 0L),
        (1L, 4L, 5L, "purchase", 100L))
      q.processAllAvailable()
      val got = spark.table("attr")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((2L, "direct", 500L), (1L, "click", 900L), (1L, "view", 100L)),
        s"got $got")
    } finally q.stop()

    // equivalence with the batch operator: real events split into TWO
    // micro-batches at the median timestamp; aggregating the streamed
    // per-purchase rows must reproduce events_attribution exactly
    // (cents pre-converted with the SAME decimal cast the batch uses)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
      .as[(Long, Long, Long, String, Long)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long, Long, String, Long)]
    val q2 = EventStreams.attributionStream(mem2.toDS())
      .toDF("user_id", "channel", "cents")
      .writeStream.format("memory").queryName("attr_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("attr_eq")
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"), sum("cents").as("attributed_cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.AnalyticsPlus.eventsAttribution(spark, sfDir)
        .select("channel", "n_purchases", "attributed_cents")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_lifecycle: cross-batch day continuity, == batch events_lifecycle") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1 active days 10, 11 land in batch 1; day 13 in
    // batch 2 — the gap classification must come from carried state
    // (resurrected), NOT restart as new; a redelivered day 11 in batch
    // 2 must emit nothing
    val mem = MemoryStream[(Long, Long)]
    val q = EventStreams.lifecycleStream(mem.toDS())
      .toDF("day", "user_id", "status")
      .writeStream.format("memory").queryName("life").outputMode("append").start()
    try {
      mem.addData((1L, 10L), (1L, 11L), (1L, 10L))
      q.processAllAvailable()
      mem.addData((1L, 13L), (1L, 11L), (2L, 13L))
      q.processAllAvailable()
      val got = spark.table("life")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == Set((10L, 1L, "new"), (11L, 1L, "retained"),
        (13L, 1L, "resurrected"), (13L, 2L, "new")), s"got $got")
    } finally q.stop()

    // equivalence with the batch operator: real events' (user, day)
    // stream split into TWO micro-batches at the median timestamp;
    // aggregating streamed classifications must reproduce
    // events_lifecycle exactly (days arrive in ts order per user, so
    // the split never reorders a user's days)
    val dayUs = 86400L * 1000000
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"))
      .as[(Long, Long)].collect().sortBy(_._2)
      .map { case (u, ts) => (u, ts / dayUs) }
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long)]
    val q2 = EventStreams.lifecycleStream(mem2.toDS())
      .toDF("day", "user_id", "status")
      .writeStream.format("memory").queryName("life_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("life_eq")
        .groupBy("day")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
          sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val batch = graft.operators.Growth.eventsLifecycle(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_markov: cross-batch transition from carried state, == batch events_markov") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1's "click" closes batch 1; the "view" opening
    // batch 2 must transition FROM click (carried state), not from
    // '<start>' again; user 2's first event is '<start>' -> purchase
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = EventStreams.markovStream(mem.toDS())
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("markov").outputMode("append").start()
    try {
      mem.addData((1L, 0L, 1L, "click"))
      q.processAllAvailable()
      mem.addData((1L, 1L, 2L, "view"), (2L, 2L, 3L, "purchase"))
      q.processAllAvailable()
      val got = spark.table("markov")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == Seq(("<start>", "click"), ("<start>", "purchase"), ("click", "view")),
        s"got $got")
    } finally q.stop()

    // equivalence with the batch operator: real events split into TWO
    // micro-batches at the median timestamp; counting the streamed
    // transition rows must reproduce events_markov exactly
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long, Long, String)]
    val q2 = EventStreams.markovStream(mem2.toDS())
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("markov_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("markov_eq")
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n_transitions"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.operators.EventsMore.eventsMarkov(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_paths: straddled trigram completes from carried state, == batch events_paths") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1 sees a, b in batch 1 and c, d in batch 2 — the
    // (a,b,c) trigram straddles the boundary and must complete from the
    // two carried types; (b,c,d) follows in-batch
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = EventStreams.pathsStream(mem.toDS())
      .toDF("user_id", "e1", "e2", "e3")
      .writeStream.format("memory").queryName("paths").outputMode("append").start()
    try {
      mem.addData((1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"))
      q.processAllAvailable()
      mem.addData((1L, 2L, 3L, "c"), (1L, 3L, 4L, "d"))
      q.processAllAvailable()
      val got = spark.table("paths")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
      assert(got == Set((1L, "a", "b", "c"), (1L, "b", "c", "d")), s"got $got")
    } finally q.stop()

    // equivalence with the batch operator: aggregating the streamed
    // trigram rows (count + distinct-user reach, batch's exact ordering
    // and top-20 cut) must reproduce events_paths under a median split
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long, Long, String)]
    val q2 = EventStreams.pathsStream(mem2.toDS())
      .toDF("user_id", "e1", "e2", "e3")
      .writeStream.format("memory").queryName("paths_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("paths_eq")
        .groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).as("n_paths"), countDistinct("user_id").as("n_users"))
        .orderBy(col("n_paths").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
      val batch = graft.operators.Growth.eventsPaths(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_streaks: straddled run continues from carried state, == batch events_streaks") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1 active days 10, 11 in batch 1 and 12, 14 in
    // batch 2 — day 12 must EXTEND the carried (11, run=2) streak to 3
    // with the original start day 10, then day 14 opens a fresh streak
    val mem = MemoryStream[(Long, Long)]
    val q = EventStreams.streaksStream(mem.toDS())
      .toDF("user_id", "start_day", "streak_days")
      .writeStream.format("memory").queryName("streaks").outputMode("append").start()
    try {
      mem.addData((1L, 10L), (1L, 11L))
      q.processAllAvailable()
      mem.addData((1L, 12L), (1L, 14L))
      q.processAllAvailable()
      val got = spark.table("streaks")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 10L, 1L), (1L, 10L, 2L), (1L, 10L, 3L), (1L, 14L, 1L)),
        s"got $got")
    } finally q.stop()

    // equivalence with the batch operator: max-aggregating streamed
    // rows per (user, start_day) rebuilds the island frame; applying
    // batch's best-streak pick and top-20 cut must equal events_streaks
    // under a median-day split (per-user days are monotone across it)
    val dayUs = 86400L * 1000000
    val ud = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us div $dayUs").as("day"))
      .as[(Long, Long)].collect().sortBy(_._2)
    val (first, second) = ud.splitAt(ud.length / 2)
    val mem2 = MemoryStream[(Long, Long)]
    val q2 = EventStreams.streaksStream(mem2.toDS())
      .toDF("user_id", "start_day", "streak_days")
      .writeStream.format("memory").queryName("streaks_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val islands = spark.table("streaks_eq")
        .groupBy("user_id", "start_day")
        .agg(max("streak_days").as("streak_days"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        .orderBy(col("streak_days").desc, col("start_day"))
      val streamed = islands
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "streak_days", "start_day")
        .orderBy(col("streak_days").desc, col("user_id"))
        .limit(20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val batch = graft.operators.EventsMore.eventsStreaks(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_burstiness: straddled gap computed from carried state, == batch events_burstiness") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: the click 3 minutes into batch 2 must produce ONE gap
    // of 3 min from the carried batch-1 timestamp, not re-seed at zero;
    // an independent (type, user) key seeds without emitting
    val mem = MemoryStream[(String, Long, Long, Long)]
    val q = EventStreams.burstinessStream(mem.toDS())
      .toDF("event_type", "gap_min")
      .writeStream.format("memory").queryName("burst").outputMode("append").start()
    try {
      mem.addData(("click", 1L, 0L, 1L))
      q.processAllAvailable()
      mem.addData(("click", 1L, 180000000L, 2L), ("view", 2L, 60000000L, 3L))
      q.processAllAvailable()
      val got = spark.table("burst")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(got == Seq(("click", 3L)), s"got $got")
    } finally q.stop()

    // equivalence: integer moment sums over the streamed gaps, fed to
    // the SAME stats tail as the batch operator, must reproduce
    // events_burstiness exactly under a median split
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("ts_us"), col("event_id"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._3)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(String, Long, Long, Long)]
    val q2 = EventStreams.burstinessStream(mem2.toDS())
      .toDF("event_type", "gap_min")
      .writeStream.format("memory").queryName("burst_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val moments = spark.table("burst_eq")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"), sum("gap_min").as("s1"),
          sum(expr("gap_min * gap_min")).as("s2"))
      val streamed = graft.operators.AnalyticsMore.burstinessStats(moments)
        .collect().map(_.toSeq).toSeq
      val batch = graft.operators.AnalyticsMore.eventsBurstiness(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_entropy: cumulative count upserts rebuild the grid, == batch events_entropy") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1's second "click" in batch 2 must emit the
    // CUMULATIVE count 2 (not a batch-local 1) — the carried map is
    // what makes last-write-wins rebuild the census
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.entropyStream(mem.toDS())
      .toDF("user_id", "event_type", "c")
      .writeStream.format("memory").queryName("entropy").outputMode("append").start()
    try {
      mem.addData((1L, "click"), (1L, "view"))
      q.processAllAvailable()
      mem.addData((1L, "click"))
      q.processAllAvailable()
      val got = spark.table("entropy")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((1L, "click", 1L), (1L, "view", 1L), (1L, "click", 2L)),
        s"got $got")
    } finally q.stop()

    // equivalence: max-aggregating the monotone upserts per (user, type)
    // rebuilds the grid; the SAME histogram tail as the batch operator
    // must then reproduce events_entropy exactly under a median split
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .collect().sortBy(_.getLong(1)).map(r => (r.getLong(0), r.getString(2)))
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.entropyStream(mem2.toDS())
      .toDF("user_id", "event_type", "c")
      .writeStream.format("memory").queryName("entropy_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val grid = spark.table("entropy_eq")
        .groupBy("user_id", "event_type").agg(max("c").as("c"))
      val streamed = graft.operators.AnalyticsMore.entropyHistogram(grid)
        .collect().map(_.toSeq).toSeq
      val batch = graft.operators.AnalyticsMore.eventsEntropy(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_cum_share: straddled day upserts monotonically, == batch events_cum_share") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: type A's day 5 straddles the batch boundary — the
    // second emission must carry the FULL day (30+12) and the larger
    // cumulative, so a last-write-wins consumer never regresses; day 4
    // arriving after day 5 is late out-of-order and must be dropped
    val mem = MemoryStream[(String, Long, Long)]
    val q = EventStreams.cumShareStream(mem.toDS())
      .toDF("event_type", "day", "day_cents", "cum_cents")
      .writeStream.format("memory").queryName("cum").outputMode("append").start()
    try {
      mem.addData(("A", 5L, 30L), ("A", 6L, 7L))
      q.processAllAvailable()
      mem.addData(("A", 5L, 12L), ("A", 4L, 99L), ("A", 7L, 1L))
      q.processAllAvailable()
      val got = spark.table("cum")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch 1: day 5 -> (30, 30), day 6 -> (7, 37)
      // batch 2: day 5 re-emitted only if it is still the carried day —
      // it is NOT (day 6 closed it), so the late 12 is dropped with the
      // late 99; day 7 -> (1, 38)
      assert(got == Set(("A", 5L, 30L, 30L), ("A", 6L, 7L, 37L), ("A", 7L, 1L, 38L)),
        s"got $got")
    } finally q.stop()

    // straddle WITHIN the carried day: day 5 still open when its second
    // half arrives -> upsert with the full total
    val mem2 = MemoryStream[(String, Long, Long)]
    val q2 = EventStreams.cumShareStream(mem2.toDS())
      .toDF("event_type", "day", "day_cents", "cum_cents")
      .writeStream.format("memory").queryName("cum2").outputMode("append").start()
    try {
      mem2.addData(("A", 5L, 30L)); q2.processAllAvailable()
      mem2.addData(("A", 5L, 12L), ("A", 6L, 7L)); q2.processAllAvailable()
      val got = spark.table("cum2")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(("A", 5L, 30L, 30L), ("A", 5L, 42L, 42L), ("A", 6L, 7L, 49L)),
        s"got $got")
      // last-write-wins view of the upserts == the closed-day rows
      val lww = spark.table("cum2").groupBy("event_type", "day")
        .agg(max("day_cents").as("day_cents"), max("cum_cents").as("cum_cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(lww == Set(("A", 5L, 42L, 42L), ("A", 6L, 7L, 49L)))
    } finally q2.stop()

    // equivalence with the batch operator: real events split into TWO
    // micro-batches at the median timestamp (cents pre-converted with
    // the batch operator's DECIMAL cast; days arrive in ts order per
    // type, so only the straddled day upserts) — the last-write-wins
    // view must equal events_cum_share's (type, day, day_cents,
    // cum_cents) exactly
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem3 = MemoryStream[(String, Long, Long)]
    val q3 = EventStreams.cumShareStream(mem3.toDS())
      .toDF("event_type", "day", "day_cents", "cum_cents")
      .writeStream.format("memory").queryName("cum_eq").outputMode("append").start()
    try {
      mem3.addData(first.toSeq); q3.processAllAvailable()
      mem3.addData(second.toSeq); q3.processAllAvailable()
      val streamed = spark.table("cum_eq").groupBy("event_type", "day")
        .agg(max("day_cents").as("day_cents"), max("cum_cents").as("cum_cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = graft.operators.Growth.eventsCumShare(spark, sfDir)
        .select("event_type", "day", "day_cents", "cum_cents")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
    } finally q3.stop()
  }

  test("stream_daily_topk: latest emission per key == batch top-3 under any split") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: batch 2 delivers a value that displaces rank 2, and a
    // tie on value that must break on the smaller event_id
    val mem = MemoryStream[(String, Long, Long, Double)]
    val q = EventStreams.dailyTopkStream(mem.toDS())
      .toDF("event_type", "day", "upd", "rk", "event_id", "value")
      .writeStream.format("memory").queryName("tk").outputMode("append").start()
    try {
      mem.addData(("A", 0L, 1L, 5.0), ("A", 0L, 2L, 3.0))
      q.processAllAvailable()
      mem.addData(("A", 0L, 3L, 4.0), ("A", 0L, 4L, 5.0))
      q.processAllAvailable()
      val latest = spark.table("tk").groupBy("event_type", "day", "rk")
        .agg(max(struct(col("upd"), col("event_id"), col("value"))).as("b"))
        .select(col("rk"), col("b.event_id"), col("b.value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest == Set((1L, 1L, 5.0), (2L, 4L, 5.0), (3L, 3L, 4.0)), s"got $latest")
    } finally q.stop()

    // equivalence on the real events table, median split
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        col("event_id"), col("value"), col("ts_us"))
      .as[(String, Long, Long, Double, Long)].collect().sortBy(_._5)
      .map(r => (r._1, r._2, r._3, r._4))
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(String, Long, Long, Double)]
    val q2 = EventStreams.dailyTopkStream(mem2.toDS())
      .toDF("event_type", "day", "upd", "rk", "event_id", "value")
      .writeStream.format("memory").queryName("tk_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val rows = spark.table("tk_eq").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
      val lastUpd = rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
      val streamed = rows.filter(r => r._3 == lastUpd((r._1, r._2)))
        .map(r => (r._1, r._2, r._4, r._5, r._6)).toSet
      val batch = graft.operators.EventsMore.eventsDailyTopk(spark, sfDir)
        .select("event_type", "day", "rk", "event_id", "value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_hll_sliding: register table converges to the batch daily sketch under any split") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def reg(user: Long): (Long, Int) = {
      val m = graft.operators.Sketches.HllM
      val wb = graft.operators.Sketches.HllWBits
      val h = graft.functions.HashKernels.mix31(graft.functions.HashKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(user.toString)))
      val w = h / m
      (h % m, if (w == 0L) wb + 1 else wb + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w)))
    }
    // hand case: same user twice (idempotent), two users across batches
    val mem = MemoryStream[(Long, Long)]
    val q = EventStreams.hllDailyStream(mem.toDS())
      .toDF("day", "bucket", "upd", "mr")
      .writeStream.format("memory").queryName("hll").outputMode("append").start()
    try {
      mem.addData((0L, 7L), (0L, 7L)); q.processAllAvailable()
      mem.addData((0L, 11L)); q.processAllAvailable()
      val latest = spark.table("hll").groupBy("day", "bucket")
        .agg(max(struct(col("upd"), col("mr"))).as("b"))
        .select(col("day"), col("bucket"), col("b.mr"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val (b7, r7) = reg(7L)
      val (b11, r11) = reg(11L)
      val expected =
        if (b7 == b11) Set((0L, b7, math.max(r7, r11)))
        else Set((0L, b7, r7), (0L, b11, r11))
      assert(latest == expected, s"got $latest expected $expected")
    } finally q.stop()

    // equivalence on the real events table, median split: the final
    // register table must equal a driver recount, and its window merge
    // must reproduce the batch operator's sketch internals exactly
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"), col("ts_us"))
      .as[(Long, Long, Long)].collect().sortBy(_._3).map(r => (r._1, r._2))
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long)]
    val q2 = EventStreams.hllDailyStream(mem2.toDS())
      .toDF("day", "bucket", "upd", "mr")
      .writeStream.format("memory").queryName("hll_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("hll_eq").groupBy("day", "bucket")
        .agg(max(struct(col("upd"), col("mr"))).as("b"))
        .select(col("day"), col("bucket"), col("b.mr"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val expected = ev.map { case (d, u) => val (b, r) = reg(u); (d, b) -> r }
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(streamed == expected, "register table diverged from recount")
      // read-time window merge == the batch operator's internals
      val m = graft.operators.Sketches.HllM
      val wb = graft.operators.Sketches.HllWBits
      val days = streamed.keySet.map(_._1)
      val batch = graft.operators.Sketches.sketchHllSliding(spark, sfDir).collect()
      assert(batch.nonEmpty)
      batch.foreach { r =>
        val end = r.getAs[java.sql.Date]("window_end").toLocalDate.toEpochDay
        val win = streamed.filter { case ((d, _), _) => d >= end - 6 && d <= end }
        val merged = win.groupBy(_._1._2).view.mapValues(_.values.max).toMap
        assert(r.getAs[Long]("n_present") == merged.size.toLong, s"window $end n_present")
        val num = merged.values.map(mr => 1L << (wb + 1 - mr)).sum +
          (m.toLong - merged.size) * (1L << (wb + 1))
        assert(r.getAs[Long]("numerator") == num, s"window $end numerator")
        assert(days.exists(d => d >= end - 6 && d <= end))
      }
      // state-size contract: ONE record per OCCUPIED (day, bucket) key,
      // never per event/user — ≤ 512 registers per day regardless of
      // traffic. A state-growth regression fails here instead of
      // OOMing a 100× run.
      val stateRows = q2.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      assert(stateRows == expected.size.toLong,
        s"state rows $stateRows != occupied registers ${expected.size}")
      assert(stateRows <= 512L * days.size,
        s"state rows $stateRows exceed 512/day × ${days.size} days")
    } finally q2.stop()
  }

  test("stream_srm: late-arriving earlier exposure revises the arm; sums == batch census") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: user 1's view arrives first, then a click with an
    // EARLIER timestamp lands late — the twin must emit a correction
    // (-1 view, +1 click), never double-count
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = EventStreams.srmStream(mem.toDS())
      .toDF("arm", "d")
      .writeStream.format("memory").queryName("srm").outputMode("append").start()
    try {
      mem.addData((1L, 100L, 10L, "view"), (2L, 50L, 5L, "click"))
      q.processAllAvailable()
      mem.addData((1L, 40L, 4L, "click"), (1L, 200L, 20L, "view"))
      q.processAllAvailable()
      val sums = spark.table("srm").groupBy("arm").agg(sum("d").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sums == Map("click" -> 2L, "view" -> 0L), s"got $sums")
    } finally q.stop()

    // equivalence on the real events table, median split
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._2, r._3))
    val (w1, w2) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, Long, Long, String)]
    val q2 = EventStreams.srmStream(mem2.toDS())
      .toDF("arm", "d")
      .writeStream.format("memory").queryName("srm_eq").outputMode("append").start()
    try {
      mem2.addData(w1.toSeq); q2.processAllAvailable()
      mem2.addData(w2.toSeq); q2.processAllAvailable()
      val sums = spark.table("srm_eq").groupBy("arm").agg(sum("d").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.operators.AnalyticsMore.eventsSrm(spark, sfDir).collect().head
      assert(sums.getOrElse("click", 0L) == batch.getAs[Long]("n_click"))
      assert(sums.getOrElse("view", 0L) == batch.getAs[Long]("n_view"))
      // state-size contract: ONE first-exposure record per user, never
      // per event — a regression to per-event state fails here
      val stateRows = q2.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      val nUsers = ev.map(_._1).distinct.length.toLong
      assert(stateRows == nUsers, s"state rows $stateRows != users $nUsers")
    } finally q2.stop()
  }

  test("stream_abtest: delta rows rebuild the batch 2x2 cells under any split") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case crossing the boundary BOTH ways: user 1 converts after
    // exposure (click credited at purchase time), user 2 converts
    // before exposure (view arrives carrying the conversion)
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.abtestStream(mem.toDS())
      .toDF("exposure_type", "d_users", "d_conv")
      .writeStream.format("memory").queryName("ab").outputMode("append").start()
    try {
      mem.addData((1L, "click"), (2L, "purchase"))
      q.processAllAvailable()
      mem.addData((1L, "purchase"), (2L, "view"), (1L, "click"))
      q.processAllAvailable()
      val got = spark.table("ab").groupBy("exposure_type")
        .agg(sum("d_users").as("u"), sum("d_conv").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(("<all>", 2L, 2L), ("click", 1L, 1L), ("view", 1L, 1L)),
        s"got $got")
    } finally q.stop()

    // equivalence: summed deltas == batch events_abtest cells on the
    // real events table split at the median timestamp
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .as[(Long, String, Long)].collect().sortBy(_._3)
      .map(r => (r._1, r._2))
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.abtestStream(mem2.toDS())
      .toDF("exposure_type", "d_users", "d_conv")
      .writeStream.format("memory").queryName("ab_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val cells = spark.table("ab_eq").groupBy("exposure_type")
        .agg(sum("d_users").as("u"), sum("d_conv").as("c"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = graft.operators.AnalyticsMore.eventsAbtest(spark, sfDir).collect()
      val (nAll, convAll) = (batch.head.getAs[Long]("n_treat") + batch.head.getAs[Long]("n_ctrl"),
        batch.head.getAs[Long]("conv_treat") + batch.head.getAs[Long]("conv_ctrl"))
      assert(cells("<all>") == ((nAll, convAll)))
      batch.foreach { r =>
        assert(cells(r.getString(0)) ==
          ((r.getAs[Long]("n_treat"), r.getAs[Long]("conv_treat"))),
          s"${r.getString(0)}: cells diverge")
      }
    } finally q2.stop()
  }

  test("stream_rolling_anomaly: silent days score as real zeros, LWW view == batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: day 0 holds 3 events, then a jump to day 8 across the
    // batch boundary — day 7 is the first full-window axis day and must
    // be scored as a ZERO (baseline still carries day 0's mass, no
    // flag); day 8's window is all-zero, so its single event is an
    // anomaly; a second day-8 event re-emits with the same window
    val mem = MemoryStream[(String, Long)]
    val q = EventStreams.rollingAnomalyStream(mem.toDS())
      .toDF("event_type", "day", "n_so_far", "win_sum", "is_anomaly")
      .writeStream.format("memory").queryName("ra").outputMode("append").start()
    try {
      mem.addData(("A", 0L), ("A", 0L), ("A", 0L))
      q.processAllAvailable()
      mem.addData(("A", 8L))
      q.processAllAvailable()
      mem.addData(("A", 8L))
      q.processAllAvailable()
      val got = spark.table("ra").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == Set(("A", 7L, 0L, 3L, 0L), ("A", 8L, 1L, 0L, 1L), ("A", 8L, 2L, 0L, 1L)),
        s"got $got")
    } finally q.stop()

    // equivalence: the real events table, ts-ordered, split at the
    // median — the last-write-wins view must equal the batch operator
    // row for row (n_so_far monotone per day ⇒ max struct is the LWW)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_us"))
      .as[(String, Long)].collect().sortBy(_._2)
      .map { case (t, ts) => (t, ts / 86400000000L) }
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(String, Long)]
    val q2 = EventStreams.rollingAnomalyStream(mem2.toDS())
      .toDF("event_type", "day", "n_so_far", "win_sum", "is_anomaly")
      .writeStream.format("memory").queryName("ra_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("ra_eq").groupBy("event_type", "day")
        .agg(max(struct(col("n_so_far"), col("win_sum"), col("is_anomaly"))).as("b"))
        .select(col("event_type"), col("day"), col("b.n_so_far").as("n_events"),
          col("b.win_sum"), col("b.is_anomaly"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val batch = graft.operators.EventsMore.eventsRollingAnomaly(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(streamed == batch,
        s"stream-only=${streamed -- batch}, batch-only=${batch -- streamed}")
      // state stays one fixed-width record per type — never history-sized
      val stateRows = q2.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      val nTypes = ev.map(_._1).distinct.length.toLong
      assert(stateRows <= nTypes, s"state rows $stateRows exceed type count $nTypes")
    } finally q2.stop()
  }

  test("stream_forecast: lag-7 pairs complete at first emission, rollup == batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: day 10 pairs with day 3 (count 2); day 10 grows across
    // the boundary and re-emits with the SAME prediction; day 11 has no
    // lag-7 partner (gap at 4) and must emit nothing
    val mem = MemoryStream[(String, Long)]
    val q = EventStreams.forecastStream(mem.toDS())
      .toDF("event_type", "day", "n_so_far", "n_pred")
      .writeStream.format("memory").queryName("fc").outputMode("append").start()
    try {
      mem.addData(("A", 3L), ("A", 3L), ("A", 10L))
      q.processAllAvailable()
      mem.addData(("A", 10L), ("A", 11L))
      q.processAllAvailable()
      val got = spark.table("fc").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(("A", 10L, 1L, 2L), ("A", 10L, 2L, 2L)), s"got $got")
    } finally q.stop()

    // equivalence: per-type day rows in ts order, split at the median —
    // the last-write-wins view re-aggregated per type must equal batch
    // events_forecast's error-mass columns exactly
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_us"))
      .as[(String, Long)].collect().sortBy(_._2)
      .map { case (t, ts) => (t, ts / 86400000000L) }
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(String, Long)]
    val q2 = EventStreams.forecastStream(mem2.toDS())
      .toDF("event_type", "day", "n_so_far", "n_pred")
      .writeStream.format("memory").queryName("fc_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("fc_eq").groupBy("event_type", "day")
        .agg(max(struct(col("n_so_far"), col("n_pred"))).as("b"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("b.n_so_far").as("sum_actual"),
          sum(expr("abs(b.n_so_far - b.n_pred)")).as("sum_abs_err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = graft.operators.EventsMore.eventsForecast(spark, sfDir)
        .select("event_type", "n_days", "sum_actual", "sum_abs_err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("stream_ohlc: late pre-open row replaces the open, == batch events_ohlc") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: bucket 0 of type A straddles the boundary; batch 2
    // delivers a row EARLIER than the carried open (t=5 < 10) which
    // must replace the open, and a later close (t=40) which must
    // replace the close; high/low track all four
    val mem = MemoryStream[(String, Long, Long, Long, Double)]
    val q = EventStreams.ohlcStream(mem.toDS())
      .toDF("event_type", "hour_bucket", "open", "high", "low", "close", "n")
      .writeStream.format("memory").queryName("ohlc").outputMode("append").start()
    try {
      mem.addData(("A", 0L, 10L, 1L, 3.0), ("A", 0L, 20L, 2L, 9.0))
      q.processAllAvailable()
      mem.addData(("A", 0L, 5L, 3L, 7.0), ("A", 0L, 40L, 4L, 1.0))
      q.processAllAvailable()
      val got = spark.table("ohlc").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      assert(got == Set(
        ("A", 0L, 3.0, 9.0, 3.0, 9.0, 2L),
        ("A", 0L, 7.0, 9.0, 1.0, 1.0, 4L)), s"got $got")
      // last-write-wins (max n per key) == the closed candle
      val lww = spark.table("ohlc").groupBy("event_type", "hour_bucket")
        .agg(max(struct(col("n"), col("open"), col("high"), col("low"), col("close"))).as("b"))
        .select(col("b.open"), col("b.high"), col("b.low"), col("b.close"), col("b.n"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
      assert(lww == Set((7.0, 9.0, 1.0, 1.0, 4L)))
    } finally q.stop()

    // equivalence: real events split into two micro-batches at the
    // median timestamp — the max-n view of the upserts must equal the
    // batch candle table exactly (same (ts_us, event_id) tiebreak)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts_us div 3600000000").as("hour_bucket"),
        col("ts_us"), col("event_id"), col("value"))
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._3)
    val (first, second) = ev.splitAt(ev.length / 2)
    val mem2 = MemoryStream[(String, Long, Long, Long, Double)]
    val q2 = EventStreams.ohlcStream(mem2.toDS())
      .toDF("event_type", "hour_bucket", "open", "high", "low", "close", "n")
      .writeStream.format("memory").queryName("ohlc_eq").outputMode("append").start()
    try {
      mem2.addData(first.toSeq); q2.processAllAvailable()
      mem2.addData(second.toSeq); q2.processAllAvailable()
      val streamed = spark.table("ohlc_eq").groupBy("event_type", "hour_bucket")
        .agg(max(struct(col("n"), col("open"), col("high"), col("low"), col("close"))).as("b"))
        .select(col("event_type"), col("hour_bucket"), col("b.open"), col("b.high"),
          col("b.low"), col("b.close"), col("b.n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      val batch = graft.operators.Queries.eventsOhlc(spark, sfDir)
        .select(col("event_type"), col("hour_bucket"), col("open"), col("high"),
          col("low"), col("close"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }
  test("stream_quota: hash-rank admission is arrival-order independent; audit == batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: q=2, three docs arrive in an order where the LAST one
    // has the smallest hash rank — it must displace an earlier
    // admission (first-come-first-kept would get this wrong); the
    // audit row after each batch carries the current frontier
    def h(id: Long) = graft.operators.Corpus.mixHashJvm(id, 1000000007L)
    val ids = (1L to 50L).sortBy(h).take(3) // three smallest-rank ids
    val (best, mid, worst) = (ids(0), ids(1), ids(2))
    val mem = MemoryStream[(Long, String, Long)]
    val q = EventStreams.quotaStream(mem.toDS(), 2)
      .toDF("source", "n_seen", "n_kept", "sum_kept_ids", "kept_chars")
      .writeStream.format("memory").queryName("quota").outputMode("append").start()
    try {
      mem.addData((mid, "s", 10L), (worst, "s", 20L))
      q.processAllAvailable()
      mem.addData((best, "s", 30L))
      q.processAllAvailable()
      val last = spark.table("quota").orderBy(col("n_seen").desc).collect().head
      assert(last.getAs[Long]("n_seen") == 3L && last.getAs[Long]("n_kept") == 2L)
      assert(last.getAs[Long]("sum_kept_ids") == best + mid,
        s"late best-rank doc did not displace: kept sum ${last.getAs[Long]("sum_kept_ids")} != ${best + mid}")
      assert(last.getAs[Long]("kept_chars") == 40L)
    } finally q.stop()

    // equivalence on the real documents table under a median split: the
    // last-write-wins (max n_seen) view must equal corpus_quota_sample's
    // kept columns exactly — the min-q frontier is order-independent
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val (w1, w2) = docs.splitAt(docs.length / 2)
    val mem2 = MemoryStream[(Long, String, Long)]
    val q2 = EventStreams.quotaStream(mem2.toDS(), graft.operators.Corpus.QuotaPerSource.toInt)
      .toDF("source", "n_seen", "n_kept", "sum_kept_ids", "kept_chars")
      .writeStream.format("memory").queryName("quota_eq").outputMode("append").start()
    try {
      mem2.addData(w2.toSeq); q2.processAllAvailable() // reversed halves on purpose
      mem2.addData(w1.toSeq); q2.processAllAvailable()
      val streamed = spark.table("quota_eq").groupBy("source")
        .agg(max(struct(col("n_seen"), col("n_kept"), col("sum_kept_ids"), col("kept_chars"))).as("b"))
        .select(col("source"), col("b.n_seen"), col("b.n_kept"), col("b.sum_kept_ids"), col("b.kept_chars"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val batch = graft.operators.Corpus.corpusQuotaSample(spark, sfDir)
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("sum_kept_ids"), r.getAs[Long]("kept_chars"))).toMap
      assert(streamed == batch, "streamed quota audit != batch corpus_quota_sample")
      // state-size contract: ONE frontier record per source (each ≤ q
      // entries), never doc-count-sized
      val stateRows = q2.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      assert(stateRows == batch.size.toLong,
        s"state rows $stateRows != sources ${batch.size}")
    } finally q2.stop()
  }

  test("stream_boilerplate: monotone census counters rebuild the batch flagged set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // hand case: a line crosses the 50% bar only in the SECOND batch.
    // batch 1: docs 1,2 both carry line 100 (df=2, n=2 → df under the
    // floor of 3, not flagged); batch 2: doc 3 carries it too, doc 4
    // doesn't (df=3, n=4 → 3≥3 and 300≥200 → flagged). Docs 1 and 3
    // each REPEAT line 100 (the consecutive-blank-lines case): df
    // counts distinct DOCS, so the repeats must not inflate it.
    val memL = MemoryStream[(String, Long, Long)]
    val memD = MemoryStream[(String, Long)]
    val qL = EventStreams.boilerplateStream(memL.toDS())
      .toDF("source", "line_fp", "df")
      .writeStream.format("memory").queryName("boiler_df").outputMode("append").start()
    val qD = EventStreams.docCountStream(memD.toDS())
      .toDF("source", "n_docs")
      .writeStream.format("memory").queryName("boiler_nd").outputMode("append").start()
    def flaggedView(dfTable: String, ndTable: String): Set[(String, Long, Long, Long)] =
      spark.table(dfTable).groupBy("source", "line_fp").agg(max("df").as("df"))
        .join(spark.table(ndTable).groupBy("source").agg(max("n_docs").as("n_docs")), Seq("source"))
        .filter(col("df") >= graft.operators.CorpusClean.BoilerMinDf &&
          col("df") * 100 >= col("n_docs") * graft.operators.CorpusClean.BoilerSharePct)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    try {
      memL.addData(("s", 100L, 1L), ("s", 100L, 1L), ("s", 100L, 2L),
        ("s", 7L, 1L), ("s", 8L, 2L))
      memD.addData(("s", 1L), ("s", 2L))
      qL.processAllAvailable(); qD.processAllAvailable()
      assert(flaggedView("boiler_df", "boiler_nd").isEmpty, "flagged too early (df floor)")
      memL.addData(("s", 100L, 3L), ("s", 100L, 3L), ("s", 9L, 3L), ("s", 10L, 4L))
      memD.addData(("s", 3L), ("s", 4L))
      qL.processAllAvailable(); qD.processAllAvailable()
      // df = 3 DISTINCT docs (the intra-doc repeats in docs 1 and 3
      // count once), not 5 line occurrences
      assert(flaggedView("boiler_df", "boiler_nd") == Set(("s", 100L, 3L, 4L)))
    } finally { qL.stop(); qD.stop() }

    // equivalence on the real documents table (planted line structure,
    // the batch operator's own frame) under a median split of doc_ids
    val lineRows = graft.operators.CorpusClean.lines(spark, sfDir)
      .select(col("doc_id"), col("source"), col("line_fp"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val docRows = graft.operators.CorpusClean.lined(spark, sfDir)
      .select(col("source"), col("doc_id"))
      .as[(String, Long)].collect().sortBy(_._2)
    val medianId = docRows(docRows.length / 2)._2
    val memL2 = MemoryStream[(String, Long, Long)]
    val memD2 = MemoryStream[(String, Long)]
    val qL2 = EventStreams.boilerplateStream(memL2.toDS())
      .toDF("source", "line_fp", "df")
      .writeStream.format("memory").queryName("boiler_df_eq").outputMode("append").start()
    val qD2 = EventStreams.docCountStream(memD2.toDS())
      .toDF("source", "n_docs")
      .writeStream.format("memory").queryName("boiler_nd_eq").outputMode("append").start()
    try {
      // reversed halves on purpose — the counters are order-independent
      memL2.addData(lineRows.filter(_._1 >= medianId).map(r => (r._2, r._3, r._1)).toSeq)
      memD2.addData(docRows.filter(_._2 >= medianId).toSeq)
      qL2.processAllAvailable(); qD2.processAllAvailable()
      memL2.addData(lineRows.filter(_._1 < medianId).map(r => (r._2, r._3, r._1)).toSeq)
      memD2.addData(docRows.filter(_._2 < medianId).toSeq)
      qL2.processAllAvailable(); qD2.processAllAvailable()
      val streamed = flaggedView("boiler_df_eq", "boiler_nd_eq")
      val batch = graft.operators.CorpusClean.textBoilerplate(spark, sfDir)
        .select("source", "line_fp", "df", "n_docs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch, "streamed boilerplate census != batch text_boilerplate")
      // state-size contract: one row per DISTINCT (source, line) — the
      // batch census' own shuffle cardinality, never corpus-line-sized
      val stateRows = qL2.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      val distinctLines = lineRows.map(r => (r._2, r._3)).distinct.length.toLong
      assert(stateRows == distinctLines,
        s"state rows $stateRows != distinct (source, line) $distinctLines")
    } finally { qL2.stop(); qD2.stop() }
  }

  test("stream_kll: chunked compactor state meets the batch rank-error bar under any split") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val cap = operators.Sketches.KllCapacity
    val items = sources.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
        col("event_id").as("tie"), lit(0L).as("lvl"))
      .as[(String, Long, Long, Long)].collect()
    val exact = items.groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    val nByType = items.groupBy(_._1).map { case (t, vs) => t -> vs.length.toLong }

    // the merge bar from OperatorInvariantSpec's split-merge grade:
    // rank error ≤ 2× the state's top weight for every graded quantile
    // (chunked arrival = repeated union + re-compact = repeated merge)
    def runSplit(name: String, batches: Seq[Seq[(String, Long, Long, Long)]]): Unit = {
      val mem = MemoryStream[(String, Long, Long, Long)]
      val q = EventStreams.kllStream(mem.toDS())
        .toDF("event_type", "ver", "cents", "tie", "lvl")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        val rows = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        // final sketch = the max-ver slice per group
        val state = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
          val vmax = rs.map(_._2).max
          rs.filter(_._2 == vmax).toSeq
        }
        state.groupBy(r => (r._1, r._5)).foreach { case ((t, lvl), rs) =>
          assert(rs.size <= cap, s"$name $t lvl $lvl: buffer over capacity") }
        state.groupBy(_._1).foreach { case (t, rs) =>
          assert(rs.map(r => 1L << r._5.toInt).sum == nByType(t), s"$name $t: weight mass")
          val sorted = rs.sortBy(r => (r._3, r._4))
          val wmax = rs.map(r => 1L << r._5.toInt).max
          val n = nByType(t)
          operators.Sketches.KllQuantilesPpm.foreach { qppm =>
            val target = (n * qppm + 999999L) / 1000000L
            var cum = 0L
            val est = sorted.find { r => cum += 1L << r._5.toInt; cum >= target }.get._3
            val vs = exact(t)
            val lo = vs.count(_ < est) + 1L
            val hi = vs.count(_ <= est).toLong
            val err = if (target >= lo && target <= hi) 0L
              else math.min(math.abs(target - lo), math.abs(target - hi))
            assert(err <= 2L * wmax,
              s"$name $t q=$qppm: rank error $err exceeds 2x top weight $wmax")
          }
        }
        // state-size contract: the keyed state is the compacted sketch,
        // capacity + capacity·log₂(n) items per group — never corpus-sized
        val stateRows = q.recentProgress.flatMap(_.stateOperators)
          .map(_.numRowsTotal).max
        assert(stateRows == nByType.size.toLong,
          s"$name: state rows $stateRows != groups ${nByType.size}")
      } finally q.stop()
    }
    val med = items.map(_._3).sorted.apply(items.length / 2)
    runSplit("kll_median",
      Seq(items.filter(_._3 < med).toSeq, items.filter(_._3 >= med).toSeq))
    runSplit("kll_resplit",
      Seq(0L, 1L, 2L).map(p => items.filter(r => math.floorMod(r._3, 3L) == p).toSeq))
  }

  test("restart harness: index-carrying twins recover the corpus index from checkpoint") {
    // the A/B crash-between-waves harness applied to the seven twins
    // whose keyed state IS the production corpus index (LSH band
    // buckets, containment print postings, boilerplate df counters,
    // per-video frame frontier, per-source quota frontier, the KLL
    // compactor, semantic vector postings): a recovery
    // bug there silently re-admits duplicates after a crash — a
    // deployment correctness bug, not a latency one. Wave 2's probes /
    // increments only produce the right rows if wave 1's index state
    // came back from the checkpoint; the uninterrupted run is the
    // ground truth, and the multisets must match EXACTLY.
    implicit val s = spark
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.DataFrame
    import graft.functions.PortableHash._
    import graft.streaming.EventStreams.{ContainPrintRow, LshBandRow}
    graft.expressions.GraftFunctions.register(spark)

    val d = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    def bandRows(docs: DataFrame, idCol: String, kind: Int): Seq[LshBandRow] =
      docs.select(col(idCol), expr(sparkMinhash(sparkShingleHashes("text"))).as("mh"))
        .select(col(idCol), explode(expr(s"sequence(0, ${MinhashBands - 1})")).as("b"), col("mh"))
        .select(col(idCol), col("b"), expr(sparkBandValue("mh", "b")).as("bv"), col("mh"))
        .collect().map(r => LshBandRow(kind, r.getLong(0), r.getInt(1), r.getLong(2),
          r.getSeq[Long](3)))
    def printRows(docs: DataFrame, idCol: String, kind: Int): Seq[ContainPrintRow] =
      docs.select(col(idCol),
          expr(operators.Dedup.sparkWinnowPrints("text")).as("prs"),
          expr(s"array_distinct(${sparkShingleHashes("text")})").as("sh"))
        .select(col(idCol), explode(col("prs")).as("pr"), col("sh"))
        .collect().map(r => ContainPrintRow(kind, r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    // probes = the incremental operators' own planted batches (tail
    // edits, digest composites, reversed docs) over the subset corpus
    val lshProbeDocs = d.filter(pmod(col("doc_id"), lit(10)) === 4)
      .select((col("doc_id") + operators.Dedup.NearBatchShift).as("new_id"),
        concat(col("text"), lit(" appendix")).as("text"))
    val contProbeDocs = d.filter(pmod(col("doc_id"), lit(10)) === 6)
      .join(d.select(col("doc_id").as("id1"), col("text").as("t1")),
        col("id1") === col("doc_id") + 1)
      .join(d.select(col("doc_id").as("id2"), col("text").as("t2")),
        col("id2") === col("doc_id") + 2)
      .select((col("doc_id") + operators.Dedup.ContainBatchShift).as("new_id"),
        concat_ws(" ", col("text"), col("t1"), col("t2")).as("text"))
    val lshIdx = bandRows(d, "doc_id", 0)
    val lshProbes = bandRows(lshProbeDocs, "new_id", 1)
    val contIdx = printRows(d, "doc_id", 0)
    val contProbes = printRows(contProbeDocs, "new_id", 1)
    assert(lshIdx.nonEmpty && lshProbes.nonEmpty && contIdx.nonEmpty && contProbes.nonEmpty)
    // wave 1 carries HALF the index + half the probes; wave 2's probes
    // hit wave-1 index entries only via the recovered state store
    def halves[T](xs: Seq[T], key: T => Long): (Seq[T], Seq[T]) = {
      val med = xs.map(key).sorted.apply(xs.size / 2)
      xs.partition(x => key(x) < med)
    }
    val (li1, li2) = halves[LshBandRow](lshIdx, _.id)
    val (lp1, lp2) = halves[LshBandRow](lshProbes, _.id)
    val (ci1, ci2) = halves[ContainPrintRow](contIdx, _.id)
    val (cp1, cp2) = halves[ContainPrintRow](contProbes, _.id)

    val lineRows = graft.operators.CorpusClean.lines(spark, sfDir)
      .select(col("doc_id"), col("source"), col("line_fp"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val lineMed = lineRows(lineRows.length / 2)._1
    val vbase = graft.operators.Video.encodeVideos(spark, sfDir)
      .filter(_.doc_id < 60)
    val frames = graft.operators.Video
      .aHashLoHi(vbase.union(graft.operators.Video.freezeFrameCopies(vbase)))
      .as[(Long, Int, Long, Long)].collect()
    val (f1, f2) = frames.partition(_._2 < 2)
    assert(f2.nonEmpty, "scene split produced no boundary-spanning frames")
    val qdocs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val (qd1, qd2) = qdocs.splitAt(qdocs.length / 2)
    // kll: a wave-2 chunk only compacts correctly against the carried
    // sketch state — the mergeable-sketch index the crash must not lose
    val kllItems = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
        col("event_id").as("tie"), lit(0L).as("lvl"))
      .as[(String, Long, Long, Long)].collect()
    val kllMed = kllItems.map(_._3).sorted.apply(kllItems.length / 2)
    // semantic: a wave-2 paraphrase probe only rejects if wave 1's
    // vector postings came back from the checkpoint
    import graft.streaming.EventStreams.SemPostRow
    val svecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr(graft.functions.VectorFns.sparkToDouble("embedding")).as("v"))
      .filter(col("vec_id") < 200)
    def semRows(frame: org.apache.spark.sql.DataFrame, idCol: String,
        kind: Int): Seq[SemPostRow] =
      graft.operators.Similarity.semanticPostings(svecs, frame, idCol)
        .collect().map(r => SemPostRow(kind, r.getLong(0), r.getInt(1),
          r.getLong(2), r.getSeq[Double](3)))
    val semIdx = semRows(svecs, "vec_id", 0)
    val semProbes = semRows(
      graft.operators.Similarity.semanticPlantBatch(svecs), "new_id", 1)
    assert(semIdx.nonEmpty && semProbes.nonEmpty)
    val (si1, si2) = halves[SemPostRow](semIdx, _.id)
    val (sp1, sp2) = halves[SemPostRow](semProbes, _.id)

    val cases: Seq[(String, String, DataFrame, DataFrame, DataFrame => DataFrame)] = Seq(
      ("dedup_lsh", "kind INT, id LONG, b INT, bv LONG, mh ARRAY<LONG>",
        (li1 ++ lp1).toDF(), (li2 ++ lp2).toDF(),
        (df: DataFrame) => EventStreams.dedupLshStream(df.as[LshBandRow])
          .toDF("new_id", "cand", "matches")),
      ("dedup_containment", "kind INT, id LONG, pr LONG, sh ARRAY<LONG>",
        (ci1 ++ cp1).toDF(), (ci2 ++ cp2).toDF(),
        (df: DataFrame) => EventStreams.dedupContainmentStream(df.as[ContainPrintRow])
          .toDF("new_id", "cand", "i")),
      ("boilerplate", "source STRING, line_fp LONG, doc_id LONG",
        lineRows.filter(_._1 < lineMed).map(r => (r._2, r._3, r._1)).toSeq
          .toDF("source", "line_fp", "doc_id"),
        lineRows.filter(_._1 >= lineMed).map(r => (r._2, r._3, r._1)).toSeq
          .toDF("source", "line_fp", "doc_id"),
        (df: DataFrame) => EventStreams.boilerplateStream(df.as[(String, Long, Long)])
          .toDF("source", "line_fp", "df")),
      ("scene_cut", "doc_id LONG, frame_idx INT, ahash_lo LONG, ahash_hi LONG",
        f1.toSeq.toDF("doc_id", "frame_idx", "ahash_lo", "ahash_hi"),
        f2.toSeq.toDF("doc_id", "frame_idx", "ahash_lo", "ahash_hi"),
        (df: DataFrame) => EventStreams.sceneCutStream(df.as[(Long, Int, Long, Long)])
          .toDF("doc_id", "frame_idx", "hamming_bits", "is_cut")),
      ("quota", "doc_id LONG, source STRING, n_chars LONG",
        qd1.toSeq.toDF("doc_id", "source", "n_chars"),
        qd2.toSeq.toDF("doc_id", "source", "n_chars"),
        (df: DataFrame) => EventStreams.quotaStream(
          df.as[(Long, String, Long)], graft.operators.Corpus.QuotaPerSource.toInt)
          .toDF("source", "n_seen", "n_kept", "sum_kept_ids", "kept_chars")),
      ("kll", "event_type STRING, cents LONG, tie LONG, lvl LONG",
        kllItems.filter(_._3 < kllMed).toSeq
          .toDF("event_type", "cents", "tie", "lvl"),
        kllItems.filter(_._3 >= kllMed).toSeq
          .toDF("event_type", "cents", "tie", "lvl"),
        (df: DataFrame) => EventStreams.kllStream(df.as[(String, Long, Long, Long)])
          .toDF("event_type", "ver", "cents", "tie", "lvl")),
      ("dedup_semantic", "kind INT, id LONG, space INT, key LONG, v ARRAY<DOUBLE>",
        (si1 ++ sp1).toDF(), (si2 ++ sp2).toDF(),
        (df: DataFrame) => EventStreams.dedupSemanticStream(df.as[SemPostRow])
          .toDF("new_id", "cand", "cos_ppm")))

    cases.foreach { case (name, schema, b1, b2, twin) =>
      val root = Files.createTempDirectory(s"graft-index-restart-$name").toString
      def run(in: String, out: String, ck: String) =
        twin(spark.readStream.schema(schema).json(in))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck).outputMode("append").start()
      // A: both waves inside one query lifetime
      b1.coalesce(1).write.mode("append").json(s"$root/inA")
      val qa = run(s"$root/inA", s"$root/outA", s"$root/ckA")
      try {
        qa.processAllAvailable()
        b2.coalesce(1).write.mode("append").json(s"$root/inA")
        qa.processAllAvailable()
      } finally qa.stop()
      // B: "crash" between the waves, restart from checkpoint
      b1.coalesce(1).write.mode("append").json(s"$root/inB")
      val qb1 = run(s"$root/inB", s"$root/outB", s"$root/ckB")
      try qb1.processAllAvailable() finally qb1.stop()
      b2.coalesce(1).write.mode("append").json(s"$root/inB")
      val qb2 = run(s"$root/inB", s"$root/outB", s"$root/ckB")
      try qb2.processAllAvailable() finally qb2.stop()

      val a = spark.read.parquet(s"$root/outA").collect().map(_.toString).sorted.toSeq
      val b = spark.read.parquet(s"$root/outB").collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$name: harness produced no rows")
      assert(a == b,
        s"$name: restarted run diverges from uninterrupted run (${a.length} vs ${b.length} rows)")
    }
  }

  test("stream_scene_cut: boundary-spanning transitions from carried state == batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // the batch operator's own frame universe: corpus ∪ freeze plants
    val base = graft.operators.Video.encodeVideos(spark, sfDir)
    val frames = graft.operators.Video
      .aHashLoHi(base.union(graft.operators.Video.freezeFrameCopies(base)))
      .as[(Long, Int, Long, Long)].collect()
    // split at frame_idx 2: every 3-4 frame video's later transitions
    // must compute against state carried across the batch boundary
    val (w1, w2) = frames.partition(_._2 < 2)
    assert(w2.nonEmpty, "split produced no boundary-spanning frames")
    val mem = MemoryStream[(Long, Int, Long, Long)]
    val q = EventStreams.sceneCutStream(mem.toDS())
      .toDF("doc_id", "frame_idx", "hamming_bits", "is_cut")
      .writeStream.format("memory").queryName("scenecut").outputMode("append").start()
    try {
      mem.addData(w1.toSeq); q.processAllAvailable()
      mem.addData(w2.toSeq); q.processAllAvailable()
      val streamed = spark.table("scenecut").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet
      val batch = graft.operators.Video.videoSceneCut(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet
      assert(streamed == batch, "streamed scene cuts != batch video_scene_cut")
      // state-size contract: ONE record per video, never frame-history-sized
      val stateRows = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      val nVideos = frames.map(_._1).distinct.length.toLong
      assert(stateRows == nVideos, s"state rows $stateRows != videos $nVideos")
    } finally q.stop()
  }
}
