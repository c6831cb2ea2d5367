package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch analytics (SURVEY §2
  * streaming rows): the same semantics as `events_window_agg` /
  * `events_sessionize` / `change_detect`, expressed over an unbounded
  * source with watermarks and typed state.
  *
  * These run identically on a real Kafka/file stream at cluster scale:
  * state lives in the state store keyed by (window,type) or user_id —
  * never on the driver.
  */
object EventStreams {

  /** tumbling 1-hour window per event_type with a 2-hour watermark —
    * streaming twin of the batch `events_window_agg`.
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** hopping (sliding) 60-minute window advancing every 15 minutes —
    * streaming twin of the batch `events_hop_window`. Native
    * `window(ts, "1 hour", "15 minutes")` assigns each event its 4
    * containing windows (the same ×4 fanout the batch twin explodes by
    * hand) and the watermark closes a window 2 hours after its end —
    * state is live-window-bounded, never stream-history-bounded.
    */
  def hopWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).as("sum_value_dec"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"),
        round(col("sum_value_dec"), 2).cast("double").as("sum_value"))

  /** stream-stream RANGE join with watermarks — the streaming twin of
    * the batch `events_range_join`: each error joins the same user's
    * clicks within the 5 minutes before it (LEFT OUTER, so click-less
    * errors still emit one null-click row once the watermark passes
    * them). The time bound living INSIDE the join condition is what
    * lets Spark evict state on both sides: a click older than
    * (watermark − 5 min) can never match a future error, so click
    * state is bounded by watermark + range width — never the stream
    * history. At scale both sides hash-partition on user_id once, the
    * same shuffle the batch twin does.
    */
  def rangeJoinStream(clicks: DataFrame, errors: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "10 minutes")
    val e = errors
      .select(col("user_id").as("e_user"), col("event_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "10 minutes")
    e.join(c,
      col("c_user") === col("e_user") &&
        col("c_ts") >= col("e_ts") - expr("INTERVAL 5 MINUTES") &&
        col("c_ts") < col("e_ts"),
      "leftOuter")
  }

  case class GapState(lastBucket: Long, recent: Map[Long, Long])

  /** Streaming gap fill: dense per-type bucket counts with explicit
    * zero rows for silent buckets — the streaming twin of the batch
    * events_gap_fill / EventOps.gapFill. State per type is the last
    * emitted bucket plus RUNNING counts for the trailing
    * `retainBuckets` buckets, so every emitted row — dense or late
    * correction — carries the CUMULATIVE count for its bucket, and the
    * last-write-wins view of the union of batch outputs (downstream
    * upserts by (type, bucket) key) is the same dense series no matter
    * where the micro-batch boundaries fall — including when one
    * bucket's events straddle a batch boundary (batch 1 emits (b, c1),
    * batch 2 re-emits (b, c1+c2), and the overwrite is correct; a
    * bare per-batch count here would silently undercount to c2).
    * State is bounded: `retainBuckets` longs per type, independent of
    * stream length. A correction OLDER than the retention horizon is
    * DROPPED, not emitted: the cumulative count for that bucket is
    * gone from state, and emitting the batch-local partial instead
    * would last-write-wins OVERWRITE a previously-correct value with a
    * smaller one — a silent regression, strictly worse than a gap.
    * Bound lateness with an upstream watermark (or widen
    * `retainBuckets`) when beyond-horizon data is possible.
    */
  def gapFillStream(events: Dataset[(String, Long)],
      bucketUs: Long = 3600000000L,
      retainBuckets: Int = 168): Dataset[(String, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .map { case (tpe, tsUs) => (tpe, tsUs / bucketUs) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long)], state: GroupState[GapState]) =>
          val counts = rows.map(_._2).toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val prev = state.getOption.getOrElse(GapState(Long.MinValue, Map.empty))
          val batchMax = counts.keys.max
          val newLast = math.max(prev.lastBucket, batchMax)
          val merged = counts.foldLeft(prev.recent) { case (m, (b, c)) =>
            m.updated(b, m.getOrElse(b, 0L) + c)
          }
          val emitFrom =
            if (prev.lastBucket == Long.MinValue) counts.keys.min
            else prev.lastBucket + 1
          val dense =
            if (batchMax < emitFrom) Iterator.empty
            else (emitFrom to batchMax).iterator.map(b => (tpe, b, merged.getOrElse(b, 0L)))
          // late buckets: emit the cumulative count when the retention
          // window still holds it; DROP beyond-horizon corrections
          // (their cumulative is lost — a batch-local partial would
          // overwrite a correct earlier emission under last-write-wins)
          val horizon =
            if (prev.lastBucket == Long.MinValue) Long.MinValue
            else prev.lastBucket - retainBuckets
          val corrections = counts.keys.filter(b => b < emitFrom && b > horizon)
            .toSeq.sorted.iterator.map(b => (tpe, b, merged(b)))
          state.update(GapState(newLast, merged.filter(_._1 > newLast - retainBuckets)))
          corrections ++ dense
      }
  }

  case class DwellState(lastUs: Long)

  /** Streaming twin of the batch `events_dwell`: per-user inter-event
    * gap rows, log2-bucketed by seconds, from ONE long of state per
    * user (the last seen timestamp). Emits (user, bucket, gap_s) per
    * event after the user's first — downstream aggregates buckets
    * incrementally, and the union of batch outputs equals the batch
    * operator's gap set no matter where micro-batch boundaries fall
    * (the boundary gap is computed from carried state, not lost).
    * In-batch events are processed in (ts, tiebreak) order so
    * same-batch gaps are identical to the batch lag window's.
    */
  def dwellStream(events: Dataset[(Long, Long, Long)]): Dataset[(Long, Int, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[DwellState]) =>
          val sorted = rows.map { case (_, ts, tie) => (ts, tie) }.toSeq.sorted
          var last = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
          val out = Seq.newBuilder[(Long, Int, Long)]
          sorted.foreach { case (ts, _) =>
            if (last != Long.MinValue) {
              val gapS = (ts - last) / 1000000L
              val bucket =
                if (gapS <= 0) -1
                else 63 - java.lang.Long.numberOfLeadingZeros(gapS)
              out += ((user, bucket, gapS))
            }
            last = ts
          }
          state.update(DwellState(last))
          out.result().iterator
      }
  }

  case class TouchState(lastTouch: String)

  /** Streaming twin of the batch `events_attribution`: last-touch
    * revenue attribution with ONE string of state per user — the
    * channel of the user's most recent non-purchase event. Each
    * purchase emits (user, channel, cents) the moment it arrives;
    * non-purchases only update state. In-batch events are processed in
    * (ts, event_id) order, and the carried state makes the union of
    * batch outputs equal the batch operator's per-purchase attribution
    * no matter where micro-batch boundaries fall (a purchase whose
    * qualifying touch landed in an earlier batch is credited from
    * state, not lost to "direct"). Downstream aggregates channels
    * incrementally; cents arrive pre-converted (same DECIMAL(12,2)→
    * cents cast as the batch operator) so stream and batch agree
    * bit-exactly.
    */
  def attributionStream(events: Dataset[(Long, Long, Long, String, Long)])
      : Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, String, Long)],
            state: GroupState[TouchState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var last = state.getOption.map(_.lastTouch).orNull
          val out = Seq.newBuilder[(Long, String, Long)]
          sorted.foreach { case (_, _, _, tpe, cents) =>
            if (tpe == "purchase")
              out += ((user, if (last == null) "direct" else last, cents))
            else last = tpe
          }
          if (last != null) state.update(TouchState(last))
          out.result().iterator
      }
  }

  case class LifeState(lastDay: Long)

  /** Streaming twin of the batch `events_lifecycle` growth accounting:
    * classifies each (user, active-day) as new / retained /
    * resurrected with ONE long of state per user — the user's last
    * active day. In-batch rows sort+dedupe by day; cross-batch
    * continuity comes from the carried last-day, so the union of batch
    * outputs equals the batch operator's per-(user, day) classification
    * no matter where micro-batch boundaries fall (a user whose
    * previous active day landed in an earlier batch is classified from
    * state, not re-counted as new). A day equal to the carried day is
    * a redelivered duplicate (already classified — emitted nothing); a
    * day BELOW the carried day is out-of-order beyond the advertised
    * in-order-per-user contract and is dropped rather than
    * misclassified — the same drop-don't-corrupt policy as
    * gapFillStream's beyond-horizon corrections.
    */
  def lifecycleStream(events: Dataset[(Long, Long)]): Dataset[(Long, Long, String)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[LifeState]) =>
          val days = rows.map(_._2).toSeq.distinct.sorted
          var last = state.getOption.map(_.lastDay).getOrElse(Long.MinValue)
          val out = Seq.newBuilder[(Long, Long, String)]
          days.foreach { d =>
            if (last == Long.MinValue) { out += ((d, user, "new")); last = d }
            else if (d == last + 1) { out += ((d, user, "retained")); last = d }
            else if (d > last) { out += ((d, user, "resurrected")); last = d }
            // d <= last: duplicate or late out-of-order — no emission
          }
          if (last != Long.MinValue) state.update(LifeState(last))
          out.result().iterator
      }
  }

  case class CumShareState(lastDay: Long, dayCents: Long, cumBefore: Long)

  /** Streaming twin of the batch `events_cum_share` cumulative revenue
    * curve: per (event_type, day) emits the day's cents-so-far and the
    * running cumulative, with THREE longs of state per type (current
    * day, its accumulated cents, cumulative through the previous day).
    * A day that straddles a micro-batch boundary re-emits the SAME
    * (type, day) key with monotonically larger values — deliberate
    * upsert semantics: a last-write-wins (or max-merge) consumer holds
    * exactly the batch operator's row once the day closes, and never
    * sees a partial that overwrites a larger value (the gapFillStream
    * correction lesson). Days below the carried day are out-of-order
    * beyond the advertised per-type contract and are dropped, not
    * misaccumulated.
    */
  def cumShareStream(rows: Dataset[(String, Long, Long)])
      : Dataset[(String, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[(String, Long, Long)],
            state: GroupState[CumShareState]) =>
          val byDay = it.toSeq.groupBy(_._2).view
            .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
          var st = state.getOption.getOrElse(CumShareState(Long.MinValue, 0L, 0L))
          val out = Seq.newBuilder[(String, Long, Long, Long)]
          byDay.foreach { case (d, c) =>
            if (d == st.lastDay) {
              st = st.copy(dayCents = st.dayCents + c)
              out += ((tpe, d, st.dayCents, st.cumBefore + st.dayCents))
            } else if (d > st.lastDay) {
              val cum = if (st.lastDay == Long.MinValue) 0L
                else st.cumBefore + st.dayCents
              st = CumShareState(d, c, cum)
              out += ((tpe, d, c, cum + c))
            }
            // d < lastDay: late out-of-order — dropped (see scaladoc)
          }
          if (st.lastDay != Long.MinValue) state.update(st)
          out.result().iterator
      }
  }

  /** the current top-3 candle of a (type, day) leaderboard plus a
    * monotone update counter (`upd` lets an append-mode consumer pick
    * the latest emission per key without event-time bookkeeping).
    */
  case class TopkState(top: Seq[(Double, Long)], upd: Long)

  /** Streaming twin of the batch `events_daily_topk` leaderboard:
    * keyed by (event_type, day) with THREE (value, event_id) pairs of
    * state, re-emitting the full current top-3 whenever a batch
    * touches the key. Order is (value desc, event_id asc) — the batch
    * operator's exact total order — so the latest emission per key
    * (max `upd`) equals the batch top-3 no matter how rows split
    * across micro-batches or arrive out of order: a leaderboard merge
    * is commutative, the ONLY ordering-convention-free family besides
    * the A/B census. State is a fixed 3-slot array per open key.
    */
  def dailyTopkStream(rows: Dataset[(String, Long, Long, Double)])
      : Dataset[(String, Long, Long, Long, Long, Double)] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), it: Iterator[(String, Long, Long, Double)],
            state: GroupState[TopkState]) =>
          val prev = state.getOption.getOrElse(TopkState(Seq.empty, 0L))
          val merged = (prev.top ++ it.map(r => (r._4, r._3)))
            .sortBy { case (v, id) => (-v, id) }.take(3)
          val upd = prev.upd + 1L
          state.update(TopkState(merged, upd))
          merged.zipWithIndex.iterator.map { case ((v, id), i) =>
            (key._1, key._2, upd, (i + 1).toLong, id, v)
          }
      }
  }

  /** per-(day, bucket) HLL register: the current max rank plus the
    * monotone update counter (latest-emission-per-key convention, same
    * as the leaderboard twin).
    */
  case class HllReg(mr: Int, upd: Long)

  /** Streaming twin of the batch `sketch_hll_sliding` DAILY-SKETCH
    * build: consumes (day, user_id) activity and maintains the
    * (day, bucket) → max-rank register table incrementally — ONE byte
    * of real state per open (day, bucket) key, ≤ 512 keys per day
    * regardless of traffic. The register merge is max(), so any
    * micro-batch split, replay, or out-of-order arrival converges to
    * the identical register table (max is commutative + idempotent —
    * the CRDT property that makes HLL the right streaming distinct
    * counter). Window estimates are then a read-time bucket-max merge
    * of ≤7 day tables (the batch operator's exact arithmetic) — the
    * stream never recounts a window.
    *
    * Hash/bucket/rank arithmetic calls the SAME compiled kernel the
    * batch expression path uses ([[graft.functions.HashKernels]]), so
    * stream and batch registers are bit-identical by construction.
    */
  def hllDailyStream(rows: Dataset[(Long, Long)]): Dataset[(Long, Long, Long, Int)] = {
    import rows.sparkSession.implicits._
    val m = graft.operators.Sketches.HllM
    val wb = graft.operators.Sketches.HllWBits
    rows.map { case (day, user) =>
      val h = graft.functions.HashKernels.mix31(graft.functions.HashKernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(user.toString)))
      val bucket = h % m
      val w = h / m
      val rank = if (w == 0L) wb + 1
        else wb + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      (day, bucket, rank)
    }
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), it: Iterator[(Long, Long, Int)],
            state: GroupState[HllReg]) =>
          val prev = state.getOption.getOrElse(HllReg(0, 0L))
          val mr = math.max(prev.mr, it.map(_._3).max)
          val upd = prev.upd + 1L
          state.update(HllReg(mr, upd))
          Iterator((key._1, key._2, upd, mr))
      }
  }

  /** exposure bitmask + conversion/seen flags — one int and two
    * booleans per user, the entire A/B census state.
    */
  case class AbState(mask: Int, converted: Boolean, seen: Boolean)

  /** The DEFAULT exposure universe the bitmask indexes — the contract
    * events table's non-purchase types. The batch operator derives this
    * set from the data at plan time; a stream can't (state layout must
    * be fixed before the first row), so the universe is a parameter of
    * [[abtestStream]] and an unrecognized type FAILS the query rather
    * than silently dropping exposures (the schema-drift trap: a new
    * event type would otherwise diverge from batch with no error).
    */
  val AbTypes: Seq[String] = Seq("click", "error", "signup", "view")

  /** Streaming twin of the batch `events_abtest` census: emits
    * (exposure_type, Δusers, Δconversions) delta rows from one bitmask
    * of state per user — first sight of exposure t adds a treatment
    * member (already-converted users arrive with their conversion),
    * first purchase credits every exposure seen so far plus the
    * `<all>` population row. Deltas are order-independent within a
    * user (exposure-then-convert and convert-then-exposure sum to the
    * same cell), so the summed deltas rebuild the batch operator's
    * 2×2 cells exactly under ANY micro-batch split — no ordering
    * convention needed, unlike the day-frontier twins. Downstream
    * keeps the running z-statistic from \|types\|+1 tiny aggregates.
    */
  def abtestStream(rows: Dataset[(Long, String)],
      exposureTypes: Seq[String] = AbTypes): Dataset[(String, Long, Long)] = {
    import rows.sparkSession.implicits._
    require(exposureTypes.size <= 32,
      s"abtestStream: ${exposureTypes.size} exposure types exceed the 32-bit state mask")
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, String)], state: GroupState[AbState]) =>
          var st = state.getOption.getOrElse(AbState(0, false, false))
          val out = Seq.newBuilder[(String, Long, Long)]
          it.foreach { case (_, t) =>
            if (!st.seen) { out += (("<all>", 1L, 0L)); st = st.copy(seen = true) }
            if (t == "purchase") {
              if (!st.converted) {
                st = st.copy(converted = true)
                out += (("<all>", 0L, 1L))
                exposureTypes.zipWithIndex.foreach { case (tt, i) =>
                  if ((st.mask & (1 << i)) != 0) out += ((tt, 0L, 1L))
                }
              }
            } else {
              val i = exposureTypes.indexOf(t)
              if (i < 0)
                throw new IllegalArgumentException(
                  s"abtestStream: unrecognized exposure type '$t' (universe: " +
                    s"${exposureTypes.mkString(", ")}) — pass exposureTypes covering " +
                    "the stream or filter the new type upstream; silently dropping it " +
                    "would diverge from the batch census")
              if ((st.mask & (1 << i)) == 0) {
                st = st.copy(mask = st.mask | (1 << i))
                out += ((t, 1L, if (st.converted) 1L else 0L))
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** the user's current first exposure — one small record of state;
    * out-of-order arrivals can REVISE it (an earlier event landing
    * late), which is why the twin emits correcting deltas.
    */
  case class SrmState(tsUs: Long, eventId: Long, arm: String)

  /** Streaming twin of the batch `events_srm` arm census: consumes
    * (user_id, ts_us, event_id, arm) exposure events (filter to the
    * designed arms upstream) and maintains each user's FIRST exposure
    * by the batch operator's (ts_us, event_id) total order. Emits
    * (arm, ±1) deltas: +1 on first sighting, and a (-1 old, +1 new)
    * correction when a LATE-ARRIVING earlier event revises the arm —
    * so the running per-arm sums equal the batch census under any
    * micro-batch split or arrival order. The SRM chi-square is then
    * driver/consumer arithmetic over two integers, recomputed on any
    * read — state is one (ts, id, arm) record per user.
    */
  def srmStream(rows: Dataset[(Long, Long, Long, String)]): Dataset[(String, Long)] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[(Long, Long, Long, String)],
            state: GroupState[SrmState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[(String, Long)]
          it.foreach { case (_, ts, eid, arm) =>
            if (st == null) {
              out += ((arm, 1L))
              st = SrmState(ts, eid, arm)
            } else if (ts < st.tsUs || (ts == st.tsUs && eid < st.eventId)) {
              if (arm != st.arm) { out += ((st.arm, -1L)); out += ((arm, 1L)) }
              st = SrmState(ts, eid, arm)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** rolling 8-day count window per type: day → count, pruned to
    * [frontier−7, frontier] — the seasonal-naive predictor's entire
    * working set, bounded by the season length, never history-sized.
    */
  case class ForecastState(days: Map[Long, Long])

  /** Streaming twin of the batch `events_forecast` seasonal-naive
    * scorer: keyed by event type, carries the last 8 observed days'
    * counts, and emits a (type, day, n_so_far, n_pred) upsert whenever
    * a day with an observed lag-7 partner grows. Days must arrive
    * non-decreasing per type (the cum_share ordering convention; late
    * out-of-order days drop) — in that regime day d−7 is complete
    * before d's first row, so n_pred is final at first emission and a
    * last-write-wins consumer rebuilds exactly the batch operator's
    * paired frame; its per-type Σ|n − n_pred| rollup then equals
    * events_forecast's error mass. State is ≤8 longs per type.
    */
  def forecastStream(rows: Dataset[(String, Long)])
      : Dataset[(String, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[(String, Long)],
            state: GroupState[ForecastState]) =>
          val byDay = it.toSeq.groupBy(_._2).view
            .mapValues(_.size.toLong).toSeq.sortBy(_._1)
          var days = state.getOption.map(_.days).getOrElse(Map.empty[Long, Long])
          var frontier = if (days.isEmpty) Long.MinValue else days.keys.max
          val out = Seq.newBuilder[(String, Long, Long, Long)]
          byDay.foreach { case (d, c) =>
            if (d >= frontier) {
              frontier = d
              days = days.updated(d, days.getOrElse(d, 0L) + c)
                .filter { case (k, _) => k >= frontier - 7 }
              days.get(d - 7).foreach(pred => out += ((tpe, d, days(d), pred)))
            } // d < frontier: late out-of-order — dropped
          }
          state.update(ForecastState(days))
          out.result().iterator
      }
  }

  /** rolling-anomaly working set per type: the axis origin (minDay —
    * the batch operator scores a day only once 7 AXIS days precede it)
    * plus the trailing ≤8-day dense count window. Fixed-width state,
    * never history-sized.
    */
  case class RollingAnomState(minDay: Long, days: Map[Long, Long])

  /** Streaming twin of the batch `events_rolling_anomaly` trailing-
    * baseline alert: keyed by event type, carries [[RollingAnomState]]
    * and emits a (type, day, n_so_far, win_sum, is_anomaly) upsert
    * whenever a scoreable day's count grows. The DENSE-AXIS rule is
    * preserved incrementally: when the frontier jumps from f to d,
    * the silent days (f, d) are materialized as real zeros, scored,
    * and emitted exactly once (they can never change — late
    * behind-frontier rows drop, the forecast twin's discipline), so a
    * last-write-wins consumer (max struct(n_so_far, …) per (type,
    * day) — n_so_far grows monotonically across re-emissions)
    * reconstructs the batch table exactly under any split. The 2σ
    * predicate is the batch operator's integer cross-multiplication
    * ((7c−Σ)² > 4(7Σx²−Σ²)) evaluated in BigInt — no float, no
    * overflow. A day's trailing window is already final at its first
    * emission (its 7 predecessors are behind the frontier), so
    * win_sum never changes across a day's re-emissions.
    */
  def rollingAnomalyStream(rows: Dataset[(String, Long)])
      : Dataset[(String, Long, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[(String, Long)],
            state: GroupState[RollingAnomState]) =>
          val byDay = it.toSeq.groupBy(_._2).view
            .mapValues(_.size.toLong).toSeq.sortBy(_._1)
          var (minDay, days) = state.getOption
            .map(s => (s.minDay, s.days))
            .getOrElse((Long.MinValue, Map.empty[Long, Long]))
          var frontier = if (days.isEmpty) Long.MinValue else days.keys.max
          val out = Seq.newBuilder[(String, Long, Long, Long, Long)]
          def score(d: Long): Unit = if (minDay != Long.MinValue && d - minDay >= 7) {
            val c = days.getOrElse(d, 0L)
            val win = ((d - 7) until d).map(days.getOrElse(_, 0L))
            val s7 = win.sum
            val sq = win.map(x => BigInt(x) * x).sum
            val dev = BigInt(7L * c - s7)
            val flag = if (dev * dev > 4 * (7 * sq - BigInt(s7) * s7)) 1L else 0L
            out += ((tpe, d, c, s7, flag))
          }
          byDay.foreach { case (d, c) =>
            if (frontier == Long.MinValue) {
              minDay = d; frontier = d; days = Map(d -> c); score(d)
            } else if (d == frontier) {
              days = days.updated(d, days(d) + c); score(d)
            } else if (d > frontier) {
              ((frontier + 1) until d).foreach { z =>
                days = (days + (z -> 0L)).filter { case (k, _) => k >= z - 7 }
                score(z)
              }
              days = (days + (d -> c)).filter { case (k, _) => k >= d - 7 }
              frontier = d
              score(d)
            } // d < frontier: late out-of-order — dropped
          }
          state.update(RollingAnomState(minDay, days))
          out.result().iterator
      }
  }

  /** one candle of carried state: the open/close carry their (ts_us,
    * event_id) total-order position so cross-batch comparisons use the
    * batch operator's exact `ord` tiebreak, not arrival order.
    */
  case class OhlcState(openTs: Long, openId: Long, openV: Double,
      hiV: Double, loV: Double,
      closeTs: Long, closeId: Long, closeV: Double, n: Long)

  /** Streaming twin of the batch `events_ohlc` hourly candles: keyed by
    * (event_type, hour_bucket) with ONE candle of state, emitting the
    * cumulative (open, high, low, close, n) upsert for every bucket
    * touched in the batch. Open/close resolve by the batch operator's
    * (ts_us, event_id) total order — an out-of-order row that precedes
    * the carried open REPLACES the open, so micro-batch boundaries and
    * late arrivals cannot flip a candle — and a last-write-wins
    * consumer (or max-by-n aggregate) over the upserts reconstructs the
    * batch candle table exactly. In production, watermark + timeout
    * expires buckets once the clock passes them; state is one fixed-
    * width record per open bucket either way.
    */
  def ohlcStream(events: Dataset[(String, Long, Long, Long, Double)])
      : Dataset[(String, Long, Double, Double, Double, Double, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long, Long, Long, Double)],
            state: GroupState[OhlcState]) =>
          var st = state.getOption.orNull
          rows.foreach { case (_, _, t, id, v) =>
            st = if (st == null) OhlcState(t, id, v, v, v, t, id, v, 1L)
            else {
              val opens = t < st.openTs || (t == st.openTs && id < st.openId)
              val closes = t > st.closeTs || (t == st.closeTs && id > st.closeId)
              OhlcState(
                if (opens) t else st.openTs, if (opens) id else st.openId,
                if (opens) v else st.openV,
                math.max(st.hiV, v), math.min(st.loV, v),
                if (closes) t else st.closeTs, if (closes) id else st.closeId,
                if (closes) v else st.closeV,
                st.n + 1L)
            }
          }
          state.update(st)
          Iterator.single((key._1, key._2, st.openV, st.hiV, st.loV, st.closeV, st.n))
      }
  }

  case class MarkovState(lastType: String)

  /** Streaming twin of the batch `events_markov` transition matrix:
    * emits one (from_type, to_type) transition row per event, with ONE
    * string of state per user — the user's most recent event type. A
    * user's first-ever event emits the '<start>' source state, exactly
    * like the batch operator's coalesced lag. In-batch events process
    * in (ts, event_id) order; the carried state makes the union of
    * batch outputs aggregate to the batch matrix no matter where
    * micro-batch boundaries fall (the first event of a new batch
    * transitions FROM the carried type, not from '<start>' again).
    * Downstream maintains the matrix incrementally with a count
    * aggregate keyed on the \|types\|²-bounded pair.
    */
  def markovStream(events: Dataset[(Long, Long, Long, String)])
      : Dataset[(String, String)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[MarkovState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var last = state.getOption.map(_.lastType).orNull
          val out = Seq.newBuilder[(String, String)]
          sorted.foreach { case (_, _, _, tpe) =>
            out += ((if (last == null) "<start>" else last, tpe))
            last = tpe
          }
          if (last != null) state.update(MarkovState(last))
          out.result().iterator
      }
  }

  /** prev2 is the older of the two carried types; null until the user
    * has seen two events.
    */
  case class PathState(prev2: String, prev1: String)

  /** Streaming twin of the batch `events_paths` trigram miner: emits
    * one (user, e1, e2, e3) row per completed consecutive 3-event
    * window, carrying TWO strings of state per user (the last two
    * event types). Windows that straddle a micro-batch boundary
    * complete from carried state — the streamed rows aggregate to the
    * batch operator's exact path counts and user reach under any
    * batch split. Downstream keeps the \|types\|³-bounded count frame
    * and re-ranks incrementally.
    */
  def pathsStream(events: Dataset[(Long, Long, Long, String)])
      : Dataset[(Long, String, String, String)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[PathState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var p2 = state.getOption.map(_.prev2).orNull
          var p1 = state.getOption.map(_.prev1).orNull
          val out = Seq.newBuilder[(Long, String, String, String)]
          sorted.foreach { case (_, _, _, tpe) =>
            if (p1 != null && p2 != null) out += ((user, p2, p1, tpe))
            p2 = p1
            p1 = tpe
          }
          if (p1 != null) state.update(PathState(p2, p1))
          out.result().iterator
      }
  }

  /** lastDay = most recent active day seen; runLen = length of the
    * consecutive-day run ending at lastDay.
    */
  case class StreakState(lastDay: Long, runLen: Long)

  /** Streaming twin of the batch `events_streaks` island detector:
    * consumes (user_id, day) activity and emits one
    * (user_id, start_day, streak_days) row each time a user's current
    * streak EXTENDS (or a new streak opens), carrying two longs of
    * state per user. A run that straddles a micro-batch boundary
    * continues from the carried (lastDay, runLen) — max-aggregating the
    * emitted rows per (user, start_day) reproduces the batch operator's
    * island frame under any batch split. Same-day repeats are no-ops;
    * days older than the carried frontier are dropped (bound lateness
    * with an upstream watermark if the source can regress).
    */
  def streaksStream(events: Dataset[(Long, Long)]): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[StreakState]) =>
          val days = rows.map(_._2).toSeq.distinct.sorted
          var last = state.getOption.map(_.lastDay).getOrElse(Long.MinValue)
          var run = state.getOption.map(_.runLen).getOrElse(0L)
          val out = Seq.newBuilder[(Long, Long, Long)]
          days.foreach { d =>
            if (d == last + 1 && run > 0L) {
              run += 1; last = d
              out += ((user, d - run + 1, run))
            } else if (d > last) {
              run = 1L; last = d
              out += ((user, d, 1L))
            } // d <= last: duplicate or beyond-frontier late row — drop
          }
          if (run > 0L) state.update(StreakState(last, run))
          out.result().iterator
      }
  }

  /** counts = the user's full event-type census so far —
    * |types|-bounded, the first map-valued state in the twin family.
    */
  case class TypeCounts(counts: Map[String, Long])

  /** Streaming twin of the batch `events_entropy` diversity histogram:
    * carries each user's per-type count map (|types|-bounded — ~10
    * entries, never event-history-sized) and emits the CUMULATIVE
    * (user_id, event_type, count) for every type touched in the batch.
    * Counts are monotone per key, so a last-write-wins upsert (or a
    * max-aggregate) over the emitted rows rebuilds the exact
    * (user, type, c) grid the batch operator aggregates — downstream
    * recomputes H per user from ≤|types| rows on each upsert, with
    * every log2 evaluated engine-side (the twin never computes floats,
    * so JVM-vs-engine libm ulps can't split stream from batch).
    */
  def entropyStream(events: Dataset[(Long, String)]): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[TypeCounts]) =>
          val prev = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
          val batch = rows.map(_._2).toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val merged = batch.foldLeft(prev) { case (m, (t, c)) =>
            m.updated(t, m.getOrElse(t, 0L) + c)
          }
          state.update(TypeCounts(merged))
          batch.keys.toSeq.sorted.iterator.map(t => (user, t, merged(t)))
      }
  }

  case class IatState(lastUs: Long)

  /** Streaming twin of the batch `events_burstiness` gap miner: keyed
    * by (event_type, user), carries one timestamp of state, and emits
    * one (event_type, gap_min) row per inter-arrival gap — a gap that
    * straddles a micro-batch boundary is computed from the carried
    * last-event time, exactly like the batch lag window. Because the
    * downstream moment sums (n, Σx, Σx²) are INTEGER minute sums,
    * aggregation is associative: accumulating the streamed gaps per
    * type reproduces the batch operator's moment frame — and therefore
    * its CV/burstiness quotients bit-for-bit — under any batch split.
    * State is two longs per (type, user); expire it with a timeout in
    * production if the key space churns.
    */
  def burstinessStream(events: Dataset[(String, Long, Long, Long)])
      : Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long, Long, Long)],
            state: GroupState[IatState]) =>
          val sorted = rows.map { case (_, _, ts, tie) => (ts, tie) }.toSeq.sorted
          var last = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
          val out = Seq.newBuilder[(String, Long)]
          sorted.foreach { case (ts, _) =>
            if (last != Long.MinValue) out += ((key._1, (ts - last) / 60000000L))
            last = ts
          }
          state.update(IatState(last))
          out.result().iterator
      }
  }

  /** frontier = the user's newest active day; mask = a 55-bit activity
    * window, bit i set ⟺ the user was active on day (frontier − i).
    * Two longs of state per user — the rolling-distinct problem
    * (DAU/WAU/MAU) carried in ONE machine word instead of a day-set.
    * Why 55 and not 28: a late day d (up to 27 behind the frontier)
    * asks "was the user in the 28-day window ending at e" for window
    * ends e down to d, whose windows reach back to e−27 ≥
    * frontier−54 — 28 bits would have forgotten those days and
    * double-count a re-join, 55 bits make every consulted day known.
    */
  case class StickState(frontier: Long, mask: Long)

  private val StickBits  = 55              // days of carried history
  private val StickMask  = (1L << StickBits) - 1
  private val StickLate  = 27L             // accepted lateness vs frontier

  /** One membership change: on some window-end day, this user newly
    * joined the 1-day (dau), 7-day (wau), and/or 28-day (mau) rolling
    * distinct count. Flags are 0/1 and each fires at most once per
    * (user, window-end) — membership is monotone — so SUMMING the
    * flags per day yields exactly the batch COUNT(DISTINCT …).
    */
  case class StickDelta(user_id: Long, day: Long, dau: Long, wau: Long, mau: Long)

  /** any active day in calendar range [a, b], read off the mask */
  private def stickAnyIn(frontier: Long, mask: Long, a: Long, b: Long): Boolean = {
    val hi = math.min(b, frontier)
    val lo = math.max(a, frontier - (StickBits - 1))
    hi >= lo && {
      val idxLo = (frontier - hi).toInt // newest in range → lowest bit
      val width = (hi - lo + 1).toInt
      ((mask >>> idxLo) & ((1L << width) - 1)) != 0L
    }
  }

  /** Streaming twin of the batch `events_stickiness` rolling-distinct
    * engagement counts: consumes (user_id, day) activity and, for each
    * user-day first seen, emits the window-end days on which the user
    * NEWLY enters the 1/7/28-day rolling distinct windows. A new
    * active day d can only change membership at window-ends
    * [d, d+27], and whether each flips is a pure function of the
    * carried day-bitmask — computed in O(1) bit arithmetic, no
    * day-set, no rescan. Because membership is monotone (a user never
    * leaves a window it entered — activity only accrues), summing the
    * emitted flags per window-end day over any micro-batch split
    * equals the batch operator's COUNT(DISTINCT) per day exactly;
    * restrict to observed days (the batch semi-join) and
    * dau·10⁶ div mau reproduces stickiness_ppm.
    *
    * Same-day repeats are no-ops (the mask bit is already set); days
    * more than [[StickLate]] behind the user's frontier are dropped —
    * bound lateness with an upstream 28-day watermark, the horizon
    * that makes one machine word of state exact.
    */
  def stickinessStream(events: Dataset[(Long, Long)]): Dataset[StickDelta] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[StickState]) =>
          var st = state.getOption.getOrElse(StickState(Long.MinValue, 0L))
          val out = Seq.newBuilder[StickDelta]
          rows.map(_._2).toSeq.distinct.sorted.foreach { d =>
            val fresh = st.frontier == Long.MinValue
            if (!fresh && st.frontier - d > StickLate) {
              // beyond the lateness horizon — undecidable against one word
            } else {
              val before = st
              // advance the window: shift history down as the frontier moves
              val shifted =
                if (fresh) StickState(d, 0L)
                else if (d > st.frontier) {
                  val by = d - st.frontier
                  StickState(d, if (by >= StickBits) 0L else (st.mask << by) & StickMask)
                } else st
              val bit = 1L << (shifted.frontier - d).toInt
              if ((shifted.mask & bit) == 0L) { // first sighting of (user, d)
                st = StickState(shifted.frontier, shifted.mask | bit)
                val wasIn = (a: Long, b: Long) =>
                  !fresh && stickAnyIn(before.frontier, before.mask, a, b)
                (d to d + 27).foreach { e =>
                  val dau = if (e == d) 1L else 0L
                  val wau = if (e <= d + 6 && !wasIn(e - 6, e)) 1L else 0L
                  val mau = if (!wasIn(e - 27, e)) 1L else 0L
                  if (dau + wau + mau > 0) out += StickDelta(user, e, dau, wau, mau)
                }
              } // else: duplicate day — state already holds it, nothing to emit
            }
          }
          if (st.frontier != Long.MinValue) state.update(st)
          out.result().iterator
      }
  }

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start_us: Long, session_end_us: Long,
    n_events: Long, sum_value: Double)

  val GapUs: Long = 30L * 60 * 1000000 // 30-minute inactivity gap

  /** gap-based sessionization via flatMapGroupsWithState — the streaming
    * twin of the batch lag+cumsum `events_sessionize`. A session closes
    * when a later event for the user arrives past the gap, or (with
    * `timeout = ProcessingTimeTimeout` in production) when the
    * processing-time timeout fires with no new events.
    */
  def sessionize(events: Dataset[Ev],
    timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
    implicit s: SparkSession): Dataset[Session] = {
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st =>
              Session(user, st.startUs, st.lastUs, st.n, st.sum)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_us))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              cur match {
                case Some(st) if e.ts_us - st.lastUs <= GapUs =>
                  cur = Some(SessionState(st.startUs, e.ts_us, st.n + 1, st.sum + e.value))
                case Some(st) =>
                  closed += Session(user, st.startUs, st.lastUs, st.n, st.sum)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
              }
            }
            cur.foreach(state.update)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("30 minutes")
            closed.result().iterator
          }
      }
  }

  /** streaming exact-dedup: incoming documents carry a content
    * fingerprint; only the FIRST doc per fingerprint passes — the
    * streaming twin of `dedup_exact` for an ingest that must not admit
    * a document twice across micro-batches. State = one (fingerprint →
    * first doc_id) entry in the state store, partitioned by
    * fingerprint; at cluster scale bound it with
    * `dropDuplicatesWithinWatermark` semantics (keep the timeout) so
    * state doesn't grow forever on an unbounded corpus.
    */
  case class Doc(doc_id: Long, fp: Long)
  case class DedupDecision(doc_id: Long, fp: Long, is_first: Boolean)

  def dedupStream(docs: Dataset[Doc])(implicit s: SparkSession): Dataset[DedupDecision] = {
    import s.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[Long, DedupDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: Long, rows: Iterator[Doc], state: GroupState[Long]) =>
          val out = Seq.newBuilder[DedupDecision]
          var seen = state.getOption
          // deterministic within a batch: admit the smallest doc_id first
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            out += DedupDecision(d.doc_id, fp, seen.isEmpty)
            if (seen.isEmpty) seen = Some(d.doc_id)
          }
          seen.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming twin of the batch `corpus_quota_sample`: admit at most
    * `q` docs per source, chosen by the SAME deterministic hash rank —
    * not first-come-first-kept. The state per source is the current
    * ≤q-element (hash, doc_id, n_chars) frontier, and "keep the q
    * smallest" is ORDER-INDEPENDENT (merging any arrival order of the
    * same rows yields the same frontier — the min-q set is a join-
    * semilattice, the CRDT argument the HLL twin rides), so the final
    * audit equals the batch operator's under ANY split or shuffle of
    * the corpus. Emits a cumulative per-source audit upsert per
    * touched micro-batch, keyed monotone by n_seen — a last-write-wins
    * (max n_seen) view IS the batch answer.
    *
    * State bound: ONE record per source carrying ≤ q entries — never
    * corpus-sized (asserted in StreamingSpec against the state store).
    */
  case class QuotaState(nSeen: Long, entries: List[(Long, Long, Long)])

  def quotaStream(docs: Dataset[(Long, String, Long)], q: Int)
      : Dataset[(String, Long, Long, Long, Long)] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[QuotaState, (String, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[(Long, String, Long)],
            state: GroupState[QuotaState]) =>
          val st = state.getOption.getOrElse(QuotaState(0L, Nil))
          var n = st.nSeen
          val merged = scala.collection.mutable.ArrayBuffer.from(st.entries)
          it.foreach { case (id, _, chars) =>
            n += 1
            merged += ((graft.operators.Corpus.mixHashJvm(id, 1000000007L), id, chars))
          }
          val kept = merged.sortBy { case (h, id, _) => (h, id) }.take(q).toList
          state.update(QuotaState(n, kept))
          Iterator((src, n, kept.size.toLong,
            kept.map(_._2).sum, kept.map(_._3).sum))
      }
  }

  /** bounded-state variant of [[dedupStream]]: on an unbounded corpus
    * the fingerprint state store grows forever; with an event-time
    * watermark, Spark expires fingerprint state older than the delay —
    * the right admission semantics when duplicates arrive close in time
    * (re-crawls, retry storms) rather than years apart.
    */
  case class StampedDoc(doc_id: Long, fp: Long, ts: Timestamp)

  def dedupStreamBounded(docs: org.apache.spark.sql.Dataset[StampedDoc],
    delay: String = "1 hour"): DataFrame =
    docs.toDF()
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup admission — the twin of the batch
    * [[graft.operators.Dedup.dedupIncrementalLsh]], and the one
    * ingestion shape [[dedupStream]] cannot cover: exact-fingerprint
    * admission wrongly ADMITS a tail-edited re-ingestion (appended
    * correction, tracking footer), the most common real delta.
    *
    * The state IS the corpus band-bucket index, keyed by (band,
    * band-value): rows tagged `kind=0` are index entries (a corpus
    * doc's band row, carrying its full minhash signature) and
    * accumulate into state; rows tagged `kind=1` are probe band rows
    * (an incoming doc's band row, carrying ITS signature) and read
    * state without writing it — the batch operator's contract, where
    * the delta probes a fixed index and batch docs never dedup against
    * each other. Verification happens in-state with the batch's exact
    * integer predicate (2·matches ≥ k over full signatures), so a
    * probe emits one row per VERIFIED candidate plus one presence
    * marker (`cand = -1`) per band — the marker makes zero-candidate
    * docs (admissions) visible in append mode. The last-write-wins
    * view `min(cand ≥ 0)` per new_id IS the batch answer whenever
    * index rows precede a doc's probe rows (any split of the index
    * among earlier micro-batches and of the probes among later ones —
    * both sides are order-independent: state accumulation is a set
    * union, probes are read-only).
    *
    * State bound: one record per OCCUPIED (band, band-value) bucket,
    * holding that bucket's (doc_id, signature) members as a Map keyed
    * by id — membership checks are O(1), never a linear scan, so a
    * mega-bucket costs O(k) per batch, not O(k²) (asserted against the
    * state store in StreamingSpec). Bucket occupancy is the measured
    * text-LSH mega-bucket quantity (max 80 at ×10, SCALE.md); the
    * `bucketCap`/`anchors` parameters carry [[graft.operators.Dedup
    * .cappedPairs]]'s discipline INTO the operator: once a bucket's
    * occupancy exceeds `bucketCap`, state truncates to the `anchors`
    * lowest-id members (the anchor star — probes then verify against
    * anchors only, the exact per-probe candidate set the batch capped
    * join emits for a mega-bucket). The default cap is MaxValue so the
    * contract corpus — where no bucket approaches any cap — stays
    * bit-identical to the uncapped batch twin.
    */
  case class LshBandRow(kind: Int, id: Long, b: Int, bv: Long, mh: Seq[Long])
  case class LshProbeHit(new_id: Long, cand: Long, matches: Int)

  def dedupLshStream(rows: Dataset[LshBandRow], bucketCap: Int = Int.MaxValue,
      anchors: Int = 16)(implicit s: SparkSession): Dataset[LshProbeHit] = {
    import s.implicits._
    val k = graft.functions.PortableHash.MinhashK
    rows.groupByKey(r => (r.b, r.bv))
      .flatMapGroupsWithState[Map[Long, Seq[Long]], LshProbeHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[LshBandRow],
            state: GroupState[Map[Long, Seq[Long]]]) =>
          var idx = state.getOption.getOrElse(Map.empty[Long, Seq[Long]])
          val out = Seq.newBuilder[LshProbeHit]
          // index rows first: a same-batch index row is visible to
          // same-batch probes (deterministic under any split)
          val (idxRows, probes) = it.toSeq.partition(_.kind == 0)
          idxRows.foreach { r => if (!idx.contains(r.id)) idx += (r.id -> r.mh) }
          if (idx.size > bucketCap) {
            // mega-bucket: keep only the anchor star (lowest ids) —
            // bounded state, and future probes pair with anchors only
            idx = idx.toSeq.sortBy(_._1).take(anchors).toMap
          }
          if (idxRows.nonEmpty) state.update(idx)
          probes.foreach { p =>
            out += LshProbeHit(p.id, -1L, 0)
            idx.foreach { case (docId, mb) =>
              val m = (0 until k).count(i => p.mh(i) == mb(i))
              if (2 * m >= k) out += LshProbeHit(p.id, docId, m)
            }
          }
          out.result().iterator
      }
  }

  /** Streaming CONTAINMENT admission — the twin of the batch
    * [[graft.operators.Dedup.dedupIncrementalContainment]], and the
    * ingestion shape neither [[dedupStream]] (exact fingerprint) nor
    * [[dedupLshStream]] (est-Jaccard ≥ 1/2) can cover: a corpus doc
    * re-ingested INSIDE a longer digest is byte-unequal AND sits at
    * J ≈ 1/3, so both existing admission streams pass it.
    *
    * The state IS the corpus winnow-print posting index, keyed by the
    * print hash: `kind=0` rows are index postings (a corpus doc's
    * print, carrying its distinct shingle set) and accumulate;
    * `kind=1` rows are probe postings (a batch doc's print, carrying
    * ITS shingle set) and read state without writing. Verification
    * happens in-state with the batch gate's exact integer predicates
    * (≥ 90% of the smaller distinct-shingle set, J < 0.5, the
    * MinContainSetSize floor); a probe emits one presence marker
    * (`cand = -1`) per print plus one row per VERIFIED corpus doc, so
    * `min(cand ≥ 0)` per new_id is the batch `dup_of` under ANY split
    * of index rows before probe rows. Docs with no prints (under
    * [[graft.operators.Dedup.PrintWindow]] words) produce no rows —
    * trivially admitted, the batch contract.
    *
    * State bound: one record per OCCUPIED print bucket, holding that
    * print's (doc_id → shingle set) members in a Map (O(1) membership);
    * `bucketCap`/`anchors` = the [[dedupLshStream]] mega-bucket
    * truncation for boilerplate-hot prints (default inert).
    */
  case class ContainPrintRow(kind: Int, id: Long, pr: Long, sh: Seq[Long])
  case class ContainProbeHit(new_id: Long, cand: Long, i: Long)

  def dedupContainmentStream(rows: Dataset[ContainPrintRow],
      bucketCap: Int = Int.MaxValue, anchors: Int = 16)(
      implicit s: SparkSession): Dataset[ContainProbeHit] = {
    import s.implicits._
    val minSet = graft.operators.Dedup.MinContainSetSize
    rows.groupByKey(_.pr)
      .flatMapGroupsWithState[Map[Long, Seq[Long]], ContainProbeHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[ContainPrintRow],
            state: GroupState[Map[Long, Seq[Long]]]) =>
          var idx = state.getOption.getOrElse(Map.empty[Long, Seq[Long]])
          val out = Seq.newBuilder[ContainProbeHit]
          val (idxRows, probes) = it.toSeq.partition(_.kind == 0)
          idxRows.foreach { r => if (!idx.contains(r.id)) idx += (r.id -> r.sh) }
          if (idx.size > bucketCap) idx = idx.toSeq.sortBy(_._1).take(anchors).toMap
          if (idxRows.nonEmpty) state.update(idx)
          probes.foreach { p =>
            out += ContainProbeHit(p.id, -1L, 0L)
            val sha = p.sh.toSet
            val na = sha.size.toLong
            idx.foreach { case (docId, shb) =>
              val nb = shb.size.toLong
              val i = shb.count(sha.contains).toLong
              val mn = math.min(na, nb)
              if (mn >= minSet && 10 * i >= 9 * mn && 3 * i < na + nb)
                out += ContainProbeHit(p.id, docId, i)
            }
          }
          out.result().iterator
      }
  }

  /** Streaming SEMANTIC admission — the twin of the batch
    * [[graft.operators.Similarity.dedupIncrementalSemantic]], and the
    * ingestion shape none of the three text admission streams can
    * cover: a PARAPHRASE re-ingestion (same content re-embedded)
    * shares no shingles — exact, est-J and containment streams all
    * pass it; only the embedding index can pin it.
    *
    * The state IS the corpus semantic-index posting table
    * ([[graft.operators.Similarity.semanticPostings]]'s (space, key)
    * shape — hyperplane buckets AND IVF cells in ONE keyed store):
    * `kind=0` rows are index postings (a corpus vector under one of
    * its (space, key) slots, carrying the vector) and accumulate;
    * `kind=1` rows are probe postings (a batch vector's slots) and
    * read state without writing. Verification happens in-state with
    * the batch gate's exact quantized-cosine predicate
    * (floor(cos·10⁶)/10⁶ ≥ tau, the same strict fold order as the
    * `graft_cosine` expression — bit-identical doubles); a probe
    * emits one presence marker (`cand = -1`) per slot plus one row
    * per VERIFIED corpus vector, so `min(cand ≥ 0)` per new_id is the
    * batch `dup_of` under ANY split of index rows before probe rows.
    *
    * State bound: one record per OCCUPIED (space, key) slot, holding
    * that slot's (vec_id → vector) members in a Map (O(1) membership);
    * `bucketCap`/`anchors` = the [[dedupLshStream]] mega-bucket
    * truncation for near-identical vector families (default inert).
    */
  case class SemPostRow(kind: Int, id: Long, space: Int, key: Long, v: Seq[Double])
  case class SemProbeHit(new_id: Long, cand: Long, cos_ppm: Long)

  /** the batch verify predicate's exact double: three strict
    * left-to-right folds (dot, |a|², |b|²) then floor-quantize to
    * 10⁻⁶ — the same IEEE op sequence as `graft_cosine` + the
    * `floor(c·10⁶)/10⁶` column, so stream and batch agree bitwise.
    */
  private def quantCosine(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0) / 1000000.0
  }

  def dedupSemanticStream(rows: Dataset[SemPostRow],
      tau: Double = graft.operators.Similarity.SemAdmitTau,
      bucketCap: Int = Int.MaxValue, anchors: Int = 16)(
      implicit s: SparkSession): Dataset[SemProbeHit] = {
    import s.implicits._
    rows.groupByKey(r => (r.space, r.key))
      .flatMapGroupsWithState[Map[Long, Seq[Double]], SemProbeHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[SemPostRow],
            state: GroupState[Map[Long, Seq[Double]]]) =>
          var idx = state.getOption.getOrElse(Map.empty[Long, Seq[Double]])
          val out = Seq.newBuilder[SemProbeHit]
          val (idxRows, probes) = it.toSeq.partition(_.kind == 0)
          idxRows.foreach { r => if (!idx.contains(r.id)) idx += (r.id -> r.v) }
          if (idx.size > bucketCap) idx = idx.toSeq.sortBy(_._1).take(anchors).toMap
          if (idxRows.nonEmpty) state.update(idx)
          probes.foreach { p =>
            out += SemProbeHit(p.id, -1L, 0L)
            idx.foreach { case (docId, cv) =>
              val q = quantCosine(p.v, cv)
              if (q >= tau)
                out += SemProbeHit(p.id, docId, math.round(q * 1000000.0))
            }
          }
          out.result().iterator
      }
  }

  /** manifest-delta stream: each micro-batch carries (key, size, etag)
    * observations; emits cumulative per-key change classification vs the
    * previously-committed state — the streaming twin of `change_detect`,
    * keyed state replacing the prev-snapshot join.
    */
  case class FileObs(key: String, size: Long, etag: String)
  case class FileState(size: Long, etag: String)
  case class FileChange(key: String, change_type: String, size: Long)

  def changeFeed(obs: Dataset[FileObs])(implicit s: SparkSession): Dataset[FileChange] = {
    import s.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[FileState, FileChange](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[FileObs], state: GroupState[FileState]) =>
          val out = Seq.newBuilder[FileChange]
          var cur = state.getOption
          rows.foreach { o =>
            cur match {
              case None =>
                out += FileChange(key, "added", o.size)
              case Some(prev) if prev.size != o.size || prev.etag != o.etag =>
                out += FileChange(key, "modified", o.size)
              case Some(_) => // unchanged → no emission in append mode
            }
            cur = Some(FileState(o.size, o.etag))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** A listing-sweep observation: one object seen by a manifest sweep,
    * or its tombstone (`deleted = true`) when the sweep notices the key
    * is gone.
    */
  case class SweepObs(key: String, size: Long, etag: String, deleted: Boolean)

  /** One partition-level maintenance delta derived from a sweep. */
  case class FileDelta(pdir: String, d_files: Long, d_bytes: Long)

  /** Streaming twin of the batch `incr_agg` maintenance path: per-key
    * state (size, etag) turns each sweep observation into the aggregate
    * DELTA it implies — Added (+1 file, +size), Modified (0, size
    * difference), Deleted (−1, −size), Unchanged (nothing). Downstream,
    * [[mergeDeltas]] folds the per-batch deltas into the maintained
    * per-partition aggregate inside `foreachBatch` — the maintained-
    * aggregate MERGE pattern (one stateful operator in the stream, the
    * merge as an idempotent batch join per micro-batch), which is how a
    * production lake keeps 10⁸-object partition stats current without
    * ever re-scanning the listing.
    */
  def deltaFeed(obs: Dataset[SweepObs])(implicit s: SparkSession): Dataset[FileDelta] = {
    import s.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[FileState, FileDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SweepObs], state: GroupState[FileState]) =>
          val pdir = key.replaceAll("/part-[^/]*$", "")
          val out = Seq.newBuilder[FileDelta]
          var cur = state.getOption
          rows.foreach { o =>
            (cur, o.deleted) match {
              case (Some(prev), true) =>
                out += FileDelta(pdir, -1L, -prev.size)
                cur = None
              case (None, true) => // tombstone for a key never seen
              case (None, false) =>
                out += FileDelta(pdir, 1L, o.size)
                cur = Some(FileState(o.size, o.etag))
              case (Some(prev), false) if prev.size != o.size || prev.etag != o.etag =>
                out += FileDelta(pdir, 0L, o.size - prev.size)
                cur = Some(FileState(o.size, o.etag))
              case (Some(_), false) => // unchanged
            }
          }
          cur match {
            case Some(st) => state.update(st)
            case None => if (state.exists) state.remove()
          }
          out.result().iterator
      }
  }

  /** Fold one micro-batch of [[FileDelta]]s into the maintained
    * per-partition aggregate `(pdir, n_files, total_bytes)` — a pure
    * batch full-outer MERGE, idempotent per batch, called from
    * `foreachBatch`. Partitions whose counts reach zero are dropped.
    */
  def mergeDeltas(agg: DataFrame, deltas: DataFrame): DataFrame = {
    val d = deltas.groupBy("pdir")
      .agg(sum("d_files").as("d_files"), sum("d_bytes").as("d_bytes"))
    agg.join(d, Seq("pdir"), "full_outer")
      .select(col("pdir"),
        (coalesce(col("n_files"), lit(0L)) + coalesce(col("d_files"), lit(0L))).as("n_files"),
        (coalesce(col("total_bytes"), lit(0L)) + coalesce(col("d_bytes"), lit(0L))).as("total_bytes"))
      .filter(col("n_files") > 0)
  }

  case class ValEv(event_type: String, value: Double)
  case class MomentState(n: Long, sum: Double, sumsq: Double)
  case class AnomalyDecision(event_type: String, value: Double, flagged: Boolean)

  val AnomalyMinN = 30L // no flags until the baseline has this many points

  /** Streaming z-score anomaly monitor — the stateful twin of the batch
    * `events_anomaly`: per-type running moments (n, Σv, Σv²) live in
    * state; every event in a micro-batch is scored against the moments
    * AS OF THE PREVIOUS batches (prequential semantics — a batch can't
    * vote on its own baseline, and the decision is deterministic
    * whatever order rows arrive within the batch), then the batch folds
    * into the state. Flag at |v − μ| > 2σ via the sqrt-free comparison
    * n·(n·v − Σv)² > 4·n·(n·Σv² − Σv²ᵤₘ²). State is three numbers per
    * event type — bounded forever.
    */
  def anomalyStream(events: Dataset[ValEv])(implicit s: SparkSession): Dataset[AnomalyDecision] = {
    import s.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, AnomalyDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[ValEv], state: GroupState[MomentState]) =>
          val st = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
          val batch = rows.toSeq
          val out = batch.map { e =>
            val flagged = st.n >= AnomalyMinN && {
              val n = st.n.toDouble
              val dev = n * e.value - st.sum // n·(v − μ) scaled by n
              val varn2 = n * st.sumsq - st.sum * st.sum // n²σ²
              dev * dev > 4.0 * varn2
            }
            AnomalyDecision(typ, e.value, flagged)
          }
          state.update(MomentState(st.n + batch.size,
            st.sum + batch.map(_.value).sum,
            st.sumsq + batch.map(v => v.value * v.value).sum))
          out.iterator
      }
  }

  /** Streaming decontamination — the stream-static join pattern: the
    * STATIC eval/benchmark shingle index (benchmark-suite-sized, so it
    * broadcasts into every micro-batch) joined against the shingles of
    * arriving docs; a doc is flagged once it shares ≥ `minShared`
    * distinct shingles with any eval doc. Same shingle kernel and
    * threshold semantics as the batch
    * [[graft.operators.Dedup.textContamination]], so a batch backfill
    * and the live stream agree. Emit in UPDATE mode (counts grow
    * within a doc's micro-batch only — docs arrive whole).
    */
  def contaminationStream(docs: DataFrame, evalDocs: DataFrame,
      minShared: Long = 5L): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    val sh = graft.functions.PortableHash.sparkShingleHashes("text")
    val evalEx = evalDocs
      .select(col("doc_id").as("eval_doc"), explode(expr(sh)).as("h"))
    docs
      .select(col("doc_id"), explode(expr(sh)).as("h"))
      .join(broadcast(evalEx), Seq("h"))
      .groupBy("doc_id", "eval_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  case class DfState(df: Long)

  /** Streaming half of the batch `text_boilerplate` census: keyed by
    * (source, line fingerprint) with ONE long of state (the line's
    * within-source DOC frequency so far — distinct documents, the batch
    * census' own counter), emitting the CUMULATIVE (source, line_fp,
    * df) on every touch. Input rows are (source, line_fp, doc_id); a
    * doc repeating a line (blank lines from consecutive newlines)
    * counts ONCE — the batch contract — via an intra-batch distinct on
    * doc_id, which is exact under the docs-arrive-whole convention (a
    * document's lines land in one micro-batch; the same convention the
    * per-doc twins rely on). df is monotone per key, so a
    * last-write-wins (max-df) view is order- and split-independent;
    * joined with [[docCountStream]]'s per-source totals and filtered by
    * the batch operator's share bar it rebuilds the batch census
    * EXACTLY — the flagged set is a pure function of two monotone
    * counters. State is one long per DISTINCT (source, line) — the same
    * cardinality the batch census shuffles, kept in the state store; a
    * production deployment ages out lines that stay far under the df
    * floor with a timeout (the dedupStreamBounded discipline).
    *
    * PRECONDITION — exactly-once delivery (the monotone-counter twins'
    * shared contract): the state carries no per-doc evidence, so a doc
    * REDELIVERED in a LATER micro-batch (an at-least-once source
    * replaying acknowledged input) increments df again. The violation
    * is one-sided — df only INFLATES, so a boilerplate line is flagged
    * early, never missed — but the census then over-counts; a
    * deployment on an at-least-once source must dedup doc ids upstream
    * (dropDuplicatesWithinWatermark on doc_id, the dedupStreamBounded
    * shape) before feeding this twin. Within one micro-batch the
    * doc-id distinct below makes redelivery harmless; StreamingSpec's
    * redelivered-doc case documents the cross-batch behavior.
    */
  def boilerplateStream(lines: Dataset[(String, Long, Long)])
      : Dataset[(String, Long, Long)] = {
    import lines.sparkSession.implicits._
    lines
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[(String, Long, Long)],
            state: GroupState[DfState]) =>
          val df = state.getOption.map(_.df).getOrElse(0L) +
            rows.map(_._3).toSet.size
          state.update(DfState(df))
          Iterator.single((key._1, key._2, df))
      }
  }

  /** The census' denominator as a stream: cumulative docs-seen per
    * source (ONE long of state per source — sources-bounded, the
    * cheapest state in the twin family), emitted as (source, n_docs)
    * upserts. Monotone, so last-write-wins = max.
    */
  def docCountStream(docs: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long)],
            state: GroupState[DfState]) =>
          val n = state.getOption.map(_.df).getOrElse(0L) + rows.size
          state.update(DfState(n))
          Iterator.single((source, n))
      }
  }

  case class SceneState(idx: Int, lo: Long, hi: Long)

  /** Streaming twin of the batch `video_scene_cut` boundary feed — the
    * first VIDEO twin: frame hashes arrive as (doc_id, frame_idx,
    * ahash_lo, ahash_hi) (the aHashLoHi codec pass runs upstream,
    * map-side), keyed by doc_id with ONE (idx, lo, hi) record of state;
    * each frame emits its transition against the carried previous
    * frame, so a transition straddling a micro-batch boundary is
    * computed from state exactly like the batch lag window. Frames
    * arrive in increasing frame_idx order per video (the live decode
    * order) — within a batch they are sorted, and ACROSS batches the
    * order is enforced: a frame at/behind the carried frontier is
    * dropped rather than diffed against the wrong neighbor (bound
    * lateness upstream with a watermark if the source can regress).
    * JVM Long.bitCount over xor is bit-identical
    * to the batch operator's SQL bit_count, so the union of batch
    * outputs equals batch video_scene_cut EXACTLY under any split.
    */
  def sceneCutStream(frames: Dataset[(Long, Int, Long, Long)])
      : Dataset[(Long, Int, Long, Boolean)] = {
    import frames.sparkSession.implicits._
    frames
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[(Long, Int, Long, Long)],
            state: GroupState[SceneState]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          val out = Seq.newBuilder[(Long, Int, Long, Boolean)]
          var prev = state.getOption
          sorted.foreach { case (_, idx, lo, hi) =>
            // the cross-batch ordering convention is ENFORCED, not
            // assumed: a frame at/behind the carried frontier would be
            // diffed against the wrong neighbor (emitting a transition
            // the batch operator never computes) — drop it instead, so
            // the exact-equivalence contract can't silently break.
            if (prev.forall(_.idx < idx)) {
              prev.foreach { p =>
                val d = (java.lang.Long.bitCount(p.lo ^ lo) +
                  java.lang.Long.bitCount(p.hi ^ hi)).toLong
                out += ((doc, idx, d, d >= graft.operators.Video.SceneCutBits))
              }
              prev = Some(SceneState(idx, lo, hi))
            }
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  case class KllItem(cents: Long, tie: Long, lvl: Long)
  case class KllGroupState(ver: Long, items: Seq[KllItem])

  /** Streaming twin of the batch `sketch_kll` compactor — the sketch
    * family's one previously-ungraded production path (every other
    * mergeable sketch already has its keyed-state twin): items arrive
    * as (group, cents, tie, lvl) rows, keyed by group with the
    * CURRENT COMPACTED STATE as keyed state; each micro-batch merges
    * the incoming chunk into the carried state and re-compacts with
    * [[graft.operators.Sketches.kllCompactLocal]] — the SAME rung
    * semantics as the batch operator, run executor-local (union +
    * re-compact IS the KLL merge, so chunked arrival is just repeated
    * merge). Each batch emits the full post-compaction state tagged
    * with a per-group version counter; the final sketch is the max-ver
    * slice per group — order- and split-independent up to the
    * rank-error bar (the state is NOT split-invariant item-wise, by
    * the batch scaladoc's own contract; the ERROR BOUND is the merge
    * invariant, asserted in StreamingSpec under a median split AND an
    * arbitrary re-split, plus the checkpoint-restart harness).
    *
    * State is capacity + capacity·log₂(n/capacity) items per group —
    * KBs at any corpus size, the mergeable-sketch state contract.
    * Accepts lvl > 0 rows so two independently-built sketch states can
    * be REPLAYED through the same twin (the CRDT-merge argument
    * stream_hll_sliding makes).
    */
  def kllStream(items: Dataset[(String, Long, Long, Long)])
      : Dataset[(String, Long, Long, Long, Long)] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, rows: Iterator[(String, Long, Long, Long)],
            state: GroupState[KllGroupState]) =>
          val prev = state.getOption.getOrElse(KllGroupState(0L, Seq.empty))
          val merged = prev.items.map(i => (i.cents, i.tie, i.lvl)) ++
            rows.map(r => (r._2, r._3, r._4))
          val compacted = graft.operators.Sketches.kllCompactLocal(merged)
          val ver = prev.ver + 1L
          state.update(KllGroupState(ver,
            compacted.map { case (c, t, l) => KllItem(c, t, l) }))
          compacted.iterator.map { case (c, t, l) => (group, ver, c, t, l) }
      }
  }
}
