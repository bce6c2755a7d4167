package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators — the same
  * declarative plan runs over a stream (`readStream` → transform →
  * `writeStream`) or a table, which is the engine's answer to the
  * reference's real-time insert path (reference:
  * src/router/handle/insert_index_handle.rs — incremental updates):
  * micro-batch ingestion with event-time semantics instead of per-row
  * index mutation.
  *
  * Scale notes: the windowed aggregation is a streaming state store keyed
  * by (window, event_type) — partial aggregation per micro-batch, state
  * size O(open windows × types), bounded by the watermark which evicts
  * closed windows. Dedup keeps one state entry per event_id inside the
  * watermark horizon only.
  */
object EventStream {

  /** Tumbling 1-hour window per event_type: the streaming twin of
    * Queries.eventsWindowed (same output schema). Works on a streaming or
    * batch DataFrame with columns (ts TIMESTAMP, event_type, value).
    */
  def windowedAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.roundTo(sum("value"), 2).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Hopping 1-hour windows sliding every 15 min, per event_type: the
    * streaming twin of Queries.eventsHopping — identical window
    * membership (each event lands in 4 open windows), exact long
    * 1e-4-unit sums; state = open windows × types, overlap factor 4,
    * watermark-evicted like the tumbling case.
    */
  def hoppingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 10000 + lit(0.5)).cast("long")).as("sum_v4"))
      .select(
        unix_micros(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_v4"))

  /** Watermarked exactly-once dedup by event_id (late duplicates beyond
    * the watermark are dropped by definition).
    */
  def dedupByEventId(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Running per-type live counts — the streaming half of the PSI
    * drift monitor (twin of Queries.eventsPsi). A global unwindowed
    * count per event_type (update mode; state bounded by the type
    * domain); the sink joins each snapshot against the frozen baseline
    * counts and applies Queries.psiFromCounts, so the emitted report
    * IS the batch artifact. No watermark: the monitor's state is a
    * types-bounded count vector, so there is nothing to evict.
    */
  def runningTypeCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(count(lit(1)).as("n_b"))

  /** A versioned vector-record mutation flowing on a stream (the
    * reference's insert/upsert request payload, reference:
    * src/models/request/upsert.rs).
    */
  case class VectorMutation(id: Long, ts: Timestamp, vectors: Array[Float], data: String)

  /** Streaming upsert: latest-wins per id (by event time, then arrival),
    * emitted in Update mode each micro-batch — the streaming twin of
    * [[graft.operators.Upsert.merge]] and the reference's incremental
    * upsert path (reference: db/vector_database.rs:24-83). Downstream, a
    * `foreachBatch` MERGE INTO (or memory sink in tests) maintains the
    * searchable snapshot; state is one record per live id.
    */
  def upsertLatest(mutations: Dataset[VectorMutation]): Dataset[VectorMutation] = {
    import mutations.sparkSession.implicits._
    mutations
      .groupByKey(_.id)
      .mapGroupsWithState[VectorMutation, VectorMutation](GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[VectorMutation]) =>
          // ties on event time resolve to the LATER arrival (state comes
          // first in the iterator, so >= prefers the new record) — the
          // reference upsert overwrites unconditionally on re-upsert
          // (reference: db/vector_database.rs:24-83).
          val latest = (state.getOption.iterator ++ it)
            .reduceLeft((cur, m) => if (m.ts.getTime >= cur.ts.getTime) m else cur)
          state.update(latest)
          latest
      }
  }

  /** Open per-user session state for [[sessionize]]. */
  case class SessionState(sessionId: Long, nEvents: Long, firstEventId: Long,
                          lastEventId: Long, sumValue: Double, lastTsUs: Long)

  /** A closed session, emitted when the gap (or the event-time timeout)
    * fires — same schema as the batch twin Queries.eventsSessionize.
    */
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        first_event_id: Long, last_event_id: Long, sum_value: Double)

  private val gapUs: Long = 30L * 60 * 1000000

  /** Per-user funnel progress — the streaming state for [[windowFunnel]]:
    * earliest view, earliest QUALIFYING click (≤ 1 h after that view),
    * and the monotone stage flags. A few dozen bytes per user.
    */
  case class FunnelState(minViewUs: Long, minClickOkUs: Long,
                         s1: Boolean, s2: Boolean, s3: Boolean)

  /** Current per-user stage flags, re-emitted each micro-batch the user
    * appears in. Flags are MONOTONE (a reached stage never un-reaches),
    * so any downstream max-merge of updates equals the final state —
    * the property StreamingSpec exploits.
    */
  case class FunnelOut(user_id: Long, s1: Int, s2: Int, s3: Int)

  private val funnelWindowUs: Long = 3600L * 1000000L

  /** Streaming twin of [[graft.Queries.eventsWindowFunnel]] (ordered
    * 3-stage funnel, 1 h per-step timeout) as a mapGroupsWithState
    * state machine: each event consults the state built from PRIOR
    * events only (exactly the batch twin's
    * unbounded-preceding-to-1-preceding frame), then folds itself in.
    * Events are sorted per (user, micro-batch); across batches the
    * state carries the chain, so a time-ordered replay reproduces the
    * batch answer exactly. Timestamps convert to integer microseconds
    * (getTime ms + sub-ms nanos) — the same unix_micros the batch twin
    * compares in.
    */
  def windowFunnel(events: Dataset[(Long, Long, Timestamp, String)]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelOut](GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(
            FunnelState(Long.MaxValue, Long.MaxValue, s1 = false, s2 = false, s3 = false))
          def micros(ts: Timestamp): Long =
            ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
          it.toSeq.sortBy(e => (micros(e._3), e._2)).foreach { case (_, _, ts, typ) =>
            val t = micros(ts)
            // read prior-row state first; the row's own contribution
            // (a view's min-update) folds in last, so a view can never
            // qualify its own-row click — matching the batch frame
            if (typ == "click" && st.minViewUs != Long.MaxValue &&
                t <= st.minViewUs + funnelWindowUs)
              st = st.copy(s2 = true, minClickOkUs = math.min(st.minClickOkUs, t))
            if (typ == "purchase" && st.minClickOkUs != Long.MaxValue &&
                t <= st.minClickOkUs + funnelWindowUs)
              st = st.copy(s3 = true)
            if (typ == "view")
              st = st.copy(s1 = true, minViewUs = math.min(st.minViewUs, t))
          }
          state.update(st)
          FunnelOut(userId, if (st.s1) 1 else 0, if (st.s2) 1 else 0, if (st.s3) 1 else 0)
      }
  }

  /** Streaming gap-sessionization via flatMapGroupsWithState — the
    * custom-state path the reference's incremental inserts would need for
    * session analytics. State per user is one open session (a few dozen
    * bytes); the event-time timeout closes sessions `gap` after the
    * watermark passes their last event, so state never grows with
    * history. The batch twin (Queries.eventsSessionize) produces the
    * same sessions with a window cumsum; StreamingSpec asserts the two
    * agree on replay.
    *
    * Within a micro-batch, events for a user may arrive unordered — the
    * iterator is sorted per group (micro-batch-local sort, no shuffle
    * beyond the groupByKey hash partitioning).
    */
  /** Rolling EWMA state for [[ewmaForecast]]: the open hour bucket, its
    * running count, the fold over CLOSED buckets, and a per-type event
    * counter (strictly increasing, so "latest emission" is selectable
    * downstream). A few dozen bytes per event type.
    */
  case class EwmaState(bucketUs: Long, openN: Long, ewma: Double,
                       nClosed: Long, nSeen: Long)

  /** Per-type tentative forecast re-emitted each micro-batch the type
    * appears in; `ewma_forecast` is UNROUNDED (callers round once at
    * the edge, like the batch twin's roundTo).
    */
  case class EwmaOut(event_type: String, n_seen: Long, n_buckets: Long,
                     last_n: Long, ewma_forecast: Double)

  /** Streaming twin of [[graft.Queries.eventsEwmaForecast]] (α = 0.3
    * hourly-volume EWMA) as a mapGroupsWithState fold: only CLOSED hour
    * buckets enter the persistent state — the open bucket folds in
    * non-destructively at emission time — so partially-filled buckets
    * never contaminate the state, and once the final bucket is complete
    * the emitted value IS the batch fold (identical multiply-add order:
    * 0.3·n + 0.7·acc, seeded with the first bucket's count).
    *
    * Late events — a bucket OLDER than the open one arriving in a later
    * micro-batch — fold into the open bucket instead of re-opening the
    * old one: re-opening would close the open bucket into the EWMA
    * early and inflate n_buckets permanently. With an in-order feed
    * (bucket boundaries respected across micro-batches) the guard is
    * inert and the final emission equals the batch twin exactly; under
    * disorder the count total is preserved and only bucket attribution
    * is approximate — the standard watermark trade-off.
    */
  def ewmaForecast(events: Dataset[(String, Long, Timestamp)]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    val hourUs = 3600L * 1000000L
    events.groupByKey(_._1)
      .mapGroupsWithState[EwmaState, EwmaOut](GroupStateTimeout.NoTimeout()) {
        case (typ, it, state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(Long.MinValue, 0L, 0.0, 0L, 0L))
          def micros(ts: Timestamp): Long =
            ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
          it.toSeq.sortBy(e => (micros(e._3), e._2)).foreach { case (_, _, ts) =>
            val b = micros(ts) / hourUs * hourUs
            if (st.bucketUs == Long.MinValue)
              st = st.copy(bucketUs = b, openN = 1L, nSeen = st.nSeen + 1)
            else if (b <= st.bucketUs) // open bucket, or LATE (b < open): never re-open a closed bucket
              st = st.copy(openN = st.openN + 1, nSeen = st.nSeen + 1)
            else {
              val closed =
                if (st.nClosed == 0) st.openN.toDouble
                else 0.3 * st.openN + 0.7 * st.ewma
              st = EwmaState(b, 1L, closed, st.nClosed + 1, st.nSeen + 1)
            }
          }
          state.update(st)
          val tentative =
            if (st.nClosed == 0) st.openN.toDouble
            else 0.3 * st.openN + 0.7 * st.ewma
          EwmaOut(typ, st.nSeen, st.nClosed + 1, st.openN, tentative)
      }
  }

  def sessionize(events: Dataset[(Long, Long, Timestamp, Double)],
                 watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "event_id", "ts", "value")
      .withWatermark("ts", watermark)
      .as[(Long, Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          val out = Seq.newBuilder[SessionOut]
          if (state.hasTimedOut) {
            val s = state.get
            out += SessionOut(userId, s.sessionId, s.nEvents, s.firstEventId, s.lastEventId, s.sumValue)
            state.remove()
          } else {
            var cur = state.getOption.orNull
            it.toSeq.sortBy(e => (e._3.getTime, e._2)).foreach { case (_, eventId, ts, value) =>
              val tUs = ts.getTime * 1000L
              if (cur == null) {
                cur = SessionState(1L, 1L, eventId, eventId, value, tUs)
              } else if (tUs - cur.lastTsUs > gapUs) {
                out += SessionOut(userId, cur.sessionId, cur.nEvents, cur.firstEventId,
                  cur.lastEventId, cur.sumValue)
                cur = SessionState(cur.sessionId + 1, 1L, eventId, eventId, value, tUs)
              } else {
                // min/max ids, matching the batch twin's min()/max() aggs
                cur = SessionState(cur.sessionId, cur.nEvents + 1,
                  math.min(cur.firstEventId, eventId),
                  math.max(cur.lastEventId, eventId), cur.sumValue + value, tUs)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.lastTsUs / 1000L + gapUs / 1000L)
            }
          }
          out.result().iterator
      }
  }
}
