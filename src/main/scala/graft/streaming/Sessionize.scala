package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Gap-based sessionization over the event stream — the canonical custom
 * stateful-streaming operator (SURVEY §2.5: event-time state is a declared
 * capability extension; the reference has no session state at all).
 *
 * Two implementations with identical semantics:
 *  - [[byWindows]]: the batch/scale path — one shuffle on the key, a lag +
 *    running-sum window pair. This is what you run over 100 TB of history.
 *  - [[streaming]]: `flatMapGroupsWithState` with event-time timeout — the
 *    live path, emitting a session row once its gap expires.
 */
object Sessionize {

  /** A closed session. */
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     start_us: Long, end_us: Long)

  /** Per-key streaming state: the currently open session. */
  case class Open(sessionId: Long, n: Long, startUs: Long, endUs: Long)

  /**
   * Batch sessionization: session boundary where the gap to the previous
   * event of the same user exceeds `gapMinutes`; session id = running count
   * of boundaries per user.
   */
  def byWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .withColumn("__prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("__new_session",
        (col("__prev").isNull || col("ts_us") - col("__prev") > gapUs).cast("long"))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
  }

  /**
   * Streaming sessionization: per-key state = the open session; events
   * extend it while they arrive within the gap; the NEXT gap boundary for
   * that key closes and emits it.
   *
   * Contract: a key's final still-open session stays in state and is not
   * emitted until a later event closes it — tail-flush on watermark expiry
   * (GroupStateTimeout.EventTimeTimeout) is the production follow-up; for
   * complete-history results use [[byWindows]], which emits every session.
   */
  def streaming(spark: SparkSession, events: DataFrame,
                gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    events.select(col("user_id").cast("long"), col("ts_us").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Open), Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Open)]) =>
          // sort the micro-batch slice; state carries the open session across
          // batches (within a batch this mirrors the serial reference loop)
          val sorted = rows.map(_._2).toSeq.sorted
          var (nextId, open) = state.getOption
            .map { case (id, o) => (id, Option(o)) }.getOrElse((1L, None))
          val closed = Seq.newBuilder[Session]
          sorted.foreach { ts =>
            open = open match {
              case Some(o) if ts - o.endUs <= gapUs =>
                Some(o.copy(n = o.n + 1, endUs = ts))
              case Some(o) =>
                closed += Session(uid, o.sessionId, o.n, o.startUs, o.endUs)
                nextId += 1
                Some(Open(nextId, 1, ts, ts))
              case None => Some(Open(nextId, 1, ts, ts))
            }
          }
          open.foreach(o => state.update((nextId, o)))
          closed.result().iterator
      }
  }

  /**
   * Streaming sessionization WITH tail flush: like [[streaming]], but a
   * still-open session is emitted once the event-time watermark passes its
   * gap boundary (GroupStateTimeout.EventTimeTimeout) — no key waits
   * forever for a next event that may never come.
   *
   * `events` must carry a `ts` TimestampType column WITH a watermark
   * (`withWatermark("ts", ...)`) plus `user_id`.
   */
  def streamingWithTimeout(spark: SparkSession, events: DataFrame,
                           gapMinutes: Int = 30,
                           counterTtlGaps: Int = 100): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val counterTtlUs = counterTtlGaps.toLong * gapUs

    // the watermarked `ts` attribute must survive into the stateful
    // operator's child plan, so carry it alongside the long view
    events.select(col("user_id").cast("long"),
      unix_micros(col("ts")).cast("long"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Open), Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Open)]) =>
          if (state.hasTimedOut) {
            val (id, o) = state.get
            if (o == null) {
              // the counter-only state's retention expired → reclaim. A
              // user idle longer than counterTtlGaps×gap restarts at
              // session 1 afterwards — the documented retention bound.
              state.remove()
              Iterator.empty
            } else if (counterTtlGaps <= 0) {
              // retention disabled: reclaim immediately (ids may restart)
              state.remove()
              Iterator.single(Session(uid, id, o.n, o.startUs, o.endUs))
            } else {
              // watermark passed the open session's gap boundary → flush.
              // Keep the session counter (id+1, no open session) so a later
              // event for this key continues the per-user id sequence
              // instead of restarting at 1 and duplicating
              // (user_id, session_id) keys — but bound it with an
              // event-time TTL so the state store stays O(active users),
              // not O(all users ever seen).
              state.update((id + 1, null))
              // clamp: with a bursty watermark jump the computed instant
              // can already be in the past, and setTimeoutTimestamp
              // throws for timestamps behind the watermark (query death)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  (o.endUs + gapUs + counterTtlUs) / 1000))
              Iterator.single(Session(uid, id, o.n, o.startUs, o.endUs))
            }
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var (nextId, open) = state.getOption
              .map { case (id, o) => (id, Option(o)) }.getOrElse((1L, None))
            val closed = Seq.newBuilder[Session]
            sorted.foreach { ts =>
              open = open match {
                case Some(o) if ts - o.endUs <= gapUs =>
                  Some(o.copy(n = o.n + 1, endUs = ts))
                case Some(o) =>
                  closed += Session(uid, o.sessionId, o.n, o.startUs, o.endUs)
                  nextId += 1
                  Some(Open(nextId, 1, ts, ts))
                case None => Some(Open(nextId, 1, ts, ts))
              }
            }
            open.foreach { o =>
              state.update((nextId, o))
              // flush when event time passes end-of-session + gap; clamped
              // because an all-late batch can compute an instant behind
              // the watermark, which setTimeoutTimestamp rejects fatally
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  (o.endUs + gapUs) / 1000))
            }
            closed.result().iterator
          }
      }
  }
}
