package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators for the training-data pipeline:
  * watermarked windowed aggregation and gap-based sessionization with
  * custom state. Both operate on a STREAMING or batch DataFrame with an
  * event-time timestamp column — the declarative forms Spark's
  * incremental planner optimizes (state-store-backed, late-data handling
  * via watermark). The reference library has no event-time surface at all
  * (processing-time foreachBatch only — SURVEY §2.5); these come from
  * Structured Streaming natively and are part of the engine's
  * beyond-reference pipeline story.
  *
  * Scale notes: windowed aggregation shuffles on (window, key) with
  * map-side partial aggregation and prunes state by watermark;
  * sessionization keeps ONE small state object per key (count/sum/
  * bounds), times out via the watermark, and emits a session row at most
  * once per closed session.
  */
object EventOps {

  /** Watermarked tumbling-window counts/sums per event type.
    * Works identically on a batch frame (degenerates to a plain groupBy).
    *
    * @param events    frame with `tsCol: timestamp`, `typeCol`, `valueCol`
    * @param window    tumbling window width, e.g. "1 hour"
    * @param watermark lateness bound, e.g. "2 hours"
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val w = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    w.groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window).as("win"),
        col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))
      .select(col("win.start").as("window_start"), col(typeCol),
        col("n"), col("total_value"))
  }

  /** [[sessionize]] via Spark's NATIVE `session_window` — the
    * declarative form Catalyst plans itself (merging-session state
    * store on streams, plain aggregation on batch). Same output schema
    * and semantics as the custom-state operator (spec-asserted equal on
    * batch); prefer this one unless the session needs custom per-event
    * logic the aggregate can't express (the reason [[sessionize]]
    * exists). `gap` is a duration string, e.g. "30 minutes".
    *
    * Boundary nuance: the native window is HALF-OPEN — an event at
    * exactly lastTs + gap starts a new session, where [[sessionize]]'s
    * inclusive rule (`diff <= gapMs`) continues the old one. Identical
    * on any data without exact-gap deltas (sub-ms timestamps make
    * those measure-zero in practice).
    */
  def sessionizeNative(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    // Null policy (shared with [[sessionize]]): an event with no event
    // time belongs to no session — dropped; a null value contributes 0
    // to totalValue but still counts in numEvents.
    val w0 = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    val w = w0.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
    w.groupBy(session_window(col(tsCol), gap), col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("numEvents"),
        sum(coalesce(col(valueCol).cast("double"), lit(0.0))).as("totalValue"),
        min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .select(col("key"),
        // NTZ timestamps can't convert straight to millis — go via
        // timestamp (pinned to the UTC session zone, the house contract).
        // unix_millis is exact integer micros/1000; a double round-trip
        // (cast-double * 1000) can be off by 1 ms near binade boundaries.
        unix_millis(col("__first").cast("timestamp")).as("startMs"),
        unix_millis(col("__last").cast("timestamp")).as("endMs"),
        col("numEvents"), col("totalValue"))
  }

  /** One closed session. */
  case class Session(
      key: Long,
      startMs: Long,
      endMs: Long,
      numEvents: Long,
      totalValue: Double)

  case class SessionState(
      startMs: Long,
      lastMs: Long,
      numEvents: Long,
      totalValue: Double)

  case class Ev(key: Long, tsMs: Long, value: Double, ts: java.sql.Timestamp)

  /** Gap-based sessionization via flatMapGroupsWithState: events for a
    * key belong to one session until `gapMs` of event-time silence; the
    * closed session is emitted exactly once (on the next event past the
    * gap, or on watermark timeout for streams).
    *
    * Input columns: `keyCol: long`, `tsCol: timestamp`, `valueCol:
    * double`. Returns a Dataset[Session].
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      gapMs: Long,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked TIMESTAMP column must survive (un-cast) into the
    // stateful operator's input or the event-time timeout is rejected
    // Null policy (shared with [[sessionizeNative]]): no event time ->
    // no session membership (dropped); null value -> contributes 0 to
    // totalValue, still counted in numEvents. The filter keeps the
    // watermarked attribute intact; the coalesce keeps the non-nullable
    // Ev encoder honest on nullable input columns.
    def proj(df: DataFrame) = df
      .where(col(tsCol).isNotNull && col(keyCol).isNotNull).select(
      col(keyCol).cast("long").as("key"),
      unix_millis(col(tsCol).cast("timestamp")).as("tsMs"),
      coalesce(col(valueCol).cast("double"), lit(0.0)).as("value"),
      col(tsCol).as("ts")) // NO cast: it would mint a fresh attribute
                           // without the watermark metadata
    val prepared =
      if (events.isStreaming) proj(events.withWatermark(tsCol, watermark))
      else proj(events)
    val timeout =
      if (events.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    // plain Boolean for the state closure — capturing the DataFrame would
    // serialize a driver-side object whose plan is null on executors
    val streamingMode = events.isStreaming

    // bind the encoder by column NAME (no .map round-trip — an object
    // map would re-serialize into fresh attributes and strip the
    // watermark metadata the stateful operator checks for)
    prepared.as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) { (key, rows, state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          // stream-side: watermark passed the gap — close the open session
          val s = state.get
          state.remove()
          Iterator.single(Session(key, s.startMs, s.lastMs, s.numEvents, s.totalValue))
        } else {
          val sorted = rows.toSeq.sortBy(_.tsMs)
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMs - s.lastMs <= gapMs =>
                cur = Some(SessionState(s.startMs, e.tsMs, s.numEvents + 1, s.totalValue + e.value))
              case Some(s) =>
                out += Session(key, s.startMs, s.lastMs, s.numEvents, s.totalValue)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
            }
          }
          cur match {
            case Some(s) if streamingMode =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            case Some(s) =>
              // batch mode: no further events can arrive — close it now
              out += Session(key, s.startMs, s.lastMs, s.numEvents, s.totalValue)
              state.remove()
            case None => ()
          }
          out.iterator
        }
      }
  }
}
