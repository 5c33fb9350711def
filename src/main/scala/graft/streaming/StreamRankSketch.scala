package graft.streaming

import graft.ops.GroupedQuantileSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed RANK sketch: per-event-time-window (optionally
  * per-group) bottom-s (rk, value) summaries from a watermarked stream,
  * with BOUNDED state — the streaming producer for the batch rank-sketch
  * layer ("p99 doc length per language per hour of ingest, composed
  * weekly": each closed window×group emits its summary once; downstream
  * rebuilds the full [[graft.ops.GroupedQuantileSketch]] surface from a
  * sink of emissions via `fromWindowSummaries` /
  * `fromWindowGroupSummaries`).
  *
  * Why stateful-custom rather than declarative: a bottom-s cut is a rank
  * window, which Structured Streaming does not support over unbounded
  * input, and `collect_list`-then-slice state grows with stream volume.
  * `flatMapGroupsWithState` keyed by (window, group) holds EXACTLY the
  * summary as state — ≤ s (rk, value) pairs plus one count per open key
  * regardless of volume (each batch folds its rows through a size-s
  * bounded heap, O(log s) per row) — and emits it exactly once when the
  * watermark passes the window end (event-time timeout), the same
  * close-on-watermark discipline as [[EventOps.sessionize]]. Batch
  * frames take the DECLARATIVE cut instead (the GroupedQuantileSketch
  * window, map-side WindowGroupLimit): groupByKey would full-shuffle
  * the corpus and fold each key in ONE task — measured 14.2 s vs ~6 s
  * at the 100× decade (docs/SCALE.md). Identical result by bottom-k
  * purity; stream == batch == grouped-build parity is spec-pinned
  * (StreamRankSketchSpec).
  *
  * Determinism: rk is the house md5 rank key
  * ([[graft.ops.Sampling.uniformBits60]]) and the cut is bottom-s by
  * (rk, value) lexicographic order — a pure function of each key's row
  * multiset, independent of batch boundaries, arrival order, and
  * partitioning (bottom-k of a union is bottom-k of the parts'
  * bottom-k's).
  *
  * Policy (rule 10): NULL ts, NULL id, or NULL value rows carry no
  * window / no sample identity / no rank and are EXCLUDED; a NULL GROUP
  * value is a legitimate retained group (the
  * [[graft.ops.GroupedQuantileSketch]] policy — the group rides as its
  * string form). Late rows beyond the watermark are dropped by the
  * engine; rows arriving after a window's summary was emitted are lost
  * to that summary (the documented watermark contract — widen the
  * watermark, not the state).
  *
  * The long entry points refuse fractional value columns; the `Double`
  * siblings ride values through the fold as codegen'd
  * [[graft.functions.SortableBits]] longs (monotone + involutive — the
  * cut's tie-break equals double order) and invert bit-exactly at
  * emission, with the [[graft.ops.Quantiles.exactPctDouble]] NaN/−0.0
  * policy.
  */
object StreamRankSketch {

  /** One summary row of a closed (or, in batch mode, complete) window.
    * `n` is the window's TOTAL folded row count (identical on every row
    * of the window) — it is what lets downstream consumers answer
    * SCALED rank/CDF questions, not just sample quantiles; feed the
    * rows to [[graft.ops.GroupedQuantileSketch.fromWindowSummaries]]
    * to get the full grouped-sketch surface back.
    */
  final case class WindowSummary(
      windowStartMs: Long,
      windowEndMs: Long,
      rk: Long,
      value: Long,
      n: Long,
      portable: Boolean)

  /** [[WindowSummary]] with the stored double inverted back from its
    * sortable-bits ride (the [[windowedBottomKDouble]] output).
    */
  final case class WindowSummaryDouble(
      windowStartMs: Long,
      windowEndMs: Long,
      rk: Long,
      value: Double,
      n: Long,
      portable: Boolean)

  /** [[WindowSummary]] with the stratum riding along (the
    * [[windowedBottomKByGroup]] output; `group` is the group value's
    * string form, null for a null group). `n` is the window×group
    * folded row count.
    */
  final case class WindowGroupSummary(
      windowStartMs: Long,
      windowEndMs: Long,
      group: String,
      rk: Long,
      value: Long,
      n: Long,
      portable: Boolean)

  /** [[WindowGroupSummary]] with the double inverted back (the
    * [[windowedBottomKByGroupDouble]] output).
    */
  final case class WindowGroupSummaryDouble(
      windowStartMs: Long,
      windowEndMs: Long,
      group: String,
      rk: Long,
      value: Double,
      n: Long,
      portable: Boolean)

  // In/BkState are public because Spark's codegen'd SafeProjection
  // constructs encoder classes from generated code — a private case
  // class fails at janino compile, not at analysis
  final case class In(
      winStartMs: Long,
      winEndMs: Long,
      group: String,
      rk: Long,
      value: Long,
      ts: java.sql.Timestamp)

  /** Bounded per-(window, group) state: the current bottom-s, kept
    * sorted by (rk, value), plus the total folded row count. Arrays
    * (not Seq) keep the encoder primitive and the state compact.
    */
  final case class BkState(
      winEndMs: Long,
      nSeen: Long,
      rks: Array[Long],
      values: Array[Long])

  private def requireS(s: Int, site: String): Unit =
    graft.ops.QuantileSketch.requireS(s, s"StreamRankSketch.$site")

  /** Per-event-time-window bottom-s summaries. Emits one
    * [[WindowSummary]] row per retained sample row, exactly once per
    * window (on watermark passing the window end for streams;
    * immediately for batch frames).
    *
    * @param events     streaming or batch frame
    * @param tsCol      event-time timestamp column
    * @param idCol      unique row identity (the sampling randomness —
    *                   the [[graft.ops.QuantileSketch]] identity contract)
    * @param valueCol   integral value column (fractional input refuses —
    *                   the shared type-guard discipline)
    * @param windowDuration e.g. "10 minutes" (tumbling)
    * @param watermark  lateness bound, e.g. "10 minutes"
    * @param s          per-window summary size in [16, 65536]
    * @param seed       rank-key seed (geometry — summaries only compose
    *                   across identical seeds)
    */
  def windowedBottomK(
      events: DataFrame,
      tsCol: String,
      idCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      s: Int,
      seed: String,
      portableHash: Boolean = true): Dataset[WindowSummary] = {
    requireS(s, "windowedBottomK")
    graft.ops.Quantiles.requireIntegral(events, valueCol,
      "StreamRankSketch.windowedBottomK",
      "Use windowedBottomKDouble for fractional values (no truncation).")
    val spark = events.sparkSession
    import spark.implicits._
    windowedBottomKByGroup(events.withColumn("__nogroup", lit("")),
        tsCol, "__nogroup", idCol, valueCol, windowDuration, watermark,
        s, seed, portableHash)
      .map(w => WindowSummary(w.windowStartMs, w.windowEndMs, w.rk,
        w.value, w.n, w.portable))
  }

  /** [[windowedBottomK]] for FLOAT/DOUBLE value columns — the typed
    * sibling (the shared two-typed discipline: the long entry point
    * refuses fractional input rather than truncating, and this path
    * loses nothing). See the object doc for the sortable-bits ride and
    * the NaN/−0.0 policy (parity with
    * [[graft.ops.GroupedQuantileSketch.buildGroupedDouble]] is
    * spec-pinned).
    */
  def windowedBottomKDouble(
      events: DataFrame,
      tsCol: String,
      idCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      s: Int,
      seed: String,
      portableHash: Boolean = true): Dataset[WindowSummaryDouble] = {
    val spark = events.sparkSession
    import spark.implicits._
    windowedBottomK(sortableProjected(events, valueCol,
        "StreamRankSketch.windowedBottomKDouble"),
        tsCol, idCol, "__sb", windowDuration, watermark, s, seed,
        portableHash)
      .map(w => WindowSummaryDouble(w.windowStartMs, w.windowEndMs, w.rk,
        graft.functions.SortableBits.fromSortable(w.value), w.n, w.portable))
  }

  /** Per-(event-time window × group) bottom-s summaries — the streaming
    * producer of [[graft.ops.GroupedQuantileSketch]]-shaped strata
    * ("p99 per language per hour"). State is ≤ s pairs + one count per
    * OPEN (window, group) key: window count is bounded by the watermark
    * horizon, group count by the stratum cardinality — the same state
    * regime as any streaming groupBy over those keys. Group values ride
    * as their string form (null group retained, rule 10).
    */
  def windowedBottomKByGroup(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      idCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      s: Int,
      seed: String,
      portableHash: Boolean = true): Dataset[WindowGroupSummary] = {
    requireS(s, "windowedBottomKByGroup")
    graft.ops.Quantiles.requireIntegral(events, valueCol,
      "StreamRankSketch.windowedBottomKByGroup",
      "Use windowedBottomKByGroupDouble for fractional values (no " +
        "truncation).")
    val spark = events.sparkSession
    import spark.implicits._
    // normalize the event-time type BEFORE the watermark: TIMESTAMP_NTZ
    // parquet columns (rule-3 drift) would fail the In.ts encoder upcast
    // on the STREAMING path only — casting first, then watermarking,
    // keeps the watermark metadata on the attribute the stateful
    // operator reads (casting AFTER the watermark would mint a fresh
    // attribute without it: the EventOps.sessionize lesson)
    val normalized = events.withColumn(tsCol, col(tsCol).cast("timestamp"))
    // the watermarked TIMESTAMP column must survive (un-cast) into the
    // stateful operator's input or the event-time timeout is rejected
    def proj(df: DataFrame) = df
      .where(col(tsCol).isNotNull && col(idCol).isNotNull &&
        col(valueCol).isNotNull)
      .withColumn("__w", window(col(tsCol), windowDuration))
      .select(
        // the window BOUNDS may cast (unix_millis needs TIMESTAMP and
        // parquet event times can arrive TIMESTAMP_NTZ — rule-3 drift);
        // only the watermarked ts column below must stay un-cast
        unix_millis(col("__w.start").cast("timestamp")).as("winStartMs"),
        unix_millis(col("__w.end").cast("timestamp")).as("winEndMs"),
        col(groupCol).cast("string").as("group"),
        graft.ops.QuantileSketch.rankKey(col(idCol), seed, portableHash).as("rk"),
        col(valueCol).cast("long").as("value"),
        col(tsCol).as("ts"))
    if (!events.isStreaming) {
      // batch frames take the DECLARATIVE cut (map-side WindowGroupLimit;
      // see the object doc for the measured adjudication)
      val projected = proj(normalized).drop("ts")
      val cut = GroupedQuantileSketch.cutPerGroup(
        projected, Seq("winStartMs", "winEndMs", "group"), s)
      // per-key totals ride along so scaled ranks work downstream; the
      // frames share lineage, so join on RENAMED keys (the
      // GroupedQuantileSketch.rankOf exprId lesson); group is null-safe
      val cnts = projected
        .groupBy(col("winStartMs").as("__cws"), col("group").as("__cg"))
        .agg(count(lit(1)).as("n"))
      return cut.join(cnts,
          col("winStartMs") === col("__cws") && col("group") <=> col("__cg"))
        .select(col("winStartMs").as("windowStartMs"),
          col("winEndMs").as("windowEndMs"), col("group"), col("rk"),
          col("value"), col("n"), lit(portableHash).as("portable"))
        .as[WindowGroupSummary]
    }
    val prepared = proj(normalized.withWatermark(tsCol, watermark))
    val cap = s

    prepared.as[In]
      .groupByKey(r => (r.winStartMs, r.group))
      .flatMapGroupsWithState[BkState, WindowGroupSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((winStart, group), rows, state: GroupState[BkState]) =>
          if (state.hasTimedOut) {
            // watermark passed the window end - the summary is final
            val st = state.get
            state.remove()
            emit(winStart, group, st, portableHash)
          } else {
            // bounded fold: a size-cap max-heap on (rk, value) - a row
            // enters only by evicting the current lexicographic maximum,
            // so memory is O(s) however large the batch group is
            val ord = Ordering.Tuple2[Long, Long]
            val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)
            var endMs = 0L
            var nSeen = 0L
            state.getOption.foreach { st =>
              endMs = st.winEndMs
              nSeen = st.nSeen
              var i = 0
              while (i < st.rks.length) {
                heap.enqueue((st.rks(i), st.values(i))); i += 1
              }
            }
            rows.foreach { r =>
              endMs = r.winEndMs
              nSeen += 1
              val e = (r.rk, r.value)
              if (heap.size < cap) heap.enqueue(e)
              else if (ord.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
            }
            val sorted = heap.dequeueAll.reverse // ascending (rk, value)
            val st = BkState(endMs, nSeen, sorted.map(_._1).toArray,
              sorted.map(_._2).toArray)
            state.update(st)
            // fires once the watermark passes the window end
            state.setTimeoutTimestamp(st.winEndMs)
            Iterator.empty
          }
      }
  }

  /** [[windowedBottomKByGroup]] for FLOAT/DOUBLE value columns (the
    * sortable-bits ride — see [[windowedBottomKDouble]]).
    */
  def windowedBottomKByGroupDouble(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      idCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      s: Int,
      seed: String,
      portableHash: Boolean = true): Dataset[WindowGroupSummaryDouble] = {
    val spark = events.sparkSession
    import spark.implicits._
    windowedBottomKByGroup(sortableProjected(events, valueCol,
        "StreamRankSketch.windowedBottomKByGroupDouble"),
        tsCol, groupCol, idCol, "__sb", windowDuration, watermark, s, seed,
        portableHash)
      .map(w => WindowGroupSummaryDouble(w.windowStartMs, w.windowEndMs,
        w.group, w.rk, graft.functions.SortableBits.fromSortable(w.value),
        w.n, w.portable))
  }

  /** The double entry points' shared projection: refuse non-floating
    * input, exclude NaN (NULL is excluded downstream), normalize −0.0,
    * ride as the codegen'd sortable-bits long.
    */
  private def sortableProjected(events: DataFrame, valueCol: String,
      site: String): DataFrame = {
    graft.ops.Quantiles.requireFloating(events, valueCol, site,
      "For integral values use the long entry point (exact at the full " +
        "64-bit range).")
    events
      .where(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .withColumn("__sb", graft.functions.SortableBits.sortable(
        col(valueCol).cast("double") + lit(0.0)))
  }

  private def emit(winStartMs: Long, group: String, st: BkState,
      portableHash: Boolean): Iterator[WindowGroupSummary] =
    st.rks.indices.iterator.map(i =>
      WindowGroupSummary(winStartMs, st.winEndMs, group, st.rks(i),
        st.values(i), st.nSeen, portableHash))
}
