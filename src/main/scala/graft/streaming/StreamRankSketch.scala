package graft.streaming

import graft.ops.GroupedQuantileSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed RANK sketch: per-event-time-window bottom-s
  * (rk, value) summaries from a watermarked stream, with BOUNDED state —
  * the streaming producer for the batch rank-sketch layer ("p99 doc
  * length per hour of ingest, composed weekly": each closed window emits
  * its summary once; downstream merges/queries them with
  * [[graft.ops.GroupedQuantileSketch]] semantics, window start as the
  * group).
  *
  * Why stateful-custom rather than declarative: a bottom-s cut is a rank
  * window, which Structured Streaming does not support over unbounded
  * input, and `collect_list`-then-slice state grows with stream volume.
  * `flatMapGroupsWithState` keyed by window holds EXACTLY the summary as
  * state — ≤ s (rk, value) pairs per open window regardless of volume
  * (each batch folds its rows through a size-s bounded heap, O(log s)
  * per row) — and emits it exactly once when the watermark passes the
  * window end (event-time timeout), the same
  * close-on-watermark discipline as [[EventOps.sessionize]]. Batch
  * frames run the identical fold and emit immediately, so stream==batch
  * parity is assertable (StreamRankSketchSpec pins emitted summaries ==
  * [[graft.ops.GroupedQuantileSketch.buildGrouped]] over the same rows
  * windowed as a group column).
  *
  * Determinism: rk is the house md5 rank key
  * ([[graft.ops.Sampling.uniformBits60]]) and the cut is bottom-s by
  * (rk, value) lexicographic order — a pure function of the window's row
  * multiset, independent of batch boundaries, arrival order, and
  * partitioning (bottom-k of a union is bottom-k of the parts'
  * bottom-k's).
  *
  * Policy (rule 10): NULL ts, NULL id, or NULL value rows carry no
  * window / no sample identity / no rank and are EXCLUDED. Late rows
  * beyond the watermark are dropped by the engine; rows arriving after
  * a window's summary was emitted are lost to that summary (the
  * documented watermark contract — widen the watermark, not the state).
  *
  * Long values only, matching the integral builders: quantile answers
  * need value-order tie-breaks to be the stored order, and the emitted
  * summary feeds the long-typed grouped-sketch surface. (A double
  * stream can pre-project [[graft.functions.SortableBits]] longs and
  * invert at read — the q_quantiles_double machinery — but the primary
  * telemetry columns here are counts/lengths.)
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
      n: Long)

  /** [[WindowSummary]] with the stored double inverted back from its
    * sortable-bits ride (the [[windowedBottomKDouble]] output).
    */
  final case class WindowSummaryDouble(
      windowStartMs: Long,
      windowEndMs: Long,
      rk: Long,
      value: Double,
      n: Long)

  // In/BkState are public because Spark's codegen'd SafeProjection
  // constructs encoder classes from generated code — a private case
  // class fails at janino compile, not at analysis
  final case class In(
      winStartMs: Long,
      winEndMs: Long,
      rk: Long,
      value: Long,
      ts: java.sql.Timestamp)

  /** Bounded per-window state: the current bottom-s, kept sorted by
    * (rk, value). Arrays (not Seq) keep the encoder primitive and the
    * state compact.
    */
  final case class BkState(
      winEndMs: Long,
      nSeen: Long,
      rks: Array[Long],
      values: Array[Long])

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
      seed: String): Dataset[WindowSummary] = {
    require(s >= 16 && s <= 65536,
      s"StreamRankSketch.windowedBottomK: s must be in [16, 65536], got $s")
    graft.ops.Quantiles.requireIntegral(events, valueCol,
      "StreamRankSketch.windowedBottomK",
      "Pre-project a sortable-bits long for fractional values (no " +
        "truncation) and invert at read.")
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked TIMESTAMP column must survive (un-cast) into the
    // stateful operator's input or the event-time timeout is rejected
    // (the EventOps.sessionize lesson)
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
        graft.ops.Sampling.uniformBits60(col(idCol), seed).as("rk"),
        col(valueCol).cast("long").as("value"),
        col(tsCol).as("ts"))
    if (!events.isStreaming) {
      // batch frames take the DECLARATIVE cut (the GroupedQuantileSketch
      // window, map-side WindowGroupLimit): groupByKey would full-shuffle
      // the corpus and fold each window in ONE task — measured 14.2 s vs
      // ~1 s at the 100x decade (docs/SCALE.md). Identical result by the
      // bottom-k purity the spec pins; the stateful fold below is the
      // streaming path, where per-microbatch volume bounds the shuffle.
      val projected = proj(events).drop("ts")
      val cut = GroupedQuantileSketch.cutPerGroup(
        projected, Seq("winStartMs", "winEndMs"), s)
      // per-window totals ride along so scaled ranks work downstream;
      // the frames share lineage, so join on a RENAMED key (the
      // GroupedQuantileSketch.rankOf exprId lesson)
      val cnts = projected.groupBy(col("winStartMs").as("__cws"))
        .agg(count(lit(1)).as("n"))
      return cut.join(cnts, col("winStartMs") === col("__cws"))
        .select(col("winStartMs").as("windowStartMs"),
          col("winEndMs").as("windowEndMs"), col("rk"), col("value"),
          col("n"))
        .as[WindowSummary]
    }
    val prepared = proj(events.withWatermark(tsCol, watermark))
    val timeout = GroupStateTimeout.EventTimeTimeout
    val cap = s

    prepared.as[In]
      .groupByKey(_.winStartMs)
      .flatMapGroupsWithState[BkState, WindowSummary](
        OutputMode.Append, timeout) { (winStart, rows, state: GroupState[BkState]) =>
        if (state.hasTimedOut) {
          // watermark passed the window end - the summary is final
          val st = state.get
          state.remove()
          emit(winStart, st)
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

  /** [[windowedBottomK]] for FLOAT/DOUBLE value columns — the typed
    * sibling (the shared two-typed discipline: the long entry point
    * refuses fractional input rather than truncating, and this path
    * loses nothing). The value rides the fold as its codegen'd
    * [[graft.functions.SortableBits]] long (monotone + involutive), so
    * the cut's (rk, bits) tie-break equals (rk, double) order and the
    * emitted summary inverts bit-exactly back to the stored double.
    * Policy matches [[graft.ops.GroupedQuantileSketch.buildGroupedDouble]]
    * (parity spec-pinned): NULL and NaN values carry no rank and are
    * EXCLUDED; −0.0 normalizes to +0.0 before the transform (the
    * transform itself distinguishes them — SortableBits scaladoc).
    */
  def windowedBottomKDouble(
      events: DataFrame,
      tsCol: String,
      idCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      s: Int,
      seed: String): Dataset[WindowSummaryDouble] = {
    graft.ops.Quantiles.requireFloating(events, valueCol,
      "StreamRankSketch.windowedBottomKDouble",
      "For integral values use windowedBottomK (exact at the full 64-bit " +
        "range).")
    val spark = events.sparkSession
    import spark.implicits._
    val projected = events
      .where(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .withColumn("__sb", graft.functions.SortableBits.sortable(
        col(valueCol).cast("double") + lit(0.0)))
    windowedBottomK(projected, tsCol, idCol, "__sb",
        windowDuration, watermark, s, seed)
      .map(w => WindowSummaryDouble(w.windowStartMs, w.windowEndMs, w.rk,
        graft.functions.SortableBits.fromSortable(w.value), w.n))
  }

  private def emit(winStartMs: Long, st: BkState): Iterator[WindowSummary] =
    st.rks.indices.iterator.map(i =>
      WindowSummary(winStartMs, st.winEndMs, st.rks(i), st.values(i),
        st.nSeen))
}
