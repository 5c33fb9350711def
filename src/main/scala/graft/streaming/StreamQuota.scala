package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain admission quotas — the ingest-time counterpart of
  * [[graft.ops.Sampling.capPerDomain]]: a batch corpus can cap each
  * domain after the fact, but an ingest pipeline must decide admit/drop
  * as documents ARRIVE, against everything that domain has ever sent.
  * (The reference library has no streaming surface; this extends the
  * same §2.5 sink story as [[StreamDedup]].)
  */
object StreamQuota {

  // public: Catalyst's generated deserializer needs accessor visibility
  case class QuotaRow(domain: String, id: Long, ts: java.sql.Timestamp)

  /** Admit at most `maxDocs` documents per domain over the STREAM'S
    * LIFETIME (no watermark expiry — a quota is a permanent budget, so
    * keys never time out; restarts recover the counters from the state
    * store via checkpointing). Within a micro-batch, arrivals are
    * admitted in (event time, id) order, so the admitted set is
    * deterministic for a given batch slicing.
    *
    * State is ONE long per domain — the smallest possible stateful
    * footprint, bounded by the domain universe, not the stream length.
    * The single shuffle is the groupByKey on domain; a pathological
    * one-domain feed serializes through one task, which is inherent to
    * per-domain sequential admission (pre-filter with a hash sample if
    * a domain's feed rate dwarfs its quota).
    *
    * Emits admitted rows: (domain, id, ts, rk) with rk the domain's
    * 1-based lifetime admission rank. Works identically on batch frames
    * (runs as one group pass).
    */
  def domainQuota(
      docs: DataFrame,
      tsCol: String,
      domainCol: String,
      idCol: String,
      maxDocs: Long): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select(
      col(domainCol).cast("string").as("domain"),
      col(idCol).cast("long").as("id"),
      col(tsCol).cast("timestamp").as("ts")).as[QuotaRow]
    val cap = maxDocs
    val admitted = rows.groupByKey(_.domain)
      .flatMapGroupsWithState[Long, (String, Long, java.sql.Timestamp, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, in: Iterator[QuotaRow], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = List.newBuilder[(String, Long, java.sql.Timestamp, Long)]
          in.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
            if (n < cap) {
              n += 1
              out += ((domain, r.id, r.ts, n))
            }
          }
          state.update(n)
          out.result().iterator
      }
    admitted.toDF("domain", "id", "ts", "rk")
  }

  // public: Catalyst's generated deserializer needs accessor visibility
  case class RateRow(domain: String, id: Long, ts: java.sql.Timestamp,
    winStartS: Long)

  /** Windowed per-domain RATE limit — [[domainQuota]] per tumbling
    * event-time window instead of per lifetime: admit at most `maxDocs`
    * documents of each domain within each `windowSeconds`-second
    * event-time window, in (event time, id) order. The crawl-politeness /
    * feed-throttling shape: a burst from one domain cannot flood a
    * training batch, but the domain is not banned forever.
    *
    * State is one long per LIVE (domain, window) pair, expired by
    * EVENT-TIME timeout once the watermark passes the window's end —
    * bounded by (domains × windows inside the watermark horizon), never
    * by stream length. The window start is computed as pure integer
    * arithmetic on epoch seconds ((epoch div w)·w — no float, so the
    * batch parity path replays in any engine; q_rate_limit).
    *
    * Emits admitted rows: (domain, id, ts, win_start_s, rk) with rk the
    * 1-based admission rank within the row's window. Works identically
    * on batch frames (timeouts never fire; one pass per group).
    */
  def rateLimit(
      docs: DataFrame,
      tsCol: String,
      domainCol: String,
      idCol: String,
      maxDocs: Long,
      windowSeconds: Long = 3600L,
      watermark: String = "2 hours"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    require(windowSeconds >= 1, s"windowSeconds must be >= 1, got $windowSeconds")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      col(domainCol).cast("string").as("domain"),
      col(idCol).cast("long").as("id"),
      col(tsCol).cast("timestamp").as("ts"))
    val marked = if (base.isStreaming) base.withWatermark("ts", watermark) else base
    val rows = marked.select(col("domain"), col("id"), col("ts"),
      (call_function("div", unix_timestamp(col("ts")), lit(windowSeconds)) *
        lit(windowSeconds)).as("winStartS")).as[RateRow]
    val cap = maxDocs
    val winMs = windowSeconds * 1000L
    val streaming = base.isStreaming
    val admitted = rows.groupByKey(r => (r.domain, r.winStartS))
      .flatMapGroupsWithState[Long, (String, Long, java.sql.Timestamp, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Long), in: Iterator[RateRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var n = state.getOption.getOrElse(0L)
            val out = List.newBuilder[(String, Long, java.sql.Timestamp, Long, Long)]
            in.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
              if (n < cap) {
                n += 1
                out += ((key._1, r.id, r.ts, r.winStartS, n))
              }
            }
            state.update(n)
            // the window's counter dies once the watermark passes its end
            if (streaming) state.setTimeoutTimestamp(key._2 * 1000L + winMs)
            out.result().iterator
          }
      }
    admitted.toDF("domain", "id", "ts", "win_start_s", "rk")
  }
}
