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

  /** Bounded admission shared by [[domainQuota]] and [[rateLimit]]: the
    * `seats` smallest rows of `in` by `key`, ascending. A size-`seats`
    * max-heap keeps memory O(seats) and time O(M log seats) no matter
    * how large the burst M is — the group that needs throttling most is
    * exactly the one that must not be buffered whole; with zero seats
    * the iterator is drained without allocation.
    */
  private def admit[R](in: Iterator[R], seats: Long)(key: R => (Long, Long)): Seq[R] = {
    if (seats <= 0) return Nil
    val s = math.min(seats, Int.MaxValue.toLong - 1).toInt
    val heap = new scala.collection.mutable.PriorityQueue[R]()(Ordering.by(key))
    in.foreach { r =>
      if (heap.size < s) heap.enqueue(r)
      else if (Ordering[(Long, Long)].lt(key(r), key(heap.head))) {
        heap.dequeue(); heap.enqueue(r)
      }
    }
    heap.dequeueAll.reverse
  }

  /** Admit at most `maxDocs` documents per domain over the STREAM'S
    * LIFETIME (no watermark expiry — a quota is a permanent budget, so
    * keys never time out; restarts recover the counters from the state
    * store via checkpointing). Admission is first-come-first-served
    * ACROSS micro-batches; WITHIN a micro-batch, arrivals are admitted
    * in (event time, id) order, so the admitted set is deterministic
    * for a given batch slicing (and fully deterministic in batch mode,
    * where there is one "batch").
    *
    * State is ONE long per domain — the smallest possible stateful
    * footprint, bounded by the domain universe, not the stream length.
    * The single shuffle is the groupByKey on domain; a pathological
    * one-domain feed serializes through one task, which is inherent to
    * per-domain sequential admission (pre-filter with a hash sample if
    * a domain's feed rate dwarfs its quota). Per-batch memory is
    * O(remaining seats), never O(burst): see [[admit]].
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
          val out = admit(in, cap - n)(r => (r.ts.getTime, r.id)).map { r =>
            n += 1
            (domain, r.id, r.ts, n)
          }
          state.update(n)
          out.iterator
      }
    admitted.toDF("domain", "id", "ts", "rk")
  }

  // public: Catalyst's generated deserializer needs accessor visibility
  case class RateRow(domain: String, id: Long, ts: java.sql.Timestamp,
    winStartS: Long)

  /** Windowed per-domain RATE limit — [[domainQuota]] per tumbling
    * event-time window instead of per lifetime: admit at most `maxDocs`
    * documents of each domain within each `windowSeconds`-second
    * event-time window. The crawl-politeness / feed-throttling shape:
    * a burst from one domain cannot flood a training batch, but the
    * domain is not banned forever. As with [[domainQuota]], admission is
    * FCFS across micro-batches and (event time, id)-ordered within one —
    * a window seat taken in an earlier batch is never returned to a
    * later-arriving row with a smaller event time.
    *
    * State is one long per LIVE (domain, window) pair, expired by
    * EVENT-TIME timeout once the watermark passes the window's end —
    * bounded by (domains × windows inside the watermark horizon), never
    * by stream length. The window start is FLOOR(epoch / w)·w in pure
    * integer arithmetic (`ts − pmod(ts, w)` — correct for pre-epoch
    * event times too, where truncating division would shift the
    * window), so the batch parity path replays in any engine
    * (q_rate_limit).
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
    // floor division via pmod: pmod is non-negative, so ts - pmod(ts, w)
    // is the floor multiple for negative epochs too
    val epochS = unix_timestamp(col("ts"))
    val rows = marked.select(col("domain"), col("id"), col("ts"),
      (epochS - pmod(epochS, lit(windowSeconds))).as("winStartS")).as[RateRow]
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
            val out = admit(in, cap - n)(r => (r.ts.getTime, r.id)).map { r =>
              n += 1
              (key._1, r.id, r.ts, r.winStartS, n)
            }
            state.update(n)
            // the window's counter dies once the watermark passes its end
            if (streaming) state.setTimeoutTimestamp(key._2 * 1000L + winMs)
            out.iterator
          }
      }
    admitted.toDF("domain", "id", "ts", "win_start_s", "rk")
  }
}
