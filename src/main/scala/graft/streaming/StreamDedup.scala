package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Streaming deduplication for ingest pipelines.
  *
  * Batch dedup ([[graft.ops.Dedup]]) sees the whole corpus at once; an
  * ingest stream must decide keep/drop per arriving document with bounded
  * state. Both operators here are fully declarative —
  * `dropDuplicatesWithinWatermark` keeps one state row per key and prunes
  * it when the watermark passes, so state is O(distinct keys within the
  * watermark horizon), not O(stream length) — the only shape that
  * survives an unbounded 100-TB/day feed. (The reference library has no
  * streaming surface at all; this extends the SURVEY §2.5 sink story.)
  */
object StreamDedup {

  /** Exact-content streaming dedup: first document with a given text
    * hash (within the watermark horizon) survives; later copies drop.
    * Dedup key = xxhash64(content) — content itself never enters the
    * state store. Works identically on batch frames (plain dropDuplicates
    * on the hash).
    *
    * @param docs      streaming or batch frame
    * @param tsCol     event-time column (timestamp)
    * @param contentCol column whose exact value defines a duplicate
    * @param watermark  how long a key is remembered, e.g. "1 hour"
    * @param assumeWatermarked set when `docs` ALREADY carries a watermark
    *   (e.g. chaining dedup stages — Spark forbids redefining one);
    *   `watermark` is then ignored
    */
  def exact(
      docs: DataFrame,
      tsCol: String,
      contentCol: String,
      watermark: String = "1 hour",
      assumeWatermarked: Boolean = false): DataFrame = {
    val keyed = docs.withColumn("__dedup_key", xxhash64(col(contentCol)))
    val out =
      if (docs.isStreaming) {
        val wm = if (assumeWatermarked) keyed else keyed.withWatermark(tsCol, watermark)
        wm.dropDuplicatesWithinWatermark("__dedup_key")
      } else keyed.dropDuplicates("__dedup_key")
    out.drop("__dedup_key")
  }

  /** Near-duplicate streaming dedup by 64-bit SimHash bucket: documents
    * whose simhash signatures are IDENTICAL (hamming distance 0 — minor
    * whitespace/shingle-preserving edits) dedup against each other within
    * the watermark horizon. This is the bounded-state streaming
    * complement of [[graft.ops.Dedup.simhashCandidates]]; for distance>0
    * matching within a stream see [[simhashBanded]] (4 band-keyed state
    * rows per doc instead of one signature row).
    */
  def simhash(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      watermark: String = "1 hour",
      assumeWatermarked: Boolean = false): DataFrame = {
    val keyed = docs.withColumn("__sim_key",
      Dedup.simhashUdf(split(col(textCol), " ")))
    val out =
      if (docs.isStreaming) {
        val wm = if (assumeWatermarked) keyed else keyed.withWatermark(tsCol, watermark)
        wm.dropDuplicatesWithinWatermark("__sim_key")
      } else keyed.dropDuplicates("__sim_key")
    out.drop("__sim_key")
  }

  /** One doc's appearance under one 16-bit simhash band (pigeonhole
    * blocking key). `bandKey` packs (band index << 16) | chunk value so the
    * four bands never collide in one keyspace.
    */
  // public only because Spark's encoder codegen must instantiate them;
  // not part of the operator's API surface
  case class BandRow(bandKey: Long, id: Long, sig: Long, ts: java.sql.Timestamp)

  /** Per-band-key streaming state: recent (sig, id, tsMs) entries inside
    * the watermark horizon, newest first.
    */
  case class BandState(entries: List[(Long, Long, Long)])

  /** Streaming near-duplicate PAIR detection at hamming distance <= maxDist
    * (not just identical signatures): the streaming counterpart of the
    * batch [[graft.ops.Dedup.simhashCandidates]] banded join.
    *
    * Scale design, mirroring the batch operator's pigeonhole blocking: each
    * doc becomes 4 rows keyed by (band, 16-bit chunk); any pair within
    * hamming distance 3 shares at least one exact chunk, so comparisons
    * happen only inside band buckets. State is a per-band-key list of
    * (signature, id, eventTimeMs) pruned two ways: entries older than the
    * current watermark are evicted on every visit, and a key keeps at most
    * `maxPerKey` newest entries (skew guard — a degenerate chunk value,
    * e.g. from near-empty docs, would otherwise accumulate unbounded state
    * and O(|bucket|) work per arrival; dropped entries cost recall only
    * for pairs separated by more than maxPerKey docs in the same bucket).
    * Whole keys die via event-time timeout once idle past the horizon.
    *
    * Emits one row per (earlier id_a, later id_b) with their hamming
    * distance and the later doc's event time. A pair sharing j>1 bands is
    * emitted up to j times (once per matching band) — consumers treat the
    * output as a set (drop-decision consumers are insensitive to repeats);
    * a single-stateful-operator design was chosen over a downstream
    * streaming `dropDuplicates` so the pipeline stays one shuffle.
    */
  def simhashBanded(
      docs: DataFrame,
      tsCol: String,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      watermark: String = "10 minutes",
      maxPerKey: Int = 1024): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist=$maxDist not supported: 4 x 16-bit band blocking only guarantees recall for hamming distance <= 3")
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = docs.select(
      col(idCol).cast("long").as("id"),
      col(tsCol).as("ts"),
      Dedup.simhashUdf(split(col(textCol), " ")).as("sh"))
      .withWatermark("ts", watermark)
    // the watermarked `ts` attribute must flow into the stateful operator
    // unchanged (EventTimeTimeout resolves the watermark from its column
    // metadata), so it is carried as-is rather than pre-converted to millis
    val rows = sig.select(
      explode(array((0 until 4).map(c =>
        lit(c.toLong << 16) + shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)).as("bandKey"),
      col("id"), col("sh").as("sig"), col("ts"))
      .as[BandRow]
    val horizon = parseDurationMs(watermark)
    val md = maxDist
    val cap = maxPerKey
    rows.groupByKey(_.bandKey)
      .flatMapGroupsWithState[BandState, (Long, Long, Int, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, in: Iterator[BandRow], state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(_._3 >= wm)
            val out = List.newBuilder[(Long, Long, Int, java.sql.Timestamp)]
            // process batch rows oldest-first so in-batch pairs report the
            // earlier doc as id_a, matching the batch operator's id_a < id_b
            // convention in spirit (earlier-first here, since streams order
            // by time, not id)
            in.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
              val tsMs = r.ts.getTime
              entries.foreach { case (s, eid, _) =>
                if (eid != r.id && java.lang.Long.bitCount(s ^ r.sig) <= md)
                  out += ((eid, r.id, java.lang.Long.bitCount(s ^ r.sig), r.ts))
              }
              // mid-batch the list may grow past cap; trim lazily (at
              // 2*cap) BY EVENT TIME so a late arrival can never evict a
              // newer entry while itself surviving — a plain take(cap)
              // drops the list tail, which after a late prepend is not
              // the oldest element
              entries = (r.sig, r.id, tsMs) :: entries
              if (entries.lengthCompare(cap * 2) > 0)
                entries = entries.sortBy(e => -e._3).take(cap)
            }
            // restore newest-first once per batch — the cap must evict
            // the OLDEST entries, and later batches rely on the invariant
            entries = entries.sortBy(e => -e._3).take(cap)
            state.update(BandState(entries))
            // key expires once no new doc lands in this bucket for a full
            // horizon past the NEWEST surviving entry (the batch max alone
            // would move the timeout backwards on a late-only batch,
            // expiring live entries early); wm guard keeps the timeout
            // legally in the future even for late-edge batches
            val newest = entries.headOption.map(_._3).getOrElse(wm)
            state.setTimeoutTimestamp(math.max(newest, wm) + horizon)
            out.result().iterator
          }
      }
      .toDF("id_a", "id_b", "hamming", "ts")
  }

  /** Parse "N seconds|minutes|hours|days" (the watermark grammar subset we
    * accept) to milliseconds, for state-timeout arithmetic.
    */
  private def parseDurationMs(s: String): Long = {
    val m = raw"(?i)\s*(\d+)\s*(second|minute|hour|day)s?\s*".r
    s match {
      case m(n, unit) =>
        val mult = unit.toLowerCase match {
          case "second" => 1000L
          case "minute" => 60000L
          case "hour"   => 3600000L
          case "day"    => 86400000L
        }
        n.toLong * mult
      case _ => throw new IllegalArgumentException(
        s"cannot parse duration '$s' (expected e.g. '10 minutes')")
    }
  }
}
