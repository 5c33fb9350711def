package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    */
  def exact(
      docs: DataFrame,
      tsCol: String,
      contentCol: String,
      watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("__dedup_key", xxhash64(col(contentCol)))
    val out =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__dedup_key")
      else keyed.dropDuplicates("__dedup_key")
    out.drop("__dedup_key")
  }

  /** Near-duplicate streaming dedup by 64-bit SimHash bucket: documents
    * whose simhash signatures are IDENTICAL (hamming distance 0 — minor
    * whitespace/shingle-preserving edits) dedup against each other within
    * the watermark horizon. This is the bounded-state streaming
    * complement of [[graft.ops.Dedup.simhashCandidates]]; distance>0
    * matching needs the batch banded join (documented trade-off: one
    * state row per signature vs 4 rows per 16-bit band).
    */
  def simhash(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("__sim_key",
      Dedup.simhashUdf(split(col(textCol), " ")))
    val out =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__sim_key")
      else keyed.dropDuplicates("__sim_key")
    out.drop("__sim_key")
  }
}
