package graft.streaming

import graft.ops.{GroupedCmsSketch, GroupedHllSketch, Hll, Sketches}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-event-time-window HLL registers and CMS cells from watermarked
  * streams — with [[StreamBloom]] and [[StreamRankSketch]], every
  * sketch leg now has a windowed streaming build whose emissions
  * rebuild the grouped handle and roll up EXACTLY (register max /
  * cell sum / word OR are associative; the rank sketch re-cuts).
  *
  * Like [[StreamBloom]] (and unlike the rank sketch), these are plain
  * declarative windowed aggregations: the engine's watermark machinery
  * bounds state (≤ 2^p registers / ≤ depth·width cells per OPEN
  * window at any stream volume) and finalizes windows append-mode.
  * The rule-13 traps both apply and are handled identically: the
  * event-time column is cast-normalized BEFORE the watermark
  * (TIMESTAMP_NTZ parquet drift fails streaming encoder upcasts), and
  * window BOUNDS cast before `unix_millis` while the watermarked
  * column stays un-cast. Windows align to the EPOCH.
  *
  * Sink-rebuild asymmetry worth reading twice: HLL re-emissions
  * max-collapse EXACTLY (max is idempotent, like Bloom's OR), but CMS
  * cell counts are SUMS — a duplicated emission row would silently
  * double a cell. [[fromWindowCells]] therefore collapses exact
  * duplicate rows and REFUSES conflicting counts for the same cell
  * (a partially-reprocessed sink), instead of guessing.
  */
object StreamSketches {

  private def windowed(events: DataFrame, tsCol: String,
      windowDuration: String, watermark: String)(
      proj: DataFrame => DataFrame): DataFrame = {
    val normalized = events.withColumn(tsCol, col(tsCol).cast("timestamp"))
    val src =
      if (events.isStreaming) proj(normalized.withWatermark(tsCol, watermark))
      else proj(normalized)
    src
  }

  private def windowBounds(df: DataFrame, tail: Seq[String]): DataFrame =
    df.select(Seq(
      unix_millis(col("__w.start").cast("timestamp")).as("windowStartMs"),
      unix_millis(col("__w.end").cast("timestamp")).as("windowEndMs")) ++
      tail.map(col): _*)

  /** Per-window HLL register frames `(windowStartMs, windowEndMs,
    * bucket, maxrank)`; batch frames take the same plan without the
    * watermark. NULL event times / keys carry no register (rule 10).
    */
  def hllWindowedRegisters(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermark: String,
      p: Int,
      seed: String,
      portableHash: Boolean = true): DataFrame = {
    val (bucket, rank) = Hll.registerCoords(col("__k"), p, seed, portableHash)
    windowBounds(
      windowed(events, tsCol, windowDuration, watermark) { df =>
        df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
          .select(window(col(tsCol), windowDuration).as("__w"),
            col(keyCol).as("__k"))
          .select(col("__w"), bucket.as("bucket"), rank.as("rank"))
          .groupBy(col("__w"), col("bucket"))
          .agg(max("rank").as("maxrank"))
      }, Seq("bucket", "maxrank"))
  }

  /** Rebuild the per-window [[GroupedHllSketch]] from a SINK of
    * [[hllWindowedRegisters]] emissions. Duplicate re-emissions
    * max-collapse EXACTLY (idempotent), so restarted queries are
    * harmless; `regroup`/`toGlobal` then roll windows into days or the
    * corpus without rescanning the stream.
    */
  def hllFromWindowRegisters(registers: DataFrame, p: Int, seed: String,
      portableHash: Boolean = true): GroupedHllSketch = {
    val expected = Set("windowStartMs", "windowEndMs", "bucket", "maxrank")
    require(registers.columns.toSet == expected,
      s"StreamSketches.hllFromWindowRegisters: expected the emission " +
        s"schema (windowStartMs, windowEndMs, bucket, maxrank), got " +
        s"(${registers.columns.mkString(", ")})")
    GroupedHllSketch(
      registers.groupBy("windowStartMs", "windowEndMs", "bucket")
        .agg(max("maxrank").as("maxrank")),
      Seq("windowStartMs", "windowEndMs"), p, seed, portableHash)
  }

  /** Per-window CMS cell frames `(windowStartMs, windowEndMs, r,
    * bucket, cnt)`; batch frames take the same plan without the
    * watermark. Unweighted by design — pre-aggregate signed or
    * fractional weights upstream (the [[Sketches.build]] monotonicity
    * contract). NULL event times / keys carry no cell (rule 10).
    */
  def cmsWindowedCells(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermark: String,
      depth: Int,
      width: Int,
      seed: String,
      portableHash: Boolean = true): DataFrame =
    windowBounds(
      windowed(events, tsCol, windowDuration, watermark) { df =>
        df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
          .select(window(col(tsCol), windowDuration).as("__w"),
            Sketches.bucketPairs(col(keyCol), depth, width, seed,
              portableHash).as("rb"))
          .groupBy(col("__w"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
          .agg(count(lit(1)).as("cnt"))
      }, Seq("r", "bucket", "cnt"))

  /** Rebuild the per-window [[GroupedCmsSketch]] from a SINK of
    * [[cmsWindowedCells]] emissions. Cell counts are SUMS, not
    * idempotent: exact duplicate rows (a window re-emitted whole)
    * collapse via distinct, but CONFLICTING counts for the same cell
    * mean the sink holds a partially-reprocessed window — refused
    * loudly (summing would double-count; picking one would guess).
    */
  def cmsFromWindowCells(cells: DataFrame, depth: Int, width: Int,
      seed: String, portableHash: Boolean = true): GroupedCmsSketch = {
    val expected = Set("windowStartMs", "windowEndMs", "r", "bucket", "cnt")
    require(cells.columns.toSet == expected,
      s"StreamSketches.cmsFromWindowCells: expected the emission schema " +
        s"(windowStartMs, windowEndMs, r, bucket, cnt), got " +
        s"(${cells.columns.mkString(", ")})")
    val d = cells.distinct()
    val conflicts = d
      .groupBy("windowStartMs", "windowEndMs", "r", "bucket")
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1L).count()
    require(conflicts == 0L,
      s"StreamSketches.cmsFromWindowCells: $conflicts cell(s) appear with " +
        "CONFLICTING counts for the same (window, r, bucket) - the sink " +
        "holds a partially-reprocessed window. Summing would double-count " +
        "and picking one would guess; drop the partial emission files or " +
        "re-emit the affected windows whole.")
    GroupedCmsSketch(d, Seq("windowStartMs", "windowEndMs"),
      depth, width, seed, portableHash)
  }
}
