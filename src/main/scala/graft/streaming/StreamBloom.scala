package graft.streaming

import graft.ops.{Bloom, GroupedBloomSketch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-event-time-window Bloom membership filters from a watermarked
  * stream — the membership twin of [[StreamRankSketch]]'s windowed
  * summaries, completing the streaming story for the sketch family
  * (HLL registers and Bloom words both stream; CMS streams via its
  * cell aggregation; the rank sketch via its bounded-state fold).
  *
  * Unlike the rank sketch, NO custom stateful operator is needed: the
  * word build is an associative windowed aggregation
  * (`groupBy(window, w).bit_or`), so Structured Streaming's own
  * watermark machinery bounds the state (≤ m/64 word rows per OPEN
  * window however large the stream) and finalizes each window in
  * append mode — exactly the declarative-over-stateful preference the
  * batch rank-sketch cut measured 2.2× for (house rule 13).
  *
  * Emission schema: `(windowStartMs, windowEndMs, w, bits, portable)`
  * — ms bounds rather than timestamps so a sink of emissions is
  * engine/timezone-neutral and rebuilds the grouped handle exactly
  * ([[fromWindowWords]]). Window bounds align to the EPOCH, not the
  * data's start (house rule 13c). `portable` records the build's hash
  * mode IN the emission (r18 verdict #2), so a rebuild with the wrong
  * flag REFUSES instead of silently false-negating every probe.
  *
  * The composition this enables at 100 TB: stream per-hour filters to
  * a sink; [[fromWindowWords]] → [[GroupedBloomSketch.regroup]] rolls
  * hours into days EXACTLY (OR associativity); `toGlobal` gives the
  * corpus filter — membership audits over any horizon without
  * rescanning a byte of the stream.
  */
object StreamBloom {

  /** Build per-window word frames. Batch frames take the same
    * declarative plan without the watermark (parity spec-pinned);
    * streaming frames require append-mode semantics downstream (each
    * window emits once, when the watermark passes its end — late rows
    * beyond `watermark` are dropped by the engine, the standard
    * windowed-aggregation contract).
    *
    * NULL policy (rule 10): null event times and null keys carry no
    * bits on either path.
    */
  def windowedWords(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermark: String,
      numBits: Long,
      numHashes: Int,
      groupCols: Seq[String] = Seq.empty,
      portableHash: Boolean = true): DataFrame = {
    Bloom.requireGeometry(numBits, numHashes)
    StreamSketches.requireWindowGroupCols(groupCols,
      graft.ops.Bloom.ReservedNames, "StreamBloom.windowedWords")
    // normalize the event-time type BEFORE the watermark: TIMESTAMP_NTZ
    // parquet columns (rule-3 drift) fail streaming encoder upcasts
    // while batch works, and casting after the watermark would mint a
    // fresh attribute without the watermark metadata (the
    // StreamRankSketch / EventOps lesson, house rule 13)
    val normalized = events.withColumn(tsCol, col(tsCol).cast("timestamp"))
    def proj(df: DataFrame) = df
      .where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(Seq(window(col(tsCol), windowDuration).as("__w")) ++
        groupCols.map(col) :+
        explode(Bloom.positionsCol(col(keyCol).cast("string"),
          numBits, numHashes, portableHash)).as("pos"): _*)
      .select(Seq(col("__w")) ++ groupCols.map(col) ++ Seq(
        shiftrightunsigned(col("pos"), 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("__b")): _*)
    val src =
      if (events.isStreaming) proj(normalized.withWatermark(tsCol, watermark))
      else proj(normalized)
    src.groupBy((Seq(col("__w")) ++ groupCols.map(col)) :+ col("w"): _*)
      .agg(expr("bit_or(__b)").as("bits"))
      // the window BOUNDS may cast (unix_millis refuses TIMESTAMP_NTZ
      // and parquet event times can arrive NTZ); only the watermarked
      // ts column above must stay un-cast (house rule 13c)
      .select(Seq(
        unix_millis(col("__w.start").cast("timestamp")).as("windowStartMs"),
        unix_millis(col("__w.end").cast("timestamp")).as("windowEndMs")) ++
        groupCols.map(col) ++ Seq(col("w"), col("bits"),
        lit(portableHash).as("portable")): _*)
  }

  /** Rebuild the per-window grouped handle from a SINK of
    * [[windowedWords]] emissions — the stream-to-batch composition.
    * Duplicate (window, w) rows (overlapping sink files, restarted
    * queries re-emitting a window) OR-collapse harmlessly: union ==
    * merge for Bloom words, so the rebuild is exact rather than
    * merely tolerant.
    *
    * GEOMETRY is on trust (pass the STREAM's exact `numBits`/
    * `numHashes` — the "pass the STREAM's seed" contract of the
    * HLL/CMS rebuilds; a wrong geometry at least fails
    * [[GroupedBloomSketch]]'s word-range guards). HASH MODE is NOT on
    * trust (r18 verdict #2): every emission row carries the build's
    * `portable` flag, and this rebuild REFUSES a sink whose recorded
    * mode mixes or mismatches the requested `portableHash` — getting
    * it wrong is the WORST mismatch class (the rebuilt handle probes
    * different bit positions than the build set, so every inserted key
    * comes back a silent FALSE NEGATIVE, the failure Bloom's one-sided
    * guarantee exists to rule out).
    */
  def fromWindowWords(words: DataFrame, numBits: Long, numHashes: Int,
      groupCols: Seq[String] = Seq.empty,
      portableHash: Boolean = true): GroupedBloomSketch = {
    Bloom.requireGeometry(numBits, numHashes)
    StreamSketches.requireWindowGroupCols(groupCols, Bloom.ReservedNames,
      "StreamBloom.fromWindowWords")
    val strata = Seq("windowStartMs", "windowEndMs") ++ groupCols
    val expected = (strata ++ Seq("w", "bits", "portable")).toSet
    require(words.columns.toSet == expected,
      s"StreamBloom.fromWindowWords: expected the windowedWords emission " +
        s"schema (${(strata ++ Seq("w", "bits", "portable")).mkString(", ")}), got " +
        s"(${words.columns.mkString(", ")})")
    StreamSketches.requirePortableMode(words, portableHash,
      "StreamBloom.fromWindowWords")
    val grouped = words
      .groupBy((strata :+ "w").map(col): _*)
      .agg(expr("bit_or(bits)").as("bits"))
    GroupedBloomSketch(grouped, strata, numBits, numHashes, portableHash)
  }
}
