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

  /** Shared guard for the windowed builders' `groupCols`: refuse the
    * leg's own reserved names PLUS the window-bound output names and
    * the builders' internals — a group named "windowStartMs" would be
    * clobbered by the bounds projection.
    */
  private[streaming] def requireWindowGroupCols(groupCols: Seq[String],
      legReserved: Set[String], site: String): Unit = {
    require(groupCols.distinct == groupCols,
      s"$site: duplicate group columns $groupCols")
    val reserved = legReserved ++
      Set("windowStartMs", "windowEndMs", "__w", "rb", "portable")
    val clash = groupCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"$site: group column(s) ${clash.mkString(", ")} collide with the " +
        s"emission/internal columns (${reserved.mkString(", ")}); rename " +
        "them first")
  }

  /** Validate a sink's riding `portable` column against a rebuild's
    * requested hash mode (r18 verdict #2, shared by all four windowed
    * legs — rule 5): the fast/portable flag decides WHICH hash space
    * the emission's positions/registers/cells/rank-keys live in, so a
    * mismatched rebuild silently false-negates (Bloom), under-counts
    * (HLL/CMS), or mis-ranks (rank sketch). One ≤2-row aggregation over
    * the sink, paid at rebuild cadence.
    */
  private[graft] def requirePortableMode(emissions: DataFrame,
      portableHash: Boolean, site: String): Unit = {
    val rows = emissions.select(col("portable").cast("boolean"))
      .distinct().collect()
    // a NULL mode (a pre-upgrade sink merged with post-upgrade
    // emissions via mergeSchema) must refuse with words, not NPE at
    // getBoolean (r19 review)
    require(!rows.exists(_.isNullAt(0)),
      s"$site: the sink has emission rows with NO recorded hash mode " +
        "(a pre-upgrade sink merged with newer emissions?) - the rebuild " +
        "cannot know which hash space those rows' positions live in; " +
        "re-emit the affected windows or split the sink by vintage")
    val modes = rows.map(_.getBoolean(0)).toSeq.sorted
    require(modes.size <= 1,
      s"$site: the sink MIXES portable and fast-hash emissions - the two " +
        "modes occupy different hash spaces and cannot rebuild into one " +
        "sketch; split the sink by build mode and rebuild each separately")
    modes.headOption.foreach { m =>
      require(m == portableHash,
        s"$site: the sink records portableHash=$m but the rebuild " +
          s"requested portableHash=$portableHash - the rebuilt handle " +
          "would probe a different hash space than the build wrote " +
          "(silent false negatives / wrong counts / wrong ranks); pass " +
          s"portableHash=$m")
    }
  }

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
    * bucket, maxrank, portable)`; batch frames take the same plan
    * without the watermark. NULL event times / keys carry no register
    * (rule 10). `portable` records the build's hash mode in the
    * emission (r18 verdict #2) so rebuilds can refuse a mismatch.
    */
  def hllWindowedRegisters(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermark: String,
      p: Int,
      seed: String,
      portableHash: Boolean = true,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    requireWindowGroupCols(groupCols, Hll.ReservedNames,
      "StreamSketches.hllWindowedRegisters")
    val (bucket, rank) = Hll.registerCoords(col("__k"), p, seed, portableHash)
    windowBounds(
      windowed(events, tsCol, windowDuration, watermark) { df =>
        df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
          .select(Seq(window(col(tsCol), windowDuration).as("__w")) ++
            groupCols.map(col) :+ col(keyCol).as("__k"): _*)
          .select(Seq(col("__w")) ++ groupCols.map(col) ++
            Seq(bucket.as("bucket"), rank.as("rank")): _*)
          .groupBy((Seq(col("__w")) ++ groupCols.map(col)) :+ col("bucket"): _*)
          .agg(max("rank").as("maxrank"))
      }, groupCols ++ Seq("bucket", "maxrank"))
      .withColumn("portable", lit(portableHash))
  }

  /** Rebuild the per-window [[GroupedHllSketch]] from a SINK of
    * [[hllWindowedRegisters]] emissions. Duplicate re-emissions
    * max-collapse EXACTLY (idempotent), so restarted queries are
    * harmless; `regroup`/`toGlobal` then roll windows into days or the
    * corpus without rescanning the stream.
    */
  def hllFromWindowRegisters(registers: DataFrame, p: Int, seed: String,
      portableHash: Boolean = true,
      groupCols: Seq[String] = Seq.empty): GroupedHllSketch = {
    requireWindowGroupCols(groupCols, Hll.ReservedNames,
      "StreamSketches.hllFromWindowRegisters")
    val strata = Seq("windowStartMs", "windowEndMs") ++ groupCols
    val expected = (strata ++ Seq("bucket", "maxrank", "portable")).toSet
    require(registers.columns.toSet == expected,
      s"StreamSketches.hllFromWindowRegisters: expected the emission " +
        s"schema (${(strata ++ Seq("bucket", "maxrank", "portable")).mkString(", ")}), " +
        s"got (${registers.columns.mkString(", ")})")
    requirePortableMode(registers, portableHash,
      "StreamSketches.hllFromWindowRegisters")
    GroupedHllSketch(
      registers.groupBy((strata :+ "bucket").map(col): _*)
        .agg(max("maxrank").as("maxrank")),
      strata, p, seed, portableHash)
  }

  /** Per-window CMS cell frames `(windowStartMs, windowEndMs, r,
    * bucket, cnt, portable)`; batch frames take the same plan without
    * the watermark. Unweighted by design — pre-aggregate signed or
    * fractional weights upstream (the [[Sketches.build]] monotonicity
    * contract). NULL event times / keys carry no cell (rule 10).
    * `portable` records the build's hash mode in the emission (r18
    * verdict #2) so rebuilds can refuse a mismatch.
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
      portableHash: Boolean = true,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    requireWindowGroupCols(groupCols, Sketches.GroupedReservedNames,
      "StreamSketches.cmsWindowedCells")
    windowBounds(
      windowed(events, tsCol, windowDuration, watermark) { df =>
        df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
          .select(Seq(window(col(tsCol), windowDuration).as("__w")) ++
            groupCols.map(col) :+
            Sketches.bucketPairs(col(keyCol), depth, width, seed,
              portableHash).as("rb"): _*)
          .groupBy(Seq(col("__w")) ++ groupCols.map(col) ++
            Seq(col("rb.r").as("r"), col("rb.bucket").as("bucket")): _*)
          .agg(count(lit(1)).as("cnt"))
      }, groupCols ++ Seq("r", "bucket", "cnt"))
      .withColumn("portable", lit(portableHash))
  }

  /** Rebuild the per-window [[GroupedCmsSketch]] from a SINK of
    * [[cmsWindowedCells]] emissions. Cell counts are SUMS, not
    * idempotent: exact duplicate rows (a window re-emitted whole)
    * collapse via distinct, but CONFLICTING counts for the same cell
    * mean the sink holds a partially-reprocessed window — refused
    * loudly (summing would double-count; picking one would guess).
    */
  def cmsFromWindowCells(cells: DataFrame, depth: Int, width: Int,
      seed: String, portableHash: Boolean = true,
      groupCols: Seq[String] = Seq.empty): GroupedCmsSketch = {
    requireWindowGroupCols(groupCols, Sketches.GroupedReservedNames,
      "StreamSketches.cmsFromWindowCells")
    val strata = Seq("windowStartMs", "windowEndMs") ++ groupCols
    val expected = (strata ++ Seq("r", "bucket", "cnt", "portable")).toSet
    require(cells.columns.toSet == expected,
      s"StreamSketches.cmsFromWindowCells: expected the emission schema " +
        s"(${(strata ++ Seq("r", "bucket", "cnt", "portable")).mkString(", ")}), got " +
        s"(${cells.columns.mkString(", ")})")
    requirePortableMode(cells, portableHash,
      "StreamSketches.cmsFromWindowCells")
    val d = cells.drop("portable").distinct()
    val conflicts = d
      .groupBy((strata ++ Seq("r", "bucket")).map(col): _*)
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1L).count()
    require(conflicts == 0L,
      s"StreamSketches.cmsFromWindowCells: $conflicts cell(s) appear with " +
        "CONFLICTING counts for the same (window, group, r, bucket) - the " +
        "sink holds a partially-reprocessed window. Summing would " +
        "double-count and picking one would guess; drop the partial " +
        "emission files or re-emit the affected windows whole.")
    GroupedCmsSketch(d, strata, depth, width, seed, portableHash)
  }
}
