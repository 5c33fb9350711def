package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GROUPED mergeable rank sketch — the stratified twin of
  * [[QuantileSketch]] (per-language / per-source / per-day summaries in
  * ONE frame), the way [[Hll.buildGrouped]] is the grouped twin of
  * [[Hll.build]]: a deterministic bottom-s sample PER GROUP, with the
  * group count frame riding along so rank/CDF answers stay scaled.
  *
  * Construction is the same md5-derived bottom-k cut
  * ([[Sampling.uniformBits60]] rank keys; KMV / bottom-k sampling,
  * Bar-Yossef et al. 2002) applied under a per-group rank window, so all
  * of [[QuantileSketch]]'s properties hold per group: merge-order
  * independence (bottom-s of a union is bottom-s of the parts'
  * bottom-s's, group-wise), engine portability (pure integer/string
  * arithmetic — the summary AND the quantile answers replay in the
  * DuckDB oracle, q_qsketch_grouped), and DKW rank error ≤ n_g·ε per
  * group with ε = sqrt(ln(2/δ)/(2s)) — exact for any group with ≤ s
  * rows. Because the sample is a uniform SRS per group, the summary
  * frame doubles as a persisted STRATIFIED SAMPLE of the corpus
  * (s docs per language, merged across days) — read it directly for
  * that use.
  *
  * **Scale posture**: the cut is `row_number() OVER (PARTITION BY
  * groups ORDER BY rk, value) <= s`, which Spark plans with a MAP-SIDE
  * `WindowGroupLimit(Partial)` before the exchange (pinned in
  * PlanShapeSpec) — the shuffle carries ≤ s rows per group per input
  * partition at any corpus size, the counts frame is one
  * map-side-combined aggregation, and groups are NEVER collected:
  * quantile answers are one window over the (≤ s rows/group) summary,
  * merge is a re-cut over 2s rows/group. Group count is unbounded.
  *
  * **Identity contract** (same as the scalar sketch): `idCol` uniquely
  * identifies rows within AND across sketches that will be merged
  * (it IS the sampling randomness); NULL id / NULL value rows are
  * excluded (no sample identity / no rank, rule 10); NULL GROUP values
  * are legitimate groups and retained ([[Quantiles.exactPctByGroup]]
  * policy); the double builder excludes NaN and normalizes −0.0.
  *
  * The reference engine has no sketch layer; this is `graft.ops`
  * pipeline surface beyond it ("p99 doc length per language per day,
  * composed weekly" — the grouped form of the question
  * [[QuantileSketch]] exists for).
  */
final case class GroupedQuantileSketch(
    summary: DataFrame,
    counts: DataFrame,
    groupCols: Seq[String],
    s: Int,
    seed: String,
    doubleValued: Boolean,
    portableHash: Boolean = true) {

  /** Per-group percentile estimates: one row per (group, pct) —
    * (groupCols..., pct BIGINT, k BIGINT, value) where k is the SAMPLE
    * rank ceil(pct·s_g/100) and value the k-th smallest sample value in
    * that group ([[Quantiles.exactPctByGroup]]'s type-1 convention over
    * the sample). Pure integer arithmetic + ordering of stored values:
    * hash-oracle-able for long sketches; double sketches emit the
    * stored double bit-exactly (round it at output if it enters a hash
    * contract). One window over the summary — never a group collect.
    */
  def quantiles(pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "GroupedQuantileSketch.quantiles: pcts must be non-empty")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"GroupedQuantileSketch.quantiles: percentiles must be in [1,100], " +
        s"got ${pcts.mkString(",")}")
    require(pcts.distinct.length == pcts.length,
      "GroupedQuantileSketch.quantiles: duplicate percentiles")
    val w = Window.partitionBy(groupCols.map(col): _*)
    val pctsArr = array(pcts.map(p => lit(p.toLong)): _*)
    // structural guard, the grouped twin of the scalar sketch's
    // requireSummarySize and the SAME check rankOf runs: a legitimate
    // group has exactly min(n_g, s) summary rows — more means a
    // concatenated frame, fewer (or a group counts never saw) means the
    // two frames desynchronized; either way every answer would be
    // plausible and wrong. The counts join is groups-sized (left join:
    // a summary group missing from counts raises via the null n).
    // Counts-only groups have no summary rows to answer from and are
    // caught by the persistence digests, not here.
    val cnt = groupCols.foldLeft(counts) { (d, c) =>
      d.withColumnRenamed(c, "__c_" + c)
    }
    val cond = groupCols.map(c => col(c) <=> col("__c_" + c)).reduce(_ && _)
    summary.join(cnt, cond, "left")
      .withColumn("__rn", row_number().over(w.orderBy(col("value"))))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__n", when(col("n").isNull ||
          col("__n") =!= least(col("n"), lit(s.toLong)),
        raise_error(concat(lit("GroupedQuantileSketch.quantiles: a group's " +
          s"summary row count differs from min(n_g, s = $s) - the frame " +
          "is not a per-group bottom-k summary in sync with its counts " +
          "(concatenated frames? use merge(); corrupted payload? re-read " +
          "the sketch)"))))
        .otherwise(col("__n")))
      // rank == ceil(pct·s_g/100), multiplicatively (exact integers —
      // the pctByGroupWindow predicate, rule 5 kept by same-shape, but
      // over the SAMPLE rather than the corpus)
      .withColumn("pct", explode(filter(pctsArr, p =>
        p * col("__n") >= lit(100L) * col("__rn") - lit(99L) &&
          p * col("__n") <= lit(100L) * col("__rn"))))
      .select(groupCols.map(col) ++ Seq(col("pct"),
        col("__rn").cast("long").as("k"), col("value")): _*)
  }

  /** Estimated per-group COUNT of rows with value ≤ `threshold`: one
    * row per group, (groupCols..., le_est BIGINT) — sample count scaled
    * by n_g/s_g in exact integer arithmetic (the grouped CDF question,
    * e.g. "how many docs per language are under 200 chars"). Groups in
    * `counts` always have summary rows by construction, so the join is
    * total. Long sketches only; doubles refuse with a redirect.
    */
  def rankOf(threshold: Long): DataFrame = {
    require(!doubleValued,
      "GroupedQuantileSketch.rankOf: this sketch holds DOUBLE values - " +
        "use rankOfDouble")
    rankOfImpl(col("value") <= lit(threshold))
  }

  /** [[rankOf]] for double sketches (NaN has no rank — refused). */
  def rankOfDouble(threshold: Double): DataFrame = {
    require(doubleValued,
      "GroupedQuantileSketch.rankOfDouble: this sketch holds LONG values " +
        "- use rankOf")
    require(!threshold.isNaN,
      "GroupedQuantileSketch.rankOfDouble: NaN has no rank")
    rankOfImpl(col("value") <= lit(threshold))
  }

  private def rankOfImpl(le: Column): DataFrame = {
    val sampleAgg = summary
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__sg"),
        sum(when(le, 1L).otherwise(0L)).as("__cnt"))
    // null-safe equi-join on RENAMED count columns: summary and counts
    // share lineage (both derive from the build projection), so joining
    // attribute-to-attribute would be a self-join on identical exprIds
    // (Spark warns "trivially true predicate" and disambiguation is
    // rule-dependent) — the rename makes the condition unambiguous
    // (the Hll.intersectEstimateGrouped pattern)
    val cnt = groupCols.foldLeft(counts) { (d, c) =>
      d.withColumnRenamed(c, "__c_" + c)
    }
    val cond = groupCols.map(c => col(c) <=> col("__c_" + c)).reduce(_ && _)
    // structural guard (the grouped requireSummarySize): a legitimate
    // group ALWAYS has exactly min(n_g, s) summary rows — anything else
    // is a concatenated/desynchronized frame and every scaled rank from
    // it is plausible and wrong. Checked on the groups-sized join, no
    // extra job. LEFT join + null-n raise, mirroring quantiles(): an
    // inner join would silently DROP a summary group missing from
    // counts — exactly the desync class this guard exists to refuse
    // (r16 ADVICE defect).
    val sg = when(col("n").isNull ||
        col("__sg") =!= least(col("n"), lit(s.toLong)),
      raise_error(concat(lit("GroupedQuantileSketch.rankOf: a group's " +
        s"summary row count differs from min(n_g, s = $s) - the summary " +
        "and counts frames have desynchronized (concatenated frames? " +
        "use merge(); corrupted payload? re-read the sketch)"))))
      .otherwise(col("__sg"))
    sampleAgg.join(cnt, cond, "left")
      .withColumn("__sg", sg)
      .select(groupCols.map(sampleAgg(_)) :+
        // floor(cnt·n_g/s_g) in PURE long arithmetic (the naive product
        // needs 80 bits): decompose n_g = q·s_g + r, then
        // cnt·q + ⌊cnt·r/s_g⌋ — cnt·q ≤ the result ≤ n_g and
        // cnt·r < s² ≤ 2^32, so nothing overflows; bit-identical to the
        // scalar sketch's BigInt floor
        expr("CAST(__cnt * (n DIV __sg) + (__cnt * (n % __sg)) DIV __sg " +
          "AS BIGINT)").as("le_est"): _*)
  }

  /** Re-stratify to COARSER groups without rescanning — "hourly
    * sketches → daily sketches": each new group column is an expression
    * over the CURRENT group columns (e.g. `col("windowStartMs") -
    * col("windowStartMs") % 86400000L`), the summary re-cuts, the
    * counts re-sum. EXACT, not approximate: a coarse group is a union
    * of fine groups, and any element in the coarse bottom-s has
    * rank-within-its-fine-group ≤ rank-within-the-coarse-group ≤ s, so
    * it already survived its fine cut — re-cutting the fine summaries
    * yields EXACTLY the sketch a direct coarse build would (spec-pinned).
    * Geometry (s, seed, value type) is unchanged, so the result merges
    * with direct coarse builds of disjoint corpora as usual.
    */
  def regroup(newGroups: Seq[(String, Column)]): GroupedQuantileSketch = {
    require(newGroups.nonEmpty,
      "GroupedQuantileSketch.regroup: newGroups must be non-empty (use " +
        "toGlobal for the ungrouped rollup)")
    val names = newGroups.map(_._1)
    require(names.distinct == names,
      s"GroupedQuantileSketch.regroup: duplicate new group names $names")
    // the FULL reserved set, not just the summary columns: a new group
    // named "pct"/"__n"/... would be silently clobbered by quantiles()'s
    // internal projections downstream (r20 review finding)
    val clash = names.filter(GroupedQuantileSketch.ReservedNames.contains)
    require(clash.isEmpty,
      s"GroupedQuantileSketch.regroup: new group name(s) " +
        s"${clash.mkString(",")} collide with the summary/output columns " +
        s"(${GroupedQuantileSketch.ReservedNames.mkString(",")})")
    val newSummary = GroupedQuantileSketch.cutPerGroup(
      summary.select(newGroups.map { case (nm, c) => c.as(nm) } ++
        Seq(col("rk"), col("value")): _*),
      names, s)
    val newCounts = counts
      .select(newGroups.map { case (nm, c) => c.as(nm) } :+ col("n"): _*)
      .groupBy(names.map(col): _*)
      .agg(sum(col("n")).as("n"))
    copy(summary = newSummary, counts = newCounts, groupCols = names)
  }

  /** [[regroup]] with SQL expression strings — the py4j-friendly form
    * (a Column cannot ride the gateway in a Scala tuple).
    */
  def regroupExpr(names: Seq[String], exprs: Seq[String]): GroupedQuantileSketch = {
    require(names.length == exprs.length,
      s"GroupedQuantileSketch.regroupExpr: ${names.length} names vs " +
        s"${exprs.length} expressions")
    regroup(names.zip(exprs.map(expr)))
  }

  /** Roll the strata up to ONE global [[QuantileSketch]] — the same
    * exactness argument as [[regroup]] with a single coarse group:
    * equals the scalar sketch a direct build over the whole corpus
    * would produce (spec-pinned). The corpus-wide twin of "compose
    * per-day sketches into the weekly answer".
    */
  def toGlobal: QuantileSketch = {
    val total = counts.agg(coalesce(sum(col("n")), lit(0L)))
      .head().getLong(0)
    QuantileSketch(
      QuantileSketch.bottomK(summary.select(col("rk"), col("value")), s),
      s, seed, total, doubleValued, portableHash)
  }

  /** Group-wise bottom-s merge, refusing mismatched geometry (different
    * seed/s/type/groupCols = a different hash space or stratification —
    * plausible quantiles, wrong distribution; the [[QuantileSketch.merge]]
    * / [[HllSketch.merge]] refusal class). Summary re-cuts 2s rows per
    * group; counts is one aggregation over group rows.
    */
  def merge(other: GroupedQuantileSketch): GroupedQuantileSketch = {
    require(s == other.s && seed == other.seed &&
      doubleValued == other.doubleValued && groupCols == other.groupCols &&
      portableHash == other.portableHash,
      s"GroupedQuantileSketch.merge: geometry mismatch - this is (s=$s, " +
        s"seed=$seed, doubleValued=$doubleValued, groupCols=$groupCols, " +
        s"portableHash=$portableHash), other is (s=${other.s}, " +
        s"seed=${other.seed}, doubleValued=${other.doubleValued}, " +
        s"groupCols=${other.groupCols}, portableHash=${other.portableHash}). " +
        "Summaries only merge when built with IDENTICAL geometry (a " +
        "cross-mode bottom-k mixes two hash spaces); rebuild one side.")
    val mergedCounts = counts.unionByName(other.counts)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"))
    copy(
      summary = GroupedQuantileSketch.cutPerGroup(
        summary.unionByName(other.summary), groupCols, s),
      counts = mergedCounts)
  }
}

object GroupedQuantileSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** Names the internal projections/outputs own — a group column (or
    * regroup target) with one of these names would be silently
    * clobbered; both entry points refuse them.
    */
  private[ops] val ReservedNames = Set("rk", "value", "n", "pct", "k",
    "le_est", "__rn", "__n", "__sg", "__cnt")

  /** Digest columns canonicalized to environment-independent forms —
    * the shared [[SketchIo.canonicalDigest]] (hoisted there r20 wave 6
    * so every grouped handle canonicalizes identically).
    */
  private def canonicalDigest(df: DataFrame, cols: Seq[String]): Long =
    SketchIo.canonicalDigest(df, cols)

  private def requireArgs(items: DataFrame, groupCols: Seq[String],
      s: Int): Unit = {
    require(groupCols.nonEmpty,
      "GroupedQuantileSketch: groupCols must be non-empty (for a global " +
        "sketch use QuantileSketch)")
    QuantileSketch.requireS(s, "GroupedQuantileSketch")
    // a group column named like the payload/output columns would be
    // silently clobbered by the internal projections — refuse loudly
    // (the Quantiles.requireByGroupArgs discipline)
    val clash = groupCols.filter(ReservedNames.contains)
    require(clash.isEmpty,
      s"GroupedQuantileSketch: group column name(s) ${clash.mkString(",")} " +
        s"collide with the summary/output columns (${ReservedNames.mkString(",")})" +
        " - alias the group column first")
  }

  /** The group-wise bottom-s cut: `row_number <= s` under a per-group
    * (rk, value) window — Spark plans the rank-limit MAP-SIDE
    * (WindowGroupLimit(Partial), PlanShapeSpec pin), so the exchange
    * carries ≤ s rows per group per input partition. (rk, value)
    * lexicographic order makes the cut a pure function of the multiset
    * even if 60-bit rank keys ever tie.
    */
  private[graft] def cutPerGroup(rows: DataFrame, groupCols: Seq[String],
      s: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("rk"), col("value"))
    rows.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= s).drop("__rn")
  }

  /** Build a LONG-valued grouped sketch: the counts aggregation + the
    * windowed cut, both over one null-filtered projection
    * (recompute-over-materialize, the [[Quantiles]] stance). Refuses
    * fractional value columns — [[buildGroupedDouble]] is the lossless
    * sibling.
    */
  def buildGrouped(items: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, s: Int, seed: String,
      portableHash: Boolean = true): GroupedQuantileSketch = {
    requireArgs(items, groupCols, s)
    Quantiles.requireIntegral(items, valueCol, "GroupedQuantileSketch.buildGrouped",
      "For fractional values use GroupedQuantileSketch.buildGroupedDouble " +
        "(no truncation).")
    val rows = items
      .where(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        QuantileSketch.rankKey(col(idCol), seed, portableHash).as("rk"),
        col(valueCol).cast("long").as("value")): _*)
    GroupedQuantileSketch(cutPerGroup(rows, groupCols, s),
      rows.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n")),
      groupCols, s, seed, doubleValued = false, portableHash = portableHash)
  }

  /** Build a DOUBLE-valued grouped sketch (float/double columns; NaN
    * excluded, −0.0 normalized — the [[Quantiles.exactPctDouble]]
    * policy).
    */
  def buildGroupedDouble(items: DataFrame, groupCols: Seq[String],
      idCol: String, valueCol: String, s: Int, seed: String,
      portableHash: Boolean = true): GroupedQuantileSketch = {
    requireArgs(items, groupCols, s)
    Quantiles.requireFloating(items, valueCol,
      "GroupedQuantileSketch.buildGroupedDouble",
      "For integral values use GroupedQuantileSketch.buildGrouped (exact " +
        "at the full 64-bit range).")
    val rows = items
      .where(col(idCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol)))
      .select(groupCols.map(col) ++ Seq(
        QuantileSketch.rankKey(col(idCol), seed, portableHash).as("rk"),
        (col(valueCol).cast("double") + lit(0.0)).as("value")): _*)
    GroupedQuantileSketch(cutPerGroup(rows, groupCols, s),
      rows.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n")),
      groupCols, s, seed, doubleValued = true, portableHash = portableHash)
  }

  /** Rebuild the grouped-sketch surface from
    * [[graft.streaming.StreamRankSketch]] emissions — the
    * stream-to-batch composition the windowed sketch exists for: write
    * each closed window's summary rows to a sink, read them back here,
    * and [[GroupedQuantileSketch.quantiles]]/[[GroupedQuantileSketch.rankOf]]/
    * [[GroupedQuantileSketch.merge]] work with windowStartMs as the
    * group (the per-window `n` riding on every emitted row becomes the
    * counts frame). `s` and `seed` are the STREAM's geometry — they are
    * not carried in the rows, and a wrong s/seed here would merge into
    * a mixed hash space downstream, so pass the values the stream was
    * started with. The HASH MODE, by contrast, IS carried (the
    * `portable` field every summary row records — r18 verdict #2): a
    * rebuild whose `portableHash` mixes or mismatches the sink's
    * REFUSES here, because `rankOf` on the rebuilt sketch would hash
    * query ids into a different rank space than the stored keys
    * (silently wrong ranks). Value type (long vs double emissions) is
    * inferred from the frame.
    */
  def fromWindowSummaries(summaries: DataFrame, s: Int, seed: String,
      portableHash: Boolean = true): GroupedQuantileSketch =
    fromSummariesImpl(summaries, Seq("windowStartMs"), s, seed,
      portableHash, "fromWindowSummaries")

  /** [[fromWindowSummaries]] for [[graft.streaming.StreamRankSketch]]
    * GROUPED emissions (windowStartMs, windowEndMs, group, rk, value,
    * n): the rebuilt sketch is stratified by (windowStartMs, group).
    */
  def fromWindowGroupSummaries(summaries: DataFrame, s: Int, seed: String,
      portableHash: Boolean = true): GroupedQuantileSketch =
    fromSummariesImpl(summaries, Seq("windowStartMs", "group"), s, seed,
      portableHash, "fromWindowGroupSummaries")

  private def fromSummariesImpl(summaries: DataFrame,
      groupCols: Seq[String], s: Int, seed: String, portableHash: Boolean,
      site: String): GroupedQuantileSketch = {
    val cols = summaries.columns.toSet
    require((groupCols.toSet ++ Set("rk", "value", "n", "portable"))
        .subsetOf(cols),
      s"GroupedQuantileSketch.$site: expected the StreamRankSketch " +
        s"emission schema (${groupCols.mkString(", ")}, windowEndMs, rk, " +
        s"value, n, portable) - got ${summaries.columns.mkString(",")}")
    graft.streaming.StreamSketches.requirePortableMode(summaries,
      portableHash, s"GroupedQuantileSketch.$site")
    val dv = summaries.schema("value").dataType match {
      case org.apache.spark.sql.types.LongType => false
      case org.apache.spark.sql.types.DoubleType => true
      case dt => throw new IllegalArgumentException(
        s"GroupedQuantileSketch.$site: value column is " +
          s"${dt.catalogString} - StreamRankSketch emits BIGINT " +
          "(long entry points) or DOUBLE (the Double siblings)")
    }
    QuantileSketch.requireS(s, s"GroupedQuantileSketch.$site (pass the " +
      "stream's geometry)")
    GroupedQuantileSketch(
      summaries.select((groupCols ++ Seq("rk", "value")).map(col): _*),
      summaries.select((groupCols :+ "n").map(col): _*).distinct(),
      groupCols, s, seed, dv, portableHash)
  }

  /** Persist summary + counts + geometry + content digests at `path`
    * (overwrites). Digests are XORs ([[SketchIo]]) over what was
    * WRITTEN, so a failed/partial write cannot inherit a valid digest.
    */
  def write(sketch: GroupedQuantileSketch, path: String): Unit = {
    val spark = sketch.summary.sparkSession
    sketch.summary.write.mode("overwrite").parquet(s"$path/summary")
    sketch.counts.write.mode("overwrite").parquet(s"$path/counts")
    val sumDig = canonicalDigest(spark.read.parquet(s"$path/summary"),
      sketch.groupCols ++ Seq("rk", "value"))
    val cntDig = canonicalDigest(spark.read.parquet(s"$path/counts"),
      sketch.groupCols :+ "n")
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("s" -> sketch.s) ~
        ("seed" -> sketch.seed) ~
        ("groupCols" -> sketch.groupCols.toList) ~
        ("doubleValued" -> sketch.doubleValued) ~
        ("portableHash" -> sketch.portableHash) ~
        ("summaryDigest" -> sumDig) ~
        ("countsDigest" -> cntDig)
    SketchIo.writeFile(spark, path, "gqsketch.json", compact(render(meta)))
  }

  /** Load and VALIDATE a persisted grouped sketch: geometry from
    * gqsketch.json, both digests recomputed and compared — corruption
    * refuses here instead of mis-ranking downstream.
    */
  def read(spark: SparkSession, path: String): GroupedQuantileSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "gqsketch.json",
      "GroupedQuantileSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"GroupedQuantileSketch.read: formatVersion $ver unsupported " +
        s"(expected $FormatVersion)")
    val groupCols = (meta \ "groupCols").extract[List[String]]
    val summary = spark.read.parquet(s"$path/summary")
    val counts = spark.read.parquet(s"$path/counts")
    def check(df: DataFrame, cols: Seq[String], key: String,
        what: String): Unit = {
      val expected = (meta \ key).extract[Long]
      // digestMatches: canonical rule, with the pre-r17 legacy-NTZ
      // fallback so old valid sketches don't refuse as corrupted
      require(SketchIo.digestMatches(df, cols, expected),
        s"GroupedQuantileSketch.read: $what digest mismatch (stored " +
          s"$expected) - the payload at $path/$what does not match what " +
          "was written; refusing a corrupted sketch")
    }
    check(summary, groupCols ++ Seq("rk", "value"), "summaryDigest", "summary")
    check(counts, groupCols :+ "n", "countsDigest", "counts")
    GroupedQuantileSketch(summary, counts, groupCols,
      (meta \ "s").extract[Int],
      (meta \ "seed").extract[String],
      (meta \ "doubleValued").extract[Boolean],
      // pre-r17 files lack the field and were all md5-portable
      (meta \ "portableHash").extractOrElse(true))
  }
}
