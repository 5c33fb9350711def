package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed handle for PER-GROUP Bloom filters: one membership filter per
  * stratum (per language, per day, per domain) in one word frame
  * `(groupCols..., w, bits)` — the grouped twin of [[BloomSketch]],
  * mirroring how [[GroupedQuantileSketch]] stratifies
  * [[QuantileSketch]].
  *
  * Why a handle: beyond the scalar geometry hazard (a foreign-modulus
  * probe can answer `false` for an inserted key), the grouped frame
  * adds the STRATIFICATION to the geometry — merging frames grouped by
  * different columns, or probing with a different grouping than the
  * build's, silently answers membership questions about the wrong
  * strata. The handle carries (numBits, numHashes, groupCols), refuses
  * mismatches, and persists with the shared canonicalized digest
  * ([[SketchIo.canonicalDigest]] — timestamp/double group columns
  * digest environment-independently, the GroupedQuantileSketch rule).
  *
  * Rollups are EXACT, unlike every other sketch's: a Bloom filter of a
  * union is the bitwise OR of the filters (same m), so [[regroup]] to
  * coarser strata ("hourly → daily") and [[toGlobal]] equal the direct
  * builds BIT FOR BIT — no accuracy argument needed, just OR
  * associativity. This is also why [[toGlobal]] exists as the
  * deliberate, explicit form of the group-collapse that the scalar
  * entry points refuse when handed a grouped frame by accident.
  *
  * Persistence layout: `path/words` + `path/gbloom.json` (formatVersion,
  * geometry incl. groupCols, canonicalized word digest). `read`
  * recomputes the digest and range-checks word indices, like
  * [[BloomSketch.read]].
  */
final case class GroupedBloomSketch(
    words: DataFrame,
    groupCols: Seq[String],
    numBits: Long,
    numHashes: Int,
    portableHash: Boolean = true) {

  /** Per-(group, key) membership verdicts against each group's own
    * filter — see [[Bloom.mightContainGrouped]] (null-safe group join,
    * filterless groups answer false).
    */
  def mightContain(keys: DataFrame, keyCol: String): DataFrame =
    Bloom.mightContainGrouped(words, keys, keyCol, groupCols, numBits,
      numHashes, portableHash)

  /** Group-wise OR-merge, REFUSING mismatched geometry, hash mode, or
    * stratification (a cross-MODE merge at matching (m, k) ORs cleanly
    * but false-negates one side's keys at probe time — the
    * [[BloomSketch.merge]] hazard, per group).
    */
  def merge(other: GroupedBloomSketch): GroupedBloomSketch = {
    require(numBits == other.numBits && numHashes == other.numHashes &&
      groupCols == other.groupCols && portableHash == other.portableHash,
      s"GroupedBloomSketch.merge: geometry mismatch - this is " +
        s"(numBits=$numBits, numHashes=$numHashes, groupCols=$groupCols, " +
        s"portableHash=$portableHash), other is (numBits=${other.numBits}, " +
        s"numHashes=${other.numHashes}, groupCols=${other.groupCols}, " +
        s"portableHash=${other.portableHash}). Filters only merge when " +
        "built with IDENTICAL geometry, hash mode, and stratification; " +
        "rebuild one side.")
    copy(words = Bloom.mergeGrouped(words, other.words, groupCols))
  }

  /** Re-stratify to COARSER groups by OR-ing subgroup filters — EXACT:
    * filter(A ∪ B) = filter(A) | filter(B) at the same m, so the
    * result equals a direct build over the coarser grouping bit for
    * bit (spec-pinned). `newGroups` maps new names to expressions over
    * the CURRENT group columns ("hourly → daily": `date_trunc` of the
    * hour column).
    */
  def regroup(newGroups: Seq[(String, Column)]): GroupedBloomSketch = {
    require(newGroups.nonEmpty,
      "GroupedBloomSketch.regroup: newGroups must be non-empty (use " +
        "toGlobal for the ungrouped rollup)")
    val names = newGroups.map(_._1)
    require(names.distinct == names,
      s"GroupedBloomSketch.regroup: duplicate new group names $names")
    val clash = names.filter(Bloom.ReservedNames.contains)
    require(clash.isEmpty,
      s"GroupedBloomSketch.regroup: new group name(s) ${clash.mkString(", ")} " +
        s"collide with the frame/output columns " +
        s"(${Bloom.ReservedNames.mkString(", ")})")
    val rolled = words
      .select(newGroups.map { case (nm, c) => c.as(nm) } ++
        Seq(col("w"), col("bits")): _*)
      .groupBy((names :+ "w").map(col): _*)
      .agg(expr("bit_or(bits)").as("bits"))
    copy(words = rolled, groupCols = names)
  }

  /** [[regroup]] with SQL expression strings — the py4j-friendly form
    * (a Column cannot ride the gateway in a Scala tuple).
    */
  def regroupExpr(names: Seq[String], exprs: Seq[String]): GroupedBloomSketch = {
    require(names.length == exprs.length,
      s"GroupedBloomSketch.regroupExpr: ${names.length} names vs " +
        s"${exprs.length} expressions")
    regroup(names.zip(exprs.map(expr)))
  }

  /** OR-collapse every group into ONE global [[BloomSketch]] — the
    * union filter of all strata, equal to a direct ungrouped build bit
    * for bit. The DELIBERATE form of the collapse the scalar entry
    * points refuse when handed a grouped frame unannounced.
    */
  def toGlobal: BloomSketch =
    BloomSketch(
      words.select(col("w"), col("bits"))
        .groupBy("w").agg(expr("bit_or(bits)").as("bits")),
      numBits, numHashes, portableHash)

  /** Per-group fill ratios `(groupCols..., fill)`; a group's expected
    * FP rate is fill^numHashes.
    */
  def fillRatios(): DataFrame =
    Bloom.fillRatioGrouped(words, groupCols, numBits)
}

object GroupedBloomSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** Build with geometry + stratification captured in the handle —
    * same arguments and word frame as [[Bloom.buildGrouped]]. Size
    * `numBits` for the LARGEST group you expect (all groups share m so
    * their filters merge and regroup; `fillRatios` audits the spread).
    */
  def build(items: DataFrame, keyCol: String, groupCols: Seq[String],
      numBits: Long, numHashes: Int = 7,
      portableHash: Boolean = true): GroupedBloomSketch =
    GroupedBloomSketch(
      Bloom.buildGrouped(items, keyCol, groupCols, numBits, numHashes,
        portableHash),
      groupCols, numBits, numHashes, portableHash)

  /** Persist words + geometry + canonicalized content digest at `path`
    * (overwrites).
    */
  def write(sketch: GroupedBloomSketch, path: String): Unit = {
    val spark = sketch.words.sparkSession
    sketch.words.write.mode("overwrite").parquet(s"$path/words")
    // digest what was WRITTEN, not the input plan (house rule)
    val written = spark.read.parquet(s"$path/words")
    val dig = SketchIo.canonicalDigest(written,
      sketch.groupCols ++ Seq("w", "bits"))
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    // persist-time saturation audit over the WORST group (one tiny agg
    // over the re-read frame — the BloomSketch.write discipline, per
    // stratum: a shared m sized for the median group can silently
    // saturate the largest one)
    val worst = Bloom.fillRatioGrouped(written,
        sketch.groupCols, sketch.numBits)
      .agg(org.apache.spark.sql.functions.max(col("fill"))).head()
    if (!worst.isNullAt(0) && worst.getDouble(0) >= Bloom.SaturationWarnFill)
      System.err.println(f"[bloom] warning: persisted grouped filter at " +
        f"$path has a stratum ${worst.getDouble(0)}%.2f full (expected FP " +
        f"rate ${math.pow(worst.getDouble(0), sketch.numHashes.toDouble)}%.3f) - " +
        "that group holds more keys than the shared geometry was sized " +
        "for; resize with Bloom.sizeFor and rebuild (fillRatios() shows " +
        "the per-group spread)")
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("numBits" -> sketch.numBits) ~
        ("numHashes" -> sketch.numHashes) ~
        ("groupCols" -> sketch.groupCols.toList) ~
        ("portableHash" -> sketch.portableHash) ~
        ("wordDigest" -> dig)
    SketchIo.writeFile(spark, path, "gbloom.json", compact(render(meta)))
  }

  /** Load and VALIDATE: geometry + stratification from gbloom.json,
    * canonicalized digest recomputed, word indices range-checked.
    */
  def read(spark: SparkSession, path: String): GroupedBloomSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "gbloom.json",
      "GroupedBloomSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"GroupedBloomSketch.read: formatVersion $ver unsupported " +
        s"(expected $FormatVersion)")
    val numBits = (meta \ "numBits").extract[Long]
    val numHashes = (meta \ "numHashes").extract[Int]
    Bloom.requireGeometry(numBits, numHashes)
    val groupCols = (meta \ "groupCols").extract[List[String]]
    val words = spark.read.parquet(s"$path/words")
    val expected = (meta \ "wordDigest").extract[Long]
    require(SketchIo.digestMatches(words, groupCols ++ Seq("w", "bits"), expected),
      s"GroupedBloomSketch.read: word digest mismatch (stored $expected) " +
        s"- the payload at $path/words does not match " +
        "what was written; refusing a corrupted filter")
    val nWords = (numBits + 63L) >>> 6
    val bad = words.filter(col("w") < 0L || col("w") >= nWords).count()
    require(bad == 0L,
      s"GroupedBloomSketch.read: $bad word row(s) outside [0, $nWords) for " +
        s"numBits = $numBits - the payload does not match its declared " +
        "geometry; refusing to serve probes that could false-negate")
    // pre-r17 files lack the field and were all md5-portable
    GroupedBloomSketch(words, groupCols, numBits, numHashes,
      (meta \ "portableHash").extractOrElse(true))
  }
}
