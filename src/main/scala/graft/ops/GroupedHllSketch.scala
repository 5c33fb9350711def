package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed handle for PER-GROUP HyperLogLog sketches: one register set
  * per stratum in one frame `(groupCols..., bucket, maxrank)` — the
  * grouped twin of [[HllSketch]], completing the grouped-handle matrix
  * across the sketch family ([[GroupedQuantileSketch]],
  * [[GroupedBloomSketch]], [[GroupedCmsSketch]], this).
  *
  * Why a handle: beyond the scalar geometry hazard (mixed seeds or p
  * silently UNDER-estimate), the grouped frame adds the STRATIFICATION
  * — max-merging frames grouped by different columns mixes strata and
  * answers per-group cardinality questions about groups that never
  * existed. Geometry (p, seed, hash mode, groupCols) travels with the
  * registers; [[merge]] refuses mismatches; persistence validates a
  * canonicalized digest ([[SketchIo.canonicalDigest]] — timestamp/
  * double group columns digest environment-independently) plus a
  * bucket range check against 2^p.
  *
  * The composition: persist per-(day, lang) register frames, merge
  * across days (register max rides the group-by), ask per-lang
  * distinct counts or cross-snapshot overlap per lang
  * ([[unionEstimates]]/[[intersectEstimates]]) — never rescanning a
  * corpus.
  */
final case class GroupedHllSketch(
    registers: DataFrame,
    groupCols: Seq[String],
    p: Int,
    seed: String,
    portableHash: Boolean) {

  /** Per-group cardinality estimates `(groupCols..., est)` — one
    * aggregation, groups never collected ([[Hll.estimateGrouped]],
    * including its duplicate-bucket and geometry refusals).
    */
  def estimates(): DataFrame = Hll.estimateGrouped(registers, groupCols, p)

  /** Per-group |A ∪ B| estimates against another sketch with IDENTICAL
    * geometry and stratification — `(groupCols..., est)`, one-sided
    * groups estimated from the present side alone.
    */
  def unionEstimates(other: GroupedHllSketch): DataFrame = {
    requireSameGeometry(other, "unionEstimates")
    Hll.unionEstimateGrouped(registers, other.registers, groupCols, p)
  }

  /** Per-group |A ∩ B| estimates by inclusion–exclusion (errors
    * compound per group exactly as in [[Hll.intersectEstimate]]).
    */
  def intersectEstimates(other: GroupedHllSketch): DataFrame = {
    requireSameGeometry(other, "intersectEstimates")
    Hll.intersectEstimateGrouped(registers, other.registers, groupCols, p)
  }

  /** Group-wise register max-merge, REFUSING mismatched geometry or
    * stratification.
    */
  def merge(other: GroupedHllSketch): GroupedHllSketch = {
    requireSameGeometry(other, "merge")
    copy(registers = Hll.merge(registers, other.registers))
  }

  /** Re-stratify to COARSER groups by max-merging subgroup registers —
    * EXACT: register max is associative and idempotent, so
    * registers(A ∪ B) = max(registers(A), registers(B)) at the same
    * (p, seed), and the result equals a direct build over the coarser
    * grouping bit for bit (spec-pinned; the [[GroupedBloomSketch]] OR
    * argument with max in place of OR). "hourly → daily" register
    * rollups never rescan.
    */
  def regroup(newGroups: Seq[(String, org.apache.spark.sql.Column)]): GroupedHllSketch = {
    require(newGroups.nonEmpty,
      "GroupedHllSketch.regroup: newGroups must be non-empty (use " +
        "toGlobal for the ungrouped rollup)")
    val names = newGroups.map(_._1)
    require(names.distinct == names,
      s"GroupedHllSketch.regroup: duplicate new group names $names")
    val clash = names.filter(Hll.ReservedNames.contains)
    require(clash.isEmpty,
      s"GroupedHllSketch.regroup: new group name(s) ${clash.mkString(", ")} " +
        s"collide with the register/output columns " +
        s"(${Hll.ReservedNames.mkString(", ")})")
    val rolled = registers
      .select(newGroups.map { case (nm, c) => c.as(nm) } ++
        Seq(col("bucket"), col("maxrank")): _*)
      .groupBy((names :+ "bucket").map(col): _*)
      .agg(max("maxrank").as("maxrank"))
    copy(registers = rolled, groupCols = names)
  }

  /** [[regroup]] with SQL expression strings — the py4j-friendly form. */
  def regroupExpr(names: Seq[String], exprs: Seq[String]): GroupedHllSketch = {
    require(names.length == exprs.length,
      s"GroupedHllSketch.regroupExpr: ${names.length} names vs " +
        s"${exprs.length} expressions")
    regroup(names.zip(exprs.map(expr)))
  }

  /** Max-collapse every group into ONE global [[HllSketch]] — equal to
    * a direct ungrouped build bit for bit (same exactness argument as
    * [[regroup]] with a single coarse group).
    */
  def toGlobal: HllSketch =
    HllSketch(
      registers.select(col("bucket"), col("maxrank"))
        .groupBy("bucket").agg(max("maxrank").as("maxrank")),
      p, seed, portableHash)

  private def requireSameGeometry(other: GroupedHllSketch,
      site: String): Unit =
    require(p == other.p && seed == other.seed &&
      portableHash == other.portableHash && groupCols == other.groupCols,
      s"GroupedHllSketch.$site: geometry mismatch - this is (p=$p, " +
        s"seed=$seed, portableHash=$portableHash, groupCols=$groupCols), " +
        s"other is (p=${other.p}, seed=${other.seed}, " +
        s"portableHash=${other.portableHash}, groupCols=${other.groupCols}). " +
        "Register frames only combine when built with IDENTICAL geometry " +
        "and stratification; rebuild one side.")
}

object GroupedHllSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** Build with geometry + stratification captured in the handle —
    * same arguments and register frame as [[Hll.buildGrouped]].
    */
  def build(items: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int, seed: String, portableHash: Boolean = true): GroupedHllSketch =
    GroupedHllSketch(
      Hll.buildGrouped(items, groupCols, keyCol, p, seed, portableHash),
      groupCols, p, seed, portableHash)

  /** Persist registers + geometry + canonicalized content digest at
    * `path` (overwrites).
    */
  def write(sketch: GroupedHllSketch, path: String): Unit = {
    val spark = sketch.registers.sparkSession
    sketch.registers.write.mode("overwrite").parquet(s"$path/registers")
    // digest what was WRITTEN, not the input plan (house rule)
    val dig = SketchIo.canonicalDigest(spark.read.parquet(s"$path/registers"),
      sketch.groupCols ++ Seq("bucket", "maxrank"))
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("p" -> sketch.p) ~
        ("seed" -> sketch.seed) ~
        ("portableHash" -> sketch.portableHash) ~
        ("groupCols" -> sketch.groupCols.toList) ~
        ("registerDigest" -> dig)
    SketchIo.writeFile(spark, path, "ghll.json", compact(render(meta)))
  }

  /** Load and VALIDATE: geometry + stratification from ghll.json,
    * canonicalized digest recomputed, bucket indices range-checked
    * against 2^p — a foreign or corrupted payload refuses here instead
    * of mis-estimating downstream.
    */
  def read(spark: SparkSession, path: String): GroupedHllSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "ghll.json",
      "GroupedHllSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"GroupedHllSketch.read: formatVersion $ver unsupported " +
        s"(expected $FormatVersion)")
    val p = (meta \ "p").extract[Int]
    val groupCols = (meta \ "groupCols").extract[List[String]]
    val registers = spark.read.parquet(s"$path/registers")
    val expected = (meta \ "registerDigest").extract[Long]
    require(SketchIo.digestMatches(registers,
        groupCols ++ Seq("bucket", "maxrank"), expected),
      s"GroupedHllSketch.read: register digest mismatch (stored $expected) " +
        s"- the payload at $path/registers does not " +
        "match what was written; refusing a corrupted sketch")
    val m = 1L << p
    val bad = registers.filter(col("bucket") < 0L || col("bucket") >= m).count()
    require(bad == 0L,
      s"GroupedHllSketch.read: $bad register row(s) with bucket outside " +
        s"[0, $m) for p = $p - the payload does not match its declared " +
        "geometry; refusing to serve estimates")
    GroupedHllSketch(registers, groupCols, p,
      (meta \ "seed").extract[String],
      (meta \ "portableHash").extract[Boolean])
  }
}
