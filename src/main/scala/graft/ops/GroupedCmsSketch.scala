package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed handle for PER-GROUP count-min sketches: one cell grid per
  * stratum in one frame `(groupCols..., r, bucket, cnt)` — the grouped
  * twin of [[CmsSketch]], completing the grouped-handle matrix across
  * the sketch family.
  *
  * Why a handle: a probe with mismatched (depth, width, seed) runs the
  * min over the WRONG cells and can UNDER-estimate (the one-sided
  * guarantee silently voided — the scalar [[CmsSketch]] rationale),
  * and the grouped frame adds the STRATIFICATION: cell-summing frames
  * grouped by different columns attributes counts to strata that never
  * existed. Geometry travels with the cells; [[merge]] refuses
  * mismatches; persistence validates a canonicalized digest plus cell
  * coordinate range checks.
  *
  * The composition: persist per-(day, lang) cell frames, cell-sum
  * across days ([[merge]]), ask per-lang frequency estimates for any
  * key set ([[estimates]]) — never rescanning a corpus.
  */
final case class GroupedCmsSketch(
    cells: DataFrame,
    groupCols: Seq[String],
    depth: Int,
    width: Int,
    seed: String,
    portableHash: Boolean) {

  /** One-sided point estimates per (group, key) pair against THAT
    * group's cells — geometry supplied by the handle
    * ([[Sketches.estimateGrouped]]: null-safe group join, sketchless
    * groups estimate 0).
    */
  def estimates(keys: DataFrame, keyCol: String): DataFrame =
    Sketches.estimateGrouped(cells, keys, keyCol, groupCols, depth, width,
      seed, portableHash)

  /** Re-stratify to COARSER groups by cell-summing subgroup grids —
    * EXACT: cell sums are associative, so cells(A ∪ B) = cells(A) +
    * cells(B) at the same (depth, width, seed), and the result equals
    * a direct build over the coarser grouping bit for bit
    * (spec-pinned; the [[GroupedBloomSketch]]/[[GroupedHllSketch]]
    * rollup argument with + in place of OR/max). "hourly → daily"
    * frequency rollups never rescan.
    */
  def regroup(newGroups: Seq[(String, org.apache.spark.sql.Column)]): GroupedCmsSketch = {
    require(newGroups.nonEmpty,
      "GroupedCmsSketch.regroup: newGroups must be non-empty (use " +
        "toGlobal for the ungrouped rollup)")
    val names = newGroups.map(_._1)
    require(names.distinct == names,
      s"GroupedCmsSketch.regroup: duplicate new group names $names")
    val clash = names.filter(Sketches.GroupedReservedNames.contains)
    require(clash.isEmpty,
      s"GroupedCmsSketch.regroup: new group name(s) ${clash.mkString(", ")} " +
        s"collide with the cell/output columns " +
        s"(${Sketches.GroupedReservedNames.mkString(", ")})")
    val rolled = cells
      .select(newGroups.map { case (nm, c) => c.as(nm) } ++
        Seq(col("r"), col("bucket"), col("cnt")): _*)
      .groupBy((names ++ Seq("r", "bucket")).map(col): _*)
      .agg(sum("cnt").as("cnt"))
    copy(cells = rolled, groupCols = names)
  }

  /** [[regroup]] with SQL expression strings — the py4j-friendly form. */
  def regroupExpr(names: Seq[String], exprs: Seq[String]): GroupedCmsSketch = {
    require(names.length == exprs.length,
      s"GroupedCmsSketch.regroupExpr: ${names.length} names vs " +
        s"${exprs.length} expressions")
    regroup(names.zip(exprs.map(expr)))
  }

  /** Sum-collapse every group into ONE global [[CmsSketch]] — equal to
    * a direct ungrouped build bit for bit.
    */
  def toGlobal: CmsSketch =
    CmsSketch(
      cells.select(col("r"), col("bucket"), col("cnt"))
        .groupBy("r", "bucket").agg(sum("cnt").as("cnt")),
      depth, width, seed, portableHash)

  /** Group-wise cell-sum merge, REFUSING mismatched geometry or
    * stratification.
    */
  def merge(other: GroupedCmsSketch): GroupedCmsSketch = {
    require(depth == other.depth && width == other.width &&
      seed == other.seed && portableHash == other.portableHash &&
      groupCols == other.groupCols,
      s"GroupedCmsSketch.merge: geometry mismatch - this is " +
        s"(depth=$depth, width=$width, seed=$seed, " +
        s"portableHash=$portableHash, groupCols=$groupCols), other is " +
        s"(depth=${other.depth}, width=${other.width}, seed=${other.seed}, " +
        s"portableHash=${other.portableHash}, groupCols=${other.groupCols}). " +
        "Sketches only merge when built with IDENTICAL geometry and " +
        "stratification; rebuild one side.")
    copy(cells = Sketches.mergeGrouped(cells, other.cells, groupCols))
  }
}

object GroupedCmsSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** Build with geometry + stratification captured in the handle —
    * same arguments and cell frame as [[Sketches.buildGrouped]].
    */
  def build(
      items: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      depth: Int,
      width: Int,
      seed: String,
      weightCol: Option[String] = None,
      portableHash: Boolean = true): GroupedCmsSketch =
    GroupedCmsSketch(
      Sketches.buildGrouped(items, keyCol, groupCols, depth, width, seed,
        weightCol, portableHash),
      groupCols, depth, width, seed, portableHash)

  /** Persist cells + geometry + canonicalized content digest at `path`
    * (overwrites).
    */
  def write(sketch: GroupedCmsSketch, path: String): Unit = {
    val spark = sketch.cells.sparkSession
    sketch.cells.write.mode("overwrite").parquet(s"$path/cells")
    // digest what was WRITTEN, not the input plan (house rule)
    val dig = SketchIo.canonicalDigest(spark.read.parquet(s"$path/cells"),
      sketch.groupCols ++ Seq("r", "bucket", "cnt"))
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("depth" -> sketch.depth) ~
        ("width" -> sketch.width) ~
        ("seed" -> sketch.seed) ~
        ("portableHash" -> sketch.portableHash) ~
        ("groupCols" -> sketch.groupCols.toList) ~
        ("cellDigest" -> dig)
    SketchIo.writeFile(spark, path, "gcms.json", compact(render(meta)))
  }

  /** Load and VALIDATE: geometry + stratification from gcms.json,
    * canonicalized digest recomputed, cell coordinates range-checked
    * against (depth, width) and counts required nonnegative — a
    * foreign or corrupted payload refuses here instead of silently
    * under-estimating at probe time.
    */
  def read(spark: SparkSession, path: String): GroupedCmsSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "gcms.json",
      "GroupedCmsSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"GroupedCmsSketch.read: formatVersion $ver unsupported " +
        s"(expected $FormatVersion)")
    val depth = (meta \ "depth").extract[Int]
    val width = (meta \ "width").extract[Int]
    val groupCols = (meta \ "groupCols").extract[List[String]]
    val cells = spark.read.parquet(s"$path/cells")
    val expected = (meta \ "cellDigest").extract[Long]
    require(SketchIo.digestMatches(cells,
        groupCols ++ Seq("r", "bucket", "cnt"), expected),
      s"GroupedCmsSketch.read: cell digest mismatch (stored $expected) " +
        s"- the payload at $path/cells does not match " +
        "what was written; refusing a corrupted sketch")
    val bad = cells.filter(col("r") < 0 || col("r") >= depth ||
      col("bucket") < 0L || col("bucket") >= width.toLong ||
      col("cnt") < 0L).count()
    require(bad == 0L,
      s"GroupedCmsSketch.read: $bad cell row(s) outside the declared " +
        s"(depth=$depth, width=$width) geometry or with negative counts - " +
        "refusing to serve estimates that could under-count")
    GroupedCmsSketch(cells, groupCols, depth, width,
      (meta \ "seed").extract[String],
      (meta \ "portableHash").extract[Boolean])
  }
}
