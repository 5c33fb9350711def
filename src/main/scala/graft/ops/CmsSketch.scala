package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed handle for a count-min sketch: the cell frame PLUS the geometry
  * (depth, width, seed, hash mode) it was built with — and the layer
  * that makes the sketch a safe PERSISTED artifact.
  *
  * Why a handle: the functional [[Sketches]] API trusts the caller to
  * re-supply identical geometry on every probe and merge. That hazard is
  * not an accuracy nuance — probing with a mismatched seed/width/depth
  * runs the min over the WRONG cells and can UNDER-estimate, silently
  * voiding the one-sided guarantee (est ≥ true count) every consumer of
  * the sketch builds on, and [[Sketches.merge]] of two different
  * geometries adds apples to oranges without an error. The handle makes
  * the contract structural: geometry travels with the cells, [[merge]]
  * refuses mismatches with a typed error, and a sketch loaded from
  * storage carries the geometry it was built with.
  *
  * Persistence layout (`write`/`read`): `path/cells` (parquet, the
  * distributed cell frame) + `path/cms.json` (geometry, a formatVersion,
  * and an ORDER-INDEPENDENT content digest — XOR of each cell's 60-bit
  * md5 content hash, the [[graft.sources.ShardExport.manifest]]
  * pattern). `read` recomputes the digest and refuses a corrupted or
  * partially-written sketch instead of serving under-estimates. This is
  * file-I/O sink surface (sbt-only evidence, like InterchangeV1 model
  * write — §2.5): the arithmetic inside is the SAME build/estimate the
  * hash-oracled q_cms_heavy gate replays in DuckDB.
  */
final case class CmsSketch(
    cells: DataFrame,
    depth: Int,
    width: Int,
    seed: String,
    portableHash: Boolean) {

  /** One-sided point estimates for `keys` — geometry supplied by the
    * handle, so a probe can never desynchronize from the build.
    */
  def estimate(keys: DataFrame, keyCol: String): DataFrame =
    Sketches.estimate(cells, keys, keyCol, depth, width, seed, portableHash)

  /** Cell-sum merge, REFUSING mismatched geometries: a silent merge of
    * different (depth, width, seed, hash) spaces would corrupt every
    * subsequent estimate in the hardest-to-debug way (plausible but
    * wrong counts, one-sidedness gone).
    */
  def merge(other: CmsSketch): CmsSketch = {
    require(depth == other.depth && width == other.width &&
      seed == other.seed && portableHash == other.portableHash,
      s"CmsSketch.merge: geometry mismatch - this is (depth=$depth, " +
        s"width=$width, seed=$seed, portableHash=$portableHash), other is " +
        s"(depth=${other.depth}, width=${other.width}, seed=${other.seed}, " +
        s"portableHash=${other.portableHash}). Sketches only merge when " +
        "built with IDENTICAL geometry; rebuild one side.")
    copy(cells = Sketches.merge(cells, other.cells))
  }
}

object CmsSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** Build with geometry captured in the handle — same arguments and
    * cell frame as [[Sketches.build]].
    */
  def build(
      items: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      seed: String,
      weightCol: Option[String] = None,
      portableHash: Boolean = true): CmsSketch =
    CmsSketch(
      Sketches.build(items, keyCol, depth, width, seed, weightCol, portableHash),
      depth, width, seed, portableHash)

  /** Order-independent 60-bit content digest of a cell frame
    * ([[SketchIo.xorDigest]] over (r, bucket, cnt)).
    */
  private def digest(cells: DataFrame): Long =
    SketchIo.xorDigest(cells, Seq("r", "bucket", "cnt"))

  /** Persist sketch cells + geometry + content digest at `path`
    * (overwrites). Cell order is irrelevant (the digest is an XOR), so
    * the parquet write needs no coalesce or sort.
    */
  def write(sketch: CmsSketch, path: String): Unit = {
    val spark = sketch.cells.sparkSession
    sketch.cells.write.mode("overwrite").parquet(s"$path/cells")
    // digest what was WRITTEN, not the input plan - a failed/partial
    // write must not inherit a valid digest from the source frame
    val dig = digest(spark.read.parquet(s"$path/cells"))
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("depth" -> sketch.depth) ~
        ("width" -> sketch.width) ~
        ("seed" -> sketch.seed) ~
        ("portableHash" -> sketch.portableHash) ~
        ("cellDigest" -> dig)
    SketchIo.writeFile(spark, path, "cms.json", compact(render(meta)))
  }

  /** Load and VALIDATE a persisted sketch: geometry from cms.json, cell
    * digest recomputed and compared — a corrupted, truncated, or
    * hand-edited cell payload refuses here instead of under-estimating
    * at probe time.
    */
  def read(spark: SparkSession, path: String): CmsSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "cms.json", "CmsSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"CmsSketch.read: formatVersion $ver unsupported (expected $FormatVersion)")
    val cells = spark.read.parquet(s"$path/cells")
    val expected = (meta \ "cellDigest").extract[Long]
    val actual = digest(cells)
    require(actual == expected,
      s"CmsSketch.read: cell digest mismatch (stored $expected, recomputed " +
        s"$actual) - the cell payload at $path/cells does not match what was " +
        "written; refusing to serve estimates from a corrupted sketch")
    CmsSketch(cells,
      (meta \ "depth").extract[Int],
      (meta \ "width").extract[Int],
      (meta \ "seed").extract[String],
      (meta \ "portableHash").extract[Boolean])
  }
}
