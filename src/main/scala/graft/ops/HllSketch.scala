package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed handle for a HyperLogLog sketch: the register frame PLUS the
  * geometry (p, seed, hash mode) it was built with — the cardinality
  * sibling of [[CmsSketch]], and the layer that makes HLL registers a
  * safe PERSISTED artifact.
  *
  * Why a handle: [[Hll.merge]] trusts the caller to only combine frames
  * built with identical geometry. That hazard is not an accuracy
  * nuance — max-merging registers from different seeds or different p
  * mixes unrelated hash spaces and the estimate comes back plausible
  * but wrong (typically an UNDER-estimate: foreign ranks land in the
  * wrong buckets and the harmonic mean is dominated by what looks like
  * a smaller set). The handle makes the contract structural: geometry
  * travels with the registers, [[merge]] refuses mismatches with a
  * typed error, and a sketch loaded from storage carries the geometry
  * it was built with.
  *
  * Persistence layout (`write`/`read`): `path/registers` (parquet, the
  * distributed register frame) + `path/hll.json` (geometry, a
  * formatVersion, and an ORDER-INDEPENDENT content digest — XOR of each
  * register's 60-bit md5 content hash, the
  * [[graft.sources.ShardExport]] manifest pattern). `read` recomputes
  * the digest and refuses a corrupted or partially-written sketch
  * instead of serving wrong cardinalities. File-I/O sink surface
  * (sbt-only evidence, like CmsSketch and the §2.5 model writer); the
  * arithmetic inside is the SAME build/merge the hash-oracled
  * q_hll_registers / q_hll_merge gates replay in DuckDB.
  */
final case class HllSketch(
    registers: DataFrame,
    p: Int,
    seed: String,
    portableHash: Boolean) {

  /** Cardinality estimate — geometry supplied by the handle. */
  def estimate(): Long = Hll.estimate(registers, p)

  /** |this ∪ other| estimate (geometry-checked; the union sketch is
    * lossless, single-sketch error).
    */
  def unionEstimate(other: HllSketch): Long = merge(other).estimate()

  /** |this ∩ other| estimate by inclusion–exclusion (geometry-checked).
    * Errors compound — see [[Hll.intersectEstimate]].
    */
  def intersectEstimate(other: HllSketch): Long =
    math.max(0L, estimate() + other.estimate() - unionEstimate(other))

  /** Register max-merge, REFUSING mismatched geometries. */
  def merge(other: HllSketch): HllSketch = {
    require(p == other.p && seed == other.seed &&
      portableHash == other.portableHash,
      s"HllSketch.merge: geometry mismatch - this is (p=$p, seed=$seed, " +
        s"portableHash=$portableHash), other is (p=${other.p}, " +
        s"seed=${other.seed}, portableHash=${other.portableHash}). " +
        "Register frames only merge when built with IDENTICAL geometry; " +
        "rebuild one side.")
    copy(registers = Hll.merge(registers, other.registers))
  }
}

object HllSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** Build with geometry captured in the handle — same arguments and
    * register frame as [[Hll.build]].
    */
  def build(
      items: DataFrame,
      keyCol: String,
      p: Int,
      seed: String,
      portableHash: Boolean = true): HllSketch =
    HllSketch(Hll.build(items, keyCol, p, seed, portableHash),
      p, seed, portableHash)

  /** Order-independent 60-bit content digest of a register frame
    * ([[SketchIo.xorDigest]] over (bucket, maxrank)).
    */
  private def digest(registers: DataFrame): Long =
    SketchIo.xorDigest(registers, Seq("bucket", "maxrank"))

  /** Persist registers + geometry + content digest at `path`
    * (overwrites). Register order is irrelevant (the digest is an XOR),
    * so the parquet write needs no coalesce or sort.
    */
  def write(sketch: HllSketch, path: String): Unit = {
    val spark = sketch.registers.sparkSession
    sketch.registers.write.mode("overwrite").parquet(s"$path/registers")
    // digest what was WRITTEN, not the input plan - a failed/partial
    // write must not inherit a valid digest from the source frame
    val dig = digest(spark.read.parquet(s"$path/registers"))
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("p" -> sketch.p) ~
        ("seed" -> sketch.seed) ~
        ("portableHash" -> sketch.portableHash) ~
        ("registerDigest" -> dig)
    SketchIo.writeFile(spark, path, "hll.json", compact(render(meta)))
  }

  /** Load and VALIDATE a persisted sketch: geometry from hll.json,
    * register digest recomputed and compared — corruption refuses here
    * instead of mis-estimating downstream.
    */
  def read(spark: SparkSession, path: String): HllSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "hll.json", "HllSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"HllSketch.read: formatVersion $ver unsupported (expected $FormatVersion)")
    val registers = spark.read.parquet(s"$path/registers")
    val expected = (meta \ "registerDigest").extract[Long]
    val actual = digest(registers)
    require(actual == expected,
      s"HllSketch.read: register digest mismatch (stored $expected, " +
        s"recomputed $actual) - the payload at $path/registers does not " +
        "match what was written; refusing a corrupted sketch")
    HllSketch(registers,
      (meta \ "p").extract[Int],
      (meta \ "seed").extract[String],
      (meta \ "portableHash").extract[Boolean])
  }
}
