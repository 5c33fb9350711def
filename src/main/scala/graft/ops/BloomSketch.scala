package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed handle for a Bloom membership filter: the packed-word frame
  * PLUS the geometry (numBits, numHashes) it was built with — the
  * membership sibling of [[CmsSketch]] / [[HllSketch]] /
  * [[QuantileSketch]], completing the mergeable sketch family.
  *
  * Why a handle: [[Bloom.mightContain]] trusts the caller to re-supply
  * the build's exact (m, k) on every probe. That hazard is not an
  * accuracy nuance — probing with a different modulus computes
  * positions in the WRONG space and can answer `false` for a key that
  * WAS inserted, silently voiding the no-false-negative guarantee
  * every consumer of a membership filter builds on (a decontamination
  * pass would ship contaminated docs while claiming cleanliness). The
  * handle makes the contract structural: geometry travels with the
  * words, [[merge]] refuses mismatches with a typed error, and a
  * filter loaded from storage carries the geometry it was built with.
  *
  * Persistence layout (`write`/`read`): `path/words` (parquet, the
  * distributed word frame, ≤ m/64 rows) + `path/bloom.json` (geometry,
  * a formatVersion, and an ORDER-INDEPENDENT content digest — XOR of
  * each word's 60-bit md5 content hash, the
  * [[graft.sources.ShardExport]] manifest pattern). Both columns are
  * longs, so no canonicalization is needed before digesting (the
  * [[SketchIo.xorDigestCols]] timestamp/double rules don't apply).
  * `read` recomputes the digest, refuses corruption, and additionally
  * refuses word indices outside the geometry's range — the one
  * structural defect the digest can't catch if it was written by a
  * foreign tool. File-I/O sink surface (sbt-only evidence, §2.5); the
  * arithmetic inside is the SAME build/merge/probe the hash-oracled
  * q_bloom_bits / q_bloom_merge / q_bloom_probe gates replay in
  * DuckDB.
  *
  * The 100-TB story: build the eval-set filter ONCE, persist it, and
  * probe every future ingest batch via
  * [[Curate.decontaminateBloomPrebuilt]] — the filter costs m/8 bytes
  * on disk and its merge with next quarter's eval suite is a
  * ≤ 2·m/64-row job, never an eval-corpus rescan.
  */
final case class BloomSketch(
    words: DataFrame,
    numBits: Long,
    numHashes: Int,
    portableHash: Boolean = true) {

  /** Membership verdicts for the distinct non-null keys of `keyCol` —
    * geometry AND hash mode supplied by the handle, so a probe can
    * never desynchronize from the build. See [[Bloom.mightContain]].
    */
  def mightContain(keys: DataFrame, keyCol: String): DataFrame =
    Bloom.mightContain(words, keys, keyCol, numBits, numHashes, portableHash)

  /** Bitwise-OR merge, REFUSING mismatched geometries: same-m frames
    * from different k are the subtle case — the words LOOK compatible
    * and OR cleanly, but the merged filter answers probes with
    * whichever k the caller supplies, false-negating the other side's
    * keys. The hash MODE is geometry too, and the nastier case: a
    * portable/fast pair at the same (m, k) also ORs cleanly, but the
    * merged filter probes positions in only one side's hash space and
    * answers `false` for the other side's inserted keys — the exact
    * no-false-negative violation the handle exists to prevent.
    */
  def merge(other: BloomSketch): BloomSketch = {
    require(numBits == other.numBits && numHashes == other.numHashes &&
      portableHash == other.portableHash,
      s"BloomSketch.merge: geometry mismatch - this is (numBits=$numBits, " +
        s"numHashes=$numHashes, portableHash=$portableHash), other is " +
        s"(numBits=${other.numBits}, numHashes=${other.numHashes}, " +
        s"portableHash=${other.portableHash}). Filters only merge when " +
        "built with IDENTICAL geometry and hash mode; rebuild one side.")
    copy(words = Bloom.merge(words, other.words))
  }

  /** Fraction of set bits; the filter's realized expected
    * false-positive rate is [[fprEstimate]] = fillRatio^numHashes.
    */
  def fillRatio(): Double = Bloom.fillRatio(words, numBits)

  /** Expected false-positive probability per probed key, from the
    * realized fill (tighter than the a-priori (1-e^{-kn/m})^k).
    */
  def fprEstimate(): Double = math.pow(fillRatio(), numHashes.toDouble)

  /** The dense `Array[Long]` image for broadcast-probe paths
    * ([[Curate.decontaminateBloomPrebuilt]]); conf-capped driver
    * collect, see [[Bloom.denseWords]].
    */
  def dense(): Array[Long] = Bloom.denseWords(words, numBits)
}

object BloomSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** Build with geometry captured in the handle — same arguments and
    * word frame as [[Bloom.build]]. Size `numBits` from the EXPECTED
    * TOTAL cardinality across every filter you intend to merge
    * (~10 bits/key ≈ 0.8% FP at k=7, or let [[Bloom.sizeFor]] pick
    * both knobs from a target FP rate): the modulus must be chosen
    * once and held fixed, it cannot be derived from any one slice's
    * count. `portableHash = false` swaps the md5 double-hash for
    * codegen'd xxhash64 positions — see [[Bloom.positions]] for the
    * tradeoff (no external replay; every membership property intact).
    */
  def build(items: DataFrame, keyCol: String, numBits: Long,
      numHashes: Int = 7, portableHash: Boolean = true): BloomSketch =
    BloomSketch(Bloom.build(items, keyCol, numBits, numHashes, portableHash),
      numBits, numHashes, portableHash)

  /** Order-independent 60-bit content digest of a word frame
    * ([[SketchIo.xorDigest]] over (w, bits)).
    */
  private def digest(words: DataFrame): Long =
    SketchIo.xorDigest(words, Seq("w", "bits"))

  /** Persist words + geometry + content digest at `path` (overwrites).
    * Word order is irrelevant (the digest is an XOR), so the parquet
    * write needs no coalesce or sort.
    */
  def write(sketch: BloomSketch, path: String): Unit = {
    val spark = sketch.words.sparkSession
    sketch.words.write.mode("overwrite").parquet(s"$path/words")
    // digest what was WRITTEN, not the input plan - a failed/partial
    // write must not inherit a valid digest from the source frame
    val written = spark.read.parquet(s"$path/words")
    val dig = digest(written)
    // persist-time saturation audit (one tiny agg over the <= m/64-row
    // frame we re-read anyway): an oversaturated filter "works" while
    // answering true for everything — warn before a user ships it
    // (sizeFor's scaladoc tells the story; the r20w6 replica lesson)
    val fill = Bloom.fillRatio(written, sketch.numBits)
    if (fill >= Bloom.SaturationWarnFill)
      System.err.println(f"[bloom] warning: persisted filter at $path is " +
        f"$fill%.2f full (expected FP rate ${math.pow(fill, sketch.numHashes.toDouble)}%.3f) - " +
        "it holds more keys than its geometry was sized for; resize with " +
        "Bloom.sizeFor(expectedDistinct, targetFpr) and rebuild")
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("numBits" -> sketch.numBits) ~
        ("numHashes" -> sketch.numHashes) ~
        ("portableHash" -> sketch.portableHash) ~
        ("wordDigest" -> dig)
    SketchIo.writeFile(spark, path, "bloom.json", compact(render(meta)))
  }

  /** Load and VALIDATE a persisted filter: geometry from bloom.json,
    * word digest recomputed and compared, word indices range-checked
    * against the geometry — corruption or a foreign payload refuses
    * here instead of false-negating at probe time.
    */
  def read(spark: SparkSession, path: String): BloomSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "bloom.json", "BloomSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"BloomSketch.read: formatVersion $ver unsupported (expected $FormatVersion)")
    val numBits = (meta \ "numBits").extract[Long]
    val numHashes = (meta \ "numHashes").extract[Int]
    Bloom.requireGeometry(numBits, numHashes)
    val words = spark.read.parquet(s"$path/words")
    val expected = (meta \ "wordDigest").extract[Long]
    val actual = digest(words)
    require(actual == expected,
      s"BloomSketch.read: word digest mismatch (stored $expected, " +
        s"recomputed $actual) - the payload at $path/words does not match " +
        "what was written; refusing a corrupted filter")
    val nWords = (numBits + 63L) >>> 6
    val bad = words.filter(org.apache.spark.sql.functions.col("w") < 0L ||
      org.apache.spark.sql.functions.col("w") >= nWords).count()
    require(bad == 0L,
      s"BloomSketch.read: $bad word row(s) outside [0, $nWords) for " +
        s"numBits = $numBits - the payload does not match its declared " +
        "geometry; refusing to serve probes that could false-negate")
    // hash mode defaults true for pre-r17 files: every filter written
    // before the field existed was md5-portable by construction
    BloomSketch(words, numBits, numHashes,
      (meta \ "portableHash").extractOrElse(true))
  }
}
