package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable RANK sketch — the third leg of the sketch triad
  * (frequency = [[CmsSketch]], cardinality = [[HllSketch]], ranks =
  * this): a deterministic bottom-k order-statistics sample, persisted
  * and merged the same way the HLL register frames are.
  *
  * **The summary**: the `s` rows with the SMALLEST md5-derived rank key
  * `rk = md5_60("seed:id")` ([[Sampling.uniformBits60]]), each carrying
  * its row's value — i.e. a simple random sample without replacement of
  * s rows, drawn by portable hash (the KMV / bottom-k sketch
  * construction: Bar-Yossef et al. 2002, Cohen & Kaplan 2007, applied
  * to order statistics instead of distinct counting). Three properties
  * fall out of "bottom-k of a pure hash" that no compactor-based
  * summary has together:
  *
  *  - **Mergeable by construction, merge-order-INDEPENDENT**: bottom-k
  *    of a union is the bottom-k of the parts' bottom-k's, so per-day /
  *    per-shard / per-snapshot summaries compose associatively AND the
  *    merged summary is a pure function of the input multiset. This is
  *    why the design is bottom-k rather than KLL/GK (Karnin, Lang &
  *    Liberty 2016; Greenwald & Khanna 2001): KLL's compaction schedule
  *    depends on buffer arrival order — under Spark's nondeterministic
  *    partial-aggregation order the summary STRUCTURE would vary run to
  *    run and could never be gate-oracled; GK summaries degrade under
  *    repeated merge. The honest tradeoff is the error rate: sampling
  *    gives rank error ~ n/√s (DKW bound, below) vs KLL's ~ n/s at
  *    equal space — documented, spec-measured, and the right trade for
  *    an engine whose whole gate surface is engine-replayable
  *    determinism.
  *  - **Engine-portable**: rk is the house md5 scheme, so the summary
  *    replays bit-for-bit in the DuckDB oracle exactly the way
  *    q_hll_registers replays registers (q_qsketch_summary,
  *    q_qsketch_merge) — pure integer/string arithmetic (rule 1).
  *  - **Scale-bound state**: the one distributed operation is a
  *    TakeOrderedAndProject (per-partition top-s, then an s-row driver
  *    merge) — each partition contributes ≤ s rows at ANY corpus size;
  *    merging persisted sketches touches 2s rows, never a corpus.
  *
  * **Accuracy** (spec-pinned in QuantileSketchSpec at 3 decades vs
  * [[Quantiles.exactPct]] ground truth): the empirical CDF of a simple
  * random sample of size s deviates from the true CDF by at most
  * ε = sqrt(ln(2/δ)/(2s)) with probability ≥ 1−δ
  * (Dvoretzky–Kiefer–Wolfowitz with Massart's constant), so a
  * [[quantile]] answer's RANK error is ≤ ε·n — s = 4096 gives ~2%
  * rank error at 99% confidence, at any corpus size. When n ≤ s the
  * sample IS the multiset and every answer is exact. For exact answers
  * at corpus scale use [[Quantiles]] (re-scans the source by design);
  * this sketch exists for the persist-once-merge-later path — "p99 doc
  * length per day, composed weekly" — that exact re-scanning cannot
  * serve.
  *
  * **Identity contract**: `idCol` must uniquely identify rows (it IS
  * the sampling randomness — duplicate ids draw correlated rank keys
  * and bias the sample toward their values); across sketches that will
  * be merged, the row sets must be disjoint, same as concatenating the
  * corpora before [[Quantiles.exactPct]]. NULL id or NULL value rows
  * carry no sample identity / no rank and are EXCLUDED (rule-10
  * explicit policy, both sides of the gate); the double builder also
  * excludes NaN and normalizes −0.0 (+0.0), matching
  * [[Quantiles.exactPctDouble]].
  *
  * Persistence (`write`/`read`): `path/summary` (parquet) +
  * `path/qsketch.json` (geometry, n, formatVersion, XOR content digest
  * via [[SketchIo]]) — `read` recomputes the digest and refuses a
  * corrupted sketch, like the other two handles. The reference engine
  * has no sketch layer at all; this is `graft.ops` pipeline surface
  * beyond it.
  */
final case class QuantileSketch(
    summary: DataFrame,
    s: Int,
    seed: String,
    n: Long,
    doubleValued: Boolean,
    portableHash: Boolean = true) {

  import QuantileSketch.requirePct

  /** The pct-th percentile estimate of the sketched corpus (type-1 over
    * the sample: value at sample rank ceil(pct·s'/100)) — EXACT when
    * n ≤ s, rank error ≤ ε·n otherwise (class doc). Long-valued
    * sketches only; a double sketch refuses with a redirect.
    */
  def quantile(pct: Int): Long = {
    require(!doubleValued,
      "QuantileSketch.quantile: this sketch holds DOUBLE values - use " +
        "quantileDouble")
    requirePct(pct, "quantile")
    val v = sampleLongs
    require(v.nonEmpty, "QuantileSketch.quantile: empty sketch (n=0)")
    v(((pct.toLong * v.length + 99L) / 100L - 1L).toInt)
  }

  /** [[quantile]] for double-valued sketches. */
  def quantileDouble(pct: Int): Double = {
    require(doubleValued,
      "QuantileSketch.quantileDouble: this sketch holds LONG values - use " +
        "quantile")
    requirePct(pct, "quantileDouble")
    val v = sampleDoubles
    require(v.nonEmpty, "QuantileSketch.quantileDouble: empty sketch (n=0)")
    v(((pct.toLong * v.length + 99L) / 100L - 1L).toInt)
  }

  /** Estimated COUNT of corpus rows with value ≤ `value` (the rank/CDF
    * question, scaled from the sample: count·n/s' in exact integer
    * arithmetic). Same error bound as [[quantile]]; exact when n ≤ s.
    */
  def rankOf(value: Long): Long = {
    require(!doubleValued,
      "QuantileSketch.rankOf: this sketch holds DOUBLE values - use " +
        "rankOfDouble")
    if (sampleLongs.isEmpty) 0L
    else scaledRank(sampleLongs.count(_ <= value))
  }

  /** [[rankOf]] for double-valued sketches (NaN has no rank — refused). */
  def rankOfDouble(value: Double): Long = {
    require(doubleValued,
      "QuantileSketch.rankOfDouble: this sketch holds LONG values - use " +
        "rankOf")
    require(!value.isNaN, "QuantileSketch.rankOfDouble: NaN has no rank")
    if (sampleDoubles.isEmpty) 0L
    else scaledRank(sampleDoubles.count(_ <= value))
  }

  /** Bottom-k merge, REFUSING mismatched geometries: rank keys from a
    * different seed are a different hash space, and a mixed bottom-k is
    * no longer a uniform sample of anything — plausible quantiles,
    * wrong distribution (the same failure class [[HllSketch.merge]] and
    * [[CmsSketch.merge]] refuse).
    */
  def merge(other: QuantileSketch): QuantileSketch = {
    require(s == other.s && seed == other.seed &&
      doubleValued == other.doubleValued &&
      portableHash == other.portableHash,
      s"QuantileSketch.merge: geometry mismatch - this is (s=$s, " +
        s"seed=$seed, doubleValued=$doubleValued, " +
        s"portableHash=$portableHash), other is (s=${other.s}, " +
        s"seed=${other.seed}, doubleValued=${other.doubleValued}, " +
        s"portableHash=${other.portableHash}). Summaries only merge when " +
        "built with IDENTICAL geometry - a cross-mode (or cross-seed) " +
        "bottom-k mixes two hash spaces and is no longer a uniform " +
        "sample of anything; rebuild one side.")
    copy(
      summary = QuantileSketch.bottomK(summary.unionByName(other.summary), s),
      n = math.addExact(n, other.n))
  }

  private def scaledRank(cnt: Int): Long = {
    val sPrime = if (doubleValued) sampleDoubles.length else sampleLongs.length
    ((BigInt(cnt) * n) / sPrime).toLong
  }

  /** The collected, sorted sample — the one intentionally driver-local
    * step, ≤ s rows by construction ([[QuantileSketch.requireS]] caps
    * s at 2^16, the [[Hll.estimate]] collect budget). Structural guard:
    * a frame larger than s is not a summary this layer built
    * (concatenated frames? use merge()).
    */
  private lazy val sampleLongs: Array[Long] = {
    val v = summary.select(col("value")).collect().map(_.getLong(0))
    requireSummarySize(v.length)
    java.util.Arrays.sort(v)
    v
  }

  private lazy val sampleDoubles: Array[Double] = {
    val v = summary.select(col("value")).collect().map(_.getDouble(0))
    requireSummarySize(v.length)
    java.util.Arrays.sort(v)
    v
  }

  private def requireSummarySize(len: Int): Unit = {
    require(len <= s,
      s"QuantileSketch: $len summary rows for s = $s - the frame is not a " +
        "single bottom-k summary (concatenated frames? use merge())")
    require(len.toLong == math.min(n, s.toLong),
      s"QuantileSketch: $len summary rows but n=$n rows were sketched " +
        s"(expected ${math.min(n, s.toLong)}) - the summary and n have " +
        "desynchronized; rebuild or re-read the sketch")
  }
}

object QuantileSketch {

  /** Layout/compat marker for the on-disk format. */
  val FormatVersion = 1

  /** The ONE s-range guard behind every rank-sketch builder and the
    * stream rebuild path (scalar, grouped, streaming) — a bound change
    * lands once (house rule 5 applied to Scala guards, r20 review).
    */
  private[graft] def requireS(s: Int, site: String): Unit =
    require(s >= 16 && s <= 65536,
      s"$site: s must be in [16, 65536], got $s. s is the summary " +
        "size AND the accuracy knob (rank error ~ n/sqrt(s)); 2^16 rows is " +
        "the same bounded driver-collect budget as Hll.estimate.")

  private[ops] def requirePct(pct: Int, site: String): Unit =
    require(pct >= 1 && pct <= 100,
      s"QuantileSketch.$site: percentile must be in [1,100], got $pct")

  /** The sketch's rank key — the ONE definition behind the scalar,
    * grouped, and windowed-streaming builders. Portable mode (default,
    * the only mode the gate oracles replay) is the house 60-bit md5 key
    * ([[Sampling.uniformBits60]], rule-1 engine-replayable). Fast mode
    * is codegen'd xxhash64 over the same `"seed:" + id` identity,
    * masked to the same nonnegative 60-bit domain — every bottom-k
    * property (merge-order independence, SRS uniformity, DKW accuracy)
    * holds identically because the key is still a pure uniform hash of
    * the row identity; only external replayability is lost (the
    * [[Hll.registerCoords]] tradeoff). NOT interchangeable: summaries
    * from different modes are different hash spaces, which is why the
    * handles carry the mode and refuse cross-mode merges.
    */
  private[graft] def rankKey(id: org.apache.spark.sql.Column, seed: String,
      portable: Boolean): org.apache.spark.sql.Column =
    if (portable) Sampling.uniformBits60(id, seed)
    else xxhash64(lit(seed + ":"), id.cast("string"))
      .bitwiseAND(lit((1L << 60) - 1L))

  /** Per-partition top-s then an s-row driver-side merge
    * (TakeOrderedAndProject — never a global sort): the (rk, value)
    * lexicographic order makes the cut a pure function of the multiset
    * even if 60-bit rank keys ever tie.
    */
  private[ops] def bottomK(rows: DataFrame, s: Int): DataFrame =
    rows.orderBy(col("rk"), col("value")).limit(s)

  /** Build a LONG-valued sketch: one pruned scan for the count, one
    * TakeOrderedAndProject for the summary (recompute-over-materialize,
    * the [[Quantiles]] stance). Refuses fractional value columns —
    * [[buildDouble]] is the lossless sibling (the r15-verdict guard
    * discipline, shared via [[Quantiles.requireIntegral]]).
    */
  def build(items: DataFrame, idCol: String, valueCol: String,
      s: Int, seed: String, portableHash: Boolean = true): QuantileSketch = {
    requireS(s, "QuantileSketch.build")
    Quantiles.requireIntegral(items, valueCol, "QuantileSketch.build",
      "For fractional values use QuantileSketch.buildDouble (no truncation).")
    val rows = items
      .where(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(rankKey(col(idCol), seed, portableHash).as("rk"),
        col(valueCol).cast("long").as("value"))
    QuantileSketch(bottomK(rows, s), s, seed, rows.count(),
      doubleValued = false, portableHash = portableHash)
  }

  /** Build a DOUBLE-valued sketch (float/double columns; NaN excluded,
    * −0.0 normalized — the [[Quantiles.exactPctDouble]] policy).
    */
  def buildDouble(items: DataFrame, idCol: String, valueCol: String,
      s: Int, seed: String, portableHash: Boolean = true): QuantileSketch = {
    requireS(s, "QuantileSketch.buildDouble")
    Quantiles.requireFloating(items, valueCol, "QuantileSketch.buildDouble",
      "For integral values use QuantileSketch.build (exact at the full " +
        "64-bit range).")
    val rows = items
      .where(col(idCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol)))
      .select(rankKey(col(idCol), seed, portableHash).as("rk"),
        (col(valueCol).cast("double") + lit(0.0)).as("value"))
    QuantileSketch(bottomK(rows, s), s, seed, rows.count(),
      doubleValued = true, portableHash = portableHash)
  }

  /** Order-independent 60-bit content digest of a summary frame
    * ([[SketchIo.xorDigest]] over (rk, value)).
    */
  private def digest(summary: DataFrame): Long =
    SketchIo.xorDigest(summary, Seq("rk", "value"))

  /** Persist summary + geometry + n + content digest at `path`
    * (overwrites). The digest is an XOR, so the parquet write needs no
    * coalesce or sort.
    */
  def write(sketch: QuantileSketch, path: String): Unit = {
    val spark = sketch.summary.sparkSession
    sketch.summary.write.mode("overwrite").parquet(s"$path/summary")
    // digest what was WRITTEN, not the input plan - a failed/partial
    // write must not inherit a valid digest from the source frame
    val dig = digest(spark.read.parquet(s"$path/summary"))
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("s" -> sketch.s) ~
        ("seed" -> sketch.seed) ~
        ("n" -> sketch.n) ~
        ("doubleValued" -> sketch.doubleValued) ~
        ("portableHash" -> sketch.portableHash) ~
        ("summaryDigest" -> dig)
    SketchIo.writeFile(spark, path, "qsketch.json", compact(render(meta)))
  }

  /** Load and VALIDATE a persisted sketch: geometry and n from
    * qsketch.json, summary digest recomputed and compared — corruption
    * refuses here instead of mis-ranking downstream.
    */
  def read(spark: SparkSession, path: String): QuantileSketch = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "qsketch.json",
      "QuantileSketch.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"QuantileSketch.read: formatVersion $ver unsupported (expected $FormatVersion)")
    val summary = spark.read.parquet(s"$path/summary")
    val expected = (meta \ "summaryDigest").extract[Long]
    val actual = digest(summary)
    require(actual == expected,
      s"QuantileSketch.read: summary digest mismatch (stored $expected, " +
        s"recomputed $actual) - the payload at $path/summary does not " +
        "match what was written; refusing a corrupted sketch")
    QuantileSketch(summary,
      (meta \ "s").extract[Int],
      (meta \ "seed").extract[String],
      (meta \ "n").extract[Long],
      (meta \ "doubleValued").extract[Boolean],
      // pre-r17 files lack the field and were all md5-portable
      (meta \ "portableHash").extractOrElse(true))
  }
}
