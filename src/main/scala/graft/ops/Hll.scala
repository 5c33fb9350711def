package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet & Meunier
  * 2007, "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm") as a first-class DISTRIBUTED frame: the
  * `m = 2^p` max-rank registers held as a (bucket, maxrank) DataFrame
  * rather than an opaque binary blob. Spark's built-in
  * `approx_count_distinct` is HLL++ too, but its sketch lives inside an
  * aggregation buffer — it cannot be persisted as data, merged across
  * snapshots/days/streams after the fact, inspected, or replayed in an
  * external engine. This layer makes the registers themselves the
  * artifact, the same design point as [[Sketches]] (CMS) for counts:
  *
  *  - **Mergeable by construction**: registers combine by max, so
  *    per-partition partials, per-day partials, and per-micro-batch
  *    streaming state all compose associatively ([[merge]]); partial
  *    aggregation combines map-side and the one shuffle carries at most
  *    `m` rows per input partition regardless of corpus size — the
  *    100-TB property.
  *  - **Engine-portable**: bucket and rank hashes default to the house
  *    md5 scheme (pure integer/string arithmetic — house rule 1), so the
  *    register frame replays bit-for-bit in the DuckDB oracle
  *    (q_hll_registers, q_hll_merge). `portableHash = false` swaps in
  *    codegen'd xxhash64 for corpora that don't need external replay
  *    (same honest tradeoff as [[Sketches.cmsBucket]]: the build is
  *    scan/explode-bound, not hash-bound, so expect ~10%, not magic).
  *  - **Grouped**: [[buildGrouped]]/[[estimateGrouped]] give per-group
  *    cardinalities (distinct users per event type, vocabulary per
  *    language) with `m`-bounded state per group.
  *
  * Duplicates are free: a key's (bucket, rank) is deterministic, so max
  * is idempotent — build over OCCURRENCES, no distinct pass needed.
  * NULL keys are skipped (a NULL has no cardinality identity — rule-10
  * explicit policy, same as [[Sketches.build]]). NULL GROUP values in
  * the grouped form are legitimate groups and are retained.
  *
  * Estimate accuracy is the standard HLL bound: relative standard error
  * ~= 1.04 / sqrt(m) (3.2% at p=10), with linear counting below 2.5·m
  * (Heule et al. 2013's HLL++ empirical-bias table is NOT used — the
  * raw/linear-counting crossover keeps the estimator portable and
  * dependency-free; accuracy asserted against exact distinct counts in
  * HllSpec). The reference engine has no sketch layer; this is
  * `graft.ops` pipeline surface beyond it, the cardinality sibling of
  * the CMS frequency layer.
  */
object Hll {

  private def requireP(p: Int): Unit =
    require(p >= 4 && p <= 16,
      s"Hll: p must be in [4,16] (m = 2^p registers), got $p. p=16 is " +
        "65536 registers (~0.4% RSE) - past any useful accuracy point " +
        "for a frame that must stay broadcast/collect-small.")

  /** Rank-hash domain: 52 bits (13 hex chars of md5), so rank is in
    * [1, 53] and the whole computation stays in exact integer range in
    * every engine (a 64-bit UBIGINT parse would come back signed here).
    */
  private val RankBits = 52

  /** The (bucket, rank) register coordinates of a key. Portable mode is
    * the ONE house md5 contract, applied twice with disjoint tags:
    * bucket = first-8-hex of md5("seed:b:key") mod m
    * ([[Classify.md5Bucket]]); rank = 1 + leading-zeros of the 52-bit
    * value w = first-13-hex of md5("seed:r:key"), i.e.
    * `CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END` — `bin`
    * drops leading zeros in Spark and DuckDB alike, so its string
    * length IS the bit length and the expression replays exactly.
    * Independent bucket/rank hashes are standard (the original paper
    * splits one hash; two tagged md5 draws are equivalent and keep
    * each piece in exact-integer SQL range). Fast mode: xxhash64 over
    * the same tagged identities — not engine-replayable.
    */
  private[ops] def registerCoords(key: Column, p: Int, seed: String,
      portable: Boolean): (Column, Column) = {
    val m = 1 << p
    val (bucket, w) =
      if (portable) (
        Classify.md5Bucket(concat(lit(s"$seed:b:"), key.cast("string")), m),
        conv(substring(md5(concat(lit(s"$seed:r:"), key.cast("string"))), 1, 13),
          16, 10).cast("long"))
      else (
        pmod(xxhash64(lit(s"$seed:b"), key.cast("string")), lit(m.toLong)),
        xxhash64(lit(s"$seed:r"), key.cast("string"))
          .bitwiseAND(lit((1L << RankBits) - 1L)))
    val rank = when(w === 0L, lit(RankBits + 1).cast("long"))
      .otherwise(lit(RankBits + 1).cast("long") - length(bin(w)).cast("long"))
    (bucket, rank)
  }

  /** Build the register frame over one item frame: ONE scan, one
    * map-side-combined max aggregation — the shuffle carries at most
    * `2^p` (bucket, maxrank) rows per input partition at ANY corpus
    * size. Returns (bucket BIGINT, maxrank BIGINT); only touched
    * registers are present — absent registers are zero and
    * [[estimate]] accounts for them.
    */
  def build(
      items: DataFrame,
      keyCol: String,
      p: Int,
      seed: String,
      portableHash: Boolean = true): DataFrame = {
    requireP(p)
    val (bucket, rank) = registerCoords(col("__k"), p, seed, portableHash)
    Dedup.fanOut(items.select(col(keyCol).as("__k")))
      .where(col("__k").isNotNull)
      .select(bucket.as("bucket"), rank.as("rank"))
      .groupBy("bucket").agg(max("rank").as("maxrank"))
  }

  /** Per-group register frames: (groupCols..., bucket, maxrank), at most
    * `2^p` register rows per group. Same scan/aggregation shape as
    * [[build]] with the group key joined into the aggregation key —
    * state is m-bounded PER GROUP, so keep p modest when groups are
    * many (p=12 over 10^6 groups is 4·10^9 potential cells).
    */
  def buildGrouped(
      items: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      p: Int,
      seed: String,
      portableHash: Boolean = true): DataFrame = {
    requireP(p)
    require(groupCols.nonEmpty, "Hll.buildGrouped: groupCols must be non-empty")
    val (bucket, rank) = registerCoords(col("__k"), p, seed, portableHash)
    val gs = groupCols.map(col)
    Dedup.fanOut(items.select(gs :+ col(keyCol).as("__k"): _*))
      .where(col("__k").isNotNull)
      .select(gs ++ Seq(bucket.as("bucket"), rank.as("rank")): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "bucket": _*)
      .agg(max("rank").as("maxrank"))
  }

  /** Merge two register frames built with the SAME (p, seed, hash mode):
    * registers combine by max. Works identically for grouped frames
    * (any extra key columns ride along in the group-by). Geometry is
    * the caller's responsibility here; [[HllSketch.merge]] makes it
    * structural and refuses mismatches — merging registers from
    * different seeds or p silently UNDER-estimates, the same
    * plausible-but-wrong failure mode as a mismatched CMS probe.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns.filter(_ != "maxrank").toSeq
    a.unionByName(b)
      .groupBy(keys.head, keys.tail: _*)
      .agg(max("maxrank").as("maxrank"))
  }

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Cardinality estimate from a register frame: raw HLL
    * (alpha_m · m² / Σ 2^-M_j, untouched registers contributing 2^0)
    * with the standard linear-counting crossover (raw ≤ 2.5·m and some
    * register untouched → m·ln(m/V)). Driver-side scalar over ≤ 2^p
    * collected rows — the one intentionally driver-local step, bounded
    * by [[requireP]]'s p ≤ 16. Estimates are output-only floats
    * (rule 1: they never enter a hash contract — the REGISTERS are the
    * oracle-checked object; accuracy vs exact distinct is spec-pinned).
    */
  def estimate(registers: DataFrame, p: Int): Long = {
    requireP(p)
    val m = 1 << p
    val rows = registers.select(col("bucket").cast("long"),
      col("maxrank").cast("long")).collect()
    require(rows.length <= m,
      s"Hll.estimate: ${rows.length} register rows for m = $m - the frame " +
        "is not a single sketch (grouped frame? use estimateGrouped)")
    // a grouped frame SMALL enough to pass the row-count check would
    // still carry duplicate buckets across groups and estimate garbage
    // plausibly - refuse on the structural invariant, not just the size
    require(rows.iterator.map(_.getLong(0)).toSet.size == rows.length,
      "Hll.estimate: duplicate bucket ids in the register frame - this is " +
        "a grouped (or concatenated) frame; use estimateGrouped, or merge() " +
        "the sketches first")
    // a p SMALLER than the build's leaves buckets >= m - the same
    // plausible-wrong-estimate class; refuse on the bucket range. (A p
    // LARGER than the build's is structurally indistinguishable from a
    // sparse sketch - the geometry-checked [[HllSketch]] handle is the
    // API that rules that out by construction.)
    require(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < m),
      s"Hll.estimate: bucket ids outside [0, $m) - the frame was built " +
        s"with a larger p than the $p supplied here")
    require(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= RankBits + 1),
      s"Hll.estimate: maxrank outside [1, ${RankBits + 1}] - not a register " +
        "frame this layer built")
    // Σ 2^-maxrank as an EXACT scaled integer (Σ 2^(53-maxrank), one
    // division at the end): double summation of the 2^-r terms is
    // non-associative, and [[estimateGrouped]]'s partial-aggregation
    // order varies run to run — exact integer summation makes both
    // paths order-independent AND bit-identical to each other (the
    // grouped == per-group equality pin in HllSpec).
    var sumScaled = BigInt(0)
    rows.foreach { r => sumScaled += BigInt(1) << (RankBits + 1 - r.getLong(1).toInt) }
    val zeros = m - rows.length
    val sumInv = sumScaled.toDouble / math.pow(2.0, (RankBits + 1).toDouble) +
      zeros.toDouble
    val raw = alpha(m) * m.toDouble * m.toDouble / sumInv
    val est =
      if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  /** |A ∪ B| estimate from two register frames with IDENTICAL geometry:
    * the union sketch is LOSSLESS (max-merge of registers IS the sketch
    * of the union), so this carries exactly the single-sketch error —
    * the HLL property that makes cross-snapshot overlap questions
    * cheap at 100 TB (per-snapshot sketches persist once; any pairwise
    * union is a 2·2^p-row merge, never a corpus scan).
    */
  def unionEstimate(a: DataFrame, b: DataFrame, p: Int): Long =
    estimate(merge(a, b), p)

  /** |A ∩ B| estimate by inclusion–exclusion:
    * est(A) + est(B) − est(A ∪ B). Unlike the union this is NOT a
    * sketch of the intersection — errors compound (absolute error
    * ~ RSE · (|A| + |B|)), so a small true intersection of two large
    * sets can be noise; the result is clamped at 0 and callers needing
    * tight small-overlap bounds should use the exact paths
    * ([[SetSimJoin]], [[Curate]] decontamination). Spec-pinned
    * tolerance in HllSpec.
    */
  def intersectEstimate(a: DataFrame, b: DataFrame, p: Int): Long =
    math.max(0L, estimate(a, p) + estimate(b, p) - unionEstimate(a, b, p))

  /** Per-group |A ∪ B| estimates from two [[buildGrouped]] register
    * frames with IDENTICAL geometry AND group columns — the grouped
    * twin of [[unionEstimate]]: one union + one max-merge aggregation +
    * one estimate aggregation, groups never collected. Groups present
    * in only one frame estimate that frame's cardinality (union with
    * the empty set), which falls out of the merge naturally.
    */
  def unionEstimateGrouped(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], p: Int): DataFrame =
    estimateGrouped(merge(a, b), groupCols, p)

  /** Per-group |A ∩ B| estimates by inclusion–exclusion over two
    * [[buildGrouped]] frames — the grouped twin of
    * [[intersectEstimate]], one call instead of a driver-side loop over
    * groups. Three group-sized aggregations + two null-safe left joins
    * onto the union frame (whose group set is groups(A) ∪ groups(B);
    * NULL groups are legitimate and join via IS NOT DISTINCT FROM
    * semantics — rule 10). Groups absent from one side contribute 0 and
    * clamp to 0. Error compounds exactly as in the scalar form
    * (absolute error ~ RSE · (|A| + |B|) per group) — small true
    * overlaps of large groups can be noise; the exact paths
    * ([[SetSimJoin]], [[Curate]]) remain the tight-bound tools.
    * Grouped == per-group scalar results exactly (HllSpec pin; both
    * sides share the order-independent exact-summation estimator).
    */
  def intersectEstimateGrouped(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], p: Int): DataFrame = {
    requireP(p)
    require(groupCols.nonEmpty,
      "Hll.intersectEstimateGrouped: groupCols must be non-empty")
    def renamed(df: DataFrame, pre: String): DataFrame =
      groupCols.foldLeft(df.withColumnRenamed("est", pre + "est")) {
        (d, c) => d.withColumnRenamed(c, pre + c)
      }
    val ea = renamed(estimateGrouped(a, groupCols, p), "__a_")
    val eb = renamed(estimateGrouped(b, groupCols, p), "__b_")
    val eu = unionEstimateGrouped(a, b, groupCols, p)
    eu
      .join(ea, groupCols.map(c => col(c) <=> col("__a_" + c)).reduce(_ && _), "left")
      .join(eb, groupCols.map(c => col(c) <=> col("__b_" + c)).reduce(_ && _), "left")
      .select(groupCols.map(col) :+
        greatest(lit(0L), coalesce(col("__a_est"), lit(0L)) +
          coalesce(col("__b_est"), lit(0L)) - col("est")).as("est"): _*)
  }

  /** Per-group cardinality estimates from a [[buildGrouped]] frame:
    * (groupCols..., est BIGINT). The whole estimator is one aggregation
    * over the register frame (group count + Σ 2^-maxrank), never a
    * per-group collect — group count is unbounded, register rows per
    * group are ≤ 2^p. Same raw/linear-counting crossover as
    * [[estimate]]; same output-only-float status.
    */
  def estimateGrouped(registers: DataFrame, groupCols: Seq[String],
      p: Int): DataFrame = {
    requireP(p)
    require(groupCols.nonEmpty, "Hll.estimateGrouped: groupCols must be non-empty")
    val m = 1 << p
    // Σ 2^-maxrank as an EXACT scaled integer (Σ 2^(53-maxrank) summed as
    // DECIMAL, one double division at the end): the double sum's
    // partial-aggregation order varies run to run and rint(est) could in
    // principle flip ±1 at a .5 boundary — exact summation makes the
    // grouped estimate order-independent like the rest of the gate
    // surface, and bit-identical to [[estimate]]'s scalar path (which
    // mirrors this arithmetic). Max sum 2^16 · 2^52 ≈ 3·10^20 « 10^38.
    val agg = registers
      .groupBy(groupCols.head, groupCols.tail: _*)
      .agg(count(lit(1)).as("__touched"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${RankBits + 1} - maxrank AS INT))")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__sumscaled"),
        max(col("bucket")).as("__maxb"), min(col("bucket")).as("__minb"),
        max(col("maxrank")).as("__maxr"), min(col("maxrank")).as("__minr"))
    val zeros = lit(m.toLong) - col("__touched")
    val suminv = col("__sumscaled").cast("double") /
      lit(math.pow(2.0, (RankBits + 1).toDouble)) + zeros.cast("double")
    val raw = lit(alpha(m) * m.toDouble * m.toDouble) / suminv
    val est = when(raw <= lit(2.5 * m) && zeros > 0L,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    // geometry guard (the grouped twin of estimate()'s driver-side
    // checks): a p smaller than the build's leaves buckets >= m or more
    // touched registers than m exist, and the estimate comes back
    // plausible but wrong (zeros can even go negative). The frame here
    // is groups-sized, so the raise_error branch costs nothing.
    val guarded = when(col("__touched") > m.toLong || col("__maxb") >= m.toLong ||
        col("__minb") < 0L || col("__maxr") > (RankBits + 1).toLong ||
        col("__minr") < 1L,
      raise_error(concat(lit("Hll.estimateGrouped: register frame " +
        s"inconsistent with p=$p (m=$m) - buckets or ranks out of range, or " +
        "more touched registers than m; the frame was built with a larger p"))))
      .otherwise(est)
    agg.select(groupCols.map(col) :+ rint(guarded).cast("long").as("est"): _*)
  }
}
