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

  /** Register/output/internal names the grouped entry points own — a
    * clashing group column silently clobbers or duplicates columns
    * downstream (merge() infers its keys as every-column-but-maxrank;
    * estimateGrouped emits "est"). Single-sourced so
    * [[GroupedHllSketch.regroup]] and the windowed streaming builds
    * refuse the same set (rule 5; the Quantiles.requireByGroupArgs
    * discipline).
    */
  private[graft] val ReservedNames = Set("bucket", "rank", "maxrank", "est",
    "__k", "__side", "__touched", "__sumscaled", "__maxb", "__minb",
    "__maxr", "__minr", "__dist")

  private def requireGroupCols(groupCols: Seq[String], site: String): Unit = {
    require(groupCols.nonEmpty, s"Hll.$site: groupCols must be non-empty")
    val clash = groupCols.filter(ReservedNames.contains)
    require(clash.isEmpty,
      s"Hll.$site: group column name(s) ${clash.mkString(",")} collide " +
        s"with the register/output columns (${ReservedNames.mkString(",")}) - " +
        "alias the group column first")
  }

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
  private[graft] def registerCoords(key: Column, p: Int, seed: String,
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
    requireGroupCols(groupCols, "buildGrouped")
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
    estimateFromRegisters(collectValidated(registers, p, "estimate"), p)
  }

  /** The ONE collect + structural validation behind the scalar
    * estimators: ≤ 2^p rows, each frame evaluated exactly once however
    * many estimates are derived from it (r20 review — the
    * inclusion–exclusion path previously re-ran lazy build lineages).
    */
  private def collectValidated(registers: DataFrame, p: Int,
      site: String): Map[Long, Long] = {
    val m = 1 << p
    val raw = registers.select(col("bucket").cast("long"),
      col("maxrank").cast("long")).collect()
    // NULL coordinates would NPE at unboxing below - refuse
    // self-describingly first (hand-assembled frames are exactly the
    // audience of these guards)
    require(raw.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      s"Hll.$site: NULL register coordinates - not a register frame this " +
        "layer built")
    val rows = raw.map(r => (r.getLong(0), r.getLong(1)))
    require(rows.length <= m,
      s"Hll.$site: ${rows.length} register rows for m = $m - the frame " +
        "is not a single sketch (grouped frame? use estimateGrouped)")
    // a grouped frame SMALL enough to pass the row-count check would
    // still carry duplicate buckets across groups and estimate garbage
    // plausibly - refuse on the structural invariant, not just the size
    require(rows.iterator.map(_._1).toSet.size == rows.length,
      s"Hll.$site: duplicate bucket ids in the register frame - this is " +
        "a grouped (or concatenated) frame; use estimateGrouped, or merge() " +
        "the sketches first")
    // a p SMALLER than the build's leaves buckets >= m - the same
    // plausible-wrong-estimate class; refuse on the bucket range. (A p
    // LARGER than the build's is structurally indistinguishable from a
    // sparse sketch - the geometry-checked [[HllSketch]] handle is the
    // API that rules that out by construction.)
    require(rows.forall(r => r._1 >= 0 && r._1 < m),
      s"Hll.$site: bucket ids outside [0, $m) - the frame was built " +
        s"with a larger p than the $p supplied here")
    require(rows.forall(r => r._2 >= 1 && r._2 <= RankBits + 1),
      s"Hll.$site: maxrank outside [1, ${RankBits + 1}] - not a register " +
        "frame this layer built")
    rows.toMap
  }

  /** The pure estimator over validated (bucket → maxrank) registers:
    * Σ 2^-maxrank as an EXACT scaled integer (Σ 2^(53-maxrank), one
    * division at the end) — double summation of the 2^-r terms is
    * non-associative, and [[estimateGrouped]]'s partial-aggregation
    * order varies run to run; exact integer summation makes both
    * paths order-independent AND bit-identical to each other (the
    * grouped == per-group equality pin in HllSpec).
    */
  private def estimateFromRegisters(regs: Map[Long, Long], p: Int): Long = {
    val m = 1 << p
    var sumScaled = BigInt(0)
    regs.valuesIterator.foreach { r => sumScaled += BigInt(1) << (RankBits + 1 - r.toInt) }
    val zeros = m - regs.size
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
  def unionEstimate(a: DataFrame, b: DataFrame, p: Int): Long = {
    requireP(p)
    estimateFromRegisters(maxMerge(
      collectValidated(a, p, "unionEstimate"),
      collectValidated(b, p, "unionEstimate")), p)
  }

  /** Driver-side max-merge of two collected register maps (≤ 2^p
    * entries each) — the union/intersect estimators derive every
    * estimate from ONE evaluation per input frame.
    */
  private def maxMerge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    (a.keySet ++ b.keySet).iterator.map { k =>
      k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))
    }.toMap

  /** |A ∩ B| estimate by inclusion–exclusion:
    * est(A) + est(B) − est(A ∪ B). Unlike the union this is NOT a
    * sketch of the intersection — errors compound (absolute error
    * ~ RSE · (|A| + |B|)), so a small true intersection of two large
    * sets can be noise; the result is clamped at 0 and callers needing
    * tight small-overlap bounds should use the exact paths
    * ([[SetSimJoin]], [[Curate]] decontamination). Spec-pinned
    * tolerance in HllSpec.
    */
  def intersectEstimate(a: DataFrame, b: DataFrame, p: Int): Long = {
    requireP(p)
    val ra = collectValidated(a, p, "intersectEstimate")
    val rb = collectValidated(b, p, "intersectEstimate")
    math.max(0L, estimateFromRegisters(ra, p) + estimateFromRegisters(rb, p) -
      estimateFromRegisters(maxMerge(ra, rb), p))
  }

  /** Per-group |A ∪ B| estimates from two [[buildGrouped]] register
    * frames with IDENTICAL geometry AND group columns — the grouped
    * twin of [[unionEstimate]]: one union + one max-merge aggregation +
    * one estimate aggregation, groups never collected. Groups present
    * in only one frame estimate that frame's cardinality (union with
    * the empty set), which falls out of the merge naturally.
    */
  def unionEstimateGrouped(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], p: Int): DataFrame = {
    requireGroupCols(groupCols, "unionEstimateGrouped")
    estimateGrouped(merge(a, b), groupCols, p)
  }

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
    requireGroupCols(groupCols, "intersectEstimateGrouped")
    val m = 1 << p
    val zeroDec = lit(BigDecimal(0))
    val (agg, guard) = intersectGroupedAgg(a, b, groupCols, p,
      "intersectEstimateGrouped")
    val est = greatest(lit(0L),
      estExprGrouped(col("__t_a"), coalesce(col("__s_a"), zeroDec), m) +
        estExprGrouped(col("__t_b"), coalesce(col("__s_b"), zeroDec), m) -
        estExprGrouped(col("__t_u"), col("__s_u"), m))
    agg.select(groupCols.map(col) :+ guard(est).cast("long").as("est"): _*)
  }

  /** [[intersectEstimateGrouped]] exposing the three sketches'
    * SUFFICIENT STATISTICS alongside the estimate:
    * (groupCols..., t_a, t_b, t_u BIGINT, s_a, s_b, s_u DECIMAL(38,0),
    * est DOUBLE). The six stats are exact integers (touched counts and
    * Σ 2^(53−maxrank) of the A / B / max-merged-union register sets);
    * the inclusion–exclusion estimate is a fixed function of them, so
    * pinning them pins the estimate (the q_hll_overlap_grouped hash
    * contract; the float is round-6 output-only at the gate). `est`
    * here is the CONTINUOUS form (raw component doubles combined then
    * clamped at 0) — [[intersectEstimateGrouped]] keeps the
    * integer-rounded-per-component form. Groups absent from one side
    * carry t=0, s=0 for it.
    */
  def intersectEstimateGroupedStats(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], p: Int): DataFrame = {
    requireP(p)
    requireGroupCols(groupCols, "intersectEstimateGroupedStats")
    val m = 1 << p
    val zeroDec = lit(BigDecimal(0))
    val (agg, guard) = intersectGroupedAgg(a, b, groupCols, p,
      "intersectEstimateGroupedStats")
    val est = greatest(lit(0.0),
      estDoubleExprGrouped(col("__t_a"), coalesce(col("__s_a"), zeroDec), m) +
        estDoubleExprGrouped(col("__t_b"), coalesce(col("__s_b"), zeroDec), m) -
        estDoubleExprGrouped(col("__t_u"), col("__s_u"), m))
    agg.select(groupCols.map(col) ++ Seq(
      col("__t_a").as("t_a"), col("__t_b").as("t_b"), col("__t_u").as("t_u"),
      coalesce(col("__s_a"), zeroDec).as("s_a"),
      coalesce(col("__s_b"), zeroDec).as("s_b"),
      col("__s_u").as("s_u"),
      guard(est).as("est")): _*)
  }

  /** The ONE two-sided grouped register aggregation + per-side
    * structural guard behind [[intersectEstimateGrouped]] and
    * [[intersectEstimateGroupedStats]] (rule 5). SINGLE evaluation per
    * input (r20 review — the previous three-estimate form re-ran each
    * frame's lazy build lineage twice): tag the sides, collapse to
    * per-(group, bucket) side maxranks, then ONE group aggregation
    * yields the A / B / union estimator inputs together;
    * inclusion–exclusion happens per group row. Two aggregations total,
    * groups never collected. The guard refuses duplicate
    * (group, bucket) rows within one side (a concatenated grouped
    * frame — use Hll.merge first) and range violations (geometry
    * mismatch).
    */
  private def intersectGroupedAgg(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], p: Int,
      site: String): (DataFrame, Column => Column) = {
    val m = 1 << p
    val gs = groupCols.map(col)
    val tagged = a.withColumn("__side", lit(0))
      .unionByName(b.withColumn("__side", lit(1)))
    val perBucket = tagged
      .groupBy(gs :+ col("bucket"): _*)
      .agg(max(col("maxrank")).as("__mr_u"),
        max(when(col("__side") === 0, col("maxrank"))).as("__mr_a"),
        max(when(col("__side") === 1, col("maxrank"))).as("__mr_b"),
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__rows_a"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__rows_b"))
    val agg = perBucket
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("__t_u"),
        scaledSumExpr("__mr_u").as("__s_u"),
        count(col("__mr_a")).as("__t_a"),
        scaledSumExpr("__mr_a").as("__s_a"),
        count(col("__mr_b")).as("__t_b"),
        scaledSumExpr("__mr_b").as("__s_b"),
        max(col("__rows_a")).as("__dup_a"),
        max(col("__rows_b")).as("__dup_b"),
        max(col("bucket")).as("__maxb"), min(col("bucket")).as("__minb"),
        max(col("__mr_u")).as("__maxr"), min(col("__mr_u")).as("__minr"))
    val guard: Column => Column = out =>
      when(col("__dup_a") > 1L || col("__dup_b") > 1L,
        raise_error(concat(lit(s"Hll.$site: duplicate " +
          "(group, bucket) register rows within one input - concatenated " +
          "grouped frames (use Hll.merge) or groupCols coarser than the " +
          "build's"))))
        .otherwise(when(col("__t_u") > m.toLong || col("__maxb") >= m.toLong ||
          col("__minb") < 0L || col("__maxr") > (RankBits + 1).toLong ||
          col("__minr") < 1L,
        raise_error(concat(lit(s"Hll.$site: register " +
          s"frame inconsistent with p=$p (m=$m) - buckets or ranks out of " +
          "range, or more touched registers than m; the frame was built " +
          "with a larger p"))))
        .otherwise(out))
    (agg, guard)
  }

  /** Σ 2^(53−maxrank) over a (possibly NULL-bearing) maxrank column as
    * EXACT DECIMAL — the ONE scaled-sum fragment behind the grouped
    * estimators (rule 5). NULL maxranks (a side absent from a bucket)
    * contribute nothing.
    */
  private def scaledSumExpr(maxrankCol: String) =
    sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${RankBits + 1} - $maxrankCol AS INT))")
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)))

  /** The RAW (un-rounded) grouped estimator expression over
    * (touched, Σ scaled) — the double the rint-to-long estimators and
    * the [[estimateGroupedStats]] continuous output both derive from.
    * Every arithmetic step mirrors [[estimateFromRegisters]] exactly
    * (the HllSpec grouped == scalar pin) and is replayed
    * operation-for-operation by the gate oracles' SQL form, so the
    * only cross-engine float exposure is the final `ln` (masked by the
    * round-6 output contract).
    */
  private def estDoubleExprGrouped(touched: Column, sumScaled: Column,
      m: Int): Column = {
    val zeros = lit(m.toLong) - touched
    val suminv = sumScaled.cast("double") /
      lit(math.pow(2.0, (RankBits + 1).toDouble)) + zeros.cast("double")
    val raw = lit(alpha(m) * m.toDouble * m.toDouble) / suminv
    when(raw <= lit(2.5 * m) && zeros > 0L,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** The grouped estimator expression over (touched, Σ scaled) — the
    * exact SQL mirror of [[estimateFromRegisters]] (bit-identical, the
    * HllSpec grouped == scalar pin), shared by [[estimateGrouped]] and
    * [[intersectEstimateGrouped]] (rule 5).
    */
  private def estExprGrouped(touched: Column, sumScaled: Column, m: Int): Column =
    rint(estDoubleExprGrouped(touched, sumScaled, m)).cast("long")

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
    requireGroupCols(groupCols, "estimateGrouped")
    val m = 1 << p
    val (agg, guard) = groupedEstAgg(registers, groupCols, p, "estimateGrouped")
    val est = estExprGrouped(col("__touched"), col("__sumscaled"), m)
    agg.select(groupCols.map(col) :+ guard(est).cast("long").as("est"): _*)
  }

  /** [[estimateGrouped]] exposing the estimator's SUFFICIENT STATISTICS
    * alongside the estimate: (groupCols..., touched BIGINT,
    * sumscaled DECIMAL(38,0), est DOUBLE). `touched` and `sumscaled`
    * (Σ 2^(53−maxrank), exact) are pure integers — the whole estimator
    * is a fixed function of them, so pinning THEM pins the estimate
    * (the q_hll_grouped hash contract; rule 1: the one float, the final
    * division/ln, is emitted round-6 output-only by the gate). `est`
    * here is the RAW continuous double (no rint) — [[estimateGrouped]]
    * remains the integer-cardinality surface. Also the audit view:
    * touched/m is the sketch's saturation (the linear-counting
    * crossover fires below 2.5·m raw).
    */
  def estimateGroupedStats(registers: DataFrame, groupCols: Seq[String],
      p: Int): DataFrame = {
    requireP(p)
    requireGroupCols(groupCols, "estimateGroupedStats")
    val m = 1 << p
    val (agg, guard) = groupedEstAgg(registers, groupCols, p,
      "estimateGroupedStats")
    agg.select(groupCols.map(col) ++ Seq(
      col("__touched").as("touched"),
      col("__sumscaled").as("sumscaled"),
      guard(estDoubleExprGrouped(col("__touched"), col("__sumscaled"), m))
        .as("est")): _*)
  }

  /** The ONE grouped register aggregation + structural guard behind
    * [[estimateGrouped]] and [[estimateGroupedStats]] (rule 5).
    *
    * Σ 2^-maxrank as an EXACT scaled integer (Σ 2^(53-maxrank) summed as
    * DECIMAL, one double division at the end): the double sum's
    * partial-aggregation order varies run to run and rint(est) could in
    * principle flip ±1 at a .5 boundary — exact summation makes the
    * grouped estimate order-independent like the rest of the gate
    * surface, and bit-identical to [[estimate]]'s scalar path (which
    * mirrors this arithmetic). Max sum 2^16 · 2^52 ≈ 3·10^20 « 10^38.
    *
    * The guard is the grouped twin of estimate()'s driver-side checks:
    * a p smaller than the build's leaves buckets >= m or more touched
    * registers than m exist, and the estimate comes back plausible but
    * wrong (zeros can even go negative); duplicate buckets WITHIN a
    * group pass the <= m size check when both sides are sparse, yet
    * each contributes its own 2^-maxrank term and the estimate comes
    * back plausibly UNDER (r20 review finding) — concatenated grouped
    * frames must go through merge(), and estimating with groupCols
    * COARSER than the build's is the same structural error. The frame
    * here is groups-sized, so the raise_error branch costs nothing.
    */
  private def groupedEstAgg(registers: DataFrame, groupCols: Seq[String],
      p: Int, site: String): (DataFrame, Column => Column) = {
    val m = 1 << p
    val agg = registers
      .groupBy(groupCols.head, groupCols.tail: _*)
      .agg(count(lit(1)).as("__touched"),
        scaledSumExpr("maxrank").as("__sumscaled"),
        countDistinct(col("bucket")).as("__dist"),
        max(col("bucket")).as("__maxb"), min(col("bucket")).as("__minb"),
        max(col("maxrank")).as("__maxr"), min(col("maxrank")).as("__minr"))
    val guard: Column => Column = out =>
      when(col("__touched") =!= col("__dist"),
        raise_error(concat(lit(s"Hll.$site: duplicate bucket ids " +
          "within a group - concatenated grouped frames (use Hll.merge) or " +
          "groupCols coarser than the build's"))))
        .otherwise(when(col("__touched") > m.toLong || col("__maxb") >= m.toLong ||
          col("__minb") < 0L || col("__maxr") > (RankBits + 1).toLong ||
          col("__minr") < 1L,
        raise_error(concat(lit(s"Hll.$site: register frame " +
          s"inconsistent with p=$p (m=$m) - buckets or ranks out of range, or " +
          "more touched registers than m; the frame was built with a larger p"))))
        .otherwise(out))
    (agg, guard)
  }
}
