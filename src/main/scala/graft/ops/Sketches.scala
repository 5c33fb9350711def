package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") as a
  * first-class DISTRIBUTED frame: `depth × width` counter cells held as a
  * (r, bucket, cnt) DataFrame rather than a driver-side array. The sketch
  * is a pure sum over cells, so it is mergeable by construction — partial
  * aggregation combines map-side and the one shuffle carries at most
  * depth·width cells per input partition, never token instances. That is
  * the property that makes it a 100-TB operator: a corpus-wide frequency
  * summary whose shuffle volume is O(depth·width·partitions) regardless of
  * corpus size, and whose result (a few thousand rows) broadcasts for
  * free into every later probe.
  *
  * Bucket hashes default to the house ENGINE-PORTABLE md5 scheme
  * (`('0x' || substr(md5(seed || ':' || r || ':' || key), 1, 8))::UBIGINT
  * % width` in any SQL engine — same pattern as the feature-hashed NB
  * classifier, `Classify.md5Bucket`), so every estimate replays
  * bit-for-bit in the DuckDB oracle (q_cms_heavy). Pure integer
  * arithmetic end to end (house rule 1). `portableHash = false` swaps
  * in codegen'd xxhash64 cells for corpora that don't need external
  * replay (see [[cmsBucket]] for the honest cost comparison).
  *
  * Estimates are one-sided: est(k) = min over rows of the k-bucketed cell
  * sums ≥ true count, always — so a threshold filter over estimates has
  * NO false negatives (every genuinely heavy key survives; collisions can
  * only add false positives). The reference engine has no sketch layer;
  * this is `graft.ops` pipeline surface beyond it, complementing the
  * exact vocabulary pass (`TextOps.vocabStats`) and the HLL cardinality
  * variant (`TextOps.approxVocabStats`).
  */
object Sketches {

  /** CMS bucket for hash row `r`. Portable mode: first 8 hex chars of
    * md5("seed:r:key") as a 32-bit unsigned value, mod width — the ONE
    * house md5-bucket contract ([[Classify.md5Bucket]]) applied to a
    * row-prefixed key, replayable bit-for-bit in any SQL engine (the
    * oracle contract behind q_cms_heavy). Fast mode: xxhash64 over the
    * same (seed:r, key) identity — NOT engine-replayable; codegen'd
    * where md5 allocates a hex string per (row, occurrence). Measured
    * honestly (round 18, clean JVMs): ~1.1x on the whole build at a
    * 100x corpus — the build is scan/explode/agg-bound, not hash-bound,
    * so take the free ~10% but don't trade oracle replay for it
    * expecting more. Same independence-per-row structure, same
    * one-sided estimate guarantee — every Sketches property except
    * oracle replay holds identically, asserted in SketchOpsSpec.
    */
  private def cmsBucket(key: org.apache.spark.sql.Column, r: Int, width: Int,
      seed: String, portable: Boolean): org.apache.spark.sql.Column =
    if (portable) Classify.md5Bucket(concat(lit(s"$seed:$r:"), key.cast("string")), width)
    else pmod(xxhash64(lit(s"$seed:$r"), key.cast("string")), lit(width.toLong))

  /** The depth bucket coordinates of a key, as one exploded (r, bucket)
    * pair per hash row — shared by build (cell sums) and probe (cell
    * lookups) so the two sides can never desynchronize.
    */
  private[graft] def bucketPairs(key: org.apache.spark.sql.Column, depth: Int, width: Int,
      seed: String, portable: Boolean): org.apache.spark.sql.Column =
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), cmsBucket(key, r, width, seed, portable).as("bucket"))): _*))

  /** Refuse sketch geometries whose cell frame could not broadcast: the
    * touched-cell frame can reach depth·width rows and [[estimate]]
    * broadcasts it unconditionally, so an uncapped width would trade the
    * operator's whole design point (a broadcastable summary) for an
    * OOM at probe time. Conf-capped like every other driver/broadcast
    * materialization in this library (asofLookup, estimateJoint).
    * 4M cells ≈ 100 MB of (int, long, long) rows — far past any useful
    * CMS accuracy point (error ≤ 2·N/width at width 4M/depth).
    */
  private def requireCellCap(spark: org.apache.spark.sql.SparkSession,
      depth: Int, width: Int, site: String): Unit = {
    val maxCells = graft.util.Conf.long(spark, "graft.cms.maxCells", 4194304L)
    require(depth.toLong * width <= maxCells,
      s"Sketches.$site: depth*width = ${depth.toLong * width} cells exceeds " +
        s"graft.cms.maxCells ($maxCells). The sketch frame must stay " +
        "broadcastable for probes; widen the cap only with executor memory " +
        "to back it, or reduce width - CMS error is already <= 2N/width.")
  }

  /** Build the sketch over one item frame: each input row contributes its
    * weight (default 1) to one cell per hash row. NULL keys are skipped
    * (a NULL has no frequency identity — rule-10 explicit policy), as are
    * NULL weights. Single scan: the depth-way fan-out is a per-row array
    * explode feeding a hash aggregate whose group count is ≤ depth·width,
    * so the partial agg combines map-side and the shuffle carries cells.
    *
    * Returns (r INT, bucket BIGINT, cnt BIGINT) — only touched cells are
    * present; absent cells are zero ([[estimate]] fills them).
    */
  def build(
      items: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      seed: String,
      weightCol: Option[String] = None,
      portableHash: Boolean = true): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    requireCellCap(items.sparkSession, depth, width, "build")
    val w = weightCol.map(c => col(c)).getOrElse(lit(1L)).cast("long")
    // A negative weight would let a cell UNDER-count and silently void
    // the one-sided guarantee (est >= true count) that every consumer of
    // this sketch relies on — refuse the row instead. Retractions belong
    // upstream (aggregate signed deltas first, or keep two sketches and
    // subtract estimates). Guard only the WEIGHTED path: raise_error is
    // codegen-hostile (measured 1.8× on the whole build), and the
    // default lit(1L) weight cannot be negative.
    val wChecked =
      if (weightCol.isEmpty) col("__w")
      else when(col("__w") >= 0L, col("__w")).otherwise(raise_error(concat(
        lit("Sketches.build: negative weight "), col("__w").cast("string"),
        lit(" - cell sums must be monotone for the one-sided CMS estimate " +
          "guarantee; aggregate retractions upstream or subtract two sketches"))))
    Dedup.fanOut(items.select(col(keyCol).as("__k"), w.as("__w")))
      .where(col("__k").isNotNull && col("__w").isNotNull)
      .select(bucketPairs(col("__k"), depth, width, seed, portableHash).as("rb"),
        wChecked.as("__w"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(sum("__w").as("cnt"))
  }

  /** Merge two sketches built with the SAME (depth, width, seed): cell
    * sums add. This is the property that makes the sketch a distributed
    * AND streaming object — per-partition partials, per-day partials, or
    * per-micro-batch deltas all combine associatively. [[build]] on a
    * STREAMING frame is the same thing expressed declaratively: Spark's
    * incremental stateful aggregation maintains the ≤ depth·width
    * running cells across micro-batches (state is the sketch itself),
    * asserted batch-vs-stream in SketchOpsSpec.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "bucket").agg(sum("cnt").as("cnt"))

  /** Cell/output names the grouped entry points own — refused as group
    * column names (the [[Bloom.ReservedNames]] discipline: a group
    * literally named "r" would be clobbered by the cell projection).
    */
  private[graft] val GroupedReservedNames =
    Set("r", "bucket", "cnt", "est", "rb", "__k", "__w")

  private def requireGroupCols(groupCols: Seq[String], site: String): Unit = {
    require(groupCols.nonEmpty,
      s"Sketches.$site: groupCols is empty - use the ungrouped form")
    val clash = groupCols.filter(GroupedReservedNames.contains)
    require(clash.isEmpty,
      s"Sketches.$site: group column(s) ${clash.mkString(", ")} collide " +
        s"with the cell/output columns (${GroupedReservedNames.mkString(", ")}); " +
        "rename them first")
  }

  /** One CMS PER GROUP in one aggregation: `(groupCols..., r, bucket,
    * cnt)`, ≤ groups × depth·width rows — per-language / per-day
    * frequency sketches without a per-group loop (the grouped twin of
    * [[build]], completing the grouped forms across the sketch family:
    * HLL registers, Bloom words, rank summaries, now CMS cells). Same
    * null/weight policy as [[build]]; NULL group values are retained as
    * their own group (rule 10 — SQL equi-join consumers drop them, so
    * [[estimateGrouped]] joins null-safely). The depth·width cell cap
    * is per GROUP; the frame itself is groups× that — probe-side plans
    * join rather than unconditionally broadcasting for exactly this
    * reason.
    */
  def buildGrouped(
      items: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      depth: Int,
      width: Int,
      seed: String,
      weightCol: Option[String] = None,
      portableHash: Boolean = true): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    requireGroupCols(groupCols, "buildGrouped")
    requireCellCap(items.sparkSession, depth, width, "buildGrouped")
    val w = weightCol.map(c => col(c)).getOrElse(lit(1L)).cast("long")
    val wChecked =
      if (weightCol.isEmpty) col("__w")
      else when(col("__w") >= 0L, col("__w")).otherwise(raise_error(concat(
        lit("Sketches.buildGrouped: negative weight "), col("__w").cast("string"),
        lit(" - cell sums must be monotone for the one-sided CMS estimate " +
          "guarantee; aggregate retractions upstream or subtract two sketches"))))
    Dedup.fanOut(items.select(
        groupCols.map(col) ++ Seq(col(keyCol).as("__k"), w.as("__w")): _*))
      .where(col("__k").isNotNull && col("__w").isNotNull)
      .select(groupCols.map(col) ++ Seq(
        bucketPairs(col("__k"), depth, width, seed, portableHash).as("rb"),
        wChecked.as("__w")): _*)
      .groupBy(groupCols.map(col) ++
        Seq(col("rb.r").as("r"), col("rb.bucket").as("bucket")): _*)
      .agg(sum("__w").as("cnt"))
  }

  /** [[merge]] per group over `(groupCols..., r, bucket, cnt)` frames. */
  def mergeGrouped(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    requireGroupCols(groupCols, "mergeGrouped")
    a.unionByName(b)
      .groupBy((groupCols ++ Seq("r", "bucket")).map(col): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** Point estimates per (group, key) pair against THAT group's sketch:
    * `(groupCols..., keyCol, est)` for the distinct non-null-key pairs
    * of `keys` — one null-safe join instead of a per-group loop (`<=>`:
    * a plain equi-join would silently drop every null-group pair,
    * rule 10; the sketch side's columns are renamed before joining, the
    * shared-lineage self-join trap). A pair whose group has no sketch
    * at all estimates 0, consistent with [[estimate]]'s never-touched
    * cells. Unlike [[estimate]], the sketch side is NOT unconditionally
    * broadcast (it is groups × depth·width rows); AQE picks the join
    * strategy from its actual size.
    */
  def estimateGrouped(
      sketch: DataFrame,
      keys: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      depth: Int,
      width: Int,
      seed: String,
      portableHash: Boolean = true): DataFrame = {
    requireGroupCols(groupCols, "estimateGrouped")
    require(!GroupedReservedNames.contains(keyCol),
      s"estimateGrouped: keyCol '$keyCol' collides with a cell/output " +
        s"column (${GroupedReservedNames.mkString(", ")}) - rename it first")
    require(!groupCols.contains(keyCol),
      s"estimateGrouped: keyCol '$keyCol' is also a group column - a key " +
        "cannot stratify itself; rename one of them")
    requireCellCap(keys.sparkSession, depth, width, "estimateGrouped")
    val sk = sketch
      .select(groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__sg$i") } ++
        Seq(col("r").as("__sr"), col("bucket").as("__sb"), col("cnt")): _*)
    val kb = keys
      .select(groupCols.map(col) :+ col(keyCol): _*)
      .where(col(keyCol).isNotNull).distinct()
      .select(groupCols.map(col) ++ Seq(col(keyCol),
        bucketPairs(col(keyCol), depth, width, seed, portableHash).as("rb")): _*)
      .select(groupCols.map(col) ++ Seq(col(keyCol),
        col("rb.r").as("r"), col("rb.bucket").as("bucket")): _*)
    val joinCond = groupCols.zipWithIndex
      .map { case (g, i) => kb(g) <=> sk(s"__sg$i") }
      .reduce(_ && _) && (kb("r") === sk("__sr")) && (kb("bucket") === sk("__sb"))
    kb.join(sk, joinCond, "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy((groupCols :+ keyCol).map(kb(_)): _*)
      .agg(min("cnt").as("est"))
  }

  /** Point-estimate counts for a key frame against a built sketch:
    * est = min over the depth cells the key hashes to (0 for never-touched
    * cells). The sketch side (≤ depth·width rows) broadcasts, so probing
    * any number of keys is one broadcast join + a depth-row min per key —
    * no shuffle of the key frame beyond its own dedup.
    * Returns (keyCol, est BIGINT).
    */
  def estimate(
      sketch: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      seed: String,
      portableHash: Boolean = true): DataFrame = {
    require(!Seq("r", "bucket", "cnt", "est").contains(keyCol),
      s"estimate: keyCol '$keyCol' collides with a sketch column " +
        "(r, bucket, cnt, est) - rename the key column first")
    requireCellCap(keys.sparkSession, depth, width, "estimate")
    val kb = keys.select(col(keyCol)).where(col(keyCol).isNotNull).distinct()
      .select(col(keyCol),
        bucketPairs(col(keyCol), depth, width, seed, portableHash).as("rb"))
      .select(col(keyCol), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    kb.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(keyCol).agg(min("cnt").as("est"))
  }

  /** Heavy hitters over an item frame: keys whose CMS estimate reaches
    * `threshold`. One-sided guarantee: every key with true count ≥
    * threshold IS returned (estimates only over-count); collisions may
    * add keys whose true count is below it — callers needing exactness
    * join the survivors back for an exact count of the (small) candidate
    * set, which is the classic two-pass sketch-then-verify shape.
    *
    * `candidates` supplies the probe keys. Pass None to probe the item
    * frame's own distinct keys — exact and simple, but at extreme
    * cardinality that distinct is itself a shuffle of the key space; at
    * that scale pass a restricted candidate frame (e.g. per-partition
    * local top-m, a prior round's survivors, a domain vocabulary) and the
    * probe cost is the candidate count, not the corpus.
    * Returns (keyCol, est BIGINT), heaviest first, key-ordered on ties.
    */
  def heavyHitters(
      items: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      seed: String,
      threshold: Long,
      candidates: Option[DataFrame] = None,
      portableHash: Boolean = true): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val sk = build(items, keyCol, depth, width, seed, portableHash = portableHash)
    estimate(sk, candidates.getOrElse(items), keyCol, depth, width, seed, portableHash)
      .where(col("est") >= threshold)
      .orderBy(col("est").desc, col(keyCol))
  }

  /** Per-partition Misra-Gries candidate generator (Misra & Gries 1982,
    * "Finding repeated elements"): each partition keeps at most `m`
    * counters over its local stream and emits the surviving keys; the
    * union (deduplicated) is the candidate frame. GUARANTEE: any key
    * with GLOBAL count > N/(m+1) survives in at least one partition —
    * if its count were ≤ n_p/(m+1) in every partition, summing gives
    * ≤ N/(m+1), a contradiction (MG's local bound: a key is evicted
    * only if its local count ≤ n_p/(m+1)). So for a heavy-hitter pass
    * at threshold T, choose m ≥ N/T and the candidate set has NO false
    * negatives — the property [[heavyHittersExact]] builds on.
    *
    * This is the genuine per-partition-imperative case: bounded-memory
    * stream summarization has no declarative equivalent (a groupBy
    * shuffles the whole key space — the exact cost this exists to
    * avoid). Memory is O(m) counters per task; output ≤ m keys per
    * partition regardless of partition size; the only shuffle is the
    * final dedup over ≤ m·partitions candidate keys. NULL keys are
    * skipped (rule-10: a NULL has no frequency identity).
    */
  def localTopCandidates(items: DataFrame, keyCol: String, m: Int): DataFrame =
    mgSummaries(items, keyCol, m)
      .where(col(keyCol).isNotNull).select(col(keyCol)).distinct()

  /** The shared MG scan: per partition, emit the ≤ m surviving keys as
    * (key, NULL) rows plus ONE (NULL, n_p) row carrying the partition's
    * non-null-key count — so callers that also need N ([[topKExact]]'s
    * completeness bound) get it from the SAME pass instead of a second
    * corpus scan. Keys are non-null by the filter, so the NULL key is an
    * unambiguous marker for the count row.
    */
  /** True when `t` is or nests a MapType (private recursion — the
    * public existsRecursively is `private[spark]`).
    */
  private def hasMapType(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case _: MapType => true
      case a: ArrayType => hasMapType(a.elementType)
      case s: StructType => s.fields.exists(f => hasMapType(f.dataType))
      case _ => false
    }
  }

  private def mgSummaries(items: DataFrame, keyCol: String, m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    // MapData has IDENTITY equals/hashCode (maps are unorderable and
    // ungroupable across Spark generally), so a map-typed key would
    // silently corrupt the counters on the InternalRow path — refuse it
    // the way groupBy would (r19 advice)
    require(!hasMapType(items.schema(keyCol).dataType),
      s"mgSummaries: key column '$keyCol' contains a map type, which has " +
        "no content-based equality; map keys are unsupported (project the " +
        "map to a groupable key first)")
    val keyed = Dedup.fanOut(items.select(col(keyCol)))
      .where(col(keyCol).isNotNull)
    // the key field must be NULLABLE in the summary schema regardless of
    // the input's nullability: the per-partition count row carries a
    // NULL key as its marker
    val schema = org.apache.spark.sql.types.StructType(
      keyed.schema.fields.map(_.copy(nullable = true)))
      .add("__n", org.apache.spark.sql.types.LongType)
    // InternalRow path (r19): the DataFrame.mapPartitions form decoded
    // every occurrence to an external Row (UTF8String→String copy +
    // GenericRowWithSchema alloc) on the way IN and encoded the ≤m+1
    // survivors on the way OUT — pure overhead for a kernel that only
    // hashes/compares keys. Internal values compare/hash by content
    // (UTF8String by bytes), so the counters work on them directly; the
    // one subtlety is that unsafe-row-backed values are REUSED buffers,
    // so a key is defensively copied ONCE when it first enters the map
    // (copies are bounded by m, not by the stream length).
    val keyType = keyed.schema.fields(0).dataType
    val rdd = keyed.queryExecution.toRdd.mapPartitions { rows =>
      // Open-addressing counter table (r20, r19 verdict #7): the
      // java.util.HashMap[Any, java.lang.Long] form allocated one boxed
      // Long PER OCCURRENCE on the increment path (plus an Entry per
      // insert); here counts live in a primitive long array beside a
      // linear-probed key array (power-of-two capacity ≥ 2m, load
      // factor ≤ ~0.5). Key semantics are unchanged: content-based
      // hashCode/equals of the internal values (UTF8String hashes its
      // bytes), defensive copy ONLY when a key first enters the table
      // (bounded by m). The decrement-all step gathers survivors and
      // re-inserts in place — same amortized O(1)/element bound (each
      // decrement-all consumes ≥ size(=m) of total counter mass ≤ n_p,
      // so rebuilds cost O(n_p) across the partition).
      var cap = 8
      while (cap < m * 2) cap <<= 1
      val mask = cap - 1
      val keys = new Array[AnyRef](cap)
      val cnts = new Array[Long](cap)
      var size = 0
      def slotOf(k: AnyRef): Int = {
        var s = k.hashCode & mask
        while ((keys(s) ne null) && !keys(s).equals(k)) s = (s + 1) & mask
        s
      }
      var np = 0L
      rows.foreach { row =>
        np += 1L
        val k = row.get(0, keyType).asInstanceOf[AnyRef]
        val s = slotOf(k)
        if (keys(s) ne null) cnts(s) += 1L
        else if (size < m) {
          // first entry: detach the key from the reused row buffer
          val owned = k match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case r: org.apache.spark.sql.catalyst.InternalRow => r.copy()
            case x => x
          }
          keys(s) = owned.asInstanceOf[AnyRef]
          cnts(s) = 1L
          size += 1
        } else {
          // decrement-all: survivors (count > 1) re-insert decremented
          val sk = new Array[AnyRef](size)
          val sc = new Array[Long](size)
          var out = 0
          var i = 0
          while (i < cap) {
            if ((keys(i) ne null) && cnts(i) > 1L) {
              sk(out) = keys(i); sc(out) = cnts(i) - 1L; out += 1
            }
            keys(i) = null
            i += 1
          }
          size = out
          i = 0
          while (i < out) {
            val t = slotOf(sk(i))
            keys(t) = sk(i); cnts(t) = sc(i)
            i += 1
          }
        }
      }
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        private var i = 0
        private var countEmitted = false
        private def advance(): Unit = while (i < cap && (keys(i) eq null)) i += 1
        advance()
        def hasNext: Boolean = i < cap || !countEmitted
        def next(): org.apache.spark.sql.catalyst.InternalRow =
          if (i < cap) {
            val k = keys(i)
            i += 1
            advance()
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](k, null))
          } else {
            countEmitted = true
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](null, np))
          }
      }
    }
    org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(
      items.sparkSession, rdd, schema)
  }

  /** EXACT heavy hitters — the verify-or-refuse sibling of
    * [[heavyHitters]]: returns EXACTLY {key : count(key) ≥ threshold}
    * with exact counts, (keyCol, cnt BIGINT), heaviest first,
    * key-ordered on ties.
    *
    * Auto path (candidates = None): ONE fused Misra-Gries scan yields
    * both the candidate keys and N (the [[topKExact]] fusion, applied
    * here in r17 — this was three corpus scans through r16: count,
    * then MG, then a CMS build whose filter thinned an ALREADY
    * driver-capped candidate set before a broadcast that was equally
    * cheap unfiltered), then one exact-confirm scan. The MG bound
    * needs m ≥ N/threshold, and N is only known after the scan, so the
    * scan runs at a guessed m (`graft.cms.mgInitialCounters`, default
    * 65536, clamped to the candidate cap) and re-runs at exactly
    * ⌊N/threshold⌋+1 in the rare case the guess undershot — the same
    * verify-don't-assume discipline as topKExact's completeness check.
    * Refuses (with remediation) when the required m exceeds
    * `graft.cms.maxCandidateCounters` (default 4M): a threshold that
    * small relative to the corpus admits millions of "heavy" keys.
    * Happy-path cost: TWO map-side-combined scans of `items`; the
    * confirm shuffle carries only candidate keys; nothing is ordered
    * or distinct'd over the full key space. The MG guess bounds
    * counters PER PARTITION, so on a wide cluster with per-partition-
    * diverse keys the global candidate union can exceed what a FORCED
    * broadcast should carry — past
    * `graft.cms.maxBroadcastCandidates` (default 4M) the one-sided CMS
    * prefilter (depth/width/seed) thins the set first, the pre-r17
    * shape reserved for exactly the regime that needs it. Like
    * topKExact, the AUTO path's result comes back persisted (the bound
    * check materializes it) and the caller owns the release; the
    * explicit-candidates path returns a lazy frame.
    *
    * Explicit-candidates path: a caller-supplied frame (a domain
    * vocabulary, a prior round's survivors) has UNKNOWN size, so the
    * CMS prefilter (depth/width/seed — one-sided, no true-heavy key
    * lost) still earns its scan by thinning the set BEFORE it must
    * broadcast into the confirm. The sketch parameters are only
    * consulted on this path.
    */
  def heavyHittersExact(
      items: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      seed: String,
      threshold: Long,
      candidates: Option[DataFrame] = None,
      portableHash: Boolean = true): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val spark = items.sparkSession
    val confirmed = candidates match {
      case Some(_) =>
        val survivors = heavyHitters(items, keyCol, depth, width, seed,
          threshold, candidates = candidates, portableHash = portableHash)
          .select(col(keyCol))
        items.join(broadcast(survivors), Seq(keyCol), "left_semi")
          .groupBy(keyCol).agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= threshold)
          .orderBy(col("cnt").desc, col(keyCol))
      case None =>
        val maxM = graft.util.Conf.long(spark,
          "graft.cms.maxCandidateCounters", 4194304L)
        val guess = math.min(
          math.max(1024L, graft.util.Conf.long(spark,
            "graft.cms.mgInitialCounters", 65536L)),
          maxM)
        // toIntExact, not toInt: a conf cap raised past Int.MaxValue
        // silently wrapping here would void the MG no-false-negative
        // bound while the API still claims exactness
        var summaries = mgSummaries(items, keyCol,
          math.toIntExact(guess)).persist()
        try {
          val n = summaries.where(col(keyCol).isNull)
            .agg(coalesce(sum(col("__n")), lit(0L))).head().getLong(0)
          val needed = n / threshold + 1L
          require(needed <= maxM,
            s"heavyHittersExact: auto candidate generation needs N/threshold+1 = $needed " +
              s"Misra-Gries counters per partition (cap $maxM via " +
              "graft.cms.maxCandidateCounters). A threshold this small relative to " +
              "the corpus admits millions of 'heavy' keys - raise the threshold, " +
              "or pass an explicit candidates frame (a domain vocabulary, a prior " +
              "round's survivors, localTopCandidates with your own m).")
          if (guess < needed) {
            // the guess undershot the MG bound: keys with count just at
            // the threshold could have been evicted — re-scan at the
            // exact m instead of returning a silently-lossy answer
            summaries.unpersist()
            summaries = mgSummaries(items, keyCol,
              math.toIntExact(needed)).persist()
          }
          val candAll = summaries.where(col(keyCol).isNotNull)
            .select(col(keyCol)).distinct()
          // candidate-count guard before the FORCED broadcast (see the
          // scaladoc): summaries are persisted, so this count is cheap
          val maxBc = graft.util.Conf.long(spark,
            "graft.cms.maxBroadcastCandidates", 4194304L)
          val cand =
            if (candAll.count() <= maxBc) candAll
            else heavyHitters(items, keyCol, depth, width, seed, threshold,
              candidates = Some(candAll), portableHash = portableHash)
              .select(col(keyCol))
          val out = items.join(broadcast(cand), Seq(keyCol), "left_semi")
            .groupBy(keyCol).agg(count(lit(1)).as("cnt"))
            .where(col("cnt") >= threshold)
            .orderBy(col("cnt").desc, col(keyCol))
            .persist()
          // materialize before releasing the summaries the plan reads
          try out.count()
          catch { case t: Throwable => out.unpersist(); throw t }
          out
        } finally summaries.unpersist()
    }
    confirmed
  }

  /** EXACT top-k most frequent keys — "the 1,000 most frequent n-grams,
    * exactly" — WITHOUT ever sorting or exact-counting the key space:
    * per-partition Misra-Gries candidates (`m` counters), exact counts
    * for the candidate set only (a broadcast semi-join + one map-side-
    * combined aggregate over the items scan), then an order over the ≤
    * m·partitions candidates. The result is VERIFIED before it is
    * returned: completeness holds iff the k-th candidate count exceeds
    * N/(m+1) — the MG bound guarantees every key with count > N/(m+1)
    * is a candidate, so when the k-th count clears that line, no
    * non-candidate key can out-rank (or tie into) the top k. If the
    * check fails, the call REFUSES with the measured gap and the m that
    * would close it, instead of returning a silently-approximate list —
    * the same verify-or-refuse contract as [[heavyHittersExact]], which
    * answers the threshold-form of this question.
    *
    * `m` defaults to max(32·k, 1024): on non-adversarial distributions
    * the k-th count comfortably clears N/(32k+1) (the top k keys alone
    * hold ≥ k·c_k of the N mass). A heavy-tailed corpus where it does
    * not will refuse; re-call with the suggested m. Ties at the k-th
    * count are broken key-ascending (deterministic, oracle-replayable).
    * Returns (keyCol, cnt BIGINT, rank INT), rank 1 = heaviest — a
    * persisted frame (the verification pass materializes it); the
    * caller owns its unpersist.
    */
  def topKExact(
      items: DataFrame,
      keyCol: String,
      k: Int,
      m: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = items.sparkSession
    val mEff = if (m > 0) m else math.max(32 * k, 1024)
    val maxM = graft.util.Conf.long(spark, "graft.cms.maxCandidateCounters", 4194304L)
    require(mEff <= maxM,
      s"topKExact: m = $mEff exceeds graft.cms.maxCandidateCounters ($maxM)")
    require(mEff > k, s"topKExact: m ($mEff) must exceed k ($k) for the " +
      "completeness bound to be satisfiable")
    // ONE fused scan yields both the MG survivors and N (the per-partition
    // count rows): unlike heavyHittersExact's auto path, m here does not
    // depend on N — only the post-hoc bound check does — so the separate
    // count(*) pass would be a pure waste of a corpus scan. The summary
    // frame is tiny (≤ m+1 rows/partition) — persist it, not the corpus.
    val summaries = mgSummaries(items, keyCol, mEff).persist()
    val n = summaries.where(col(keyCol).isNull)
      .agg(coalesce(sum(col("__n")), lit(0L))).head().getLong(0)
    val cand = summaries.where(col(keyCol).isNotNull)
      .select(col(keyCol)).distinct()
    val counted = items.join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    // rank over candidates only (<= m * partitions rows — never the key
    // space); deterministic (cnt desc, key asc) total order
    val ranked = counted
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col(keyCol).asc)))
      .where(col("rank") <= k)
      .persist()
    val rows = ranked.count()
    val bound = n / (mEff + 1L)
    val verified =
      if (rows >= k) {
        // every key with count > N/(m+1) is a candidate (MG bound), so a
        // k-th candidate count above that line proves no outside key can
        // out-rank or tie into the top k
        ranked.where(col("rank") === k).select(col("cnt")).head().getLong(0) > bound
      } else {
        // fewer candidates than k: the answer is complete ONLY if the
        // candidates are the ENTIRE key set — exactly checkable: every
        // occurrence must be accounted for by a candidate count
        val countedTotal = counted.agg(coalesce(sum(col("cnt")), lit(0L)))
          .head().getLong(0)
        countedTotal == n
      }
    summaries.unpersist()
    if (!verified) {
      val kth = if (rows >= k)
        ranked.where(col("rank") === k).select(col("cnt")).head().getLong(0)
      else -1L
      ranked.unpersist()
      val need = if (kth > 0) n / kth + 1L else mEff * 4L
      throw new IllegalArgumentException(
        s"topKExact: completeness not verifiable - the k-th candidate count " +
          s"(${if (rows >= k) kth.toString else s"only $rows candidates"}) does not " +
          s"exceed N/(m+1) = $bound, so a non-candidate key could belong to the " +
          s"true top $k. Re-call with m >= $need (and raise " +
          "graft.cms.maxCandidateCounters if needed), or use heavyHittersExact " +
          "with an explicit threshold.")
    }
    ranked
  }
}
