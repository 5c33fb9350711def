package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter MEMBERSHIP sketch as a first-class packed-word frame —
  * the fourth member of the mergeable sketch family (frequency =
  * [[Sketches]]/[[CmsSketch]], cardinality = [[Hll]]/[[HllSketch]],
  * ranks = [[QuantileSketch]], membership = this + [[BloomSketch]]).
  *
  * The filter is a DataFrame of `(w: long, bits: long)` rows — word
  * index and the 64-bit packed word — holding only NONZERO words, so
  * the frame is ≤ ceil(m/64) rows at ANY corpus size: geometry-bound,
  * never corpus-bound, exactly like the HLL register frame. Unlike
  * [[Curate.decontaminateBloom]]'s broadcast image (built, used, and
  * discarded inside one operator), the word frame is persistable data:
  * per-day / per-shard / per-stream filters compose AFTER the fact by
  * bitwise OR ([[merge]]), and a persisted eval-set filter is probed by
  * every future ingest batch without rebuilding ([[BloomSketch]] +
  * [[Curate.decontaminateBloomPrebuilt]]).
  *
  * Bit positions are the SAME engine-portable math as
  * `Curate.bloomImage` (bit-for-bit — interop is spec-pinned):
  * Kirsch–Mitzenmacher double hashing from ONE md5 per key
  * (`pos_i = (h1 + i·h2) mod m`, h1/h2 the digest's two unsigned
  * 8-byte halves mod m — Kirsch & Mitzenmacher 2006 prove the k-hash
  * FP asymptotics survive this), so an external SQL engine rebuilds the
  * EXACT filter including its false positives and the gate hash-checks
  * the words themselves (q_bloom_bits / q_bloom_merge / q_bloom_probe /
  * q_bloom_grouped / q_bloom_probe_grouped — build, merge, scalar and
  * per-group probe verdicts all replay). The hash-contract view splits
  * each word into two
  * nonnegative 32-bit halves (`lo`/`hi`, [[wordHalves]]) because the
  * sign bit is unreachable by portable integer SQL (`1 << 63` is an
  * overflow error in ANSI engines); internally words stay packed
  * 64-bit for JVM interop with the dense `Array[Long]` image.
  *
  * Reference context: the reference keeps no reusable membership
  * artifact at all — its dedup/contains paths rebuild per run (cf. the
  * eval-set handling the exact paths in `Curate` mirror). This layer is
  * the repo's own 100-TB design language applied to membership.
  *
  * NULL policy (both engines, house rule 10): a NULL key carries no
  * membership bit — build DROPS null keys, probe emits no row for
  * them (probe answers are per DISTINCT non-null key). DuckDB oracles
  * align because `shingleRowsSql` collapses null-text shingle lists to
  * empty lists before unnest.
  *
  * Duplicate-word-row policy: bitwise OR is idempotent and associative,
  * so a frame formed by UNION of valid word frames (instead of
  * [[merge]]) is not a corruption the way a unioned HLL register frame
  * is — every consumer here ([[mightContain]], [[denseWords]],
  * [[fillRatio]]) first NORMALIZES with `groupBy(w).bit_or(bits)`,
  * which maps any union of valid frames to exactly the merged filter.
  * The tiny normalize aggregation (≤ m/64 rows) buys structural
  * correctness instead of a refusal.
  */
object Bloom {

  /** Word-index / packed-word column names (the frame schema) plus the
    * probe/view output names — refused as group-column names in the
    * grouped entry points (the [[GroupedQuantileSketch.ReservedNames]]
    * discipline: a group literally named "w" would be clobbered).
    */
  private[graft] val ReservedNames =
    Set("w", "bits", "lo", "hi", "pos", "contained", "fill", "__k", "__b")

  /** Scalar consumers require a frame of EXACTLY (w, bits); grouped
    * consumers exactly (groupCols..., w, bits). A GROUPED frame fed to
    * a scalar entry point would silently OR-collapse every group into
    * the union filter — mathematically well-defined, but a probe meant
    * against ONE group's filter then answers "in ANY group", the
    * plausible-but-wrong class this codebase refuses everywhere
    * (the Hll.estimate grouped-frame refusal is the same guard for the
    * non-idempotent case). Schema-only check: no job is run.
    */
  private def requireWordFrame(df: DataFrame, groupCols: Seq[String],
      site: String): Unit = {
    // reserved-name clash first: groupCols=["bits"] would otherwise
    // PASS the set comparison below against a scalar (w, bits) frame
    // and then be clobbered by the normalize aggregation
    val clash = groupCols.filter(ReservedNames.contains)
    require(clash.isEmpty,
      s"Bloom.$site: group column(s) ${clash.mkString(", ")} collide with " +
        s"the frame/output columns (${ReservedNames.mkString(", ")}); " +
        "rename them first")
    val expected = (groupCols ++ Seq("w", "bits")).toSet
    val got = df.columns.toSet
    require(got == expected,
      s"Bloom.$site: expected a word frame with columns " +
        s"(${(groupCols ++ Seq("w", "bits")).mkString(", ")}), got " +
        s"(${df.columns.mkString(", ")}). A grouped frame must go through " +
        "the grouped entry points (or filter to one group and drop the " +
        "group columns) - silently collapsing groups would answer " +
        "membership in ANY group's filter.")
  }

  /** The probe/collect consumers compose `distinct()` + an aggregation
    * (+ a join): on a STREAMING frame that plans multiple stateful
    * operators and fails deep in the engine with an error that names
    * neither this API nor the fix — refuse at the door instead.
    * Streaming BUILDS are supported (complete-mode [[build]], windowed
    * [[graft.streaming.StreamBloom]]); probes belong in foreachBatch.
    */
  private def requireBatch(df: DataFrame, what: String, site: String): Unit =
    require(!df.isStreaming,
      s"Bloom.$site: the $what frame is streaming - probe/collect paths " +
        "compose distinct + join + aggregation and cannot run as one " +
        "streaming query. Probe inside foreachBatch (per micro-batch), or " +
        "build windowed filters with StreamBloom.windowedWords and probe " +
        "the rebuilt handle.")

  /** Geometry bounds shared by every entry point. The 2^36-bit ceiling
    * matches `Curate.bloomImage`'s implementation ceiling (int word
    * indexing of the dense image); 64 is one word. k ≤ 16 matches the
    * double-hashing quality range Curate enforces.
    */
  private[graft] def requireGeometry(numBits: Long, numHashes: Int): Unit = {
    require(numBits >= 64L && numBits <= (1L << 36),
      s"Bloom: numBits must be in [64, 2^36], got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"Bloom: numHashes must be in [1, 16], got $numHashes")
  }

  /** The k probe positions of one key — the ONE definition of the
    * position math, used by build and probe here and by
    * `Curate.bloomImage` (a drifted copy would silently desynchronize
    * a persisted filter from its probes). Portable mode (the default,
    * and the only mode the gate oracles replay): Kirsch–Mitzenmacher
    * double hashing from ONE md5 — engine side
    * `('0x' || substr(md5(key), 1, 16))::UBIGINT % m` and the 17..32
    * half, then `(h1 + i*h2) % m`. Fast mode (`portable = false`): the
    * same double-hashing structure from two tag-namespaced xxhash64
    * draws ([[graft.util.Hashing.xxh64Tagged]] — bit-identical to the
    * codegen'd column path, spec-pinned), floorMod-reduced. NOT
    * engine-replayable; for production corpora that don't need external
    * replay (the `Hll.registerCoords` tradeoff). Every membership
    * property (no false negatives, deterministic FPs, OR mergeability)
    * holds identically in both modes — only replayability differs.
    */
  private[graft] def positions(key: String, m: Long, k: Int,
      portable: Boolean = true): Array[Long] = {
    val (h1, h2) =
      if (portable) {
        val (h1r, h2r) = graft.util.Hashing.md5LongPair(key)
        (java.lang.Long.remainderUnsigned(h1r, m),
          java.lang.Long.remainderUnsigned(h2r, m))
      } else {
        // floorMod, not remainderUnsigned: the column twin is pmod()
        // over the signed xxhash64 value, and the two reductions differ
        // — the JVM side must match the codegen side bit for bit
        (java.lang.Math.floorMod(graft.util.Hashing.xxh64Tagged("bloom:h1", key), m),
          java.lang.Math.floorMod(graft.util.Hashing.xxh64Tagged("bloom:h2", key), m))
      }
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      out(i) = (h1 + i * h2) % m
      i += 1
    }
    out
  }

  /** Positions as a Column (array<long>) over a string key column.
    * Portable mode evaluates the house md5 pair in a UDF (MessageDigest
    * has no codegen'd Column twin that matches the oracle contract);
    * fast mode is PURE built-ins — two xxhash64 draws and integer
    * arithmetic inside whole-stage codegen, no UDF boundary at all.
    * Measured honestly (r21, docs/SCALE.md): the BUILD is scan-bound
    * once warm (one md5 per key funds all k positions), so fast≈md5
    * there; the fast mode's real wins are the full-corpus PROBE
    * (1.35× steady / 1.9× cold at the 100× decade) and the cleaner
    * all-codegen plan. Null keys yield null in both modes (callers
    * filter them; parity kept anyway).
    */
  private[graft] def positionsCol(key: Column, m: Long, k: Int,
      portable: Boolean = true): Column =
    if (portable) {
      val u = udf { s: String => if (s == null) null else positions(s, m, k) }
      u(key)
    } else {
      val h1 = pmod(xxhash64(lit("bloom:h1"), key), lit(m))
      val h2 = pmod(xxhash64(lit("bloom:h2"), key), lit(m))
      when(key.isNull, lit(null).cast("array<bigint>"))
        .otherwise(array((0 until k).map(i =>
          pmod(h1 + lit(i.toLong) * h2, lit(m))): _*))
    }

  /** Build the word frame over `keyCol` (cast to string). ONE exchange:
    * positions explode map-side, the (w, bits) partial bit_or combines
    * map-side, so the shuffle carries ≤ m/64 rows per task regardless
    * of input size — and input duplicates are free (OR idempotence), so
    * no distinct-keys shuffle is needed or taken.
    */
  def build(df: DataFrame, keyCol: String, numBits: Long,
      numHashes: Int, portableHash: Boolean = true): DataFrame = {
    requireGeometry(numBits, numHashes)
    wordsOf(Dedup.fanOut(df.select(col(keyCol).cast("string").as("__k"))
        .filter(col("__k").isNotNull)),
      numBits, numHashes, Seq.empty, portableHash)
  }

  /** One filter PER GROUP in one aggregation: `(groupCols..., w, bits)`,
    * ≤ groups × m/64 rows. Same null/dup policy as [[build]]; NULL
    * group values are retained as their own group (Spark groupBy
    * semantics — spelled out because SQL equi-join consumers drop
    * them, house rule 10).
    */
  def buildGrouped(df: DataFrame, keyCol: String, groupCols: Seq[String],
      numBits: Long, numHashes: Int, portableHash: Boolean = true): DataFrame = {
    requireGeometry(numBits, numHashes)
    require(groupCols.nonEmpty, "Bloom.buildGrouped: groupCols is empty - use build")
    val clash = groupCols.filter(ReservedNames.contains)
    require(clash.isEmpty,
      s"Bloom.buildGrouped: group column(s) ${clash.mkString(", ")} collide " +
        s"with the frame/output columns (${ReservedNames.mkString(", ")}); " +
        "rename them before building")
    wordsOf(Dedup.fanOut(df.select(
        groupCols.map(col) :+ col(keyCol).cast("string").as("__k"): _*)
        .filter(col("__k").isNotNull)),
      numBits, numHashes, groupCols, portableHash)
  }

  /** Shared build tail: explode the k positions, derive (w, bit) with
    * codegen'd integer expressions, bit_or by (groupCols..., w).
    */
  private def wordsOf(keyed: DataFrame, m: Long, k: Int,
      groupCols: Seq[String], portable: Boolean = true): DataFrame =
    keyed
      .select(groupCols.map(col) :+
        explode(positionsCol(col("__k"), m, k, portable)).as("pos"): _*)
      .select(groupCols.map(col) ++ Seq(
        shiftrightunsigned(col("pos"), 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("__b")): _*)
      .groupBy((groupCols :+ "w").map(col): _*)
      .agg(expr("bit_or(__b)").as("bits"))

  /** OR-merge two word frames (same geometry — enforce it via
    * [[BloomSketch]], which refuses mismatches; at this layer the
    * caller owns geometry like the functional [[Sketches]] API).
    * Summary-bound: ≤ 2·m/64 input rows, one tiny aggregation.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    requireWordFrame(a, Seq.empty, "merge")
    requireWordFrame(b, Seq.empty, "merge")
    normalize(a.select("w", "bits").union(b.select("w", "bits")), Seq.empty)
  }

  /** [[merge]] per group over `(groupCols..., w, bits)` frames. */
  def mergeGrouped(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    requireWordFrame(a, groupCols, "mergeGrouped")
    requireWordFrame(b, groupCols, "mergeGrouped")
    val cols = (groupCols ++ Seq("w", "bits")).map(col)
    normalize(a.select(cols: _*).union(b.select(cols: _*)), groupCols)
  }

  /** `groupBy(w).bit_or(bits)` — maps any UNION of valid word frames to
    * the merged filter (see the duplicate-word-row policy above).
    */
  private def normalize(words: DataFrame, groupCols: Seq[String]): DataFrame =
    words.groupBy((groupCols :+ "w").map(col): _*)
      .agg(expr("bit_or(bits)").as("bits"))

  /** Membership verdicts for the DISTINCT non-null keys of `keyCol`:
    * `(keyCol, contained)`. Each key's k positions left-join the
    * normalized word frame on `w` (broadcast when the dense image is
    * ≤ 2^28 bits = 64 MB of words; plain equi-join above — the frame
    * is ≤ m/64 rows either way, and at 2^36 bits a 16 GiB broadcast
    * would be the wrong plan); contained = every position's bit set,
    * an absent word row meaning "no bits in this word". A double-hash
    * self-collision just re-checks the same position — `every` over k
    * verdicts is collision-proof without a distinct.
    *
    * False positives are part of the CONTRACT (deterministic, engine-
    * replayable — the gate hash-checks them); false negatives are
    * impossible for keys that entered a merged build.
    */
  def mightContain(words: DataFrame, keys: DataFrame, keyCol: String,
      numBits: Long, numHashes: Int, portableHash: Boolean = true): DataFrame = {
    requireGeometry(numBits, numHashes)
    requireWordFrame(words, Seq.empty, "mightContain")
    requireBatch(keys, "keys", "mightContain")
    requireBatch(words, "word", "mightContain")
    require(keyCol != "contained",
      "Bloom.mightContain: keyCol 'contained' collides with the verdict " +
        "output column; rename the key column first")
    val filt = normalize(words.select("w", "bits"), Seq.empty)
    val filtSized = if (numBits <= (1L << 28)) broadcast(filt) else filt
    Dedup.fanOut(keys.select(col(keyCol).cast("string").as("__k"))
        .filter(col("__k").isNotNull))
      .distinct()
      .select(col("__k"), explode(
        positionsCol(col("__k"), numBits, numHashes, portableHash)).as("pos"))
      .select(col("__k"),
        shiftrightunsigned(col("pos"), 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("__b"))
      .join(filtSized, Seq("w"), "left")
      .groupBy("__k")
      .agg(expr("every(coalesce((bits & __b) = __b, false))").as("contained"))
      .select(col("__k").as(keyCol), col("contained"))
  }

  /** [[mightContain]] per group: verdicts for the DISTINCT non-null
    * keys of each (groupCols..., key) pair against THAT group's
    * filter — `(groupCols..., keyCol, contained)`. Per-language eval
    * filters probed in one join instead of a per-group loop; a pair
    * whose group has no filter at all is `contained = false` (no words
    * to match), the same semantics as probing an empty filter.
    *
    * Two deliberate mechanics (house rules 10 and 13): group columns
    * join NULL-SAFELY (`<=>`), so a NULL group's keys probe the NULL
    * group's filter instead of silently false-negating — Spark
    * equi-joins drop NULL keys; and the filter side's columns are
    * RENAMED before the join, because words and keys routinely derive
    * from the same projection and attribute-to-attribute conditions on
    * shared exprIds degenerate into a self-join.
    */
  def mightContainGrouped(words: DataFrame, keys: DataFrame, keyCol: String,
      groupCols: Seq[String], numBits: Long, numHashes: Int,
      portableHash: Boolean = true): DataFrame = {
    requireGeometry(numBits, numHashes)
    require(groupCols.nonEmpty,
      "Bloom.mightContainGrouped: groupCols is empty - use mightContain")
    requireWordFrame(words, groupCols, "mightContainGrouped")
    requireBatch(keys, "keys", "mightContainGrouped")
    requireBatch(words, "word", "mightContainGrouped")
    require(keyCol != "contained",
      "Bloom.mightContainGrouped: a column named 'contained' collides with " +
        "the verdict output column; rename it first")
    val filt = normalize(
        words.select((groupCols ++ Seq("w", "bits")).map(col): _*), groupCols)
      .select(groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__fg$i") } ++
        Seq(col("w").as("__fw"), col("bits")): _*)
    val filtSized = if (numBits <= (1L << 28)) broadcast(filt) else filt
    val probes = Dedup.fanOut(keys.select(
        groupCols.map(col) :+ col(keyCol).cast("string").as("__k"): _*)
        .filter(col("__k").isNotNull))
      .distinct()
      .select(groupCols.map(col) ++ Seq(col("__k"),
        explode(positionsCol(col("__k"), numBits, numHashes, portableHash)).as("pos")): _*)
      .select(groupCols.map(col) ++ Seq(col("__k"),
        shiftrightunsigned(col("pos"), 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("__b")): _*)
    val joinCond = groupCols.zipWithIndex
      .map { case (g, i) => probes(g) <=> filt(s"__fg$i") }
      .reduce(_ && _) && (probes("w") === filt("__fw"))
    probes.join(filtSized, joinCond, "left")
      .groupBy((groupCols :+ "__k").map(probes(_)): _*)
      .agg(expr("every(coalesce((bits & __b) = __b, false))").as("contained"))
      .select(groupCols.map(col) ++
        Seq(col("__k").as(keyCol), col("contained")): _*)
  }

  /** Collect a word frame into the dense `Array[Long]` image
    * `Curate.bloomHits` probes — the bridge from a persisted filter to
    * the broadcast-probe decontamination path. Driver memory is m/8
    * bytes, capped by `graft.bloom.maxCollectBits` (default 2^33 =
    * 1 GiB, the [[Curate]] broadcast budget); out-of-range or
    * non-normalized word rows refuse here (hand-assembled frames —
    * this is the one consumer where a bad row would silently corrupt
    * neighbors instead of just missing a join).
    */
  def denseWords(words: DataFrame, numBits: Long): Array[Long] = {
    requireWordFrame(words, Seq.empty, "denseWords")
    requireBatch(words, "word", "denseWords")
    val spark = words.sparkSession
    val cap = graft.util.Conf.long(spark, "graft.bloom.maxCollectBits", 1L << 33)
    require(numBits <= cap,
      s"Bloom.denseWords: numBits = $numBits exceeds graft.bloom.maxCollectBits " +
        s"= $cap - probe with mightContain (join path) or raise the cap")
    val nWords = ((numBits + 63L) >>> 6).toInt
    val dense = new Array[Long](nWords)
    val it = normalize(words.select("w", "bits"), Seq.empty)
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val w = r.getLong(0)
      require(w >= 0L && w < nWords,
        s"Bloom.denseWords: word index $w outside [0, $nWords) for numBits = " +
          s"$numBits - the frame was not built with this geometry")
      dense(w.toInt) = r.getLong(1)
    }
    dense
  }

  /** Fraction of set bits (one aggregation over ≤ m/64 rows). The
    * expected FALSE-POSITIVE rate of the filter as built is
    * fillRatio^k — cheaper and tighter than the a-priori formula
    * because it uses the realized fill.
    */
  def fillRatio(words: DataFrame, numBits: Long): Double = {
    requireWordFrame(words, Seq.empty, "fillRatio")
    require(numBits >= 64L, s"Bloom: numBits must be >= 64, got $numBits")
    val set = normalize(words.select("w", "bits"), Seq.empty)
      .agg(coalesce(sum(expr("bit_count(bits)").cast("long")), lit(0L)))
      .head().getLong(0)
    set.toDouble / numBits.toDouble
  }

  /** Per-group [[fillRatio]]: `(groupCols..., fill)` in one pass over
    * the ≤ groups × m/64-row frame. A group's expected FP rate is
    * fill^k — the saturation audit for per-group filters (a small
    * group's filter at a shared m is near-empty; a huge group's may
    * saturate — this is where that shows up).
    */
  def fillRatioGrouped(words: DataFrame, groupCols: Seq[String],
      numBits: Long): DataFrame = {
    require(groupCols.nonEmpty,
      "Bloom.fillRatioGrouped: groupCols is empty - use fillRatio")
    requireWordFrame(words, groupCols, "fillRatioGrouped")
    require(numBits >= 64L, s"Bloom: numBits must be >= 64, got $numBits")
    normalize(words.select((groupCols ++ Seq("w", "bits")).map(col): _*),
        groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg((coalesce(sum(expr("bit_count(bits)").cast("long")), lit(0L)) /
        lit(numBits.toDouble)).as("fill"))
  }

  /** Geometry that meets `targetFpr` for `expectedDistinct` keys: the
    * textbook optimum m = ⌈−n·ln p / (ln 2)²⌉ rounded UP to a whole
    * word (the frame packs 64-bit words), k = round(m/n · ln 2) clamped
    * to the [1, 16] double-hashing range. Returns (numBits, numHashes).
    *
    * Size from the EXPECTED TOTAL cardinality across every filter you
    * intend to merge — m is fixed at build time and cannot be derived
    * from one slice's count ([[BloomSketch.build]]'s note); get n from
    * [[Hll]]/[[HllSketch.estimate]] when it isn't known (one register
    * pass, no distinct shuffle). An UNDERSIZED filter fails silently in
    * the worst way — it saturates toward fill 1.0 and answers `true`
    * for everything while still "working" (the r20w6 replica corpora
    * silently saturated a 2^20-bit filter to all-true verdicts) —
    * which is why [[BloomSketch.write]] and [[GroupedBloomSketch.write]]
    * audit the realized fill at persist time and warn past
    * [[SaturationWarnFill]].
    */
  def sizeFor(expectedDistinct: Long, targetFpr: Double): (Long, Int) = {
    require(expectedDistinct >= 1L,
      s"Bloom.sizeFor: expectedDistinct must be >= 1, got $expectedDistinct")
    require(targetFpr > 0.0 && targetFpr < 1.0,
      s"Bloom.sizeFor: targetFpr must be in (0, 1), got $targetFpr")
    val n = expectedDistinct.toDouble
    val ln2 = math.log(2.0)
    val mOpt = math.ceil(-n * math.log(targetFpr) / (ln2 * ln2))
    val kOpt = math.round(mOpt / n * ln2).toInt
    // past k=16 (the double-hashing quality ceiling requireGeometry
    // enforces) the optimum is unreachable at the optimal m — returning
    // it anyway would MISS the target silently (~7x at 1e-9, r17
    // review). Re-solve m at the clamped k from the standard FP model
    // p = (1 - e^{-kn/m})^k  =>  m = -k·n / ln(1 - p^{1/k}), which
    // meets the target exactly with slightly more bits.
    val (mRaw, k) =
      if (kOpt > 16)
        (math.ceil(-16.0 * n / math.log1p(-math.pow(targetFpr, 1.0 / 16.0))), 16)
      else (mOpt, math.max(1, math.min(16, kOpt)))
    require(mRaw <= (1L << 36).toDouble,
      s"Bloom.sizeFor: $expectedDistinct keys at fpr $targetFpr need " +
        f"$mRaw%.0f bits, above the 2^36 implementation ceiling - shard " +
        "the key space (per-group filters) or relax the fpr")
    val m = math.max(64L, ((mRaw.toLong + 63L) >>> 6) << 6)
    (m, k)
  }

  /** [[sizeFor]] with the expected-distinct count ESTIMATED from the
    * corpus itself — the one-call form of "size the filter for THIS
    * corpus at THIS fpr": one fast-mode HLL register pass (2^p
    * registers, relative standard error ~1.04/√2^p — ~1.6% at the
    * p=12 default; fast mode because a sizing estimate never needs
    * external replay), inflated by 3σ before sizing so the realized
    * fill lands at-or-under the design point with ~99.9% confidence
    * instead of 50/50. Still size for the TOTAL across every filter
    * you intend to merge — pass the union corpus, not one slice.
    */
  def sizeForCorpus(df: DataFrame, keyCol: String, targetFpr: Double,
      p: Int = 12): (Long, Int) = {
    val est = Hll.estimate(
      Hll.build(df, keyCol, p, seed = "bloomsize", portableHash = false), p)
    val sigma = 1.04 / math.sqrt((1L << p).toDouble)
    sizeFor(math.max(1L, math.ceil(est * (1.0 + 3.0 * sigma)).toLong),
      targetFpr)
  }

  /** Fill ratio past which the persist-time audit warns. The design
    * optimum k = m/n·ln2 realizes fill ≈ 0.5 when n matches the
    * sizing, and INTEGER k rounding legitimately pushes a correctly
    * sized filter to ~0.52–0.53 (measured 0.518 at n=5000/1%) — so the
    * threshold sits just past that wobble: fill beyond it means MORE
    * keys than the geometry was sized for, and FP rate fill^k degrades
    * exponentially from there (merges only push fill up).
    */
  val SaturationWarnFill = 0.55

  /** The hash-contract view of a word frame: the packed word split into
    * two nonnegative 32-bit halves (`lo` = bits 0–31, `hi` = bits
    * 32–63) so portable integer SQL can rebuild it without touching
    * the sign bit. Involutive with `lo | (hi << 32)`.
    */
  def wordHalves(words: DataFrame, groupCols: Seq[String] = Seq.empty): DataFrame = {
    requireWordFrame(words, groupCols, "wordHalves")
    words.select(groupCols.map(col) ++ Seq(col("w"),
      col("bits").bitwiseAND(lit(0xffffffffL)).as("lo"),
      shiftrightunsigned(col("bits"), 32).as("hi")): _*)
  }
}
