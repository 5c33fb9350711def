package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT-recall set-similarity joins via prefix filtering (AllPairs:
  * Bayardo, Ma & Srikant WWW'07 "Scaling up all pairs similarity search";
  * length/prefix filters per PPJoin: Xiao, Wang, Lin & Yu WWW'08): every
  * document pair whose word-shingle Jaccard reaches the threshold is
  * returned — NO probabilistic recall loss, in contrast to
  * [[Dedup.minhashCandidates]] (recall = 1-(1-s^r)^b) and
  * [[Dedup.simhashCandidates]]. The price is sensitivity to corpus
  * redundancy: the candidate set is provably complete, so on a corpus of
  * n identical documents it IS the n²/2 output — exactness has no
  * sub-output-size escape hatch. Use this when a dedup decision must be
  * auditable ("no qualifying pair was missed"); use MinHash when a
  * bounded false-negative rate buys a smaller join.
  *
  * Two entry points over one pipeline: [[jaccardJoin]] (all pairs within
  * one corpus, id_a < id_b) and [[jaccardJoinAB]] (all cross-corpus
  * pairs, left × right — the snapshot-N-vs-snapshot-N+1 audit and the
  * pairwise train-vs-eval overlap question that [[TextOps.corpusDrift]]
  * only answers in aggregate). Both share the identical prefix /
  * positional / two-stage-verify machinery; they differ only in the side
  * predicate and are pinned equal on a mirrored corpus in SketchOpsSpec.
  *
  * Why it is sub-quadratic on real corpora: shingles are ranked rarest
  * first (document frequency ascending — computed over the UNION of both
  * sides for the AB join, so the two corpora share ONE global order —
  * shingle ascending as the deterministic tie-break), and a document of
  * |s| shingles exposes only its first |s| − ⌈t·|s|⌉ + 1 shingles to the
  * join — two documents can reach Jaccard t only if they share a shingle
  * in these prefixes (the pigeonhole bound), and prefix shingles are by
  * construction the RAREST in the corpus, so join buckets stay small. A
  * length filter (min·100 ≥ pct·max) prunes candidates whose sizes alone
  * cap Jaccard below t before any set is compared.
  *
  * Plan shape: one shingle explode (fanned out), one hash-agg for
  * document frequency, one per-document rank window (shuffles shingle
  * rows by doc id), the prefix equi-join on rare shingles, the PPJoin
  * POSITIONAL filter (first-common-shingle upper bound, a groupBy-min
  * per candidate pair — lossless), then a TWO-STAGE verify on candidate
  * ids only: a 4-byte-hash-set prefilter (sound: hash Jaccard can only
  * over-estimate unless a doc has a within-doc hash collision, which is
  * detected exactly and routed to the exact stage) followed by the
  * exact string-set compare on survivors — the wide join never carries
  * the string arrays (measured 4× at a 100× corpus, PLANS round 17).
  * The threshold compare is pure integer arithmetic on both engine and
  * oracle sides (inter·100 ≥ pct·union — house rule 1); the float
  * Jaccard is an output-only column. Null/empty text yields no shingles
  * and therefore no membership in any pair (rule-10 explicit policy; ''
  * shingles from empty text are dropped on both sides).
  *
  * Skew refuse-guard: if any prefix-shingle join bucket exceeds
  * `graft.setjoin.maxPrefixBucket` (default 1,000,000) the join REFUSES
  * with remediation instead of silently dropping pairs — dropping would
  * break the exactness contract that is this operator's whole point, and
  * a bucket that size means the corpus is so self-similar that the exact
  * output is quadratic anyway (the MinHash path is the remediation).
  *
  * REDUNDANCY CUTOVER, measured (r18, 5k-doc base, clean host): exact
  * output is Σ_g C(|g|,2) pairs over duplicate groups g, so copy-heavy
  * corpora pay quadratically in the per-group copy count r — at
  * r = 1/2/4/8 exact copies per doc the join produced 256 / 6,024 /
  * 34,096 / 156,384 pairs in 9.5 / 7.0 / 8.9 / 14.2 s, while a plain
  * content-hash exact dedup stayed FLAT at 0.6 s and collapsed every
  * group. MinHash candidates share the quadratic pair count on such
  * corpora (372k pairs at r=8) at a ~5x lower constant but without the
  * no-missed-pair guarantee. The cutover rule that follows: collapse
  * EXACT copies first ([[Dedup]] exact dedup — linear, and it returns
  * this join's pair count to the base corpus's), run the exact join on
  * canonical docs; reach for [[Dedup.minhashCandidates]] only when the
  * redundancy is genuine NEAR-duplication that exact collapsing cannot
  * remove and the recall contract can relax. On prefixed (non-cross-
  * duplicating) replicas the join itself scales sublinearly in rows:
  * 9.2 s at 100x and 48.5 s warm at 1000x (5M docs) for the AB form —
  * docs/SCALE.md.
  *
  * Release contract: the returned frame is persisted and eagerly
  * materialized (so the pipeline's internal caches can release
  * immediately); the CALLER owns the returned frame's unpersist. The
  * skew-guard probe reads the already-persisted prefix frame, so its
  * marginal cost is one cached aggregate, not a plan re-run.
  */
object SetSimJoin {

  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** All pairs (id_a < id_b) within one corpus with word-`shingleSize`-gram
    * Jaccard ≥ thresholdPct/100, with the exact Jaccard (round 6) per pair.
    * Output: (id_a, id_b, jaccard).
    */
  def jaccardJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      thresholdPct: Int = 80,
      shingleSize: Int = 3): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 100,
      s"thresholdPct must be in [1,100], got $thresholdPct")
    val tagged = docs.select(lit("x").as("sd"),
      col(idCol).as("id"), col(textCol).as("__txt"))
    // self-join: both sides draw from the one tag; id_a < id_b halves the
    // candidate space and fixes the output orientation
    exactPairs(tagged, "x", "x", col("id_a") < col("id_b"),
      thresholdPct, shingleSize)
  }

  /** All CROSS-corpus pairs (one doc from `left`, one from `right`) with
    * word-`shingleSize`-gram Jaccard ≥ thresholdPct/100. Within-corpus
    * pairs are never emitted, ids never compare across sides (the two
    * corpora may share or even collide ids — sides keep them distinct),
    * and a document present verbatim in both corpora reports itself at
    * jaccard 1.0, which is exactly the cross-snapshot audit signal.
    * Output: (id_a, id_b, jaccard) with id_a from `left`, id_b from
    * `right`. Shingle document frequencies — hence prefix ranks — are
    * computed over the UNION of both corpora so the positional filter's
    * shared global order holds across sides.
    */
  def jaccardJoinAB(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      thresholdPct: Int = 80,
      shingleSize: Int = 3): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 100,
      s"thresholdPct must be in [1,100], got $thresholdPct")
    val tagged = left.select(lit("a").as("sd"),
        col(idCol).as("id"), col(textCol).as("__txt"))
      .unionByName(right.select(lit("b").as("sd"),
        col(idCol).as("id"), col(textCol).as("__txt")))
    exactPairs(tagged, "a", "b", lit(true), thresholdPct, shingleSize)
  }

  /** The shared AllPairs/PPJoin pipeline over a side-tagged corpus
    * (sd, id, __txt). `aSide`/`bSide` select which tag feeds each join
    * side; `pairPred` is the extra pair predicate on (id_a, id_b) —
    * id_a < id_b for the self-join, true for the cross join (sides
    * already distinguish the corpora).
    */
  private def exactPairs(
      tagged: DataFrame,
      aSide: String,
      bSide: String,
      pairPred: Column,
      thresholdPct: Int,
      shingleSize: Int): DataFrame = {
    val spark = tagged.sparkSession
    val pct = lit(thresholdPct.toLong)
    // Suppress InferFiltersFromGenerate for this pipeline's actions
    // (r19 advice): with explode's child an attribute (__shs), the rule
    // infers `size(__shs) > 0`, and predicate pushdown inlines the WHOLE
    // shingle expression into the parquet-scan filter — the rule-11
    // re-evaluation trap, paying the hottest expression twice per input
    // row (the q_jaccard_join entry even re-pays its caller's
    // split/slice/concat_ws text truncation). The filter only drops
    // null-text rows, which the explode drops anyway (empty array emits
    // nothing), so it prunes almost nothing. Every action of this
    // pipeline runs inside this function (the result is materialized
    // before return), so the exclusion is scoped-and-restored here; the
    // returned frame re-reads its cache, never re-optimizes.
    // PlanShapeSpec pins the shingle-free scan filters.
    val exclKey = "spark.sql.optimizer.excludedRules"
    val inferRule =
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val prevExcl = spark.conf.getOption(exclKey)
    spark.conf.set(exclKey, (prevExcl.toSeq :+ inferRule).mkString(","))
    try exactPairsBody(tagged, aSide, bSide, pairPred, pct, shingleSize, spark)
    finally prevExcl match {
      case Some(p) => spark.conf.set(exclKey, p)
      case None => spark.conf.unset(exclKey)
    }
  }

  private def exactPairsBody(
      tagged: DataFrame,
      aSide: String,
      bSide: String,
      pairPred: Column,
      pct: Column,
      shingleSize: Int,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {

    // (sd, id, len, shingle): DISTINCT word shingles per doc; null text ->
    // none, '' (from empty text) dropped. `len` (the doc's post-filter
    // distinct-shingle count) is computed FROM THE ARRAY at explode time —
    // the array is distinct, so '' appears at most once and
    // len = size(arr) − [arr contains ''] equals exactly the former
    // count-over-(sd,id) window; that removes one of the two Window
    // passes over the full shingle-row table (r19, guide §2.4 — the
    // rank window below still pays the one (sd,id) exchange+sort).
    // The array lands in its own projection first so the shingle
    // expression is evaluated ONCE (CollapseProject keeps multiply-
    // referenced non-trivial aliases materialized; rule 11) — which
    // holds only because [[exactPairs]] excludes
    // InferFiltersFromGenerate for this pipeline: with __shs an
    // attribute under explode, that rule would infer size(__shs) > 0
    // and pushdown would inline the whole shingle tree into the scan
    // filter, re-evaluating it per input row (r19 advice; PlanShapeSpec
    // pins the shingle-free scan).
    // Persisted: read by the df pass, the rank pass and the verify join.
    val sh = Dedup.fanOut(tagged)
      .select(col("sd"), col("id"),
        TextOps.wordShingles(col("__txt"), shingleSize).as("__shs"))
      .select(col("sd"), col("id"),
        (size(col("__shs")).cast("long") -
          when(array_contains(col("__shs"), ""), 1L).otherwise(0L)).as("len"),
        explode(col("__shs")).as("s"))
      .where(col("s") =!= "")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // document frequency over EVERYTHING (both sides of an AB join): one
    // global rarest-first order shared by every prefix, which is what
    // makes the positional filter's first-common-shingle bound valid
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfreq, "s")
      .withColumn("r", row_number().over(
        Window.partitionBy("sd", "id").orderBy(col("df"), col("s"))))
    // prefix length p = len - ceil(len*pct/100) + 1 (pigeonhole bound);
    // the rank rides along for the positional filter below
    val prefix = ranked
      .where(col("r") <= col("len") - idiv(col("len") * pct + lit(99L), lit(100L)) + lit(1L))
      .select(col("s"), col("sd"), col("id"), col("len"), col("r"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val maxBucket = graft.util.Conf.long(
      spark, "graft.setjoin.maxPrefixBucket", 1000000L)
    // Deliberately a SEPARATE eager action (r19 verdict #6 adjudication):
    // folding this guard into the main job (e.g. a raise_error branch
    // cross-joined into the pipeline) would let the quadratic candidate
    // join's stages LAUNCH before the guard aggregation completes —
    // stages schedule bottom-up, so the refusal would arrive after the
    // blow-up it exists to prevent; and a sampled bound either
    // false-refuses (breaking the exactness contract's availability) or
    // misses the hot bucket. The job is not wasted work: it is what
    // materializes the sh/prefix caches the main job then reuses — its
    // marginal cost is one aggregation over the cached prefix frame.
    val worst = prefix.groupBy("s").agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
    if (worst > maxBucket) {
      prefix.unpersist(); sh.unpersist()
      throw new IllegalArgumentException(
        s"jaccardJoin: a prefix-shingle bucket has $worst documents (cap " +
          s"$maxBucket via graft.setjoin.maxPrefixBucket). Exact-recall " +
          "joining cannot drop buckets without breaking its no-missed-pair " +
          "contract, and a bucket this size makes the exact output itself " +
          "near-quadratic (pairs = sum over duplicate groups g of C(|g|,2) " +
          "- measured 6k/34k/156k pairs at 2/4/8 copies per doc on a 5k " +
          "base). Remediation, in order: (1) collapse EXACT copies first " +
          "with content-hash dedup (linear, restores the base pair count), " +
          "then re-run this join on canonical docs; (2) if the redundancy " +
          "is genuine near-duplication, use Dedup.minhashCandidates " +
          "(bounded false-negative rate, bounded buckets) for this corpus.")
    }

    // Distinct alias names on each side: a self-join on the SAME cached
    // plan with a shared column name resolves to a trivially-true
    // predicate (both sides bind to one attribute) and the prefix filter
    // silently vanishes from the plan.
    val a = prefix.where(col("sd") === aSide).select(col("s").as("s_a"),
      col("id").as("id_a"), col("len").as("len_a"), col("r").as("r_a"))
    val b = prefix.where(col("sd") === bSide).select(col("s").as("s_b"),
      col("id").as("id_b"), col("len").as("len_b"), col("r").as("r_b"))
    // POSITIONAL filter (PPJoin lemma 1, Xiao et al. WWW'08): both lists
    // are sorted by the SAME global (df, shingle) order, so at the FIRST
    // common shingle (minimal rank match) the two prefixes before it
    // share nothing, hence inter <= 1 + min(len_a - r_a, len_b - r_b).
    // J >= t  <=>  inter*(100+pct) >= pct*(la+lb), so pairs whose upper
    // bound misses that line are pruned LOSSLESSLY before any set is
    // materialized — on collision-dense corpora this removes most of the
    // one-shared-rare-shingle noise the prefix join admits.
    val candUb = a.join(b,
        col("s_a") === col("s_b") && pairPred &&
          least(col("len_a"), col("len_b")) * lit(100L) >=
            pct * greatest(col("len_a"), col("len_b")))
      .groupBy(col("id_a"), col("id_b"), col("len_a"), col("len_b"))
      .agg(min(struct(col("r_a"), col("r_b"))).as("fm"))
      .where((lit(1L) + least(col("len_a") - col("fm.r_a"),
          col("len_b") - col("fm.r_b"))) * (lit(100L) + pct) >=
        pct * (col("len_a") + col("len_b")))
      .select(col("id_a"), col("id_b"))

    // Two-stage verify. Stage 1 (cheap, array of 4-byte int hashes): the
    // hash-set Jaccard can only OVER-estimate the true one when neither
    // doc has a WITHIN-doc hash collision (cross-doc collisions add to
    // the intersection, within-doc collisions shrink a set) — and
    // within-doc collisions are detected EXACTLY by size(hash set) <
    // size(string set), which routes those rare docs (p ~ len²/2³³)
    // straight to stage 2. So the prefilter is sound: no qualifying pair
    // can fail it. Stage 2: exact string-set verify, now over surviving
    // pairs only instead of every candidate — the string arrays, ~10x
    // the bytes of the int arrays, never ride the wide join.
    // Persisted: the agg (with its expensive sort_array(collect_list))
    // would otherwise recompute for each of the four joins below (two
    // hash-prefilter sides, two exact-verify sides). Sets are keyed by
    // (sd, id): an AB join's corpora may collide on ids, so the verify
    // sides each draw from their OWN corpus only.
    // Measured and REVERTED (r20, guide §1): semi-joining sh against
    // the candidate ids before this aggregation ("build sets only for
    // candidate docs") benched 1.34-1.58x SLOWER at REPEAT=5 — with and
    // without persisting candUb — because it serializes the sets
    // aggregation behind the whole candidate join and pays a probe per
    // shingle row, while this full-corpus agg runs concurrently in the
    // same job and its output is only doc-count-sized rows.
    val sets = sh.groupBy("sd", "id").agg(
      sort_array(collect_list("s")).as("sh"),
      sort_array(collect_set(hash(col("s")))).as("hs"),
      count(lit(1)).as("len"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def hsetsOf(side: String): DataFrame = sets.where(col("sd") === side)
      .select(col("id"), col("hs"), col("len"),
        (size(col("hs")).cast("long") < col("len")).as("degen"))
    val prefiltered = candUb
      .join(hsetsOf(aSide).select(col("id").as("id_a"), col("hs").as("hs_a"),
        col("len").as("la"), col("degen").as("dg_a")), "id_a")
      .join(hsetsOf(bSide).select(col("id").as("id_b"), col("hs").as("hs_b"),
        col("len").as("lb"), col("degen").as("dg_b")), "id_b")
      .withColumn("ih", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .where(col("dg_a") || col("dg_b") ||
        col("ih") * lit(100L) >= pct * (col("la") + col("lb") - col("ih")))
      .select(col("id_a"), col("id_b"))
    def strsetsOf(side: String): DataFrame = sets.where(col("sd") === side)
    val result = prefiltered
      .join(strsetsOf(aSide).select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("len").as("la")), "id_a")
      .join(strsetsOf(bSide).select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("len").as("lb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni", col("la") + col("lb") - col("inter"))
      .where(col("inter") * lit(100L) >= pct * col("uni"))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
    // Same release discipline as embeddingNearDup: materialize the pairs
    // eagerly (persist+count, releasable), then drop the two internal
    // caches instead of pinning them for the caller's lifetime. The
    // CALLER owns the returned frame's release.
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sets.unpersist()
    prefix.unpersist()
    sh.unpersist()
    out
  }
}
