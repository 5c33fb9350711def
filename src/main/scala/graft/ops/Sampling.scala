package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling, domain mixing, and data-selection operators
  * for corpus construction.
  *
  * Everything here derives its randomness from a PORTABLE keyed hash
  * (md5 of "seed:key", first 32 bits → uniform in [0,1)), never from
  * `rand()` or `df.sample`. That buys three properties Spark's built-in
  * sampling does not have at cluster scale:
  *
  *  - **partition-independent**: the verdict for a row depends only on
  *    (seed, key) — repartitioning, AQE re-planning, or a different
  *    cluster layout cannot change which rows are sampled;
  *  - **retry-stable**: a re-executed task (speculative or recovered)
  *    re-derives the identical sample, so downstream counts cannot drift
  *    mid-job (rand()-based filters are famously non-idempotent under
  *    task retry);
  *  - **engine-portable**: the same expression evaluates identically in
  *    any SQL engine, so every sample here is DuckDB-oracle-checkable.
  *
  * All operators are single-pass projections/filters (plus one k-row
  * aggregate for [[mixturePlan]] and a per-domain window for
  * [[budgetSelect]]) — no shuffle beyond what the semantics require.
  */
object Sampling {

  /** Portable deterministic uniform in [0,1): first 8 hex digits of
    * md5("seed:key") as a 32-bit integer, scaled. Engine-portable SQL:
    * `('0x' || substr(md5(seed || ':' || key), 1, 8))::UBIGINT / 2^32`.
    */
  def uniform(key: Column, seed: String): Column =
    uniformBits(key, seed).cast("double") / lit(4294967296.0)

  /** The raw 32-bit integer behind [[uniform]] — use THIS when the hash
    * must drive an ordering (rule-1: integers order contracts, floats
    * don't). Engine-portable SQL:
    * `('0x' || substr(md5(seed || ':' || key), 1, 8))::UBIGINT`.
    */
  def uniformBits(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** 60-bit variant of [[uniformBits]] for contracts where the hash
    * drives a GLOBAL ORDERING over many keys rather than a per-key
    * [0,1) draw: 32 bits start tying at the birthday scale (~2^16
    * keys), and a bottom-k cut at a tied rank key would bias the
    * selection toward its tie-break column ([[QuantileSketch]]'s
    * order-statistics sample). 15 hex chars keep the value in exact
    * signed-64 range in every engine (the same 60-bit budget as
    * [[SketchIo.xorDigest]]). Engine-portable SQL:
    * `('0x' || substr(md5(seed || ':' || key), 1, 15))::UBIGINT`.
    */
  def uniformBits60(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic Bernoulli sample: keep rows whose keyed uniform falls
    * below `fraction`. Unlike `df.sample`, reproducible across runs,
    * partitionings, and task retries.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: String): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.where(uniform(col(keyCol), seed) < lit(fraction))
  }

  /** Per-stratum deterministic sampling: each stratum (language, source,
    * quality bucket, ...) keeps its own fraction; strata absent from
    * `rates` fall back to `defaultRate`. One projection + filter — the
    * rate lookup is a literal map, not a join.
    */
  def sampleByStrata(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      seed: String): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "all rates must be in [0,1]")
    val rateMap = map(rates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val rate = coalesce(element_at(rateMap, col(strataCol).cast("string")), lit(defaultRate))
    df.where(uniform(col(keyCol), seed) < rate)
  }

  /** Weighted sample of `n` rows WITHOUT replacement, one pass, no
    * iteration: the Efraimidis–Spirakis (2006) exponential-key scheme —
    * score every row u^(1/w) with its keyed uniform u and weight w, take
    * the top n by score. Inclusion probability is proportional to weight
    * at each of the n sequential draws. Rows with weight <= 0 or null
    * are excluded. Plans as TakeOrdered (map-side per-partition top-n,
    * then an n-row merge on the driver side of the shuffle) — no global
    * sort materializes.
    */
  def weightedSampleN(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      n: Int,
      seed: String): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val score = pow(uniform(col(keyCol), seed), lit(1.0) / col(weightCol).cast("double"))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_score", score)
      .orderBy(col("sample_score").desc, col(keyCol))
      .limit(n)
  }

  /** Max-retention sampling plan for a target domain mixture: given the
    * available token mass per domain and target weights, find the largest
    * corpus honoring the target proportions EXACTLY without upsampling
    * any domain, and the per-domain sampling rate that realizes it.
    *
    * scale = min over target domains of available_d / target_d;
    * planned_d = scale * target_d; rate_d = planned_d / available_d
    * (the binding domain keeps rate 1.0). Domains with no target weight
    * get rate 0. Targets are normalized to sum to 1 first.
    *
    * EVERY target domain produces an output row: a domain absent from
    * the corpus (or with zero weight mass) emits available=0 and forces
    * scale=0 — every row's rate/planned collapses to 0, so an
    * unsatisfiable mixture is VISIBLE in the plan instead of being
    * silently re-normalized over the domains that happen to exist
    * (which would no longer realize the target proportions).
    *
    * Output: (domain, available, target_weight, rate, planned) — one row
    * per target domain. Feed the rates to [[sampleByStrata]].
    */
  def mixturePlan(
      df: DataFrame,
      domainCol: String,
      weightCol: Column,
      target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0.0),
      "target must be non-empty with positive weights")
    val total = target.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    val targetDf = target.toSeq.map { case (d, w) => (d, w / total) }
      .toDF("domain", "target_weight")
    // restrict the aggregation to TARGET domains before grouping: the
    // corpus may carry unboundedly many distinct domains (hosts, URLs),
    // and only the target's k rows matter — the isin filter pushes to the
    // scan and bounds the aggregate (and the broadcast below) at k rows
    val targetKeys = target.keySet.toSeq
    val avail = df.select(col(domainCol).cast("string").as("domain"), weightCol.as("__w"))
      .where(col("domain").isin(targetKeys: _*))
      .groupBy(col("domain")).agg(sum(col("__w")).cast("double").as("available"))
    planFromAvail(avail, targetDf)
  }

  /** Shared tail of [[mixturePlan]] and [[temperaturePlan]]: the
    * max-retention realization from an already-aggregated k-row
    * (domain, available) frame and a k-row (domain, target_weight)
    * frame with normalized weights.
    */
  private def planFromAvail(avail: DataFrame, targetDf: DataFrame): DataFrame = {
    // LEFT join from the target side: a target domain the corpus cannot
    // supply must not vanish from the plan (avail is at most k rows,
    // so broadcasting it is free)
    val joined = targetDf.join(broadcast(avail), Seq("domain"), "left")
      .select(col("domain"),
        coalesce(col("available"), lit(0.0)).as("available"), col("target_weight"))
    // the limiting domain: one scalar, computed distributed then crossed
    // back in (the frame is k rows — domains — so this is all tiny)
    val scale = joined.agg(min(col("available") / col("target_weight")).as("__scale"))
    joined.crossJoin(broadcast(scale))
      .select(col("domain"), col("available"), col("target_weight"),
        when(col("available") === 0.0, lit(0.0))
          .otherwise(col("__scale") * col("target_weight") / col("available")).as("rate"),
        (col("__scale") * col("target_weight")).as("planned"))
  }

  /** Temperature-flattened mixture plan — the multilingual "α/temperature
    * sampling" rule (mBERT exponent-smoothed sampling; XLM-R, Conneau et
    * al. 2020 §3.1; mT5's τ): target share of domain d is
    * c_d^(1/τ) / Σ c^(1/τ), flattening the head and boosting the tail as
    * τ grows (τ = 1 keeps natural proportions; τ → ∞ approaches uniform).
    * The realized plan is [[mixturePlan]]'s max-retention solution for
    * that target — the largest corpus honoring the flattened shares with
    * NO domain upsampled — so the output schema and the rate semantics
    * are identical and the rates feed [[sampleByStrata]] unchanged.
    *
    * Shape: one k-row aggregate over the domain column collects the
    * available mass (driver-capped via `graft.mixture.maxDomains`,
    * default 10000 — temperature sampling is a languages/sources-level
    * tool, not a per-host one), computes the k target shares in closed
    * form, and delegates. Returns (domain, available, target_weight,
    * rate, planned).
    */
  def temperaturePlan(
      df: DataFrame,
      domainCol: String,
      weightCol: Column,
      temperature: Double): DataFrame = {
    require(temperature > 0.0, s"temperature must be positive, got $temperature")
    val spark = df.sparkSession
    val cap = graft.util.Conf.long(spark, "graft.mixture.maxDomains", 10000L)
    val avail = df.select(col(domainCol).cast("string").as("domain"), weightCol.as("__w"))
      .groupBy(col("domain")).agg(sum(col("__w")).cast("double").as("available"))
      .limit(math.min(cap + 1, Int.MaxValue.toLong - 1).toInt)
      .collect()
    require(avail.length <= cap,
      s"distinct domains exceed graft.mixture.maxDomains=$cap; temperature " +
        "sampling targets a bounded domain axis (languages/sources) — " +
        "pre-bucket the domain column or raise the cap")
    val live = avail.filter(r => !r.isNullAt(0) && !r.isNullAt(1) && r.getDouble(1) > 0.0)
    require(live.nonEmpty, "no domain carries positive weight mass")
    val pows = live.map(r => r.getString(0) -> math.pow(r.getDouble(1), 1.0 / temperature))
    val total = pows.map(_._2).sum
    // the aggregate already ran once — reuse its k collected rows for
    // both the availability frame and the flattened targets instead of
    // re-scanning the corpus through mixturePlan
    import spark.implicits._
    val availDf = live.map(r => (r.getString(0), r.getDouble(1))).toIndexedSeq
      .toDF("domain", "available")
    val targetDf = pows.map { case (d, w) => (d, w / total) }.toIndexedSeq
      .toDF("domain", "target_weight")
    planFromAvail(availDf, targetDf)
  }

  /** Quality-first selection under a per-domain token budget: within each
    * domain take documents in (quality desc, key asc) order while the
    * running token total BEFORE the document is inside the budget — the
    * greedy prefix rule, so the first document of a domain is always
    * taken (a budget smaller than every document still yields one doc
    * per domain, never zero).
    *
    * One window per domain (hash-partitioned sort); the output carries
    * the running total for auditability.
    */
  def budgetSelect(
      df: DataFrame,
      domainCol: String,
      keyCol: String,
      qualityCol: Column,
      tokenCol: Column,
      budgetPerDomain: Long): DataFrame = {
    require(budgetPerDomain > 0, s"budget must be positive, got $budgetPerDomain")
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("quality").desc, col("key").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(domainCol).as("domain"), col(keyCol).as("key"),
        qualityCol.as("quality"), tokenCol.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") - col("n_tokens") < lit(budgetPerDomain))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw document
    * by how much more likely a unigram LM fit on the TARGET corpus finds
    * it than a unigram LM fit on the RAW corpus itself —
    * `logw = Σ_tokens [log p_target(tok) − log p_raw(tok)]` with add-α
    * smoothing over the union vocabulary. High logw = "looks like the
    * target domain"; feed the result to [[dsirSelect]] (Gumbel top-k) for
    * the paper's resampling step.
    *
    * Shape: one vocab hash-agg per corpus (map-side combined), totals and
    * union-vocab size as lazy one-row aggregates, one keyed join of the
    * raw token stream against the (vocab-sized) log-ratio table, one
    * per-doc roll-up. Nothing collects; the token join is the same
    * AQE-planned shape as [[TextOps.tfidf]]. Tokenization is the shared
    * space-split/drop-empties contract.
    *
    * Returns (doc_id, n_tokens, logw) — logw rounded to 6dp for
    * engine-portable comparison.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      smoothing: Double = 1.0): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be positive, got $smoothing")
    def toks(df: DataFrame, id: Column): DataFrame =
      Dedup.fanOut(df.select(id, col(textCol).as("__text")))
        .select(col("doc_id"), explode(split(col("__text"), " ")).as("token"))
        .where(col("token") =!= "")
    val rawToks = toks(raw, col(idCol).cast("long").as("doc_id"))
    val tgtToks = toks(target, col(idCol).cast("long").as("doc_id"))
    val rawCnt = rawToks.groupBy(col("token")).agg(count(lit(1)).as("rc"))
    val tgtCnt = tgtToks.groupBy(col("token")).agg(count(lit(1)).as("tc"))
    // union vocabulary with both counts (absent side = 0)
    val vocab = rawCnt.join(tgtCnt, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    val tot = vocab.agg(sum(col("rc")).cast("double").as("__rtot"),
      sum(col("tc")).cast("double").as("__ttot"),
      count(lit(1)).cast("double").as("__v"))
    val ratio = vocab.crossJoin(broadcast(tot))
      .select(col("token"),
        (log((col("tc") + lit(smoothing)) / (col("__ttot") + lit(smoothing) * col("__v"))) -
          log((col("rc") + lit(smoothing)) / (col("__rtot") + lit(smoothing) * col("__v"))))
          .as("__lr"))
    rawToks.join(ratio, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (round(sum(col("__lr")), 6) + lit(0.0)).as("logw"))
  }

  /** DSIR selection: Gumbel top-`n` over the importance weights — sample
    * n documents WITHOUT replacement with probability proportional to
    * their (unnormalized) importance weight exp(logw), the Gumbel-max
    * resampling of the DSIR paper. The Gumbel noise derives from the
    * keyed [[uniform]] (g = −log(−log u)), so the draw is deterministic,
    * retry-stable, and oracle-checkable. Plans as TakeOrdered — map-side
    * per-partition top-n, an n-row driver merge, no global sort.
    */
  def dsirSelect(
      weights: DataFrame,
      keyCol: String,
      n: Int,
      seed: String): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val gumbel = -log(-log(uniform(col(keyCol), seed)))
    weights.withColumn("gumbel_score", col("logw") + gumbel)
      .orderBy(col("gumbel_score").desc, col(keyCol))
      .limit(n)
  }

  /** Temporal train/test split with an embargo gap — the eval-hygiene
    * rule for TIME-structured data (forecasting, event models, any
    * corpus where "the future leaks into the past" is the failure
    * mode), complementing the content-hash [[graft.ops.TextOps
    * .splitByHash]] (i.i.d. data) and `Dedup.leakageSafeSplit`
    * (near-dup groups): rows at or before `cutoff` are `train`, rows
    * inside (cutoff, cutoff + embargo] are `embargo` (discarded from
    * both sides — they straddle the boundary via label horizons or
    * session overlap), later rows are `test`. A null (or uncastable)
    * timestamp FAILS with remediation rather than silently leaking an
    * unknown-time row into the test split. Pure integer-comparison
    * projection: no shuffle, stream-safe, trivially engine-portable
    * (q_time_split).
    */
  def timeSplit(
      df: DataFrame,
      tsCol: String,
      cutoff: Long,
      embargo: Long = 0L): DataFrame = {
    require(embargo >= 0, s"timeSplit: embargo must be >= 0, got $embargo")
    df.withColumn("split",
      when(col(tsCol).cast("long").isNull,
        raise_error(lit(s"timeSplit: null or non-long-castable $tsCol — " +
          "filter or impute timestamps before splitting")))
        .when(col(tsCol).cast("long") <= cutoff, lit("train"))
        .when(col(tsCol).cast("long") <= cutoff + embargo, lit("embargo"))
        .otherwise(lit("test")))
  }

  /** Deterministic global shuffle — the training-order scramble: total
    * order by (keyed uniform, key). Plans as a range-partitioned sort
    * (sample → range boundaries → per-partition sort), so it scales as
    * ordinary distributed sorting; the order is a pure function of
    * (seed, key) and therefore identical on every run and layout.
    * Writing the result preserves the order within each output file and
    * across files by partition index — the standard contract for
    * pre-shuffled training shards.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key", uniform(col(keyCol), seed))
      .orderBy(col("shuffle_key"), col(keyCol))

  /** EXACT deterministic top-`fraction` selection by a scored INTEGER
    * column — the "keep the best X% by quality" stage of a selection
    * pipeline — WITHOUT a global sort or single-partition window:
    *
    *  1. per-score counts (two-phase map-side-combined aggregation; the
    *     shuffle carries one row per DISTINCT score, bounded by the
    *     score domain, never data rows),
    *  2. driver cumulative sum over the distinct scores (descending)
    *     finds the boundary score T where the budget k = ceil(f·n)
    *     crosses — capped by `graft.select.maxDistinctScores`
    *     (default 10M ≈ 160 MB; a micro-unit score domain),
    *  3. rows with score > T survive outright (a filter on the scan);
    *     the boundary score's remainder is filled by lowest id — a
    *     sort+limit over ONLY the boundary rows (tiny by construction).
    *
    * Selection order contract: (score desc, id asc) — identical to the
    * SQL window `row_number() OVER (ORDER BY score DESC, id ASC) <= k`
    * that oracles it (q_select_top_quality), but executed without the
    * window's single-partition bottleneck. Returns the selected
    * (idCol, scoreCol) rows.
    */
  def selectTopByScore(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction must be in (0,1], got $fraction")
    val spark = df.sparkSession
    val scored = df.select(col(idCol), col(scoreCol).cast("long").as(scoreCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = scored.count()
      if (n == 0) return scored.limit(0)
      val k = math.ceil(fraction * n).toLong
      val cap = graft.util.Conf.long(spark, "graft.select.maxDistinctScores", 10000000L)
      val hist = scored.groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
        .orderBy(col(scoreCol).desc)
        .limit(math.min(cap + 1, Int.MaxValue.toLong - 1).toInt)
        .collect()
      require(hist.length <= cap,
        s"distinct scores exceed graft.select.maxDistinctScores=$cap; " +
          "coarsen the score (fewer micro-digits) or raise the cap")
      require(hist.forall(!_.isNullAt(0)),
        s"$scoreCol contains nulls; the (score desc, id) order contract needs a total " +
          "integer order — filter or impute null scores first")
      var cum = 0L
      var i = 0
      while (i < hist.length && cum < k) { cum += hist(i).getLong(1); i += 1 }
      val boundary = hist(i - 1).getLong(0) // score where the budget crosses
      val aboveCount = cum - hist(i - 1).getLong(1)
      val remainder = k - aboveCount
      // the boundary fill is a TakeOrdered over ONLY score==T rows; its
      // size is data-dependent (heavy ties at T), so it is capped with
      // remediation rather than silently materializing O(k) driver rows
      val boundaryCap = graft.util.Conf.long(spark, "graft.select.maxBoundaryRows", 10000000L)
      require(remainder <= boundaryCap,
        s"boundary fill needs $remainder rows > graft.select.maxBoundaryRows=$boundaryCap; " +
          "the score ties too heavily at the cut — add a tiebreak digit to the score " +
          "(e.g. blend in a keyed hash) or raise the cap")
      val above = scored.where(col(scoreCol) > boundary)
      val atBoundary = scored.where(col(scoreCol) === boundary)
        .orderBy(col(idCol).asc)
        .limit(math.min(remainder, Int.MaxValue.toLong - 1).toInt)
      val out = above.unionByName(atBoundary)
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      out
    } finally { scored.unpersist(); () }
  }

  /** Per-domain document cap — the "no single site dominates the
    * corpus" selection step (C4 and Dolma cap documents per domain;
    * RefinedWeb's URL-level controls serve the same governance goal):
    * keep at most `maxDocs` documents of each domain, chosen by the
    * seeded portable hash order ([[uniformBits]], `idCol` ties) so the
    * kept set is a deterministic uniform subsample of the domain —
    * reproducible across runs, partitionings, and engines, and
    * rotatable by seed.
    *
    * Plan shape: one window `row_number` partitioned by domain over
    * (hash, id) — Spark's rank-limit pushdown (WindowGroupLimit, both
    * Partial and Final modes) prunes every map partition to its own
    * top-`maxDocs` per domain BEFORE the exchange, so the shuffle
    * carries at most `maxDocs`·(map tasks) rows per domain, never the
    * domain's full mass — the skew posture that survives a
    * billion-page domain. Asserted on the executed plan in
    * PlanShapeSpec.
    *
    * Returns the input columns plus `rk` (1-based keep rank), capped.
    */
  def capPerDomain(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      maxDocs: Long,
      seed: String): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol))
      .orderBy(uniformBits(col(idCol), seed).asc, col(idCol).asc)
    df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= lit(maxDocs))
  }

  /** Keep the `k` BEST documents of each domain by an integer score —
    * the quality-ranked counterpart of [[capPerDomain]] (random subsample)
    * and the count-capped counterpart of [[budgetSelect]] (token budget):
    * per domain, rows rank by (score desc, `idCol` asc) and ranks > k
    * drop. Same plan shape as [[capPerDomain]]: the rank filter plans
    * map-side WindowGroupLimit, so each map task forwards at most k rows
    * per domain and a billion-page domain never crosses the shuffle
    * whole (PlanShapeSpec asserts it on the executed plan).
    *
    * The ordering runs on `scoreCol` CAST TO LONG (rule-1: floats don't
    * order contracts — micro-unit quality scores are the house form;
    * a fractional score must be micro-scaled by the caller, not passed
    * raw). Rows whose cast score is null (null input or an uncastable
    * value) are dropped rather than silently ranked last — enforced the
    * same way [[selectTopByScore]] rejects null scores.
    * Returns the input columns plus `rk` (1-based quality rank), capped.
    */
  def topPerDomain(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      scoreCol: String,
      k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val scoreL = col(scoreCol).cast("long")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(scoreL.desc, col(idCol).asc)
    df.where(scoreL.isNotNull)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= lit(k))
  }

  /** Exact multi-way quantile bucketing by an INTEGER score, without a
    * global sort: every row is labeled with the bucket its global rank
    * (score descending, `idCol` ascending ties) falls in, where bucket
    * boundaries are integer-weight fractions of the row count —
    * k_j = ceil(n·(w_1+…+w_j)/W) in pure 64-bit arithmetic (CCNet's
    * head/middle/tail split is `weights = Seq(1,1,1)`). Contractually
    * equal to the single-window `row_number() OVER (ORDER BY score
    * DESC, id)` form, which is the oracle replay — but the PLAN never
    * materializes a one-partition total order: a per-score histogram
    * (two-phase hash agg, driver-capped like [[selectTopByScore]])
    * yields each distinct score's strictly-above cumulative count; the
    * global rank is then that count plus a PER-SCORE-PARTITIONED
    * row_number. The only skew exposure is tie mass at one score value
    * (micro-unit scores bound it in practice); everything else is
    * hash-partitioned.
    *
    * Returns (idCol, scoreCol, bucket) with `bucket` in `labels`.
    */
  def bucketByScore(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      weights: Seq[Int],
      labels: Seq[String]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0),
      s"weights must be positive, got $weights")
    require(labels.size == weights.size,
      s"labels (${labels.size}) and weights (${weights.size}) must align")
    require(labels.distinct.size == labels.size, s"labels must be distinct, got $labels")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val scored = df.select(col(idCol), col(scoreCol).cast("long").as(scoreCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = scored.count()
      if (n == 0) return scored.withColumn("bucket", lit(null).cast("string")).limit(0)
      val totalW = weights.map(_.toLong).sum
      val bounds = weights.map(_.toLong).scanLeft(0L)(_ + _).tail.dropRight(1)
        .map(pw => (n * pw + totalW - 1) / totalW) :+ n
      val cap = graft.util.Conf.long(spark, "graft.bucket.maxDistinctScores", 1000000L)
      val hist = scored.groupBy(col(scoreCol)).agg(count(lit(1)).as("__c"))
        .orderBy(col(scoreCol).desc)
        .limit(math.min(cap + 1, Int.MaxValue.toLong - 1).toInt)
        .collect()
      require(hist.length <= cap,
        s"distinct scores exceed graft.bucket.maxDistinctScores=$cap; " +
          "coarsen the score (fewer micro-digits) or raise the cap")
      require(hist.forall(!_.isNullAt(0)),
        s"$scoreCol contains nulls; the (score desc, id) rank contract needs a total " +
          "integer order — filter or impute null scores first")
      var cum = 0L
      val above = hist.map { r =>
        val row = (r.getLong(0), cum); cum += r.getLong(1); row
      }
      import spark.implicits._
      val aboveDf = broadcast(
        spark.createDataset(above.toIndexedSeq).toDF(scoreCol, "__above"))
      val rk = col("__above") +
        row_number().over(Window.partitionBy(col(scoreCol)).orderBy(col(idCol).asc))
      val bucket = bounds.zip(labels).reverse
        .foldLeft(lit(labels.last): Column) { case (acc, (k, lab)) =>
          when(rk <= lit(k), lit(lab)).otherwise(acc)
        }
      val out = scored.join(aboveDf, scoreCol)
        .select(col(idCol), col(scoreCol), bucket.as("bucket"))
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      out
    } finally { scored.unpersist(); () }
  }
}
