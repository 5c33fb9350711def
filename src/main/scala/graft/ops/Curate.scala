package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-call corpus curation — the standard LLM training-data pipeline
  * composed from the engine's oracle-checked pieces:
  *
  *   1. language filter (n-gram heuristic language ID)
  *   2. quality filter (length/stopword/punctuation score)
  *   3. exact dedup (survivor = min id per identical text)
  *   4. near-dup grouping (MinHash-banded candidates, exact word-shingle
  *      Jaccard confirm, connected components)
  *   5. representative selection (max quality, tie -> min id, per group)
  *
  * Every stage is a shuffle-based DataFrame transform (hash aggregations,
  * banded equi-joins, BSP label propagation) — no driver collection — so
  * the pipeline holds at corpus scale; and every stage is deterministic,
  * so the whole composition is DuckDB-oracle-checkable end to end
  * (harness query q_curate_corpus).
  */
object Curate {

  /** Curate `docs`, returning surviving (doc_id, quality, n_tokens) rows.
    *
    * OWNERSHIP: the returned DataFrame is persisted (already
    * materialized); the caller owns the release — same contract as
    * [[Dedup.minhashDedup]].
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.7,
      shingleSize: Int = 3): DataFrame = {
    // FUSED filter scan: language id, quality score, and token count in
    // ONE traversal per row (TextOps.langQuality) instead of ~5 — the
    // langid/quality/token semantics (and their SQL oracles) are
    // unchanged, only the number of passes over each document drops.
    // fanOut first: the scan is CPU-heavy per row and must not inherit a
    // single-row-group file's 1-task parallelism (same guard as Dedup).
    val base = Dedup.fanOut(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text")))
      .select(col("doc_id"), col("text"),
        TextOps.langQuality(col("text")).as("lq"))
      .where(col("lq._1") === lit(lang) && col("lq._2") >= lit(minQuality))
      .select(col("doc_id"), col("text"),
        col("lq._2").as("quality"), col("lq._3").as("n_tokens"))
    // exact dedup: one survivor per identical text; quality/n_tokens are
    // pure functions of the text, so min() over the group is THE group
    // value
    val uniq = base.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("quality")).as("quality"),
        min(col("n_tokens")).as("n_tokens"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.minhashDedup(uniq, "doc_id", "text",
      threshold = jaccardThreshold, shingleSize = shingleSize)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    pairs.unpersist()
    val labeled = uniq.join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
    // representative per component: lexicographic max of (quality, -id);
    // n_tokens rides along, so no re-tokenization pass runs on the output.
    // Docs outside any component key a singleton group, so ONE aggregation
    // pass covers representatives and singles — the two-branch filter +
    // union form scanned the joined frame twice. The group key is a
    // (is-singleton, id) struct: collision-free for ANY id domain,
    // including negative ids (a `-id - 1` arithmetic key would collide
    // with a real component label there and silently drop a survivor).
    val out = labeled
      .groupBy(struct(col("comp").isNull.as("s"),
        coalesce(col("comp"), col("doc_id")).as("k")).as("__grp"))
      .agg(max_by(struct(col("doc_id"), col("quality"), col("n_tokens")),
        struct(col("quality"), -col("doc_id"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), round(col("r.quality"), 6).as("quality"),
        col("r.n_tokens").cast("int").as("n_tokens"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    uniq.unpersist()
    out
  }

  /** [[curate]] followed by substring-level duplicate-SPAN cutting on the
    * surviving documents — the full Lee et al. 2022 order (document-level
    * dedup first, then ExactSubstr over what remains). Returns
    * (doc_id, quality, n_tokens, dup_tokens, dup_frac, clean_text):
    * `n_tokens`/`dup_tokens`/`dup_frac` from the span pass over the
    * SURVIVOR corpus, `clean_text` with every globally-duplicated
    * `spanMinLen`-token span removed. Both stages are independently
    * oracle-checked (q_curate_corpus, q_substring_dedup); the
    * composition is a keyed join of the two.
    *
    * OWNERSHIP: the returned frame is persisted and materialized; the
    * caller owns the release — same contract as [[curate]].
    */
  def curateAndCut(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.7,
      shingleSize: Int = 3,
      spanMinLen: Int = 50,
      spanMinCount: Int = 2): DataFrame = {
    val kept = curate(docs, idCol, textCol, lang, minQuality, jaccardThreshold,
      shingleSize)
    val survivors = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .join(kept.select(col("doc_id"), col("quality")), "doc_id")
    val cut = Dedup.substringDedup(survivors, "doc_id", "text",
      minLen = spanMinLen, minCount = spanMinCount)
    val out = cut.join(kept.select(col("doc_id"), col("quality")), "doc_id")
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("dup_tokens"), col("dup_frac"), col("clean_text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    kept.unpersist()
    out
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * `minHits` word `n`-grams with any document of an evaluation set.
    *
    * Scale shape: the EVAL side is the small one by construction, so its
    * distinct shingle set broadcasts; the training corpus is exploded to
    * (doc_id, shingle) and hash-joined against the broadcast — the big
    * side never shuffles, and the per-doc hit count is a map-side partial
    * aggregation. Returns (doc_id, n_hits, contaminated).
    *
    * PRECONDITION: `trainIdCol` values are unique. Duplicate ids combine
    * into ONE output row whose n_hits spans all duplicates' shingles
    * (and the final id join multiplies rows) — whereas the Bloom variant
    * probes per input row — so the documented cross-variant n_hits
    * relation only holds row-wise for unique ids.
    */
  /** @param hashShingles when true (the default — the 100 TB shape), both
    *   sides join on xxhash64 of the shingle instead of the string: the
    *   broadcast table carries 8-byte longs instead of ~n-word strings
    *   (an order of magnitude smaller for n=8), and the probe hashes once
    *   per shingle instead of comparing strings. Exact up to 64-bit hash
    *   collisions (~2^-64 per cross pair — vanishing at any real scale);
    *   the string path remains for engine-portable oracle replay.
    */
  def decontaminate(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      minHits: Int = 1,
      hashShingles: Boolean = true): DataFrame = {
    def key(c: Column): Column = if (hashShingles) xxhash64(c) else c
    // fanOut both shingle scans: shingle materialization is the CPU-heavy
    // map stage and must not serialize on a single-row-group input file
    val evalShingles = Dedup.fanOut(evalDocs.select(col(evalTextCol).as("__t")))
      .select(explode(TextOps.wordShingles(col("__t"), n)).as("__sh"))
      .select(key(col("__sh")).as("sh"))
      .distinct()
    val trainShingles = Dedup.fanOut(
      train.select(col(trainIdCol).cast("long").as("doc_id"), col(trainTextCol).as("__t")))
      .select(col("doc_id"), explode(TextOps.wordShingles(col("__t"), n)).as("__sh"))
      .select(col("doc_id"), key(col("__sh")).as("sh"))
    val hits = trainShingles
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    train.select(col(trainIdCol).cast("long").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** BLOOM-FILTER decontamination: the [[decontaminate]] contract (flag
    * training documents sharing at least `minHits` distinct word
    * `n`-grams with the eval set) probed against a Bloom filter of the
    * eval shingles instead of the exact set.
    *
    * WHY at 100 TB: the exact paths carry the eval side as either a
    * broadcast shingle table or a sorted 8-byte-per-shingle array
    * ([[decontaminateStream]]) — memory grows linearly with the eval
    * set and is hard-capped at 50M shingles (~400 MB). The Bloom image
    * is `bitsPerShingle` BITS per shingle regardless of string length
    * (10 bits/shingle ≈ 0.8% false positives at `numHashes` = 7): the
    * same 400 MB broadcast budget covers ~320M shingles, an 8×
    * headroom. The filter is built DISTRIBUTED with no dense bitset in
    * any task: each partition accumulates its set bits in a SPARSE word
    * map (bounded by `numHashes` × its own shingle count, never m/8),
    * the (wordIndex, bits) pairs OR-combine by key map-side, and only
    * the driver assembles the dense m/8-byte array — streamed, so peak
    * driver memory is m/8 plus one partition of pairs. False positives
    * only ever ADD flags (never drop a genuinely contaminated doc), the
    * right failure direction for decontamination; false-negative rate
    * is zero. NOTE the FP rate is PER SHINGLE: a doc probing D distinct
    * shingles is falsely flagged at minHits=1 with probability
    * ~1-(1-p)^D, so for long documents either raise `minHits` above the
    * expected false-hit count (~p·D) or spend more `bitsPerShingle`;
    * minHits=1 is for short eval-sized records.
    *
    * ENGINE-PORTABLE and fully deterministic: bit positions are
    * double-hashed from ONE md5 per shingle (Kirsch–Mitzenmacher:
    * `pos_i = (h1 + i·h2) mod m` with h1/h2 the digest's two unsigned
    * 8-byte halves mod m — one digest instead of `numHashes`, same FP
    * asymptotics), so an external SQL engine rebuilds the EXACT
    * filter — including its false positives — and the whole operator
    * hash-checks end to end (harness query q_bloom_decontaminate).
    * `portableHash = false` swaps both the image build and the probe
    * onto the xxhash64 position math ([[Bloom.positions]]) for ingest
    * loops that never replay externally — every membership property
    * (zero false negatives, deterministic FPs) holds identically,
    * spec-pinned in FastHashSpec.
    *
    * BROADCAST LIFETIME: the filter broadcast lives as long as the
    * returned plan — Spark's ContextCleaner removes it once the
    * DataFrame is garbage-collected on the driver. Long-running
    * services that rotate eval sets should call
    * [[decontaminateBloomTracked]] and `destroy()` the handle after
    * materializing the output (the same state-rotation discipline as
    * [[decontaminateStream]]).
    *
    * PRECONDITION: `trainIdCol` values are unique (one probe per input
    * row; see the row-shape note on [[decontaminate]]).
    *
    * Returns (doc_id, n_hits, contaminated) — n_hits counts the doc's
    * distinct shingles that pass the membership test (≥ the exact
    * operator's n_hits; equal when no false positive lands in the doc).
    */
  def decontaminateBloom(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      minHits: Int = 1,
      bitsPerShingle: Int = 10,
      numHashes: Int = 7,
      portableHash: Boolean = true): DataFrame =
    decontaminateBloomTracked(train, trainIdCol, trainTextCol, evalDocs,
      evalTextCol, n, minHits, bitsPerShingle, numHashes, portableHash)._1

  /** [[decontaminateBloom]] returning the filter broadcast alongside the
    * output, so callers that outlive the plan can `destroy()` it once
    * the output is materialized.
    */
  def decontaminateBloomTracked(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      minHits: Int = 1,
      bitsPerShingle: Int = 10,
      numHashes: Int = 7,
      portableHash: Boolean = true): (DataFrame, Broadcast[Array[Long]]) = {
    require(bitsPerShingle >= 2 && bitsPerShingle <= 64,
      s"bitsPerShingle must be in [2, 64], got $bitsPerShingle")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1, 16], got $numHashes")
    val spark = train.sparkSession
    // build and probe share ONE hash mode (Bloom.positions both sides);
    // fast mode loses only external SQL replay — the gate stays md5
    val (bitsArr, m) = bloomImage(evalDocs, evalTextCol, n, bitsPerShingle,
      numHashes, portableHash)
    val bc = spark.sparkContext.broadcast(bitsArr)
    (bloomProbe(train, trainIdCol, trainTextCol, n, minHits, bc, m,
      numHashes, portableHash), bc)
  }

  /** [[decontaminateBloom]] against a PREBUILT, persisted filter
    * ([[BloomSketch]]) instead of rebuilding the eval image per call —
    * the cross-snapshot path: build the eval-set filter once
    * (`BloomSketch.build` over the eval shingles, same `n`), persist
    * it, probe every future ingest batch at the cost of one m/8-byte
    * broadcast. Bit positions are the same math on both paths
    * ([[Bloom.positions]] — spec-pinned identical to this file's
    * builder), so a sketch-probed batch equals a rebuilt-filter batch
    * bit for bit WHEN the sketch was built over the same eval shingle
    * set and `n`.
    *
    * PRECONDITION (caller-owned, like every functional-API geometry
    * contract): the sketch's keys were `n`-word shingles; a mismatched
    * `n` probes a different shingle space and under-flags. Same
    * broadcast-lifetime note as [[decontaminateBloomTracked]] — the
    * returned broadcast is destroyable after materializing the output.
    */
  def decontaminateBloomPrebuilt(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      sketch: BloomSketch,
      n: Int = 8,
      minHits: Int = 1): (DataFrame, Broadcast[Array[Long]]) = {
    val bc = train.sparkSession.sparkContext.broadcast(sketch.dense())
    // probe in the sketch's OWN hash mode (the handle carries it): a
    // fast-built filter probed with md5 positions would false-negate
    // every inserted key — the cross-mode hazard the handles refuse at
    // merge time, closed here for the probe path too
    (bloomProbe(train, trainIdCol, trainTextCol, n, minHits, bc,
      sketch.numBits, sketch.numHashes, sketch.portableHash), bc)
  }

  /** Shared probe tail of the bloom decontamination paths: shingle the
    * train docs, count per-doc shingles whose k positions are all set
    * in the broadcast image, flag at `minHits`.
    */
  private def bloomProbe(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      n: Int,
      minHits: Int,
      bc: Broadcast[Array[Long]],
      m: Long,
      k: Int,
      portable: Boolean = true): DataFrame = {
    val probe = udf { (shs: Seq[String]) =>
      if (shs == null) 0L else bloomHits(bc.value, m, k, shs, portable)
    }
    Dedup.fanOut(train.select(col(trainIdCol).cast("long").as("doc_id"),
        col(trainTextCol).as("__t")))
      .select(col("doc_id"), probe(TextOps.wordShingles(col("__t"), n)).as("n_hits"))
      .select(col("doc_id"), col("n_hits"),
        (col("n_hits") >= minHits).as("contaminated"))
  }

  /** Distributed Bloom-image build shared by [[decontaminateBloom]] and
    * [[curateStream]]'s bloom eval filter: returns (dense bit words,
    * modulus m = max(1024, bitsPerShingle·nd)). m must travel WITH the
    * words — the array is padded to a multiple of 64 bits, so it cannot
    * be recovered from the array length. No dense bitset exists in any
    * task: a dense zeroValue would be serialized into the task binary
    * (closure serialization hard-fails near 2 GiB) and deserialized once
    * per concurrent task; instead each partition fills a SPARSE word map
    * bounded by numHashes × its own shingle count, the (wordIndex, bits)
    * pairs OR-combine by key map-side, and only the driver assembles the
    * dense array from a streamed iterator — peak driver memory is m/8
    * plus one partition of pairs.
    */
  private def bloomImage(
      evalDocs: DataFrame,
      evalTextCol: String,
      n: Int,
      bitsPerShingle: Int,
      numHashes: Int,
      portable: Boolean = true): (Array[Long], Long) = {
    val spark = evalDocs.sparkSession
    import spark.implicits._
    val k = numHashes
    // persist: the count (sizes m) and the build share one execution of
    // the shingle scan; finally releases even if the build job fails
    val evalShingles = Dedup.fanOut(evalDocs.select(col(evalTextCol).as("__t")))
      .select(explode(TextOps.wordShingles(col("__t"), n)).as("sh"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nd = evalShingles.count()
      // 1024-bit floor: at the 64-bit minimum a handful of shingles x
      // numHashes positions saturates the filter (observed ~88%
      // doc-level FP on a 6-shingle eval set); 128 bytes buys a
      // vanishing FP rate for tiny eval sets
      val mm = math.max(1024L, bitsPerShingle.toLong * nd)
      // capped by what a single broadcast + per-executor copy tolerates
      // (1 GiB dense image by default), NOT by what the build could
      // produce: the build itself is sparse end to end
      val bitCap = graft.util.Conf.long(spark,
        "graft.decontaminate.maxBloomBits", 1L << 33)
      // hard ceiling regardless of conf: word INDICES are Ints (2^37
      // bits = 2^31 words) and the dense image broadcasts whole — a
      // cap raised past that would overflow the build, not run it
      require(bitCap <= (1L << 36),
        s"graft.decontaminate.maxBloomBits = $bitCap exceeds the " +
          "implementation ceiling of 2^36 bits (8 GiB dense image; " +
          "int word indexing). Use the exact decontaminate paths or " +
          "shard the eval set instead.")
      require(mm <= bitCap,
        s"Bloom filter would need $mm bits, above the broadcast cap of " +
          s"$bitCap (default 2^33 = 1 GiB dense image). Shrink the eval " +
          "set, lower bitsPerShingle, or raise graft.decontaminate.maxBloomBits.")
      val words = ((mm + 63L) >>> 6).toInt
      val pairs = evalShingles.as[String].rdd.mapPartitions { it =>
        val local = new java.util.HashMap[Integer, java.lang.Long]()
        while (it.hasNext) {
          val sh = it.next()
          // ONE position definition for build and probe across the
          // whole membership surface (Bloom.positions) - a drifted
          // copy would silently desynchronize persisted filters
          val ps = Bloom.positions(sh, mm, k, portable)
          var i = 0
          while (i < k) {
            val pos = ps(i)
            val w = Integer.valueOf((pos >>> 6).toInt)
            val bit = 1L << (pos & 63L)
            val prev = local.get(w)
            local.put(w,
              java.lang.Long.valueOf(if (prev == null) bit else prev.longValue() | bit))
            i += 1
          }
        }
        import scala.jdk.CollectionConverters._
        local.entrySet().iterator().asScala
          .map(e => (e.getKey.intValue(), e.getValue.longValue()))
      }
      val dense = new Array[Long](words)
      pairs.reduceByKey(_ | _).toLocalIterator
        .foreach { case (w, bits) => dense(w) |= bits }
      (dense, mm)
    } finally evalShingles.unpersist()
  }

  /** Count of shingles whose k double-hashed positions are ALL set —
    * the shared executor-side probe (Kirsch–Mitzenmacher, one md5 per
    * shingle).
    */
  private def bloomHits(arr: Array[Long], m: Long, k: Int, shs: Seq[String],
      portable: Boolean = true): Long = {
    var hits = 0L
    val it = shs.iterator
    while (it.hasNext) {
      val sh = it.next()
      val ps = Bloom.positions(sh, m, k, portable) // single-sourced position math
      var i = 0
      var all = true
      while (i < k && all) {
        val pos = ps(i)
        if ((arr((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) all = false
        i += 1
      }
      if (all) hits += 1L
    }
    hits
  }

  /** FUZZY benchmark decontamination: flag training documents whose
    * word-`n`-gram Jaccard similarity with ANY evaluation document
    * reaches `threshold` — catches paraphrased and lightly-edited eval
    * copies that exact shingle matching ([[decontaminate]]) misses
    * (e.g. a reformatted benchmark question sharing no single exact
    * 8-gram but 80% of its 3-gram set).
    *
    * EXACT Jaccard, not MinHash: the eval side is small by construction,
    * so its full (eval_id, shingle) set broadcasts and the train side
    * never shuffles raw text — the only shuffled frame is the
    * (train_doc, eval_doc, partial intersection count) aggregate, which
    * map-side combines and is bounded by the pairs that actually share a
    * shingle. Per-doc shingle-set sizes ride the same projections. With
    * `hashShingles` (default — the 100 TB shape) the broadcast carries
    * 8-byte longs. Best-match selection is a rank-1 window per train doc
    * (plans as WindowGroupLimit partial/final).
    *
    * `metric` picks what "similar" means — and it matters for
    * decontamination: `"jaccard"` is symmetric overlap, but a LONG
    * training document that embeds a SHORT eval question whole has low
    * Jaccard and full CONTAINMENT (|A∩B| / |B|, the fraction of the
    * EVAL doc's shingles present in the train doc) — `"containment"`
    * is the right default when eval items can be quoted inside larger
    * pages. Both scores are always emitted; `metric` chooses which one
    * ranks the best match and trips `contaminated`.
    *
    * Returns one row per train doc: (doc_id, best_eval_id, jaccard,
    * containment, contaminated) — best_eval_id null and both scores 0.0
    * when the doc shares no shingle with any eval doc.
    */
  def fuzzyDecontaminate(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      evalDocs: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      hashShingles: Boolean = true,
      metric: String = "jaccard"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(metric == "jaccard" || metric == "containment",
      s"metric must be 'jaccard' or 'containment', got '$metric'")
    def key(c: Column): Column = if (hashShingles) xxhash64(c) else c
    val tsh = Dedup.fanOut(
      train.select(col(trainIdCol).cast("long").as("doc_id"), col(trainTextCol).as("__t")))
      .select(col("doc_id"), TextOps.wordShingles(col("__t"), n).as("__shs"))
      .select(col("doc_id"), size(col("__shs")).cast("long").as("n_a"),
        explode(col("__shs")).as("__sh"))
      .select(col("doc_id"), col("n_a"), key(col("__sh")).as("sh"))
    val esh = Dedup.fanOut(
      evalDocs.select(col(evalIdCol).cast("long").as("eval_id"), col(evalTextCol).as("__t")))
      .select(col("eval_id"), TextOps.wordShingles(col("__t"), n).as("__shs"))
      .select(col("eval_id"), size(col("__shs")).cast("long").as("n_b"),
        explode(col("__shs")).as("__sh"))
      .select(col("eval_id"), col("n_b"), key(col("__sh")).as("sh"))
    // guard the eval-side broadcast with the same configurable cap as
    // [[decontaminate]]'s driver collect: a pathological eval set should
    // fail with remediation text, not OOM the broadcast. The count is one
    // cheap extra job over the (small-by-construction) eval side; the
    // exploded row count — not the distinct shingle count — is what bounds
    // the broadcast, so that is what the cap checks.
    val evalCap = graft.util.Conf.long(train.sparkSession,
      "graft.decontaminate.maxEvalShingles", 50000000L)
    val nEvalRows = esh.count()
    require(nEvalRows <= evalCap,
      s"eval set explodes to $nEvalRows (eval_id, $n-gram shingle) rows, above " +
        s"the broadcast cap of $evalCap (fuzzy decontamination broadcasts the " +
        "exploded eval side). Shrink the eval set or raise " +
        "graft.decontaminate.maxEvalShingles.")
    val inter = tsh.join(broadcast(esh), "sh")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("inter"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .withColumn("containment", col("inter").cast("double") / col("n_b"))
    val score = col(metric)
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(score.desc, col("eval_id").asc)
    val best = inter
      .withColumn("__rk", row_number().over(byDoc))
      .where(col("__rk") === 1)
      .select(col("doc_id"), col("eval_id").as("best_eval_id"),
        (round(col("jaccard"), 6) + lit(0.0)).as("jaccard"),
        (round(col("containment"), 6) + lit(0.0)).as("containment"),
        (score >= threshold).as("contaminated"))
    train.select(col(trainIdCol).cast("long").as("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("best_eval_id"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"),
        coalesce(col("containment"), lit(0.0)).as("containment"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** SEMANTIC decontamination — the third rung after [[decontaminate]]
    * (exact shingles) and [[fuzzyDecontaminate]] (n-gram overlap): flag
    * training documents whose EMBEDDING sits within cosine `tau` of any
    * eval-set embedding. Catches reworded/translated eval leakage that
    * shares no surface n-grams at all — the contamination mode n-gram
    * methods are blind to (the same geometry SemDeDup exploits for
    * dedup, pointed at the eval set instead of the corpus itself).
    *
    * Shape: the eval side (small by construction — eval suites are at
    * most millions of items, guarded by the configurable
    * `graft.decontaminate.maxEvalVectors` cap) broadcasts; the corpus
    * side is ONE scan with a codegen'd cosine per (doc, eval) pair
    * ([[graft.ops.Similarity.cosineSim]] — a fused native loop, no UDF),
    * and the per-doc rollup collapses map-side, so the only shuffle
    * carries hit rows. At very large eval sets, prune candidates with
    * [[graft.ops.IvfIndex]] first and feed the survivors here.
    *
    * Determinism for the oracle: scores are rounded to 6 dp BEFORE the
    * threshold and the aggregates (the same contract as
    * q_embed_neardup), and the reported id is min(eval_id) among hits —
    * no float ever drives an ordering.
    *
    * Returns one row per train doc: (doc_id, n_hits, max_cos,
    * min_hit_eval_id, contaminated); zeros/null when nothing is within
    * tau.
    */
  def semanticDecontaminate(
      train: DataFrame,
      trainIdCol: String,
      trainVecCol: String,
      evalVecs: DataFrame,
      evalIdCol: String,
      evalVecCol: String,
      tau: Double = 0.9): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val ev = evalVecs.select(col(evalIdCol).cast("long").as("eval_id"),
      col(evalVecCol).cast("array<double>").as("__ev"))
    val evalCap = graft.util.Conf.long(train.sparkSession,
      "graft.decontaminate.maxEvalVectors", 2000000L)
    val nEval = ev.count()
    require(nEval <= evalCap,
      s"eval set has $nEval vectors, above the broadcast cap of $evalCap " +
        "(semantic decontamination broadcasts the eval embeddings). Shrink " +
        "the eval set, pre-prune with IvfIndex, or raise " +
        "graft.decontaminate.maxEvalVectors.")
    val tr = Dedup.fanOut(train.select(col(trainIdCol).cast("long").as("doc_id"),
      col(trainVecCol).cast("array<double>").as("__tv")))
    val hits = tr.crossJoin(broadcast(ev))
      .withColumn("cos", round(Similarity.cosineSim(col("__tv"), col("__ev")), 6))
      .where(col("cos") >= tau)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("cos")).as("max_cos"),
        min(col("eval_id")).as("min_hit_eval_id"))
    train.select(col(trainIdCol).cast("long").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("max_cos"), lit(0.0)) + lit(0.0)).as("max_cos"),
        col("min_hit_eval_id"),
        (coalesce(col("n_hits"), lit(0L)) >= 1L).as("contaminated"))
  }

  /** One-call STREAMING curation — the ingest-time counterpart of
    * [[curate]]: language/quality filter, bounded-state dedup (exact
    * content within the watermark horizon; optionally simhash near-dup),
    * then decontamination against a static eval set, emitting surviving
    * (id, ts, quality, n_tokens) rows in append mode.
    *
    * Stream-safety by construction: the filter and the decontamination
    * are STATELESS projections — the filter is the fused one-pass
    * [[TextOps.langQuality]] scan, and the eval set is collected ONCE
    * (with [[decontaminateStream]]'s size guard) into a broadcast sorted
    * array of 64-bit shingle hashes probed per row by binary search, so
    * no stream-static join and no second aggregation enter the plan. The
    * only stateful operators are the dropDuplicatesWithinWatermark
    * stores (one row per distinct key inside the horizon). Late rows
    * beyond the watermark are dropped by the dedup stage — the standard
    * ingest contract. Batch frames run the same composition with a
    * DETERMINISTIC dedup keeper (earliest (ts, id) per key — the batch
    * analogue of first-arrival-wins).
    *
    * `evalFilter` picks the decontamination memory/exactness trade:
    * `"exact"` (default) probes a broadcast sorted array of 64-bit
    * shingle hashes (8 bytes/shingle, capped at 50M); `"bloom"` probes
    * a [[decontaminateBloom]]-style image at 20 bits/shingle with 14
    * hashes — 3.2× more eval capacity at the same broadcast budget.
    * The heavier parameters (vs decontaminateBloom's 10/7 default) are
    * deliberate: an ingest filter at minHits=1 multiplies the
    * per-shingle FP rate by EVERY doc's shingle count, so this mode
    * targets ~6e-5/shingle (≈3% doc-level at 500 shingles) rather than
    * 0.8%/shingle (~98% doc-level). False positives only ever DROP
    * extra docs, never admit a contaminated one. Both modes are
    * stateless per-row probes, so the streaming plan shape is
    * identical.
    */
  def curateStream(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      watermark: String = "1 hour",
      nearDupDedup: Boolean = true,
      n: Int = 8,
      minHits: Int = 1,
      evalFilter: String = "exact"): DataFrame = {
    require(evalFilter == "exact" || evalFilter == "bloom",
      s"evalFilter must be 'exact' or 'bloom', got '$evalFilter'")
    val spark = docs.sparkSession
    import spark.implicits._
    val hashSeed = 0x27d4eb2f165667c5L
    val hashUdf = udf { (s: String) => graft.util.Hashing.hashString(s, hashSeed) }
    // hitsOf: per-row count of this doc's distinct shingles present in
    // the eval structure — built ONCE from the static eval set, probed
    // statelessly per row in either mode
    val hitsOf: Seq[String] => Int =
      if (evalFilter == "bloom") {
        val (bits, m) = bloomImage(evalDocs, evalTextCol, n,
          bitsPerShingle = 20, numHashes = 14)
        val bcBits = spark.sparkContext.broadcast(bits)
        shs => bloomHits(bcBits.value, m, 14, shs).toInt
      } else {
        // persist before the cap check so the count and the collect share
        // one execution of the shingle scan instead of running it twice
        val distinctHashes = Dedup.fanOut(evalDocs.select(col(evalTextCol).as("__t")))
          .select(explode(TextOps.wordShingles(col("__t"), n)).as("__sh"))
          .select(hashUdf(col("__sh")).as("h"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        // sorted primitive array + binary search: 8 bytes per shingle and
        // no boxing — the broadcast stays compact even at tens of
        // millions. The finally covers the cap check too: a failing
        // require must not strand the materialized cache.
        val evalHashes: Array[Long] =
          try {
            val cap = graft.util.Conf.long(spark,
              "graft.decontaminate.maxEvalShingles", 50000000L)
            val nShingles = distinctHashes.count()
            require(nShingles <= cap,
              s"eval set explodes to $nShingles distinct $n-gram shingles, above the " +
                s"driver-collect cap of $cap. Shrink the eval set, raise " +
                "graft.decontaminate.maxEvalShingles, or use evalFilter = \"bloom\".")
            distinctHashes.as[Long].collect().sorted
          } finally distinctHashes.unpersist()
        val bc = spark.sparkContext.broadcast(evalHashes)
        shs => {
          val arr = bc.value
          var hits = 0
          val it = shs.iterator
          while (it.hasNext) {
            if (java.util.Arrays.binarySearch(arr,
                graft.util.Hashing.hashString(it.next(), hashSeed)) >= 0)
              hits += 1
          }
          hits
        }
      }
    val filtered = Dedup.fanOut(
      docs.select(col(idCol).cast("long").as(idCol), col(tsCol), col(textCol)))
      .withColumn("__lq", TextOps.langQuality(col(textCol)))
      .where(col("__lq._1") === lit(lang) && col("__lq._2") >= lit(minQuality))
    // batch frames get a DETERMINISTIC keeper — the earliest (ts, id) row
    // per key, the batch analogue of streaming first-arrival-wins — so the
    // composition is reproducible (and oracle-checkable); the streaming
    // path's keeper is first-arrival by construction
    def batchKeepers(df: DataFrame, key: Column): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(key).orderBy(col(tsCol), col(idCol))
      df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
    }
    val deduped =
      if (docs.isStreaming) {
        val e = graft.streaming.StreamDedup.exact(filtered, tsCol, textCol, watermark)
        if (nearDupDedup)
          // the watermark is already defined by the exact stage; Spark
          // forbids redefining it on the same stream
          graft.streaming.StreamDedup.simhash(e, tsCol, textCol, watermark,
            assumeWatermarked = true)
        else e
      } else {
        val e = batchKeepers(filtered, xxhash64(col(textCol)))
        if (nearDupDedup)
          batchKeepers(e, Dedup.simhashUdf(split(col(textCol), " ")))
        else e
      }
    val hitsUdf = udf { (shingles: Seq[String]) =>
      if (shingles == null) 0 else hitsOf(shingles)
    }
    deduped
      .withColumn("__hits", hitsUdf(TextOps.wordShingles(col(textCol), n)))
      .where(col("__hits") < minHits)
      .select(col(idCol), col(tsCol),
        col("__lq._2").as("quality"), col("__lq._3").as("n_tokens"))
  }

  /** Streaming decontamination: flag documents of a STREAM against a
    * static eval set as they arrive. The stream side explodes to
    * (doc_id, shingle) and inner-joins the broadcast eval shingles — a
    * stateless stream-static join — then a streaming aggregation counts
    * hits per doc (update output mode; only contaminated docs surface).
    * A document's shingles all come from its single input row, so its
    * count is complete within the micro-batch that carried it; the
    * aggregation state is one counter per CONTAMINATED doc id (hit rows
    * only survive the join), which is small by construction — eval
    * overlap is the anomaly, not the norm.
    */
  def decontaminateStream(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      minHits: Int = 1,
      hashShingles: Boolean = true): DataFrame = {
    // the static side of a stream-static join is re-evaluated every
    // micro-batch: materialize the distinct shingle set ONCE, to the
    // driver (it must fit there anyway — the join broadcasts it), and
    // re-enter it as a local relation. No session cache entry is left
    // behind, so nothing leaks across eval-set rotations in a
    // long-running service.
    val spark = train.sparkSession
    import spark.implicits._
    // hashShingles (default): collect and broadcast 8-byte longs instead
    // of strings — same exact-up-to-xxhash64-collision contract as
    // [[decontaminate]], and an order of magnitude less driver memory
    // persist before the cap check so the count and the collect share one
    // execution of the shingle scan instead of running it twice
    val distinctShingles = Dedup.fanOut(evalDocs.select(col(evalTextCol).as("__t")))
      .select(explode(TextOps.wordShingles(col("__t"), n)).as("__sh"))
      .select((if (hashShingles) xxhash64(col("__sh")) else col("__sh")).as("sh"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // guard the driver collect: an unexpectedly large eval set should fail
    // with a clear message, not OOM the driver mid-collect. The finally
    // covers the cap check too — a failing require must not strand the
    // materialized cache in executor storage.
    val evalShingles =
      try {
        val cap = graft.util.Conf.long(spark,
          "graft.decontaminate.maxEvalShingles", 50000000L)
        val nShingles = distinctShingles.count()
        require(nShingles <= cap,
          s"eval set explodes to $nShingles distinct $n-gram shingles, above the " +
            s"driver-collect cap of $cap (the decontamination join broadcasts the " +
            "eval side, so it must fit on the driver). Shrink the eval set or " +
            "raise graft.decontaminate.maxEvalShingles.")
        if (hashShingles) distinctShingles.as[Long].collect().toSeq.toDF("sh")
        else distinctShingles.as[String].collect().toSeq.toDF("sh")
      } finally distinctShingles.unpersist()
    train
      .select(col(trainIdCol).cast("long").as("doc_id"),
        explode(TextOps.wordShingles(col(trainTextCol), n)).as("__sh"))
      .select(col("doc_id"),
        (if (hashShingles) xxhash64(col("__sh")) else col("__sh")).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: score
    * every document under a language model, split the corpus into
    * head/middle/tail thirds, train preferentially on the head) —
    * re-expressed with the corpus's OWN bigram model and pure integer
    * arithmetic: [[TextOps.bigramScoreMicro]] is the fluency score
    * (higher = more probable text), [[Sampling.bucketByScore]] assigns
    * each document the bucket its exact global rank falls in. No
    * external LM artifact, no float ever drives the ordering, and the
    * whole chain — pair counts, integer mean probability, rank,
    * bucket — replays in ANSI SQL (q_ccnet_buckets).
    *
    * `weights`/`labels` default to the paper's equal thirds. Documents
    * with fewer than two tokens have no bigrams and emit no row.
    *
    * Scale shape: two map-side-combined aggregations + two keyed joins
    * for the score (the [[TextOps.bigramNll]] shape), then the
    * histogram-rank bucketing — no global sort anywhere.
    *
    * Returns (doc_id, score_micro, bucket).
    */
  def perplexityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[Int] = Seq(1, 1, 1),
      labels: Seq[String] = Seq("head", "middle", "tail")): DataFrame = {
    val scored = TextOps.bigramScoreMicro(docs, idCol, textCol)
    Sampling.bucketByScore(scored, "doc_id", "score_micro", weights, labels)
  }
}
