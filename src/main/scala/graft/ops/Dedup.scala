package graft.ops

import graft.util.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{UserDefinedFunction, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for large-scale corpora.
  *
  * Scale design: every variant is shuffle-based — group-by on a content
  * key, or an equi-join on LSH bucket ids. No driver collects, no cross
  * join of the full corpus against itself; candidate generation always
  * goes through a bucketing key so the pairwise work is |bucket|^2, not n^2.
  *
  * All sketch signatures (MinHash, SimHash, hyperplane) are computed in a
  * SINGLE pass over the row's tokens/shingles/values by a Scala UDF —
  * Spark's higher-order array functions are interpreted (not codegen'd),
  * so k separate `transform`/`aggregate` passes cost ~k full traversals
  * per row; one closure computing all k sketch lanes at once is the
  * scale-correct shape.
  */
object Dedup {

  /** Exact dedup on a content column: one hash-aggregate.
    * Returns (key, keeper_id, dup_count); keeper = min id for determinism.
    */
  /** Guarantee a minimum MAP parallelism before CPU-heavy per-row work.
    *
    * Signature/shingle computation inherits the input's file-split
    * parallelism: a small compressed file — or a parquet file with a
    * single row group, which cannot be split no matter what
    * `files.maxPartitionBytes` says — plans as ONE task regardless of
    * cluster size, serializing the most expensive map stage of the dedup
    * pipeline (measured r7: the whole shingle+signature pass of
    * q_ngram_jaccard ran 1-of-32 cores). Repartitions the raw (id, text)
    * projection — cheaper to shuffle than the computed shingles — and
    * ONLY when the planned partition count is under half the cluster's
    * default parallelism: at real scale input splits already exceed it
    * and this is a no-op with zero added shuffle.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch partitioning is the planner's
    // only scan-shaped plans (leaf + projections/filters) can suffer the
    // 1-task file-split problem; anything downstream of a shuffle already
    // has shuffle.partitions-way parallelism. The gate also keeps the
    // getNumPartitions probe below from materializing upstream stages
    // under AQE (df.rdd on a plan with exchanges runs real jobs).
    def scanShaped(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = p match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
      case n: org.apache.spark.sql.catalyst.plans.logical.Project => scanShaped(n.child)
      case n: org.apache.spark.sql.catalyst.plans.logical.Filter => scanShaped(n.child)
      case n: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => scanShaped(n.child)
      // a union of scans has the same 1-task-per-unsplittable-file
      // exposure as a single scan
      case n: org.apache.spark.sql.catalyst.plans.logical.Union => n.children.forall(scanShaped)
      // an explode over a scan multiplies ROWS but not PARTITIONS — the
      // 1-task exposure survives it unchanged (caught live in round 17:
      // Sketches.build over a caller-exploded n-gram frame hashed
      // md5×depth per occurrence on one core). Repartitioning the
      // exploded rows costs more than repartitioning the pre-explode
      // projection would, but fanOut only fires when the plan is already
      // serialized below half the cluster — strictly better than 1 task.
      case n: org.apache.spark.sql.catalyst.plans.logical.Generate => scanShaped(n.child)
      case _ => false
    }
    if (!scanShaped(df.queryExecution.optimizedPlan)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Exact-duplicate GROUP-SIZE distribution — the audit statistic over
    * [[exact]]'s groups: how many duplicate groups of each size the
    * corpus holds, the documents they account for, and how many rows
    * exact dedup would delete. Two hash aggregations (content → group
    * size, size → histogram), both map-side combined; pure integers end
    * to end, so the whole table hash-checks across engines
    * (q_dedup_stats). Group by a content HASH (md5/xxhash64) rather
    * than raw text when texts are long — the first shuffle then carries
    * fixed-width keys.
    */
  def dupGroupStats(df: DataFrame, contentCol: String): DataFrame =
    df.groupBy(col(contentCol)).agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .select(col("group_size"), col("n_groups"),
        (col("group_size") * col("n_groups")).as("n_docs"),
        ((col("group_size") - 1) * col("n_groups")).as("n_deletable"))

  /** Choose MinHash-LSH (bands, rowsPerBand) for a target Jaccard
    * threshold: among factorizations b·r ≤ `numHashes`, pick the pair
    * whose S-curve midpoint (1/b)^(1/r) is closest to `threshold`,
    * preferring pairs that use more of the signature (b·r) and then more
    * bands on ties. The standard MMDS §3.4 rule — callers feed the
    * result straight into [[minhashCandidates]] instead of hand-tuning.
    * Driver-side pure arithmetic on a ≤ numHashes-sized search space.
    */
  def lshPlan(threshold: Double, numHashes: Int): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1), got $threshold")
    require(numHashes >= 2, s"numHashes must be >= 2, got $numHashes")
    val candidates = for {
      r <- 1 to numHashes
      b = numHashes / r
      if b >= 1
    } yield (b, r)
    candidates.minBy { case (b, r) =>
      val mid = math.pow(1.0 / b, 1.0 / r)
      (math.abs(threshold - mid), numHashes - b * r, -b)
    }
  }

  /** Rows surviving exact dedup (keeper rows only) — distributed via a
    * min-over-window on the content hash, no collect.
    */
  def exactKeepers(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(contentCol))
    df.withColumn("__keeper", min(col(idCol)).over(w))
      .where(col(idCol) === col("__keeper"))
      .drop("__keeper")
  }

  /** MinHash signature UDF: `numHashes` permutation minima in ONE pass over
    * the shingle array. Each shingle is hashed once into (h1, h2); lane i's
    * hash is h1 + i*h2 (Kirsch–Mitzenmacher double hashing), so the cost is
    * O(|shingles| * (|shingle| + numHashes)) adds — not numHashes string
    * traversals.
    */
  def minhashSignatureUdf(numHashes: Int): UserDefinedFunction = udf { (shingles: Seq[String]) =>
    val mins = Array.fill(numHashes)(Long.MaxValue)
    if (shingles != null) {
      val it = shingles.iterator
      while (it.hasNext) {
        val s = it.next()
        val h1 = Hashing.hashString(s, 0x9e3779b97f4a7c15L)
        val h2 = Hashing.hashString(s, 0x6a09e667f3bcc909L) | 1L
        var h = h1
        var i = 0
        while (i < numHashes) {
          if (h < mins(i)) mins(i) = h
          h += h2
          i += 1
        }
      }
    }
    mins
  }

  /** Banded LSH keys from a MinHash signature, still in the same single
    * pass: band b's key = avalanche-hash of its `numHashes/bands` minima.
    * Returned as an array to be `posexplode`d into (band, bucket) rows.
    */
  def minhashBandKeysUdf(numHashes: Int, bands: Int): UserDefinedFunction = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    udf { (shingles: Seq[String]) =>
      // shingle-less docs (null/empty text) get NO band keys, so the
      // posexplode downstream emits no rows for them: an all-sentinel
      // signature would collide every such doc into one bucket per band
      // (the r13 null-rehearsal bug). The policy lives INSIDE the UDF
      // rather than as a `where(size(sh) > 0)` on the caller because
      // filter pushdown inlines the shingle expression into the
      // predicate and the whole wordShingles tree evaluates TWICE per
      // row (the dedupChunksWithin optimizer trap) — measured 1.56x on
      // the whole ingest cycle at sf0.1 (PLANS round 18).
      if (shingles == null || shingles.isEmpty) Array.emptyLongArray
      else {
        val mins = Array.fill(numHashes)(Long.MaxValue)
        val it = shingles.iterator
        while (it.hasNext) {
          val s = it.next()
          val h1 = Hashing.hashString(s, 0x9e3779b97f4a7c15L)
          val h2 = Hashing.hashString(s, 0x6a09e667f3bcc909L) | 1L
          var h = h1
          var i = 0
          while (i < numHashes) {
            if (h < mins(i)) mins(i) = h
            h += h2
            i += 1
          }
        }
        val keys = new Array[Long](bands)
        var b = 0
        while (b < bands) {
          var h = 0xcbf29ce484222325L ^ Hashing.mix64(b.toLong)
          var j = 0
          while (j < rowsPerBand) {
            h = Hashing.mix64(h ^ mins(b * rowsPerBand + j))
            j += 1
          }
          keys(b) = h
          b += 1
        }
        keys
      }
    }
  }

  /** (id, band, bucket) banding rows from a precomputed (id, sh) shingle
    * frame — THE single definition of the banded-signature layout, shared
    * by the batch candidate join below and [[IncrementalDedup]]'s
    * persisted store (which must stay bit-compatible with it).
    */
  private[graft] def bandedFromShingles(
      shingled: DataFrame, // columns: id, sh
      numHashes: Int,
      bands: Int): DataFrame = {
    val keysUdf = minhashBandKeysUdf(numHashes, bands)
    // shingle-less docs (null/empty text) emit no rows: the keys UDF
    // returns an empty array for them (policy and its why live there) and
    // posexplode drops empties — NO size() pre-filter here, which would
    // re-evaluate the caller's whole shingle expression per row once
    // filter pushdown inlines it into the predicate
    shingled.select(col("id"), posexplode(keysUdf(col("sh"))).as(Seq("band", "bucket")))
  }

  /** MinHash-LSH candidate pairs from a precomputed (id, shingles) frame:
    * band the signature, bucket-join on (band, bucket), emit distinct
    * (id_a < id_b) pairs. The join is an equi-join on the banded key —
    * shuffle on bucket id, never a cross join.
    */
  def minhashCandidatesFromShingles(
      shingled: DataFrame, // columns: id, sh
      numHashes: Int,
      bands: Int): DataFrame = {
    val banded = bandedFromShingles(shingled, numHashes, bands)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs straight from text. Word shingles: char
    * n-grams of natural text are too densely shared across unrelated
    * documents (measured median 3-gram Jaccard ~0.46 on the synthetic
    * corpus vs ~0.0 for word 3-grams) and would blow up the candidate
    * count at scale.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    val sh = fanOut(df.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .select(col("id"), TextOps.wordShingles(col("__txt"), shingleSize).as("sh"))
    minhashCandidatesFromShingles(sh, numHashes, bands)
  }

  /** MinHash-LSH near-dup pipeline: banded candidates, then exact word-
    * shingle Jaccard confirmation at `threshold`. The shingle frame is
    * computed ONCE (cached) and reused by both the candidate stage and the
    * confirm joins. Candidate generation is O(sum |bucket|^2); confirmation
    * touches only candidate pairs.
    *
    * Default 64 hashes / 32 bands of 2: P(miss a pair at Jaccard j) =
    * (1 - j^2)^32 — ~2e-10 at j=0.7, so the confirmed output equals the
    * exact brute-force answer with near-certainty (which is what lets the
    * harness oracle-check this query against a DuckDB full self-join).
    *
    * OWNERSHIP: the returned DataFrame is persisted (already materialized);
    * the CALLER owns the release — `result.unpersist()` after the terminal
    * write (the harness loops call `spark.catalog.clearCache()` per query).
    */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    val sh = fanOut(df.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .select(col("id"), TextOps.wordShingles(col("__txt"), shingleSize).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cands = minhashCandidatesFromShingles(sh, numHashes, bands)
    val confirmed = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
    // Materialize the (small) confirmed-pair set eagerly so the cached
    // shingle frame can be RELEASED here: a lazy return would pin the
    // cache for the caller's lifetime — every call leaked one cached
    // copy of the corpus shingles (the r4 bench JVM accumulated these
    // across 52 queries and spent its tail in GC/eviction churn).
    // persist+count (NOT localCheckpoint): the count executes the
    // candidate+confirm pipeline on the SQL path with AQE shuffle
    // coalescing/skew handling intact, the cached result is recomputable
    // on executor loss, and the caller (or catalog.clearCache) can
    // release it — localCheckpoint had none of those properties and cost
    // a measured 4.4x on the bench (r5 verdict).
    val out = confirmed.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sh.unpersist()
    out
  }

  /** Exact word n-gram Jaccard for candidate pairs. */
  def wordJaccard(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sh = fanOut(docs.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .select(col("id"), TextOps.wordShingles(col("__txt"), shingleSize).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
  }

  /** SimHash: 64-bit signature from per-token hash bit votes, computed in
    * ONE pass over the token array (each token hashed once; 64 bit-votes
    * accumulated in a local array).
    */
  def simhashUdf: UserDefinedFunction = udf { (tokens: Seq[String]) => simhashOf(tokens) }

  /** Plain-Scala simhash of a token sequence — the single implementation
    * behind [[simhashUdf]] and the streaming banded dedup (which needs it
    * both executor-side and in tests to pre-verify hamming distances).
    *
    * The per-token hash is the ENGINE-PORTABLE [[Hashing.md5Long]] (first
    * 8 bytes of md5), so the whole signature — votes, sign bits, band
    * chunks — replays exactly in any SQL engine; q_simhash_pairs
    * hash-checks the banded candidate join end to end against DuckDB.
    */
  def simhashOf(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    if (tokens != null) {
      val it = tokens.iterator
      while (it.hasNext) {
        val h = Hashing.md5LongMemo(it.next())
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Near-dup candidates by SimHash hamming distance <= maxDist, blocked on
    * 16-bit signature chunks (pigeonhole: any pair within distance
    * `chunks-1` shares at least one exact chunk) — equi-join on chunk
    * value, no cross join. maxDist must be <= 3 for the 4-chunk guarantee
    * to hold (ADVICE r1: larger distances would silently drop pairs).
    *
    * Skew guard (same rationale as [[embeddingNearDup]]'s): a chunk value
    * shared by m docs costs m²/2 join rows, and unlike the LSH planes the
    * 16-bit band width CANNOT scale with n — it is pigeonhole-forced by
    * the 64-bit signature and the distance-3 guarantee. A degenerate
    * corpus (near-identical boilerplate, the all-zero signature of empty
    * docs) would otherwise go quadratic in one bucket; buckets larger
    * than `maxBucketSize` are dropped from candidate generation. A pair
    * is lost only if EVERY one of its >= 1 shared chunks is oversized;
    * run exact dedup first so mass-identical docs never reach this join.
    * At 100-TB scale the structural answer is hierarchical blocking
    * (dedup exact -> partition -> simhash within partition), not a wider
    * band.
    */
  def simhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucketSize: Int = 4096): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist=$maxDist not supported: 4 x 16-bit chunk blocking only guarantees recall for hamming distance <= 3")
    require(maxBucketSize > 1, s"maxBucketSize must be > 1, got $maxBucketSize")
    // same no-shingles policy as the MinHash banding: a null-text doc
    // has no tokens, and its zero-vote simhash (0L) would collide every
    // such doc into the same buckets — exclude it from the sketch
    val sh = fanOut(df.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .where(col("__txt").isNotNull)
      .select(col("id"), simhashUdf(split(col("__txt"), " ")).as("sh"))
    val chunked = sh.select(col("id"), col("sh"), posexplode(
      array((0 until 4).map(c => shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
    ).as(Seq("chunk", "val")))
    val smallBuckets = chunked.groupBy(col("chunk"), col("val"))
      .agg(count(lit(1)).as("__bn"))
      .where(col("__bn") <= maxBucketSize)
      .select(col("chunk"), col("val"))
    val pruned = chunked.join(smallBuckets, Seq("chunk", "val"))
    val a = pruned.as("a")
    val b = pruned.as("b")
    val hamming = bit_count(col("a.sh").bitwiseXOR(col("b.sh")))
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.val") === col("b.val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), hamming.as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for a set of candidate pairs
    * (id_a, id_b): joins the shingle arrays back and computes
    * |intersect| / |union| in pure expressions.
    */
  def ngramJaccard(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sh = fanOut(docs.select(col(idCol).as("id"), col(textCol).as("__txt")))
      .select(col("id"), TextOps.charShingles(col("__txt"), shingleSize).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
  }

  /** Embedding near-dup via banded (multi-table, OR-amplified) hyperplane
    * LSH: `numTables` independent signatures of `planesPerTable` sign bits
    * each; a pair is a candidate if ANY table's signature matches (same
    * OR-amplification as MinHash banding — a single wide signature would
    * have recall (1-theta/pi)^planes). Candidates are confirmed with exact
    * cosine >= threshold, computed as ONE dot product over vectors that were
    * L2-normalized once up front.
    *
    * Recall for a pair at angle theta with s = 1 - theta/pi:
    * 1 - (1 - s^planesPerTable)^numTables. Defaults (12 planes, 24 tables)
    * give recall ~0.98 at cosine 0.9 while admitting only
    * 1-(1-0.5^12)^24 ~ 0.6% of unrelated (cosine~0) pairs as candidates —
    * sign-LSH is a HIGH-similarity (>=~0.8) family; at mid thresholds the
    * per-bit gap (s vs 0.5) is too weak for any parameterization to be
    * sub-quadratic, so callers wanting e.g. cosine>=0.4 should use
    * block/IVF-bucketed search instead.
    *
    * Skew guard: buckets larger than `maxBucketSize` are dropped from
    * candidate generation (a bucket of m rows costs m^2/2 pairs; one
    * degenerate bucket — e.g. the all-zeros region — would dominate the
    * join at scale). Pairs lost this way are only those whose EVERY shared
    * bucket is oversized; with OR-amplified tables that probability is
    * negligible for genuinely near pairs.
    *
    * OWNERSHIP: the returned DataFrame is persisted (already materialized);
    * the CALLER owns the release — `result.unpersist()` after the terminal
    * write (the harness loops call `spark.catalog.clearCache()` per query).
    */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numTables: Int = 24,
      planesPerTable: Int = 12,
      seed: Long = 42L,
      maxBucketSize: Int = 4096): DataFrame = {
    val sigUdf = Similarity.hyperplaneTableKeysUdf(numTables, planesPerTable, seed)
    val vecs = fanOut(df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__v")))
      .select(col("id"), Similarity.normalizeUdf(col("__v")).as("vn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // band only (id, table, bucket) — never shuffle the vector numTables times
    val banded = vecs.select(col("id"), posexplode(sigUdf(col("vn"))).as(Seq("tbl", "bucket")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val smallBuckets = banded.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("__bn"))
      .where(col("__bn") <= maxBucketSize)
      .select(col("tbl"), col("bucket"))
    val pruned = banded.join(smallBuckets, Seq("tbl", "bucket"))
    val a = pruned.as("a")
    val b = pruned.as("b")
    val cands = a.join(b,
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val confirmed = cands
      .join(vecs.select(col("id").as("id_a"), col("vn").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vn").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(Similarity.dot(col("va"), col("vb")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
    // Same release discipline as minhashDedup: materialize the confirmed
    // pairs eagerly (persist+count on the SQL/AQE path, releasable and
    // recomputable — not localCheckpoint), then drop the two cached
    // intermediates instead of pinning them for the caller's lifetime.
    val out = confirmed.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    banded.unpersist()
    vecs.unpersist()
    out
  }

  /** Connected components over a near-dup pair list — the step that turns
    * PAIRWISE candidates (minhash/simhash/LSH output) into dedup GROUPS:
    * every member of a component is a (transitive) near-duplicate and the
    * component label (= min id in the component) is the canonical keeper.
    *
    * Distributed min-label propagation: each iteration every node adopts
    * the smallest label among itself and its neighbors (one join + one
    * hash aggregate per iteration — the standard BSP shape; no driver
    * state beyond the convergence counter). Converges in O(component
    * diameter) iterations; near-dup components are shallow (stars around
    * a popular document), so the default cap is generous. Throws if the
    * cap is hit without convergence rather than returning wrong labels.
    *
    * Small graphs short-circuit to a driver-local union-find: the pair
    * graph of a dedup pass is tiny relative to the corpus (pairs are the
    * anomaly), and each BSP round costs whole jobs of scheduler overhead
    * that dwarf the actual work below a few million edges. The cutover is
    * edge-count-gated (`graft.components.localMaxEdges`, default 2M ≈
    * ~100 MB driver heap transiently) and the result is IDENTICAL — min
    * id per component either way; above the gate the distributed BSP path
    * runs exactly as before, so corpus-scale graphs never touch the
    * driver.
    *
    * Returns (id, comp) for every id appearing in `pairs`.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    // undirected edge list, both directions, self-loop-free
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val spark = pairs.sparkSession
    val localMaxEdges = graft.util.Conf.long(spark, "graft.components.localMaxEdges", 2000000L)
    // the count doubles as the cache materialization the first BSP round
    // would have paid anyway
    val nEdges = edges.count()
    if (nEdges <= localMaxEdges) {
      val locals = localComponents(edges.collect().map(r => (r.getLong(0), r.getLong(1))))
      edges.unpersist()
      import spark.implicits._
      // parallelize, NOT toSeq.toDF: a LocalRelation of up to ~4M rows
      // would embed in the LOGICAL PLAN and re-serialize with every task
      // closure of every downstream join; as an RDD the rows ship once as
      // ordinary partition data
      return spark.sparkContext.parallelize(locals.toSeq, spark.sparkContext.defaultParallelism)
        .toDF("id", "comp")
    }
    // localCheckpoint (not persist): each iteration's frame feeds the
    // next, so without lineage TRUNCATION the plan doubles per iteration
    // and analysis/codegen blow up after ~20 rounds — the standard
    // iterative-DataFrame trap (Spark ML breaks lineage the same way via
    // checkpointInterval).
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min over {own label} ∪ {neighbor labels}, one agg job
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      // carry the per-row improvement flag INTO the checkpointed frame:
      // convergence detection then reads the materialized result instead
      // of re-joining this iteration's labels against the previous ones
      // (which re-scanned both frames as a second full job per round)
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (coalesce(col("ncomp"), col("comp")) < col("comp")).as("__improved"))
        .localCheckpoint()
      val changed = next.where(col("__improved")).limit(1).count()
      labels = next.drop("__improved")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter iterations " +
        "(component diameter exceeds the cap; raise maxIter)")
    labels
  }

  /** Union-find with path halving for the driver-local small-graph tier
    * of [[connectedComponents]]: O(E α(E)), one pass to union, one to
    * relabel each component by its minimum member id (the same canonical
    * label the BSP path produces).
    */
  private def localComponents(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val index = scala.collection.mutable.HashMap.empty[Long, Int]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idx(v: Long): Int = index.getOrElseUpdate(v, { ids += v; ids.length - 1 })
    edges.foreach { case (a, b) => idx(a); idx(b) }
    val parent = Array.tabulate(ids.length)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    edges.foreach { case (a, b) =>
      val ra = find(idx(a)); val rb = find(idx(b))
      if (ra != rb) parent(ra) = rb
    }
    val minOfRoot = scala.collection.mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < ids.length) {
      val r = find(i)
      val cur = minOfRoot.getOrElse(r, Long.MaxValue)
      if (ids(i) < cur) minOfRoot(r) = ids(i)
      i += 1
    }
    Array.tabulate(ids.length)(j => (ids(j), minOfRoot(find(j))))
  }

  /** Dedup groups from pairwise candidates: (comp, keeper_id, group_size)
    * per connected component of the pair graph — `keeper_id` is the
    * canonical survivor, `group_size` the number of mutual near-dups.
    */
  def nearDupGroups(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("comp"))
      .agg(min(col("id")).as("keeper_id"), count(lit(1)).as("group_size"))

  /** Leakage-safe train/val/test split: near-duplicate documents land in
    * the SAME split, or held-out evaluation leaks training content
    * through paraphrases — the dedup-aware split discipline that makes a
    * test set actually held out (Lee et al. 2022 §6 observe train-test
    * overlap inflating eval; the standard remedy is splitting by
    * duplicate GROUP, not by document).
    *
    * The split key is the document's near-dup component label (min id of
    * its [[minhashDedup]] component; singletons key on themselves), and
    * the split assignment is the portable md5 hash split
    * ([[TextOps.splitByHash]]) of that key — so the whole composition
    * (LSH candidates, exact confirm, components, keyed split) is
    * deterministic and replays in SQL (q_leakage_split).
    *
    * Scale shape: inherits minhashDedup's banded equi-join and the
    * BSP components (both audited); the split itself is a projection.
    * Returns (doc_id, group_key, split).
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labels: Seq[String],
      weights: Seq[Double],
      threshold: Double = 0.7,
      salt: String = "graft"): DataFrame = {
    val pairs = minhashDedup(df, idCol, textCol, threshold)
    try {
      val comps = connectedComponents(pairs, "id_a", "id_b")
      val withKey = df.select(col(idCol).cast("long").as("doc_id"))
        .join(comps.select(col("id").as("doc_id"), col("comp")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("group_key"))
      TextOps.splitByHash(withKey, "group_key", labels, weights, salt)
        .select(col("doc_id"), col("group_key"), col("split"))
    } finally pairs.unpersist()
  }

  /** Substring-level exact dedup: remove duplicated token SPANS from
    * documents rather than whole documents (the ExactSubstr setting of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better" — their suffix-array formulation is single-machine; this is
    * the distributed token-window equivalent, exact at token granularity).
    *
    * Semantics: every overlapping `minLen`-token window whose global
    * occurrence count is >= `minCount` is a duplicate window; per
    * document, overlapping/adjacent duplicate windows merge into maximal
    * spans, whose tokens are cut from the text. ALL occurrences of a
    * duplicated span are removed (the paper's tool does the same); to
    * keep one canonical copy of fully-duplicated documents, run
    * [[exactDedup]] first. A region repeated in full is covered end to
    * end because every one of its sub-windows is duplicated.
    *
    * Scale shape: the window pass is one projection (token split + a
    * `transform` producing one key per start offset) — with `hashWindows`
    * (default) each window is xxhash64'd INSIDE the lambda, so the
    * shuffle and the count aggregation carry 8-byte longs, never
    * minLen-token strings; the duplicate-key set is a two-phase hash
    * agg; the join back is keyed (AQE broadcasts when the dup set is
    * small); span-merge is a per-doc window function over DUPLICATE
    * windows only; reconstruction is an indexed-lambda `filter` against
    * the per-doc span array (bounded by the doc's own length). Nothing
    * is ever pairwise and nothing collects. The string-window path
    * (`hashWindows = false`) exists for engine-portable oracle replay;
    * HashedSubstrSpec-style equality with the hashed path is asserted
    * in the suite.
    *
    * Returns (doc_id, n_tokens, dup_tokens, dup_frac, clean_text).
    */
  def substringDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 50,
      minCount: Int = 2,
      hashWindows: Boolean = true): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    def winKey(c: Column): Column = if (hashWindows) xxhash64(c) else c
    val base = fanOut(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t")))
      .select(col("doc_id"),
        filter(split(col("__t"), " "), t => t =!= "").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"))
    // one row per window start; docs shorter than minLen emit none
    // (posexplode of NULL yields zero rows)
    val wins = base.select(col("doc_id"),
      posexplode(when(col("n_tokens") >= minLen,
        transform(sequence(lit(0), col("n_tokens") - lit(minLen)),
          i => winKey(concat_ws(" ", slice(col("toks"), i + lit(1), lit(minLen))))))))
      .select(col("doc_id"), col("pos").as("start"), col("col").as("key"))
    val dupKeys = wins.groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .select(col("key"))
    val dupWins = wins.join(dupKeys, "key").select(col("doc_id"), col("start"))
    cutSpans(base, dupWins, minLen, "dup_tokens", "dup_frac")
  }

  /** Cross-document boilerplate removal — the token-span analogue of
    * RefinedWeb's line-level dedup (Penedo et al. 2023 §3.3: lines
    * repeated across many pages are navigation/footer boilerplate, cut
    * from every page). The reference has no counterpart. Any `n`-token
    * window whose DOCUMENT frequency (distinct docs, not occurrences)
    * is >= `minDf` is boilerplate; per document, overlapping/adjacent
    * boilerplate windows merge into maximal spans whose tokens are cut.
    * Distinct from [[substringDedup]], which counts OCCURRENCES and so
    * also fires on a passage pasted many times into one document —
    * in-document repetition is [[TextOps.dupNgramFraction]]'s signal,
    * not boilerplate; here a window must recur across `minDf` separate
    * documents before it is cut anywhere.
    *
    * Scale shape: identical to [[substringDedup]] except the key
    * aggregation counts per-doc-distinct windows (the per-row
    * projection `array_distinct`s window keys inside the doc before
    * exploding, so the count aggregation stays a plain two-phase
    * count — no count-distinct expand). The boilerplate key set is the
    * df >= minDf heavy-hitter tail — small by construction — so the
    * join back is AQE-broadcast. Everything downstream (span merge,
    * indexed-lambda cut) is per-doc bounded.
    *
    * Returns (doc_id, n_tokens, boiler_tokens, boiler_frac, clean_text).
    */
  def boilerplateCut(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDf: Int = 10,
      hashWindows: Boolean = true): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minDf >= 2, s"minDf must be >= 2 (a window is always in its own doc), got $minDf")
    def winKey(c: Column): Column = if (hashWindows) xxhash64(c) else c
    val base = fanOut(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t")))
      .select(col("doc_id"),
        filter(split(col("__t"), " "), t => t =!= "").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"))
    val wins = base.select(col("doc_id"),
      posexplode(when(col("n_tokens") >= n,
        transform(sequence(lit(0), col("n_tokens") - lit(n)),
          i => winKey(concat_ws(" ", slice(col("toks"), i + lit(1), lit(n))))))))
      .select(col("doc_id"), col("pos").as("start"), col("col").as("key"))
    // document frequency: distinct keys INSIDE the row first, so the
    // global agg is a plain count of (doc, key)-unique rows
    val docKeys = base.select(col("doc_id"),
      explode(when(col("n_tokens") >= n, array_distinct(
        transform(sequence(lit(0), col("n_tokens") - lit(n)),
          i => winKey(concat_ws(" ", slice(col("toks"), i + lit(1), lit(n)))))))).as("key"))
    val boilerKeys = docKeys.groupBy(col("key"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .select(col("key"))
    val dupWins = wins.join(boilerKeys, "key").select(col("doc_id"), col("start"))
    cutSpans(base, dupWins, n, "boiler_tokens", "boiler_frac")
  }

  /** Shared span-merge-and-cut tail of [[substringDedup]] and
    * [[boilerplateCut]]: merge flagged fixed-length windows into maximal
    * per-doc spans (gaps-and-islands: a window merges into the running
    * span when its start is within the running max end + 1 — adjacent
    * coverage is contiguous coverage), then cut the covered tokens.
    *
    * `base` is (doc_id, toks, n_tokens); `dupWins` is (doc_id, start)
    * rows of flagged windows of length `winLen`. The window function
    * runs over FLAGGED windows only; reconstruction is an indexed-lambda
    * `filter` against the per-doc span array (bounded by the doc's own
    * length). Nothing is pairwise, nothing collects.
    */
  private def cutSpans(
      base: DataFrame,
      dupWins: DataFrame,
      winLen: Int,
      cutTokensCol: String,
      cutFracCol: String): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val spans = dupWins
      .withColumn("prev_end",
        max(col("start") + lit(winLen - 1))
          .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_end").isNull || col("prev_end") < col("start") - 1, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(byDoc))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("start")).as("lo"),
        (max(col("start")) + lit(winLen - 1)).as("hi"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(sum(col("hi") - col("lo") + 1).as("__cut"),
        collect_list(struct(col("lo"), col("hi"))).as("spans"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("__cut"), lit(0L)).as(cutTokensCol),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(coalesce(col("__cut"), lit(0L)).cast("double") /
            col("n_tokens"), 6)).as(cutFracCol),
        concat_ws(" ", filter(col("toks"), (t, i) =>
          coalesce(!exists(col("spans"),
            s => i >= s("lo") && i <= s("hi")), lit(true)))).as("clean_text"))
  }
}
