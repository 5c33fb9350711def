package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL semantic dedup — the store-probe ingest shape of
  * [[SemDedup]] (r16 verdict #3), completing the ingest story the way
  * exact and MinHash dedup already have it
  * ([[IncrementalDedup.ingestVerdict]]): a persisted centroid index +
  * keeper set answers "is this new doc a semantic dup of anything KEPT
  * so far" with work proportional to the BATCH, never a corpus
  * recluster.
  *
  * The index is (fixed centers, kept vectors, epsilon). A probe batch
  * is assigned to the SAME centers by the SAME rule as the batch path
  * ([[SemDedup.assignFixed]] — one shared definition), then compared
  * within-cluster against (a) the stored keepers and (b) smaller-id
  * co-batch docs, at the same round-6 cosine threshold the batch path
  * uses. `dup_of` = the best match (highest cosine, ties to the lowest
  * id); null = novel, and [[ingest]] appends exactly the novel docs to
  * the keeper store — duplicates are never stored, so the index grows
  * with the corpus's novel mass, not its arrival rate (the
  * [[IncrementalDedup.ingestStream]] property, semantically).
  *
  * SEQUENTIAL SEMANTICS, stated honestly: like every store-only-keepers
  * scheme, a probe compares against KEPT representatives, not every
  * vector ever seen. When batch ids are monotone (every batch id
  * exceeds all previously admitted ids — the natural ingest numbering,
  * the same contract [[IncrementalDedup.ingestStream]] documents) and
  * duplicate groups are tight (every member within epsilon of the
  * group's keeper — the regime SemDeDup targets), the incremental keep
  * set equals the batch [[SemDedup.semDedupFixed]] keep set —
  * spec-pinned on exactly that regime (SemDedupIndexSpec).
  *
  * The divergence, QUANTIFIED (r17 verdict #5): ε-chains are where the
  * two semantics legitimately part. On a pure chain A1–…–AL in the
  * ε-graph (consecutive docs within ε, nothing else), batch components
  * keep exactly 1 (the min id); per-doc sequential ingest keeps the
  * alternating ⌈L/2⌉ docs (each interior dup is suppressed from the
  * store, so its far neighbor probes clean) — worst case ⌈L/2⌉ − 1
  * extra keepers PER CHAIN, and never fewer than batch (sequential
  * keepers form an independent set of the chain containing its min id;
  * both paths always keep A1). Ingesting a chain in ONE batch matches
  * batch semantics exactly (the co-batch smaller-id compare links
  * interior dups the way components do). All three behaviors are
  * spec-pinned on an adversarial 5-chain fixture (SemDedupIndexSpec).
  * Operationally: sequential ingest over-KEEPS (safe for training-data
  * dedup — more data survives, never a silently dropped novel doc);
  * periodic re-consolidation is one [[SemDedupIndex.build]] over the
  * kept corpus.
  *
  * Scale shape: the probe is one broadcast assignment over the batch +
  * one within-cluster equi-join against the keeper store — the store
  * side is read once, filtered to the batch's clusters, and NEVER
  * rescanned per doc; cost is O(batch × avg keeper-cluster size). The
  * rule-9 probe-shaped measurement (fixed batch vs growing keeper
  * store) lives in docs/SCALE.md. Keeper clusters are bounded at build
  * time by [[SemDedup.semDedupFixed]]'s maxClusterSize refusal; the
  * probe re-checks the BATCH side (a skewed batch cluster would
  * otherwise run the quadratic co-batch compare).
  *
  * Persistence (`write`/`read`, format v3): `path/keepers` parquet
  * PARTITIONED BY cluster + `path/centers` + `path/semindex.json`
  * (formatVersion, epsilon, k, dim, centerDigest, a PER-CLUSTER keeper
  * CONTENT digest map — vectors digest via their sortable-bits longs,
  * the [[SketchIo]] float rule, so digests are
  * JVM-formatter-independent — and a PER-CLUSTER FILE-STATUS digest
  * map over part-file names + lengths). `read` recomputes every
  * content digest and refuses corruption, like every sketch handle;
  * the cluster-partition layout + per-cluster digests are what make
  * [[SemDedupIndex.ingestInto]]'s batch-cadence write-back
  * O(touched clusters) instead of O(store), and the file-status map is
  * what makes its per-batch VALIDATION a directory listing instead of
  * a data read (v3, r19 verdict #2). The reference engine has no
  * incremental component at all (whole-corpus batch runs); this is
  * `graft.ops` pipeline surface beyond it.
  */
final case class SemDedupIndex(
    keepers: DataFrame,
    centers: Array[Array[Double]],
    epsilon: Double) {

  /** Verdicts for a probe batch WITHOUT updating the index: one row per
    * batch doc — (id, cluster, centroid_sim, dup_of, n_dup_matches,
    * keep). `dup_of` is the best match (highest ROUND-6 cosine, ties to
    * the lowest id) among same-cluster stored keepers and smaller-id
    * co-batch docs at round-6 cosine ≥ epsilon; `keep` = no match.
    * Match quality is defined at 6-decimal granularity END TO END —
    * threshold AND best-match ordering — because a raw float driving
    * the argmax is the rule-1 ban (two engines' cosine sums can differ
    * a ulp and flip the winner; at 6dp the id tiebreak owns that zone).
    * Batch ids must be unique and disjoint from stored keeper ids.
    *
    * The returned verdict frame comes back PERSISTED (the skew guard
    * materializes it) and the CALLER OWNS THE RELEASE — unpersist it
    * when done, or a long-running probe/ingest loop accumulates cached
    * verdict frames until executor storage pressure (the
    * [[Sketches.topKExact]] contract).
    */
  def probe(batch: DataFrame, idCol: String, vecCol: String,
      maxClusterSize: Int = 20000): DataFrame = {
    val (assigned, counts) = assignPersisted(batch, idCol, vecCol)
    try probeAssigned(assigned, maxClusterSize, counts)
    finally assigned.unpersist()
  }

  /** Assign + persist, returning the per-cluster batch counts from the
    * SAME job that materializes the cache (r20: was a count() followed
    * by a second skew-guard aggregation inside [[probeAssigned]]).
    */
  private def assignPersisted(batch: DataFrame, idCol: String,
      vecCol: String): (DataFrame, Array[(Long, Long)]) = {
    val assigned = SemDedup.assignFixed(batch, idCol, vecCol, centers)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (assigned, counts)
  }

  /** The shared probe body over an already-assigned batch — [[ingest]]
    * reuses the SAME assigned frame for its keeper append instead of
    * paying the batch × k-centers assignment twice (r17 review).
    * `clusterCounts` are the per-cluster batch sizes the assignment job
    * already collected, so the skew guard costs no extra job.
    */
  private[ops] def probeAssigned(assigned: DataFrame,
      maxClusterSize: Int, clusterCounts: Array[(Long, Long)]): DataFrame = {
    {
      // refuse a quadratic co-batch compare on a skewed batch cluster
      // (the semDedupFixed guard, applied to the probe side)
      val oversized = clusterCounts.filter(_._2 > maxClusterSize)
        .sortBy { case (c, n) => (-n, c) }.take(5)
      require(oversized.isEmpty,
        "SemDedupIndex.probe: batch cluster(s) exceed maxClusterSize=" +
          maxClusterSize + ": " +
          oversized.map { case (c, n) => s"cluster $c has $n rows" }
            .mkString("; ") +
          ". Rebuild the index with more centers (SemDedup.balancedK) or " +
          "raise maxClusterSize.")
      // store side: renamed columns (shared-lineage self-join trap,
      // rule 13b) and filtered to the batch's clusters via the join key
      val store = keepers.select(col("id").as("k_id"),
        col("cluster"), col("v").as("kv"))
      // msim is the ROUND-6 cosine: it drives both the threshold and
      // the best-match ordering (rule 1 — a raw-float argmax can flip
      // between engines; the q_incremental_dedup integer-micro-units
      // discipline, at the granularity the threshold already uses)
      val vsStore = assigned.join(store, Seq("cluster"))
        .select(col("id"), col("k_id").as("match_id"),
          round(graft.functions.ArrayMath.cosine(col("v"), col("kv")), 6)
            .as("msim"))
        .where(col("msim") >= epsilon)
      val b = assigned.select(col("cluster"), col("id").as("b_id"),
        col("v").as("bv"))
      val vsBatch = assigned.join(b, Seq("cluster"))
        .where(col("b_id") < col("id"))
        .select(col("id"), col("b_id").as("match_id"),
          round(graft.functions.ArrayMath.cosine(col("v"), col("bv")), 6)
            .as("msim"))
        .where(col("msim") >= epsilon)
      val matches = vsStore.unionByName(vsBatch)
      val best = matches.groupBy(col("id"))
        .agg(
          max_by(struct(col("msim"), (-col("match_id")).as("neg_id")),
            struct(col("msim"), (-col("match_id")).as("neg_id"))).as("bm"),
          count(lit(1)).as("n_dup_matches"))
        .select(col("id"), (-col("bm.neg_id")).as("dup_of"),
          col("n_dup_matches"))
      val out = assigned.drop("v")
        .join(best, Seq("id"), "left")
        .select(col("id"), col("cluster"), col("centroid_sim"),
          col("dup_of"), coalesce(col("n_dup_matches"), lit(0L)).as("n_dup_matches"),
          col("dup_of").isNull.as("keep"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try out.count()
      catch { case t: Throwable => out.unpersist(); throw t }
      out
    }
  }

  /** Operational health of the index — the fixed-centers design
    * DEGRADES as the store grows past what the centers were trained
    * for (clusters fatten, probe pair-work grows, and a fatter cluster
    * is also a coarser semantic bucket), and nothing else surfaces
    * that drift until a probe hits the maxClusterSize refusal. One
    * tiny aggregation over the keeper frame: (n_keepers, k,
    * max_cluster, avg_cluster, recommended_k) — when `recommended_k`
    * ([[SemDedup.balancedK]] of the CURRENT store) is well above `k`,
    * rebuild the index with fresh centers at the next maintenance
    * window — [[SemDedupIndex.rebalance]] is that operation in one
    * call (keeper set preserved; never a re-dedup of history).
    */
  def health(): DataFrame = {
    val spark = keepers.sparkSession
    import spark.implicits._
    val row = keepers.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_keepers"),
        coalesce(max(col("n")), lit(0L)).as("max_cluster"))
      .head()
    val n = row.getLong(0)
    Seq((n, centers.length, row.getLong(1),
      if (centers.length == 0) 0.0 else n.toDouble / centers.length,
      SemDedup.balancedK(n)))
      .toDF("n_keepers", "k", "max_cluster", "avg_cluster", "recommended_k")
  }

  /** [[probe]] + append the batch's novel docs to the keeper store:
    * returns (verdicts, updated index). The batch is assigned ONCE and
    * shared between the probe and the keeper append; the appended rows
    * are localCheckpoint'd (batch-sized), so the new index's only
    * storage lineage is the OLD keeper frame — which [[write]]'s
    * stage-and-swap makes safe to persist back over the same path.
    *
    * Like [[probe]], the verdict frame comes back PERSISTED and the
    * caller owns its unpersist — in an ingest LOOP, release each
    * batch's verdicts once consumed or cached frames accumulate across
    * the run.
    */
  def ingest(batch: DataFrame, idCol: String, vecCol: String,
      maxClusterSize: Int = 20000): (DataFrame, SemDedupIndex) = {
    val (assigned, counts) = assignPersisted(batch, idCol, vecCol)
    try {
      val verdicts = probeAssigned(assigned, maxClusterSize, counts)
      val newKeepers = assigned
        .join(verdicts.where(col("keep")).select(col("id")), Seq("id"))
        .select(col("id"), col("cluster"), col("v"))
        .localCheckpoint(true)
      (verdicts, copy(keepers = keepers.unionByName(newKeepers)))
    } finally assigned.unpersist()
  }
}

object SemDedupIndex {

  /** Layout/compat marker for the on-disk format. v2 (r18 verdict #1):
    * the keeper store is parquet PARTITIONED BY cluster and the
    * manifest carries PER-CLUSTER digests, so an ingest batch
    * overwrites (and re-digests) only the cluster partitions it
    * touched — write-back cost ∝ batch clusters, never store size.
    * v3 (r19 verdict #2): the manifest ADDITIONALLY carries per-cluster
    * FILE-STATUS digests (part-file names + lengths), so the
    * batch-cadence validation and post-write re-digest are directory
    * listings — zero data reads, zero Spark jobs — while the content
    * digests (now computed from the in-memory frame AT write time,
    * which is strictly stronger: a silently-partial write can no
    * longer bless itself by being re-read) still guard the full
    * [[read]] bootstrap.
    */
  val FormatVersion = 3

  /** XOR digest over a cluster partition's DATA-file statuses (name +
    * length; hidden/_metadata files excluded) — the zero-read
    * batch-cadence validation primitive of the v3 manifest. `None` when
    * the partition directory does not exist (distinct from an existing
    * empty directory, which digests to 0). Every committed rewrite of a
    * partition produces fresh part-file names (Spark's task UUIDs), so
    * the crash window between a partition overwrite and the manifest
    * merge still refuses loudly, exactly as the content digests did.
    */
  private def fileStatusDigest(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(dir)) None
    else Some(fs.listStatus(dir)
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .map(s => graft.util.Hashing.md5Long(
        s.getPath.getName + "\u001f" + s.getLen))
      .foldLeft(0L)(_ ^ _))

  /** File-status digests ([[fileStatusDigest]]) for every `cluster=c`
    * partition under `live` (or for just `clusters` when given) — pure
    * directory listings, no data read.
    */
  private def fileDigestsOf(fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path,
      clusters: Option[Seq[Long]] = None): Map[Long, Long] = clusters match {
    case Some(cs) =>
      cs.flatMap(c => fileStatusDigest(fs,
        new org.apache.hadoop.fs.Path(live, s"cluster=$c")).map(c -> _)).toMap
    case None =>
      if (!fs.exists(live)) Map.empty
      else fs.listStatus(live)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cluster="))
        .flatMap { s =>
          val c = s.getPath.getName.stripPrefix("cluster=").toLong
          fileStatusDigest(fs, s.getPath).map(c -> _)
        }.toMap
  }

  /** Bootstrap an index from an initial corpus: the full batch
    * [[SemDedup.semDedupFixed]] recipe (components + keeper rule) runs
    * once, and its keep=true rows become the store. Returns (the full
    * audit verdicts for the corpus, the index). The keeper extraction
    * REUSES the assignment frame the dedup pass already computed and
    * persisted — one broadcast-assignment pass total, not two (r17
    * advice) — and the index's keeper frame comes back PERSISTED (so
    * probes against it never recompute the bootstrap assignment);
    * the caller owns the release of both returned frames
    * (keepers via `index.keepers.unpersist()` once the index is
    * written or retired, verdicts once consumed).
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Array[Array[Double]],
      epsilon: Double,
      keeper: String = SemDedup.KeepMinId,
      maxClusterSize: Int = 20000): (DataFrame, SemDedupIndex) = {
    val (assigned, verdicts) = SemDedup.semDedupFixedWithAssigned(corpus,
      idCol, vecCol, centers, epsilon, keeper, maxClusterSize)
    val kept = assigned
      .join(verdicts.where(col("keep")).select(col("id")), Seq("id"))
      .select(col("id"), col("cluster"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try kept.count()
    catch { case t: Throwable => kept.unpersist(); throw t }
    finally assigned.unpersist()
    (verdicts, SemDedupIndex(kept, centers, epsilon))
  }

  /** [[build]] with centers TRAINED here (spherical k-means, the
    * [[SemDedup.semDedup]] recipe) instead of caller-supplied — the
    * one-call bootstrap: pick k with [[SemDedup.balancedK]] of the
    * corpus count unless you know better. The fitted centers freeze
    * into the index (that is the design: probe assignment must match
    * build assignment forever); [[SemDedupIndex.health]] tells you
    * when the frozen centers have been outgrown.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      epsilon: Double,
      seed: Long = 42L,
      maxIter: Int = 10,
      keeper: String = SemDedup.KeepMinId,
      maxClusterSize: Int = 20000): (DataFrame, SemDedupIndex) = {
    val model = new graft.clustering.GeneralizedKMeans()
      .setK(k).setDivergence("spherical").setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol(vecCol)
      .fit(corpus)
    build(corpus, idCol, vecCol, model.clusterCenters, epsilon, keeper,
      maxClusterSize)
  }

  /** Refresh the index's PARTITIONING at caller-supplied centers — the
    * maintenance operation [[SemDedupIndex.health]] recommends when the
    * store has outgrown its frozen centers. The keeper SET is preserved
    * exactly (this is maintenance, not a re-dedup: a doc kept under the
    * old centers stays kept — re-running the dedup would re-litigate
    * ε-verdicts across the whole history); every keeper re-assigns to
    * its nearest new center by the shared [[SemDedup.assignFixed]]
    * rule, and the same maxClusterSize refusal guards the result. One
    * broadcast pass over the store; the returned index's keepers come
    * back persisted (caller owns the release, like [[build]]).
    * Deterministic given the centers — gate-verified
    * (q_semdedup_rebalance). The trained-centers form is [[rebalance]].
    */
  def rebalanceTo(index: SemDedupIndex, centers: Array[Array[Double]],
      maxClusterSize: Int = 20000): SemDedupIndex = {
    val reassigned = SemDedup.assignFixed(
      index.keepers.select(col("id"), col("v")), "id", "v", centers)
      .select(col("id"), col("cluster"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one job materializes the cache AND yields the skew-guard counts
    // (r20: was a count() + a second groupBy-collect)
    val counts =
      try reassigned.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      catch { case t: Throwable => reassigned.unpersist(); throw t }
    val oversized = counts.filter(_._2 > maxClusterSize)
      .sortBy { case (c, n) => (-n, c) }.take(5)
    if (oversized.nonEmpty) {
      reassigned.unpersist()
      throw new IllegalArgumentException(
        "SemDedupIndex.rebalanceTo: cluster(s) exceed maxClusterSize=" +
          maxClusterSize + " at the NEW centers: " +
          oversized.map { case (c, n) => s"cluster $c has $n rows" }
            .mkString("; ") +
          ". Train more centers (SemDedup.balancedK of the store) or raise " +
          "maxClusterSize.")
    }
    SemDedupIndex(reassigned, centers, index.epsilon)
  }

  /** The one-call maintenance rebuild: train FRESH spherical centers on
    * the CURRENT keeper corpus (k defaults to [[SemDedup.balancedK]] of
    * the store size — exactly what [[SemDedupIndex.health]] reports as
    * `recommended_k`) and re-partition the store at them via
    * [[rebalanceTo]]. Write the result over the old path at the
    * maintenance window; probes against the new index use the new
    * centers from then on.
    */
  def rebalance(index: SemDedupIndex, k: Int = 0, seed: Long = 42L,
      maxIter: Int = 10, maxClusterSize: Int = 20000): SemDedupIndex = {
    val n = index.keepers.count()
    require(n > 0, "SemDedupIndex.rebalance: empty keeper store")
    val kk = if (k > 0) k else SemDedup.balancedK(n)
    val model = new graft.clustering.GeneralizedKMeans()
      .setK(kk).setDivergence("spherical").setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("v")
      .fit(index.keepers.select(col("id"), col("v")))
    rebalanceTo(index, model.clusterCenters, maxClusterSize)
  }

  /** py4j bridge for [[rebalanceTo]]: centers as a k-row (cluster, cv)
    * frame (the [[buildDf]] pattern).
    */
  def rebalanceToDf(index: SemDedupIndex, centersDf: DataFrame,
      maxClusterSize: Int): SemDedupIndex =
    rebalanceTo(index,
      centersDf.select(col("cluster").cast("long").as("cluster"),
          col("cv").cast("array<double>").as("cv"))
        .orderBy("cluster").collect().map(_.getSeq[Double](1).toArray),
      maxClusterSize)

  /** STREAMING ingest — the semantic twin of
    * [[IncrementalDedup.ingestStream]]: each micro-batch is probed
    * against the persisted index at `path`, its novel docs are admitted
    * to the keeper store, and the batch's verdict frame goes to `sink`.
    * Bootstrap the index FIRST ([[build]]/[[train]] + [[write]]) — the
    * frozen centers are the design (probe assignment must match build
    * assignment forever; [[SemDedupIndex.health]] audits the drift),
    * so a stream cannot self-bootstrap.
    *
    * REPLAY SAFETY without a commit marker: unlike the MinHash store
    * (bucketed APPEND tables, which need the batch-id marker to gate
    * re-appends), each batch's cycle is idempotent by construction —
    * [[ingestInto]] anti-joins the batch's own ids out of the touched
    * cluster partitions before probing, so a replayed batch (restart
    * between the MANIFEST merge and the checkpoint commit) sees
    * exactly the pre-batch store, produces the identical verdicts
    * (at-least-once to `sink`), and rewrites the touched partitions to
    * identical content (exactly-once effectively). The ONE window this
    * does not cover: a crash between the partition overwrite and the
    * manifest merge leaves the touched clusters' digests stale, and
    * the replay REFUSES on them ("digest mismatch") rather than
    * converging — the refuse-loudly contract, never silently-wrong
    * verdicts; recovery is [[repairManifest]] (re-digest the current
    * payload after confirming the refusal traces to a crashed ingest,
    * not unexplained corruption), then restart the stream. Batch ids
    * must be unique within the STREAM's lifetime (the monotone-id
    * ingest contract above); ids may collide with a crashed attempt's
    * — that is the case the anti-join heals.
    *
    * Cost shape per batch (v2, r18 verdict #1): one broadcast
    * assignment over the batch, one cluster-equi-join probe against the
    * TOUCHED cluster partitions only, and one dynamic-partition
    * overwrite + re-digest of those same clusters —
    * O(batch + touched-cluster keepers) end to end, independent of
    * store size (v1 paid a full store rewrite + full re-digest per
    * batch; docs/SCALE.md has the before/after curve). Untouched
    * partitions are physically untouched.
    */
  def ingestStream(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      maxClusterSize: Int = 20000): org.apache.spark.sql.streaming.StreamingQuery = {
    require(vectors.isStreaming,
      "SemDedupIndex.ingestStream needs a streaming frame; use ingest for batch")
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch
          .select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (b.count() > 0) {
            val verdicts = ingestInto(spark, path, b, "id", "v", maxClusterSize)
            try sink(verdicts, batchId)
            finally verdicts.unpersist()
          }
        } finally b.unpersist()
        ()
      }
      .start()
  }

  /** PARTITION-SCOPED ingest against a WRITTEN index at `path` — the
    * scale-safe batch/stream write-back (r18 verdict #1, replacing the
    * whole-store stage-and-swap on the ingest cadence): probe the batch
    * against only the cluster partitions it assigns to, admit the novel
    * docs, and dynamic-partition-overwrite ONLY those clusters —
    * validation, rewrite, and re-digesting all cost
    * O(batch + touched-cluster keepers), never O(store). Returns the
    * batch's verdict frame (persisted via localCheckpoint; caller owns
    * the release), identical by definition to [[SemDedupIndex.probe]]'s
    * against the same store (the q_semdedup_incremental oracle).
    *
    * Mechanics per batch:
    *  1. manifest + centers load (k-row, validated against centerDigest);
    *  2. broadcast assignment of the batch → the touched cluster set
    *     (the same job carries the skew-guard counts);
    *  3. validate the touched clusters' FILE-STATUS digests from
    *     directory listings (v3, r19 verdict #2 — zero data reads, zero
    *     Spark jobs; a crashed ingest's rewritten partitions carry fresh
    *     part-file names, so the crash window still refuses);
    *  4. read ONLY `keepers/cluster=c` for touched c (explicit partition
    *     paths — pruning by construction) and replay-heal: anti-join the
    *     batch's own ids out of the loaded slice (a replayed batch's
    *     earlier novel rows land in exactly the clusters it re-assigns
    *     to, so the touched slice covers them — same contract as
    *     [[ingestStream]]);
    *  5. probe + novel extraction (the [[SemDedupIndex.ingest]] body);
    *  6. localCheckpoint the replacement rows (heal ∪ novel) to cut the
    *     lineage on `path/keepers`, content-digest that SNAPSHOT (the
    *     exact rows being written — one job over the checkpoint, no
    *     post-write re-read), then ONE `partitionOverwriteMode=dynamic`
    *     write — untouched cluster partitions are physically untouched
    *     (spec-pinned file-listing identity);
    *  7. list the touched partitions' file statuses (what LANDED) and
    *     merge both digest maps into the manifest.
    *
    * Idempotent by construction: a replay re-derives identical verdicts
    * against the healed pre-batch view and rewrites the touched
    * partitions to identical content (exactly-once effectively,
    * at-least-once to the caller's sink). The crash window between the
    * partition write (6) and the manifest merge (7) leaves stale
    * digests on the touched clusters — the next validation refuses
    * loudly (the [[write]] contract; never silently-wrong verdicts).
    * Batch ids must be unique and disjoint from OTHER batches' ids for
    * the store's lifetime (the monotone-id ingest contract); colliding
    * with a crashed attempt of the SAME batch is the healed case.
    */
  def ingestInto(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      maxClusterSize: Int = 20000): DataFrame = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "semindex.json",
      "SemDedupIndex.ingestInto"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"SemDedupIndex.ingestInto: formatVersion $ver unsupported (expected $FormatVersion)")
    val epsilon = (meta \ "epsilon").extract[Double]
    val storedDigs = (meta \ "keeperDigests").extract[Map[String, Long]]
      .map { case (c, d) => c.toLong -> d }
    val storedFiles = (meta \ "keeperFiles").extract[Map[String, Long]]
      .map { case (c, d) => c.toLong -> d }
    val centersDf = spark.read.parquet(s"$path/centers")
    require(centerDigest(centersDf) == (meta \ "centerDigest").extract[Long],
      s"SemDedupIndex.ingestInto: centers digest mismatch at $path/centers - " +
        "refusing a corrupted index")
    val centers = centersDf.orderBy("cluster").collect()
      .map(r => r.getSeq[Double](1).toArray)
    require(centers.length == (meta \ "k").extract[Int],
      s"SemDedupIndex.ingestInto: centers on disk desynchronized from semindex.json")

    val live = new org.apache.hadoop.fs.Path(path, "keepers")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partDir(c: Long) = new org.apache.hadoop.fs.Path(live, s"cluster=$c")
    def readClusters(cs: Seq[Long]): DataFrame =
      if (cs.isEmpty) emptyKeepers(spark)
      else spark.read.option("basePath", live.toString)
        .parquet(cs.map(c => partDir(c).toString): _*)
        .select(col("id"), col("cluster").cast("long").as("cluster"), col("v"))

    val assigned = SemDedup.assignFixed(batch, idCol, vecCol, centers)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one job materializes the cache AND yields the touched-cluster
      // set + the skew-guard counts (r19: was a count() followed by a
      // distinct().collect(); r20: the counts also feed probeAssigned's
      // guard, dropping its separate aggregation job)
      val clusterCounts = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val touched = clusterCounts.map(_._1).sorted.toSeq
      if (touched.isEmpty) return probeEmptyResult(assigned)
      // manifest/dir consistency over the touched set, both directions —
      // v3: FILE-STATUS digests from directory listings, zero data reads
      // and zero Spark jobs (was a parquet re-read + digest aggregation
      // of every touched partition)
      checkClusterDigests(fileDigestsOf(fs, live, Some(touched)),
        storedFiles.filter { case (c, _) => touched.contains(c) }, path,
        "SemDedupIndex.ingestInto", "the touched clusters",
        remediation = ". If this follows a CRASHED ingest (died between " +
          "the partition overwrite and the manifest merge), " +
          "SemDedupIndex.repairManifest re-digests the current payload; " +
          "for unexplained corruption, restore from a backup instead")
      val onDisk = touched.filter(c => fs.exists(partDir(c))).toSet
      val storeT = readClusters(touched.filter(onDisk))
      val batchIds = assigned.select(col("id"))
      val healed = storeT.join(batchIds, Seq("id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      healed.count()
      // release the working caches even when the skew refusal (or the
      // overwrite) throws — a long-running ingest loop must not
      // accumulate cached frames across refused batches
      val (replacement, verdicts) =
        try {
          val idx = SemDedupIndex(healed, centers, epsilon)
          val verdicts0 = idx.probeAssigned(assigned, maxClusterSize,
            clusterCounts)
          try {
            val novel = assigned
              .join(verdicts0.where(col("keep")).select(col("id")), Seq("id"))
              .select(col("id"), col("cluster"), col("v"))
            // snapshot BEFORE the overwrite: both frames' lineage reads
            // the partitions the dynamic write is about to replace
            (healed.unionByName(novel).localCheckpoint(true),
              verdicts0.localCheckpoint(true))
          } finally verdicts0.unpersist()
        } finally healed.unpersist()
      // content digests of the touched clusters come from the SNAPSHOT
      // being written (v3): one job over the localCheckpoint instead of
      // a parquet re-read of the partitions after the write — and
      // strictly stronger than re-reading, since a silently-partial
      // write now mismatches the recorded digest instead of blessing it
      val newDigs = keeperClusterDigests(replacement.select("id", "cluster", "v"))
      replacement.select("id", "cluster", "v")
        .repartition(col("cluster"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster")
        .parquet(live.toString)
      // rule 13b: drop the stale file listing for the replaced partitions
      spark.catalog.refreshByPath(live.toString)
      // file-status digests of the touched clusters from what LANDED
      // (a listing, no data read) and merge both maps — O(touched)
      val newFiles = fileDigestsOf(fs, live, Some(touched))
      writeManifest(spark, path, epsilon, centers.length,
        centers.head.length, (meta \ "centerDigest").extract[Long],
        storedDigs -- touched ++ newDigs,
        storedFiles -- touched ++ newFiles)
      verdicts
    } finally assigned.unpersist()
  }

  /** The zero-row verdict frame with [[SemDedupIndex.probe]]'s schema —
    * an empty ingest batch probes to nothing and must write nothing.
    * localCheckpoint'd so the empty path honors the same
    * "returned persisted; caller owns the release" contract as the
    * main path (r19 review: a caller's unpersist must never be a no-op
    * on a lineage that still reads the batch).
    */
  private def probeEmptyResult(assigned: DataFrame): DataFrame =
    assigned.limit(0)
      .select(col("id"), col("cluster"), col("centroid_sim"),
        lit(null).cast("long").as("dup_of"), lit(0L).as("n_dup_matches"),
        lit(true).as("keep"))
      .localCheckpoint(true)

  /** Operator recovery for [[ingestInto]]'s ONE refused crash window
    * (died between the partition overwrite and the manifest merge —
    * the stream then refuses "digest mismatch" on every restart):
    * re-digest ALL cluster partitions from the CURRENT keeper payload
    * and rewrite the manifest. EXPLICIT-INTENT tool — it blesses
    * whatever keeper rows are on disk, so run it only when the refusal
    * traces to a crashed ingest, never for unexplained corruption
    * (restore a backup there). Geometry is NOT blessed: the centers
    * digest is re-validated, so a corrupted quantizer still refuses.
    * Returns the number of cluster digest entries that changed.
    */
  def repairManifest(spark: SparkSession, path: String): Long = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "semindex.json",
      "SemDedupIndex.repairManifest"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"SemDedupIndex.repairManifest: formatVersion $ver unsupported")
    val centersDf = spark.read.parquet(s"$path/centers")
    val cDig = (meta \ "centerDigest").extract[Long]
    require(centerDigest(centersDf) == cDig,
      s"SemDedupIndex.repairManifest: centers digest mismatch at " +
        s"$path/centers - the quantizer itself is corrupted; repair only " +
        "re-digests keeper partitions, restore the centers from a backup")
    val storedDigs = (meta \ "keeperDigests").extract[Map[String, Long]]
      .map { case (c, d) => c.toLong -> d }
    val storedFiles = (meta \ "keeperFiles").extract[Map[String, Long]]
      .map { case (c, d) => c.toLong -> d }
    val live = new org.apache.hadoop.fs.Path(path, "keepers")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasClusters = fs.exists(live) && fs.listStatus(live)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("cluster="))
    val fresh =
      if (!hasClusters) Map.empty[Long, Long]
      else {
        spark.catalog.refreshByPath(live.toString)
        keeperClusterDigests(spark.read.parquet(live.toString))
      }
    val freshFiles = fileDigestsOf(fs, live)
    writeManifest(spark, path, (meta \ "epsilon").extract[Double],
      (meta \ "k").extract[Int], (meta \ "dim").extract[Int], cDig, fresh,
      freshFiles)
    ((storedDigs.keySet ++ fresh.keySet ++ storedFiles.keySet ++
        freshFiles.keySet)
      .count(c => storedDigs.get(c) != fresh.get(c) ||
        storedFiles.get(c) != freshFiles.get(c))).toLong
  }

  /** py4j bridge: centers as a k-row (cluster, cv) frame ordered by
    * cluster — the [[Prototypes]] Df pattern (a nested double matrix
    * does not ride the gateway). k-row driver collect, model state.
    */
  def buildDf(corpus: DataFrame, idCol: String, vecCol: String,
      centersDf: DataFrame, epsilon: Double, keeper: String,
      maxClusterSize: Int): (DataFrame, SemDedupIndex) =
    build(corpus, idCol, vecCol,
      centersDf.select(col("cluster").cast("long").as("cluster"),
          col("cv").cast("array<double>").as("cv"))
        .orderBy("cluster").collect().map(_.getSeq[Double](1).toArray),
      epsilon, keeper, maxClusterSize)

  /** PER-CLUSTER digest map for the keeper frame (one grouped
    * aggregation): vectors ride as their sortable-bits longs rendered
    * through the array cast — the [[SketchIo.canonicalCol]] float rule
    * applied element-wise, so the digest never depends on a JVM double
    * formatter. Per-cluster granularity is the v2 point (and v3
    * computes these from the in-memory frame being written, never a
    * re-read): [[ingestInto]] re-digests ONLY the clusters a batch
    * touched; [[read]] validates them all. ≤ k rows collected
    * (quantizer-sized, model state).
    */
  private def keeperClusterDigests(df: DataFrame): Map[Long, Long] =
    SketchIo.xorDigestColsBy(df, col("cluster").cast("long"),
      Seq(col("id"),
        transform(col("v"), x => graft.functions.SortableBits.sortable(x))
          .cast("string")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def centerDigest(df: DataFrame): Long =
    SketchIo.xorDigestCols(df, Seq(col("cluster"),
      transform(col("cv"), x => graft.functions.SortableBits.sortable(x))
        .cast("string")))

  /** Persist keepers + centers + geometry + content digests at `path`
    * (overwrites) — the FULL-store write for bootstrap and the
    * maintenance paths (rebalance/retrain), which legitimately touch
    * every cluster. Batch-cadence writers use [[ingestInto]], which
    * overwrites only touched cluster partitions. Content digests are
    * PER CLUSTER, computed from the in-memory frame being written (v3:
    * no post-write re-read of the store — and a silently-partial write
    * now MISMATCHES the recorded digest at the next [[read]] instead of
    * blessing itself, which is the house rule's "a failed/partial write
    * must not inherit a valid digest" served strictly better); the
    * post-write work is one directory listing for the per-cluster
    * FILE-STATUS digests that gate the batch-cadence validation.
    *
    * The keeper payload is STAGED then swapped (write to
    * `keepers_staged`, park `keepers` aside, rename, delete the parked
    * copy) because the canonical ingest loop — read(path) →
    * ingest(batch) → write back to the SAME path — produces a keeper
    * frame whose lineage still READS `path/keepers`, and Spark refuses
    * a direct overwrite of a path being read (r17 review; a lazy union
    * is the point, not a bug: the old store must never be rescanned
    * eagerly). The park-then-swap order means no crash window deletes
    * the only copy (the [[IvfIndex.swapIndexDir]] discipline); crash
    * windows refuse loudly on the next read: mid-swap leaves no keeper
    * dir (parquet read fails), post-swap-pre-json leaves stale digests
    * ("digest mismatch") — never silently-wrong verdicts.
    */
  def write(index: SemDedupIndex, path: String): Unit = {
    val spark = index.keepers.sparkSession
    require(index.centers.nonEmpty, "SemDedupIndex.write: no centers")
    val dim = index.centers.head.length
    require(index.centers.forall(_.length == dim),
      "SemDedupIndex.write: ragged centers")
    val staged = new org.apache.hadoop.fs.Path(path, "keepers_staged")
    val live = new org.apache.hadoop.fs.Path(path, "keepers")
    val parked = new org.apache.hadoop.fs.Path(path, "keepers_old")
    val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // content digests from the frame BEING written (v3) — computed
    // before the swap because the keeper lineage of an ingest loop
    // still reads the live path; this job doubles as the old isEmpty
    // probe (empty store ⇒ empty digest map) and replaces the
    // full-store parquet re-read that used to follow the swap
    val kDigs = keeperClusterDigests(index.keepers.select("id", "cluster", "v"))
    // repartition by cluster so the partitioned layout lands ~1 file per
    // cluster instead of (#tasks × #clusters) small files; keeper order
    // within a cluster is irrelevant (set semantics, XOR digests)
    index.keepers.select("id", "cluster", "v")
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(staged.toString)
    fs.delete(parked, true)
    if (fs.exists(live))
      require(fs.rename(live, parked),
        s"SemDedupIndex.write: could not park $live aside at $parked")
    require(fs.rename(staged, live),
      s"SemDedupIndex.write: could not swap $staged into place at $live" +
        s" (previous store preserved at $parked — rename it back to recover)")
    fs.delete(parked, true)
    // drop the cached file LISTING for the swapped path: Spark's shared
    // FileStatusCache remembers the old part files and a later read
    // (including this method's own digest recompute) would fail
    // FILE_NOT_EXIST against the pre-swap names
    spark.catalog.refreshByPath(live.toString)
    val centersDf = {
      import spark.implicits._
      index.centers.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toSeq.toDF("cluster", "cv")
    }
    centersDf.write.mode("overwrite").parquet(s"$path/centers")
    val cDig = centerDigest(spark.read.parquet(s"$path/centers"))
    // file-status digests of what LANDED: one directory listing
    writeManifest(spark, path, index.epsilon, index.centers.length, dim,
      cDig, kDigs, fileDigestsOf(fs, live))
  }

  /** The v3 manifest: geometry + center digest + the per-cluster keeper
    * CONTENT digest map + the per-cluster FILE-STATUS digest map (each
    * ≤ k entries — quantizer-sized, like the centers themselves).
    * Shared by [[write]] and [[ingestInto]] (rule 5).
    */
  private def writeManifest(spark: SparkSession, path: String,
      epsilon: Double, k: Int, dim: Int, centerDig: Long,
      keeperDigs: Map[Long, Long], fileDigs: Map[Long, Long]): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val meta =
      ("formatVersion" -> FormatVersion) ~
        ("epsilon" -> epsilon) ~
        ("k" -> k) ~
        ("dim" -> dim) ~
        ("centerDigest" -> centerDig) ~
        ("keeperDigests" -> keeperDigs.map { case (c, d) =>
          (c.toString, d) }) ~
        ("keeperFiles" -> fileDigs.map { case (c, d) =>
          (c.toString, d) })
    SketchIo.writeFile(spark, path, "semindex.json", compact(render(meta)))
  }

  /** The keeper schema is FIXED by construction ([[SemDedup.assignFixed]]
    * casts id to long and vectors to array<double>), so an EMPTY store
    * — which leaves no part files to infer from — reads back as an
    * explicit-schema empty frame.
    */
  private def emptyKeepers(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id", LongType), StructField("cluster", LongType),
        StructField("v", ArrayType(DoubleType)))))
  }

  /** Validate recomputed per-cluster digests against the manifest map:
    * both directions (a cluster present on disk but absent from the
    * manifest is as corrupt as a mismatched digest). `scope` names the
    * validated subset in the refusal ("touched clusters" vs "store").
    */
  private def checkClusterDigests(actual: Map[Long, Long],
      expected: Map[Long, Long], path: String, site: String,
      scope: String, remediation: String = ""): Unit = {
    val bad = (actual.keySet ++ expected.keySet).toSeq.sorted.flatMap { c =>
      (actual.get(c), expected.get(c)) match {
        case (Some(a), Some(e)) if a == e => None
        case (a, e) => Some(s"cluster $c: stored ${e.getOrElse("absent")}, " +
          s"recomputed ${a.getOrElse("absent")}")
      }
    }
    require(bad.isEmpty,
      s"$site: keeper digest mismatch over $scope at $path/keepers (" +
        bad.take(5).mkString("; ") +
        (if (bad.size > 5) s"; … ${bad.size - 5} more" else "") +
        ") - the payload does not match what was written; refusing a " +
        "corrupted index" + remediation)
  }

  /** Load and VALIDATE: geometry from semindex.json, center digest and
    * EVERY per-cluster keeper digest recomputed, center count/dim
    * cross-checked — a corrupted or foreign payload refuses here
    * instead of mis-assigning probes. (Full-store validation is the
    * bootstrap cost, paid once per loop start; per-BATCH validation is
    * [[ingestInto]]'s touched-clusters-only pass.)
    */
  def read(spark: SparkSession, path: String): SemDedupIndex = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmts: Formats = DefaultFormats
    val meta = parse(SketchIo.readFile(spark, path, "semindex.json",
      "SemDedupIndex.read"))
    val ver = (meta \ "formatVersion").extract[Int]
    require(ver == FormatVersion,
      s"SemDedupIndex.read: formatVersion $ver unsupported (expected $FormatVersion)")
    val storedDigs = (meta \ "keeperDigests").extract[Map[String, Long]]
      .map { case (c, d) => c.toLong -> d }
    val keepers =
      if (storedDigs.isEmpty) emptyKeepers(spark)
      else spark.read.parquet(s"$path/keepers")
        .select(col("id"), col("cluster").cast("long").as("cluster"), col("v"))
    val centersDf = spark.read.parquet(s"$path/centers")
    checkClusterDigests(keeperClusterDigests(keepers), storedDigs, path,
      "SemDedupIndex.read", "the store")
    val cDig = (meta \ "centerDigest").extract[Long]
    require(centerDigest(centersDf) == cDig,
      s"SemDedupIndex.read: centers digest mismatch at $path/centers - " +
        "refusing a corrupted index")
    val k = (meta \ "k").extract[Int]
    val dim = (meta \ "dim").extract[Int]
    val centers = centersDf.orderBy("cluster").collect()
      .map(r => r.getSeq[Double](1).toArray)
    require(centers.length == k,
      s"SemDedupIndex.read: ${centers.length} centers on disk vs k=$k in " +
        "semindex.json - refusing a desynchronized index")
    require(centers.forall(_.length == dim),
      s"SemDedupIndex.read: center dim mismatch vs declared dim=$dim")
    SemDedupIndex(keepers, centers, (meta \ "epsilon").extract[Double])
  }
}
