package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

import graft.sources.BucketedCorpus

/** Incremental near-duplicate detection: dedup a NEW ingest batch against
  * an already-ingested corpus without recomputing anything over the
  * corpus — the ingest-time shape of MinHash dedup that a continuously
  * growing 100-TB training corpus actually needs (the batch pipeline in
  * [[Dedup.minhashDedup]] re-signatures the whole corpus per run; an
  * ingest pass must touch work proportional to the BATCH).
  *
  * Architecture:
  *
  *  - The corpus's banded MinHash signatures (id, band, bucket) are
  *    persisted ONCE in a catalog table bucketed by `bucket`
  *    ([[writeStore]] — the [[graft.sources.BucketedCorpus]] discipline).
  *    Store size: `bands` longs + one id per document, independent of
  *    document length.
  *  - At ingest, the batch is signatured (one scan of the batch). A
  *    SMALL batch probes the store only on its own bucket values: the
  *    probe filter is pushed as a literal IN on the bucketing column,
  *    so the scan reads the matching file-buckets
  *    (`SelectedBucketsCount` in the plan) — b docs touch at most
  *    b*bands buckets regardless of store size, the micro-batch/point
  *    regime. A LARGE batch (over `graft.incdedup.maxProbeBuckets`
  *    distinct buckets) instead joins against one full store scan with
  *    the batch side broadcast — the store is read once and NEVER
  *    shuffled, which is the correct large-batch plan (its buckets
  *    cover most of the store, so pruning cannot help).
  *  - Candidates (batch x store plus batch x earlier-batch) are
  *    confirmed with EXACT word-shingle Jaccard — shingles are computed
  *    for the batch and for the MATCHED corpus ids only (semi-join
  *    before the corpus scan), so the confirm step also costs
  *    O(batch + matches), not O(corpus).
  *
  * Jaccard is carried as integer micro-units (inter*1e6 div union —
  * pure integer arithmetic, the house oracle-portability rule), which
  * also makes the best-match ordering float-free.
  *
  * Verdict per batch doc: `dup_of` = the matched id with the highest
  * Jaccard (ties: lowest id), considering the existing corpus AND
  * smaller-id batch docs (so exactly one member of a new duplicate
  * group is admitted, deterministically); `dup_of` null = novel.
  *
  * Recall follows [[Dedup.minhashDedup]]'s banding math: at the default
  * 64 hashes / 32 bands, P(miss | jaccard >= 0.7) ~ 2e-10, so the
  * confirmed output equals the brute-force batch-vs-all answer with
  * near-certainty — which is what lets q_incremental_dedup hash-check
  * against a DuckDB brute-force replay.
  *
  * Reference scope note: the reference engine has no incremental or
  * ingest-time component (its pipelines are whole-corpus batch runs);
  * this operator is LLM-pipeline surface beyond it, same as the rest of
  * `graft.ops`.
  */
object IncrementalDedup {

  /** Banded MinHash signature rows (id, band, bucket) for a corpus
    * slice — the persisted unit of the incremental store. One scan of
    * `df`; `bands` rows per document.
    */
  def bandedSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame =
    Dedup.bandedFromShingles(
      Dedup.fanOut(df.select(col(idCol).cast("long").as("id"), col(textCol).as("__txt")))
        .select(col("id"), TextOps.wordShingles(col("__txt"), shingleSize).as("sh")),
      numHashes, bands)

  /** Persist a banded-signature frame as the incremental store: a
    * catalog table bucketed (and sorted) by `bucket`, so ingest probes
    * bucket-prune. `SaveMode.Append` adds a new batch's signatures after
    * its verdicts are final (Spark appends new files per bucket; the
    * bucketing spec is preserved).
    */
  def writeStore(
      banded: DataFrame,
      table: String,
      numBuckets: Int = 64,
      location: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    BucketedCorpus.write(
      banded.select(col("id"), col("band"), col("bucket")),
      table, "bucket", numBuckets, location, mode)

  /** Reopen the store by catalog name (plain-parquet reads would lose
    * the bucket metadata that makes probe pruning work), FRESH:
    * streaming ingest commits its appends
    * through foreachBatch's CLONED session, whose inserts refresh that
    * clone's relation cache but not this session's — a re-read from the
    * main session after the stream committed would otherwise serve the
    * STALE file listing (missing the appended files, silently — the
    * rule-13b surface for catalog tables, caught by the r19
    * second-campaign spec). refreshTable drops the cached
    * relation/listing; the next read relists — probe/bootstrap
    * cadence cost.
    */
  def loadStore(spark: SparkSession, table: String): DataFrame = {
    if (spark.catalog.tableExists(table)) spark.catalog.refreshTable(table)
    BucketedCorpus.load(spark, table)
  }

  /** Candidate (doc_id, match_id) pairs of a signatured batch against a
    * signatured store. When the batch's distinct bucket values fit
    * `graft.incdedup.maxProbeBuckets` (default 1024), they are pushed as
    * a literal IN on the store's bucketing column so a bucketed store
    * scan reads only the matching file-buckets — the POINT-PROBE
    * optimization for small/continuous micro-batch ingest, where a
    * handful of docs touches a handful of buckets of an arbitrarily
    * large store. Above the cap the probe is the plain equi-join: a
    * large batch's buckets cover most of the store anyway, so the right
    * plan is ONE full store scan with the batch side broadcast — and a
    * wide literal IN is actively harmful (measured at sf1: a 22k-value
    * IN made the store probe 30x slower than the plain join; giant IN
    * lists poison codegen/pushdown without pruning anything).
    *
    * `pushProbeFilter = false` skips the collect + IN entirely — right
    * when the store is a computed in-memory frame rather than a
    * bucketed table scan (nothing to prune; the literal IN would only
    * add planning and evaluation cost).
    */
  def probeCandidates(
      store: DataFrame,
      batchBanded: DataFrame,
      pushProbeFilter: Boolean = true): DataFrame = {
    val spark = store.sparkSession
    val cap = math.min(
      graft.util.Conf.long(spark, "graft.incdedup.maxProbeBuckets", 1024L),
      Int.MaxValue.toLong - 1)
    val probeSet =
      if (pushProbeFilter)
        batchBanded.select(col("bucket")).distinct()
          .limit(cap.toInt + 1).collect().map(_.getLong(0))
      else Array.empty[Long]
    val pruned =
      if (pushProbeFilter && probeSet.length <= cap)
        store.where(col("bucket").isin(probeSet.toSeq: _*))
      else store
    // the self-pair guard matters under at-least-once replay: a replayed
    // micro-batch's docs are already in the store and must not match
    // themselves
    pruned.as("s")
      .join(batchBanded.as("n"),
        col("s.band") === col("n.band") && col("s.bucket") === col("n.bucket") &&
          col("s.id") =!= col("n.id"))
      .select(col("n.id").as("doc_id"), col("s.id").as("match_id"))
      .distinct()
  }

  /** Ingest verdict for a new batch against an existing corpus: one row
    * per batch doc — (doc_id, dup_of, jaccard_micro, n_dup_matches).
    * `corpusBanded` should be the persisted store ([[loadStore]]); when
    * absent it is computed from `corpus` (correct, but corpus-sized work
    * — batch pipelines only). Batch ids must be disjoint from corpus ids
    * and unique within the batch.
    */
  def ingestVerdict(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      corpusBanded: Option[DataFrame] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0, 1], got $threshold")
    val thresholdMicro = math.round(threshold * 1e6)
    val batchIdText = batch.select(col(idCol).cast("long").as("id"), col(textCol).as("__txt"))
    val batchBanded = bandedSignatures(batch, idCol, textCol, shingleSize, numHashes, bands)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val store = corpusBanded.getOrElse(
        bandedSignatures(corpus, idCol, textCol, shingleSize, numHashes, bands))
      // batch vs corpus, plus batch vs smaller-id batch docs (the larger
      // id of a new duplicate pair is the duplicate, mirroring
      // exactKeepers' min-id-wins rule). The probe filter only pays off
      // against a PERSISTED store scan (bucket pruning) — the computed
      // fallback joins directly.
      val oldCands = probeCandidates(store, batchBanded,
        pushProbeFilter = corpusBanded.isDefined)
      // no inner distinct: the union's distinct below collapses the
      // band-collision multiplicity in ONE exchange (map-side partial
      // aggregation pre-collapses duplicates), and it is needed anyway —
      // under replay the store contains batch ids, so the two candidate
      // sources can overlap
      val newCands = batchBanded.as("a")
        .join(batchBanded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") > col("b.id"))
        .select(col("a.id").as("doc_id"), col("b.id").as("match_id"))
      val cands = oldCands.union(newCands).distinct()
      // exact-confirm shingles: batch side fully, corpus side ONLY the
      // matched ids (semi-join first — candidates << corpus).
      // dropDuplicates("id") makes the confirm tolerant of duplicate
      // store doc rows (a crashed-then-replayed append leaves them;
      // candidates are distinct already, this keeps the join 1:1)
      val matchedCorpus = corpus
        .select(col(idCol).cast("long").as("id"), col(textCol).as("__txt"))
        .join(cands.select(col("match_id").as("id")).distinct(), Seq("id"), "left_semi")
      val sh = Dedup.fanOut(batchIdText.unionByName(matchedCorpus))
        .select(col("id"), TextOps.wordShingles(col("__txt"), shingleSize).as("sh"))
        .dropDuplicates("id")
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val confirmed = cands
          .join(sh.select(col("id").as("doc_id"), col("sh").as("sh_a")), "doc_id")
          .join(sh.select(col("id").as("match_id"), col("sh").as("sh_b")), "match_id")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
          .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
          // integer micro-unit jaccard, HALF-UP nearest: floor((2a*1e6+b)
          // / 2b) = round(a/b * 1e6), so the threshold agrees with the
          // batch pipeline's round(j, 6) >= t (minhashDedup) instead of
          // floor-truncating a pair 1 micro below it — and still no
          // double exists on either engine's side of the contract
          .withColumn("jaccard_micro", call_function("div",
            col("inter") * lit(2000000L) + col("uni"), col("uni") * lit(2L)))
          .where(col("jaccard_micro") >= lit(thresholdMicro))
          .select(col("doc_id"), col("match_id"), col("jaccard_micro"))
        val best = confirmed
          .groupBy(col("doc_id"))
          .agg(
            max_by(struct(col("jaccard_micro"), (-col("match_id")).as("neg_id")),
              struct(col("jaccard_micro"), (-col("match_id")).as("neg_id"))).as("best"),
            count(lit(1)).as("n_dup_matches"))
          .select(col("doc_id"), (-col("best.neg_id")).as("dup_of"),
            col("best.jaccard_micro").as("jaccard_micro"), col("n_dup_matches"))
        val out = batchIdText.select(col("id").as("doc_id"))
          .join(best, Seq("doc_id"), "left")
          .select(col("doc_id"), col("dup_of"),
            col("jaccard_micro"), coalesce(col("n_dup_matches"), lit(0L)).as("n_dup_matches"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // materialize so the shingle/banded caches can release; if the
        // job fails, release out too instead of leaking the cache entry
        try out.count()
        catch { case t: Throwable => out.unpersist(); throw t }
        out
      } finally sh.unpersist()
    } finally {
      batchBanded.unpersist()
    }
  }

  /** CONTINUOUS ingest: dedup a document stream against everything ever
    * admitted, via foreachBatch over two persistent bucketed tables —
    * `<store>` (banded signatures, bucketed by bucket: the probe side)
    * and `<store>_docs` (admitted id/text, bucketed by id: the
    * exact-confirm side; signatures alone cannot confirm Jaccard). Per
    * micro-batch: verdict vs the current store ([[ingestVerdict]] — so
    * within-batch duplicates also resolve), `sink` receives the verdict
    * frame, and ONLY the admitted docs (dup_of null — novel docs and
    * one representative per new duplicate group) append their
    * signatures and texts. Duplicates are never stored, so the store
    * grows with the corpus's NOVEL mass, not its arrival rate.
    *
    * Contrast with [[graft.streaming.StreamDedup]]: that family keeps
    * watermark-BOUNDED state (duplicates beyond the horizon are
    * forgotten — the unbounded-feed shape); this one trades bounded
    * state for permanent memory backed by storage, which is what a
    * training-corpus ingest actually wants (a document is a duplicate
    * no matter when its original arrived). State lives in tables, not
    * the state store, so the stream restarts cleanly from the tables'
    * contents.
    *
    * Batch ids must be globally unique and larger than all previously
    * admitted ids for the min-id keeper rule to be stable across
    * batches (monotonic ingest ids — the natural ingest numbering).
    *
    * REPLAY SAFETY (foreachBatch is at-least-once): a `<store>_meta`
    * table records the last batchId whose appends committed FOR THIS
    * CHECKPOINT — a replayed batch recomputes and re-delivers its
    * verdict (correct even against the post-append store: the probe
    * excludes self-pairs and admitted co-batch docs are not near-dups
    * of each other) but skips the appends. The marker is
    * CHECKPOINT-SCOPED (r19 review): Spark batchIds restart at 0 with
    * every fresh checkpoint, so a store-global marker would silently
    * skip the appends of a SECOND ingest campaign's early batches
    * (new checkpoint, new docs, batchIds ≤ the old high-water mark)
    * while still delivering verdicts — novel docs lost from the store.
    * A marker recorded under a different checkpoint (or a pre-r19
    * legacy marker without one) gates nothing; the worst case of NOT
    * gating is a re-append, which the store tolerates. A crash BETWEEN
    * the two table appends either repairs on replay (first batch:
    * store treated as absent unless both tables exist → clean
    * overwrite) or re-appends both (later batches: duplicate
    * signature/doc rows are tolerated — candidates are distinct and
    * the confirm dedups ids — at the cost of dead storage).
    */
  def ingestStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      storeTable: String,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      threshold: Double = 0.7,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      numBuckets: Int = 64): StreamingQuery = {
    require(docs.isStreaming, "ingestStream needs a streaming frame; use ingestVerdict for batch")
    val docsTable = storeTable + "_docs"
    val metaTable = storeTable + "_meta"
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val b = batch.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          if (b.count() > 0) {
            // the store is "present" only when BOTH tables exist: a crash
            // between the first batch's two writes leaves a half-pair,
            // which the replay then cleanly overwrites
            val storeExists = spark.catalog.tableExists(storeTable) &&
              spark.catalog.tableExists(docsTable)
            val lastCommitted =
              if (spark.catalog.tableExists(metaTable)) {
                val meta = spark.table(metaTable)
                // checkpoint-scoped read; a legacy marker (no checkpoint
                // column) belongs to an unknowable campaign and gates
                // nothing — re-appending is tolerated, skipping is not
                if (meta.columns.contains("checkpoint"))
                  meta.where(col("checkpoint") === checkpointDir)
                    .select(coalesce(max(col("batch_id")), lit(-1L)))
                    .collect()(0).getLong(0)
                else -1L
              } else -1L
            val corpus =
              if (storeExists) BucketedCorpus.load(spark, docsTable)
              else spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], b.schema)
            val verdict0 = ingestVerdict(corpus, b, "doc_id", "text",
              threshold, shingleSize, numHashes, bands,
              corpusBanded = if (storeExists) Some(loadStore(spark, storeTable)) else None)
            // SNAPSHOT the verdict before touching the tables: the
            // appends below invalidate any cached plan that READS the
            // store tables (Spark uncaches dependents on insert), and a
            // lazily recomputed verdict would then see the batch's own
            // rows in the store — a doc would "duplicate" itself. The
            // local checkpoint cuts lineage to the tables entirely.
            val verdict = verdict0.localCheckpoint(true)
            verdict0.unpersist()
            if (batchId > lastCommitted) {
              val admitted = b.join(
                verdict.where(col("dup_of").isNull).select(col("doc_id")), Seq("doc_id"))
                .persist(StorageLevel.MEMORY_AND_DISK)
              admitted.count()
              val mode = if (storeExists) SaveMode.Append else SaveMode.Overwrite
              writeStore(
                bandedSignatures(admitted, "doc_id", "text", shingleSize, numHashes, bands),
                storeTable, numBuckets, mode = mode)
              BucketedCorpus.write(admitted, docsTable, "doc_id", numBuckets, mode = mode)
              // commit marker LAST: replays of this batchId skip the
              // appends (Overwrite drops and recreates the table, so a
              // legacy single-column marker upgrades in place)
              Seq((checkpointDir, batchId)).toDF("checkpoint", "batch_id")
                .write.mode(SaveMode.Overwrite)
                .format("parquet").saveAsTable(metaTable)
              admitted.unpersist()
            }
            sink(verdict, batchId)
            verdict.unpersist()
          }
        } finally b.unpersist()
        ()
      }
      .start()
  }
}
