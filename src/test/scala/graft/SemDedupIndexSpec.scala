package graft

import graft.ops.{SemDedup, SemDedupIndex}
import org.apache.spark.sql.functions._

/** Round-17 (r16 verdict #3): incremental semantic dedup — persisted
  * centroid/keeper index + probe-batch path. Pins the batch==incremental
  * parity on the tight-group/monotone-id regime the scaladoc promises,
  * the probe verdict mechanics (store match, co-batch match, best-match
  * tie rule), novel-only store growth, the skewed-batch refusal, and
  * the write/read roundtrip with corruption refusal.
  */
class SemDedupIndexSpec extends SparkSpec {

  import spark.implicits._

  private def j(base: Array[Double], eps: Double): Array[Double] =
    base.zipWithIndex.map { case (v, i) => v + eps * (if (i % 2 == 0) 1 else -1) }

  private val e1 = Array(1.0, 0.0, 0.0, 0.0)
  private val e2 = Array(0.0, 1.0, 0.0, 0.0)
  private val centers = Array(e1, e2)

  // batch 1 (ids < 100): groups {0,1,2} near e1, {10,11} near e2, single 3
  private def batch1 = Seq(
    (0L, e1), (1L, j(e1, 0.01)), (2L, j(e1, 0.02)),
    (3L, Array(1.0, 0.3, 0.3, 0.0)),
    (10L, e2), (11L, j(e2, 0.01))
  ).toDF("id", "v")

  // batch 2 (ids >= 100, monotone): 100/101 duplicate batch-1's e1 group,
  // 110 duplicates the e2 group, 120 is a NEW group with an in-batch dup
  // 121, 130 is a novel single
  private def batch2 = Seq(
    (100L, j(e1, 0.015)), (101L, j(e1, 0.005)),
    (110L, j(e2, 0.02)),
    (120L, Array(0.0, 0.4, 1.0, 0.0)), (121L, j(Array(0.0, 0.4, 1.0, 0.0), 0.01)),
    (130L, Array(0.3, 1.0, 0.0, 0.3))
  ).toDF("id", "v")

  test("two-batch incremental keep set == batch semDedupFixed over the " +
    "union (tight groups, monotone ids)") {
    val (v1, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val (v2, idx2) = idx.ingest(batch2, "id", "v")
    val incKeep = (v1.where(col("keep")).select("id").as[Long].collect() ++
      v2.where(col("keep")).select("id").as[Long].collect()).toSet
    val batchAll = SemDedup.semDedupFixed(batch1.union(batch2), "id", "v",
      centers, 0.99)
    val fullKeep = batchAll.where(col("keep")).select("id").as[Long]
      .collect().toSet
    assert(incKeep == fullKeep,
      s"incremental keep $incKeep != batch keep $fullKeep")
    // the store holds exactly the kept docs
    assert(idx2.keepers.select("id").as[Long].collect().toSet == incKeep)
    batchAll.unpersist(); v1.unpersist(); v2.unpersist()
  }

  test("probe verdict mechanics: store match beats nothing, best match is " +
    "(highest cosine, lowest id), co-batch dups resolve to the smaller id") {
    val (v1, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val verdicts = idx.probe(batch2, "id", "v")
    val byId = verdicts.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // 100 and 101 match the stored keeper 0 (1 and 2 were dups, never stored)
    assert(byId(100L)._1 == 0L && !byId(100L)._3)
    assert(byId(101L)._1 == 0L)
    // 110 matches stored keeper 10
    assert(byId(110L)._1 == 10L)
    // 120 is novel (new direction); 121 dups its smaller-id co-batch doc
    assert(byId(120L)._1 == -1L && byId(120L)._3)
    assert(byId(121L)._1 == 120L && !byId(121L)._3)
    // 130 is below threshold everywhere -> novel, zero matches
    assert(byId(130L) == ((-1L, 0L, true)))
    // store matches count only KEEPERS: 100's matches are {0} (not 1, 2)
    assert(byId(100L)._2 == 1L)
    verdicts.unpersist(); v1.unpersist()
  }

  test("probe is read-only; ingest appends only novel docs") {
    val (v1, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val before = idx.keepers.count()
    idx.probe(batch2, "id", "v").unpersist()
    assert(idx.keepers.count() == before, "probe mutated the store")
    val (v2, idx2) = idx.ingest(batch2, "id", "v")
    // novel in batch2: 120, 130 (101/100/110/121 are dups)
    assert(idx2.keepers.count() == before + 2)
    assert(idx2.keepers.select("id").as[Long].collect().toSet
      .intersect(Set(100L, 101L, 110L, 121L)).isEmpty,
      "a duplicate entered the store")
    v1.unpersist(); v2.unpersist()
  }

  test("epsilon-chain divergence is QUANTIFIED (r17 verdict #5): per-doc " +
    "sequential ingest keeps the alternating ceil(L/2) docs of an " +
    "L-chain, batch build and one-batch ingest both keep exactly 1, " +
    "and all paths keep the min id") {
    // adversarial path fixture: unit vectors at 0/25/50/75/100 degrees
    // with eps = 0.9 — consecutive pairs are within eps
    // (cos 25deg ~ 0.906 >= 0.9) and nothing else is
    // (cos 50deg ~ 0.643 < 0.9): a pure 5-chain in the eps-graph
    val chain = (0 until 5).map { i =>
      val th = math.toRadians(25.0 * i)
      ((i + 1).toLong, Array(math.cos(th), math.sin(th)))
    }
    val oneCenter = Array(Array(1.0, 0.0))
    def emptyIdx = graft.ops.SemDedupIndex(
      Seq.empty[(Long, Long, Array[Double])].toDF("id", "cluster", "v"),
      oneCenter, 0.9)
    // batch component semantics: the whole chain is one component,
    // min-id keeper -> exactly 1 survivor
    val (vb, _) = SemDedupIndex.build(chain.toDF("id", "v"), "id", "v",
      oneCenter, 0.9)
    val batchKeep = vb.where(col("keep")).select("id").as[Long].collect().toSet
    assert(batchKeep == Set(1L), s"batch kept $batchKeep")
    vb.unpersist()
    // one-batch ingest == batch: the co-batch smaller-id rule chains
    // A2<-A1, A3<-A2, A4<-A3, A5<-A4, so only A1 survives
    val (vi, oneShot) = emptyIdx.ingest(chain.toDF("id", "v"), "id", "v")
    val oneKeep = vi.where(col("keep")).select("id").as[Long].collect().toSet
    assert(oneKeep == Set(1L), s"one-batch ingest kept $oneKeep")
    assert(oneShot.keepers.count() == 1L)
    vi.unpersist()
    // per-doc sequential ingest: greedy vs KEPT representatives only —
    // A2 dups A1; A3 clears A1 (interior A2 was suppressed); A4 dups
    // A3; A5 clears {A1, A3}: the alternating ceil(5/2) = 3 keepers
    var idx = emptyIdx
    val seqKeep = scala.collection.mutable.Set[Long]()
    chain.foreach { case (id, v) =>
      val (vs, nxt) = idx.ingest(Seq((id, v)).toDF("id", "v"), "id", "v")
      if (vs.where(col("keep")).count() == 1L) seqKeep += id
      vs.unpersist()
      idx = nxt
    }
    assert(seqKeep.toSet == Set(1L, 3L, 5L),
      s"sequential kept ${seqKeep.toSet} (expected the alternating odd positions)")
    // the documented bound: sequential keeps ceil(L/2) on a pure chain,
    // a divergence of ceil(L/2) - 1 extra keepers vs batch; min id kept
    // by every path
    assert(seqKeep.size == (chain.size + 1) / 2)
    assert(batchKeep.subsetOf(seqKeep.toSet))
  }

  test("skewed probe batch refuses with remediation instead of running " +
    "the quadratic co-batch compare") {
    val (_, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val big = (200L until 240L).map(i => (i, j(e1, 0.001 * (i % 7))))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      idx.probe(big, "id", "v", maxClusterSize = 10)
    }
    assert(e.getMessage.contains("maxClusterSize") &&
      e.getMessage.contains("balancedK"))
  }

  test("ingestStream: verdicts stream against the persisted store, novel " +
    "docs are admitted, and a re-delivered batch heals via the anti-join " +
    "(identical verdicts, store unchanged)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (v0, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    v0.unpersist()
    val dir = java.nio.file.Files.createTempDirectory("semstream").toString
    SemDedupIndex.write(idx, dir)
    val tuples = Seq(
      (100L, j(e1, 0.015).toSeq), (101L, j(e1, 0.005).toSeq),
      (110L, j(e2, 0.02).toSeq),
      (120L, Seq(0.0, 0.4, 1.0, 0.0)), (121L, j(Array(0.0, 0.4, 1.0, 0.0), 0.01).toSeq),
      (130L, Seq(0.3, 1.0, 0.0, 0.3)))
    def runOnce(): Set[(Long, Option[Long], Boolean)] = {
      val ckpt = java.nio.file.Files.createTempDirectory("semstream-ckpt").toString
      val stream = MemoryStream[(Long, Seq[Double])]
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Option[Long], Boolean)]
      val q = SemDedupIndex.ingestStream(
        stream.toDF().select(col("_1").as("id"), col("_2").as("v")),
        "id", "v", dir,
        (v, _) => buf ++= v.collect().map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(5))),
        ckpt)
      try {
        stream.addData(tuples: _*)
        q.processAllAvailable()
      } finally q.stop()
      buf.toSet
    }
    val expected = Set[(Long, Option[Long], Boolean)](
      (100L, Some(0L), false), (101L, Some(0L), false),
      (110L, Some(10L), false),
      (120L, None, true), (121L, Some(120L), false),
      (130L, None, true))
    assert(runOnce() == expected, "first delivery")
    val store1 = SemDedupIndex.read(spark, dir).keepers
      .select("id").as[Long].collect().toSet
    assert(store1 == Set(0L, 3L, 10L, 120L, 130L), s"store after batch: $store1")
    // re-delivery of the SAME batch through a fresh checkpoint: the
    // store already holds 120/130 — the anti-join must restore the
    // pre-batch view, reproduce identical verdicts, and leave the
    // store unchanged (the crash-between-swap-and-commit window)
    assert(runOnce() == expected, "re-delivered batch diverged")
    val store2 = SemDedupIndex.read(spark, dir).keepers
      .select("id").as[Long].collect().toSet
    assert(store2 == store1, s"re-delivery mutated the store: $store2")
  }

  test("the canonical ingest loop works: read -> ingest -> write back to " +
    "the SAME path -> read again (r17 review: the keeper union's lineage " +
    "reads the path being overwritten; write stages and swaps)") {
    val (_, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val dir = java.nio.file.Files.createTempDirectory("semloop").toString
    SemDedupIndex.write(idx, dir)
    val r1 = SemDedupIndex.read(spark, dir)
    val (v2, r2) = r1.ingest(batch2, "id", "v")
    // the overwrite of a path the union still lazily reads — the exact
    // failure mode before the stage-and-swap
    SemDedupIndex.write(r2, dir)
    val r3 = SemDedupIndex.read(spark, dir)
    assert(r3.keepers.select("id").as[Long].collect().toSet ==
      Set(0L, 3L, 10L, 120L, 130L))
    // and a SECOND loop iteration over the re-read store
    val batch3 = Seq((200L, j(e1, 0.012)), (201L, Array(1.0, 1.0, 1.0, 1.0)))
      .toDF("id", "v")
    val (v3, r4) = r3.ingest(batch3, "id", "v")
    SemDedupIndex.write(r4, dir)
    assert(SemDedupIndex.read(spark, dir).keepers.count() == 6) // +201 novel
    assert(v3.where(col("id") === 200L).head().getLong(3) == 0L) // dup of keeper 0
    v2.unpersist(); v3.unpersist()
  }

  test("health() reports store shape and the balancedK recommendation; " +
    "train() bootstraps with fitted centers end to end") {
    val (_, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val h = idx.health().head()
    assert(h.getLong(0) == 3L)            // keepers: 0, 3, 10
    assert(h.getInt(1) == 2)              // k
    assert(h.getLong(2) >= 1L)            // max cluster
    assert(h.getInt(4) == graft.ops.SemDedup.balancedK(h.getLong(0)))
    // train: one-call bootstrap — same verdict schema, keepers stored
    val (tv, tidx) = SemDedupIndex.train(batch1, "id", "v", k = 2,
      epsilon = 0.99, seed = 7L)
    assert(tv.columns.toSeq ==
      Seq("id", "cluster", "centroid_sim", "comp", "keep"))
    assert(tidx.keepers.count() == tv.where(col("keep")).count())
    assert(tidx.centers.length == 2)
    tv.unpersist()
  }

  test("rebalance refreshes the partitioning, never the keeper set; " +
    "rebalanceTo refuses skewed new centers; probes still resolve") {
    val (v0, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    v0.unpersist()
    val before = idx.keepers.select("id").as[Long].collect().toSet
    // swap the centers: same partitions, cluster ids exchanged
    val swapped = SemDedupIndex.rebalanceTo(idx, Array(e2, e1))
    val byId = swapped.keepers.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet == before, "rebalance changed the keeper set")
    // e1-group keepers (0, 3) now live in cluster 1; e2 keeper (10) in 0
    assert(byId(0L) == 1L && byId(3L) == 1L && byId(10L) == 0L, byId)
    // probes against the rebalanced index still resolve dups
    val verdicts = swapped.probe(batch2, "id", "v")
    val v100 = verdicts.where(col("id") === 100).head()
    assert(v100.getLong(3) == 0L && !v100.getBoolean(5))
    verdicts.unpersist(); swapped.keepers.unpersist()
    // the trained one-call form: keeper set preserved, k refreshed
    val trained = SemDedupIndex.rebalance(idx, k = 2, seed = 7L, maxIter = 3)
    assert(trained.keepers.select("id").as[Long].collect().toSet == before)
    assert(trained.centers.length == 2 && trained.epsilon == idx.epsilon)
    trained.keepers.unpersist()
    // skew refusal: one center captures everything -> maxClusterSize trips
    val err = intercept[IllegalArgumentException] {
      SemDedupIndex.rebalanceTo(idx, Array(e1), maxClusterSize = 2)
    }
    assert(err.getMessage.contains("maxClusterSize") &&
      err.getMessage.contains("balancedK"))
  }

  test("write/read roundtrip preserves verdicts; corruption refuses") {
    val (v1, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val dir = java.nio.file.Files.createTempDirectory("semidx").toString
    SemDedupIndex.write(idx, dir)
    val back = SemDedupIndex.read(spark, dir)
    assert(back.epsilon == 0.99)
    assert(back.centers.map(_.toSeq).toSeq == centers.map(_.toSeq).toSeq)
    val a = idx.probe(batch2, "id", "v").orderBy("id").collect().toSeq
    val b = back.probe(batch2, "id", "v").orderBy("id").collect().toSeq
    assert(a == b, "persisted index probes differently")
    // v2 layout: the store is partitioned by cluster
    val keepersDir = new java.io.File(s"$dir/keepers")
    assert(keepersDir.listFiles().exists(f => f.isDirectory &&
      f.getName.startsWith("cluster=")), "keepers not partitioned by cluster")
    // corrupt the keeper payload (keeper 0 migrates clusters) -> digest refusal
    val tampered = idx.keepers.withColumn("cluster",
      when(col("id") === 0L, lit(1L)).otherwise(col("cluster")))
      .localCheckpoint(true)
    tampered.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$dir/keepers")
    spark.catalog.refreshByPath(s"$dir/keepers")
    val e = intercept[IllegalArgumentException] { SemDedupIndex.read(spark, dir) }
    assert(e.getMessage.contains("digest mismatch"))
  }

  private def partFiles(dir: String, cluster: Long): Set[(String, Long, Long)] = {
    val d = new java.io.File(s"$dir/keepers/cluster=$cluster")
    if (!d.exists) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
  }

  test("ingestInto (r18 verdict #1): partition-scoped write-back — " +
    "verdicts match the in-memory ingest, only touched cluster " +
    "partitions are rewritten, untouched partition files are " +
    "physically identical, and a new cluster's partition is created") {
    // four centers: batch1+the e4 doc populate clusters 0/1/3; cluster 2
    // (e3 direction) starts EMPTY and only batch2's 120/121 land there;
    // nothing in batch2 approaches e4, so cluster 3 stays untouched
    val e3 = Array(0.0, 0.0, 1.0, 0.0)
    val e4 = Array(0.0, 0.0, 0.0, 1.0)
    val corpus = batch1.union(Seq((20L, e4)).toDF("id", "v"))
    val (_, idx) = SemDedupIndex.build(corpus, "id", "v",
      Array(e1, e2, e3, e4), 0.99)
    val dir = java.nio.file.Files.createTempDirectory("seminto").toString
    SemDedupIndex.write(idx, dir)
    // in-memory oracle for the same batch against the same store
    val (vMem, idxMem) = SemDedupIndex.read(spark, dir).ingest(batch2, "id", "v")
    val memVerdicts = vMem.orderBy("id").collect().toSeq
    val memKeepers = idxMem.keepers.select("id", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    vMem.unpersist()
    val before = (0L to 3L).map(c => c -> partFiles(dir, c)).toMap
    assert(before(2L).isEmpty, "fixture regression: cluster 2 not empty")
    val v = SemDedupIndex.ingestInto(spark, dir, batch2, "id", "v")
    val rows = v.orderBy("id").collect().toSeq
    assert(rows == memVerdicts,
      "partition-scoped verdicts diverge from the in-memory ingest")
    val touched = rows.map(_.getLong(1)).toSet
    v.unpersist()
    val back = SemDedupIndex.read(spark, dir)
    assert(back.keepers.select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == memKeepers,
      "store content diverges from the in-memory ingest")
    // the new-direction docs created cluster 2's partition
    assert(touched.contains(2L) && partFiles(dir, 2L).nonEmpty,
      "new cluster partition was not created")
    // untouched clusters' files are PHYSICALLY identical (name/size/mtime)
    val untouched = (0L to 3L).toSet -- touched
    assert(untouched.nonEmpty, "fixture regression: every cluster touched")
    untouched.foreach { c =>
      assert(partFiles(dir, c) == before(c),
        s"untouched cluster $c was rewritten")
    }
    touched.foreach { c =>
      assert(partFiles(dir, c) != before(c), s"touched cluster $c unchanged")
    }
  }

  test("ingestInto replay is idempotent: the same batch re-ingested " +
    "yields identical verdicts and leaves the store (content AND " +
    "digests) unchanged") {
    val (_, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val dir = java.nio.file.Files.createTempDirectory("semreplay").toString
    SemDedupIndex.write(idx, dir)
    val v1 = SemDedupIndex.ingestInto(spark, dir, batch2, "id", "v")
    val first = v1.orderBy("id").collect().toSeq
    v1.unpersist()
    val store1 = SemDedupIndex.read(spark, dir).keepers
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // crash-after-write replay: the exact same batch arrives again
    val v2 = SemDedupIndex.ingestInto(spark, dir, batch2, "id", "v")
    assert(v2.orderBy("id").collect().toSeq == first,
      "replayed batch produced different verdicts")
    v2.unpersist()
    // read() re-validates every digest — a replay that desynchronized
    // the manifest would refuse here
    val store2 = SemDedupIndex.read(spark, dir).keepers
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(store2 == store1, "replay mutated the store")
  }

  test("repairManifest recovers the crashed-ingest window (stale touched " +
    "digests) but still refuses a corrupted quantizer; an empty batch " +
    "returns the empty verdict frame and writes nothing") {
    val (_, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val dir = java.nio.file.Files.createTempDirectory("semrepair").toString
    SemDedupIndex.write(idx, dir)
    // empty batch first: verdict schema intact, store untouched
    val v0 = SemDedupIndex.ingestInto(spark, dir,
      Seq.empty[(Long, Array[Double])].toDF("id", "v"), "id", "v")
    assert(v0.columns.toSeq ==
      Seq("id", "cluster", "centroid_sim", "dup_of", "n_dup_matches", "keep"))
    assert(v0.count() == 0L)
    v0.unpersist()
    // simulate the crash window: partition content changes (a committed
    // overwrite) without the manifest merge — here, a rogue row appended
    // directly into cluster 0's partition dir
    Seq((777L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("id", "v")
      .write.mode("append").parquet(s"$dir/keepers/cluster=0")
    spark.catalog.refreshByPath(s"$dir/keepers")
    val e0 = intercept[IllegalArgumentException] {
      SemDedupIndex.ingestInto(spark, dir,
        Seq((300L, j(e1, 0.004))).toDF("id", "v"), "id", "v")
    }
    assert(e0.getMessage.contains("repairManifest"),
      s"refusal must carry the remediation: ${e0.getMessage}")
    // repair re-digests the CURRENT payload; the loop then proceeds
    assert(SemDedupIndex.repairManifest(spark, dir) == 1L)
    val v1 = SemDedupIndex.ingestInto(spark, dir,
      Seq((300L, j(e1, 0.004))).toDF("id", "v"), "id", "v")
    assert(v1.count() == 1L)
    v1.unpersist()
    assert(SemDedupIndex.read(spark, dir).keepers
      .select("id").as[Long].collect().toSet.contains(777L),
      "repair must bless the on-disk payload")
    // a corrupted QUANTIZER is never blessed
    val cents = spark.read.parquet(s"$dir/centers")
      .withColumn("cv", transform(col("cv"), x => x + lit(1.0)))
      .localCheckpoint(true)
    cents.write.mode("overwrite").parquet(s"$dir/centers")
    spark.catalog.refreshByPath(s"$dir/centers")
    val e1m = intercept[IllegalArgumentException] {
      SemDedupIndex.repairManifest(spark, dir)
    }
    assert(e1m.getMessage.contains("centers digest mismatch"))
  }

  test("a REFUSED ingestInto (skewed batch) releases its working " +
    "caches and leaves the store untouched") {
    val (_, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val dir = java.nio.file.Files.createTempDirectory("semrefuse").toString
    SemDedupIndex.write(idx, dir)
    val before = SemDedupIndex.read(spark, dir).keepers
      .select("id").as[Long].collect().toSet
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val big = (400L until 440L).map(i => (i, j(e1, 0.001 * (i % 7))))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      SemDedupIndex.ingestInto(spark, dir, big, "id", "v",
        maxClusterSize = 10)
    }
    assert(e.getMessage.contains("maxClusterSize"))
    // suites run in PARALLEL on one shared session (Test/parallelExecution
    // default-true), so a raw size equality races sibling suites' persists
    // (flaked exactly once in r19's final full runs; green in isolation).
    // Attribute instead: a frame OUR refused ingest could leak reads this
    // store (healed / replacement lineage carries the unique tempdir path)
    // or was created by this call and survived — assert no NEW persistent
    // RDD references this store's directory.
    val leaked = (spark.sparkContext.getPersistentRDDs -- cachedBefore)
      .filter { case (_, rdd) =>
        (Option(rdd.name).getOrElse("") + rdd.toDebugString).contains(dir)
      }
    assert(leaked.isEmpty,
      s"refused ingest leaked store-reading cached frames: $leaked")
    assert(SemDedupIndex.read(spark, dir).keepers
      .select("id").as[Long].collect().toSet == before,
      "refused ingest mutated the store")
  }

  test("ingestInto validates ONLY touched clusters: corruption in an " +
    "untouched partition does not block the ingest, but a touched " +
    "corrupt partition refuses") {
    val (_, idx) = SemDedupIndex.build(batch1, "id", "v", centers, 0.99)
    val dir = java.nio.file.Files.createTempDirectory("semtouch").toString
    SemDedupIndex.write(idx, dir)
    // corrupt cluster 1's partition (the e2 group, keeper 10): append a
    // rogue row directly into its partition dir
    Seq((999L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "v")
      .write.mode("append").parquet(s"$dir/keepers/cluster=1")
    spark.catalog.refreshByPath(s"$dir/keepers")
    // a batch touching ONLY cluster 0 (the e1 direction) must succeed —
    // O(touched) validation is the v2 point
    val b0 = Seq((300L, j(e1, 0.004))).toDF("id", "v")
    val v = SemDedupIndex.ingestInto(spark, dir, b0, "id", "v")
    assert(v.count() == 1L)
    v.unpersist()
    // a batch touching cluster 1 refuses on the digest
    val b1 = Seq((301L, j(e2, 0.004))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      SemDedupIndex.ingestInto(spark, dir, b1, "id", "v")
    }
    assert(e.getMessage.contains("digest mismatch") &&
      e.getMessage.contains("touched"))
  }
}
