package graft

import graft.ops.{Dedup, IncrementalDedup, TextOps}
import org.apache.spark.sql.functions._

/** Incremental (ingest-time) MinHash dedup: verdicts must equal the
  * brute-force batch-vs-all answer; the persisted store must
  * bucket-prune probes on the EXECUTED PLAN; the probe-set driver cap
  * must fall back to the plain join with identical results.
  */
class IncrementalDedupSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def batch = docs.where(col("doc_id") % 7 === 0)
  private def corpus = docs.where(col("doc_id") % 7 =!= 0)

  /** Drop a managed test table AND its warehouse directory — a prior
    * aborted run can leave the location behind with no catalog entry,
    * which fails the next CREATE with LOCATION_ALREADY_EXISTS.
    */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val dir = new java.io.File(new java.io.File(wh), name)
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete(); ()
    }
    if (dir.exists) del(dir)
  }

  /** Brute-force expected verdicts via exact word-shingle Jaccard over
    * batch x (corpus + smaller-id batch docs).
    */
  private def bruteForce(threshold: Double): Map[Long, (Long, Long, Long)] = {
    val sh = docs.select(col("doc_id").as("id"),
      TextOps.wordShingles(col("text"), 3).as("sh"))
    val b = sh.where(col("id") % 7 === 0).as("b")
    val m = sh.as("m")
    val pairs = b.join(m,
        (col("m.id") % 7 =!= 0 && col("m.id") =!= col("b.id")) ||
          (col("m.id") % 7 === 0 && col("m.id") < col("b.id")))
      .select(col("b.id").as("doc_id"), col("m.id").as("match_id"),
        call_function("div",
          size(array_intersect(col("b.sh"), col("m.sh"))).cast("long") * lit(2000000L) +
            size(array_union(col("b.sh"), col("m.sh"))).cast("long"),
          size(array_union(col("b.sh"), col("m.sh"))).cast("long") * lit(2L)).as("jm"))
      .where(col("jm") >= math.round(threshold * 1e6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.groupBy(_._1).map { case (d, ms) =>
      val best = ms.minBy { case (_, mid, jm) => (-jm, mid) }
      d -> (best._2, best._3, ms.length.toLong)
    }
  }

  test("ingest verdict equals brute-force batch-vs-all at threshold 0.5") {
    val out = IncrementalDedup.ingestVerdict(corpus, batch, "doc_id", "text",
      threshold = 0.5)
    try {
      val got = out.collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))
      }.toMap
      val batchIds = batch.collect().map(_.getLong(0)).toSet
      assert(got.keySet == batchIds, "one verdict row per batch doc")
      val expected = bruteForce(0.5)
      assert(expected.nonEmpty, "fixture must contain at least one duplicate pair")
      expected.foreach { case (d, (mid, jm, n)) =>
        assert(got(d) == ((mid, jm, n)), s"doc $d: got ${got(d)}, expected ($mid, $jm, $n)")
      }
      (got.keySet -- expected.keySet).foreach { d =>
        assert(got(d) == ((-1L, -1L, 0L)), s"doc $d should be novel, got ${got(d)}")
      }
    } finally out.unpersist()
  }

  test("persisted store: probe scan bucket-prunes and matches the in-memory path") {
    resetTable("inc_store")
    val corpusBanded = IncrementalDedup.bandedSignatures(corpus, "doc_id", "text")
    IncrementalDedup.writeStore(corpusBanded, "inc_store", numBuckets = 16)
    val store = IncrementalDedup.loadStore(spark, "inc_store")
    val batchBanded = IncrementalDedup.bandedSignatures(batch, "doc_id", "text")

    // point-probe regime: a small batch's bucket values fit the IN cap
    // and the store scan must read a strict subset of the file-buckets
    val microBatch = IncrementalDedup.bandedSignatures(
      batch.where(col("doc_id") % 97 === 0), "doc_id", "text")
    val microProbe = IncrementalDedup.probeCandidates(store, microBatch)
    val microPlan = microProbe.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(microPlan)
    assert(sel.isDefined,
      s"micro-batch store probe must bucket-prune; plan:\n${microPlan.take(2000)}")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"micro-batch probe must read a strict subset of buckets: ${sel.get.matched}")

    // large-batch regime: over the cap, the probe is the plain join
    val pruned = IncrementalDedup.probeCandidates(store, batchBanded)
    val direct = IncrementalDedup.probeCandidates(corpusBanded, batchBanded)
    val a = pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"pruned store probe diverged: ${a.diff(b)} / ${b.diff(a)}")

    // end to end through the store: same verdicts as the computed path
    val viaStore = IncrementalDedup.ingestVerdict(corpus, batch, "doc_id", "text",
      threshold = 0.5, corpusBanded = Some(store))
    val inMem = IncrementalDedup.ingestVerdict(corpus, batch, "doc_id", "text",
      threshold = 0.5)
    try {
      val va = viaStore.collect().map(_.toSeq).toSet
      val vb = inMem.collect().map(_.toSeq).toSet
      assert(va == vb)
    } finally { viaStore.unpersist(); inMem.unpersist(); resetTable("inc_store") }
  }

  test("append keeps the bucket spec and extends the store") {
    resetTable("inc_store_app")
    val half1 = IncrementalDedup.bandedSignatures(
      corpus.where(col("doc_id") < 250), "doc_id", "text")
    val half2 = IncrementalDedup.bandedSignatures(
      corpus.where(col("doc_id") >= 250), "doc_id", "text")
    IncrementalDedup.writeStore(half1, "inc_store_app", numBuckets = 16)
    IncrementalDedup.writeStore(half2, "inc_store_app", numBuckets = 16,
      mode = org.apache.spark.sql.SaveMode.Append)
    val store = IncrementalDedup.loadStore(spark, "inc_store_app")
    val full = IncrementalDedup.bandedSignatures(corpus, "doc_id", "text")
    assert(store.count() == full.count())
    // appended store still bucket-prunes a small probe
    val probe = IncrementalDedup.probeCandidates(store,
      IncrementalDedup.bandedSignatures(
        batch.where(col("doc_id") % 97 === 0), "doc_id", "text"))
    assert(probe.queryExecution.executedPlan.toString.contains("SelectedBucketsCount"))
    resetTable("inc_store_app")
  }

  test("probe-set cap: over-cap batches fall back to the plain join, same answer") {
    val corpusBanded = IncrementalDedup.bandedSignatures(corpus, "doc_id", "text")
    val batchBanded = IncrementalDedup.bandedSignatures(batch, "doc_id", "text")
    val unlimited = IncrementalDedup.probeCandidates(corpusBanded, batchBanded)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("graft.incdedup.maxProbeBuckets", "3")
    try {
      val capped = IncrementalDedup.probeCandidates(corpusBanded, batchBanded)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped == unlimited)
    } finally spark.conf.unset("graft.incdedup.maxProbeBuckets")
  }

  test("ingestStream: verdicts vs everything ever admitted; duplicates never enter the store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    resetTable("inc_stream"); resetTable("inc_stream_docs"); resetTable("inc_stream_meta")
    val ckpt = java.nio.file.Files.createTempDirectory("inc-stream-ckpt").toString
    val d0 = "a b c d e f g h i j"
    val dup = d0 + " k" // word-3-gram jaccard vs d0 = 8/9 ~ 0.889 >= 0.7
    val novel = "z y x w v u t s r q"
    val stream = MemoryStream[(Long, String)]
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = graft.ops.IncrementalDedup.ingestStream(
      stream.toDF().select(col("_1").as("doc_id"), col("_2").as("text")),
      "doc_id", "text", "inc_stream",
      (v, _) => verdicts ++= v.collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))),
      ckpt)
    try {
      stream.addData((0L, d0), (1L, dup))
      q.processAllAvailable()
      assert(verdicts.toSet == Set((0L, None), (1L, Some(0L))),
        s"batch 1 verdicts: $verdicts")
      verdicts.clear()
      // 2 duplicates an ADMITTED doc; 3 is novel
      stream.addData((2L, dup), (3L, novel))
      q.processAllAvailable()
      assert(verdicts.toSet == Set((2L, Some(0L)), (3L, None)),
        s"batch 2 verdicts: $verdicts")
      verdicts.clear()
      // 4 duplicates a doc that was itself DROPPED as a duplicate —
      // it must still resolve against the admitted representative
      stream.addData((4L, d0 + " l"))
      q.processAllAvailable()
      assert(verdicts.toSet == Set((4L, Some(0L))), s"batch 3 verdicts: $verdicts")
      // the store holds only admitted docs
      val stored = graft.ops.IncrementalDedup.loadStore(spark, "inc_stream_docs")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(stored == Set(0L, 3L), s"store docs: $stored")
      val sigIds = graft.ops.IncrementalDedup.loadStore(spark, "inc_stream")
        .select(col("id")).distinct().collect().map(_.getLong(0)).toSet
      assert(sigIds == Set(0L, 3L), s"store signature ids: $sigIds")
      // the commit marker records the last appended batch FOR THIS
      // CHECKPOINT (r19 review: batchIds are checkpoint-scoped)
      val marker = spark.table("inc_stream_meta").collect()
      assert(marker.map(_.getLong(1)).toSeq == Seq(2L))
      assert(marker.map(_.getString(0)).toSeq == Seq(ckpt))
      // a replayed batch (simulated: verdict against the post-append
      // store) still resolves correctly — self-pairs are excluded, so
      // admitted docs stay novel and duplicates still match the keeper
      val replay = graft.ops.IncrementalDedup.ingestVerdict(
        graft.ops.IncrementalDedup.loadStore(spark, "inc_stream_docs"),
        Seq((4L, d0 + " l")).toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.7,
        corpusBanded = Some(graft.ops.IncrementalDedup.loadStore(spark, "inc_stream")))
      try {
        val r = replay.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(r == Seq((4L, 0L)), s"replayed verdict: $r")
      } finally replay.unpersist()
    } finally {
      q.stop()
    }
    // a SECOND campaign (fresh checkpoint, new docs, batchIds restart
    // at 0) must still APPEND: a store-global marker would read
    // lastCommitted=2 and silently drop batch 0's admission while
    // delivering its verdict (the r19-review silent-data-loss class)
    try {
      val ckpt2 = java.nio.file.Files.createTempDirectory("inc-stream-ckpt2").toString
      val stream2 = MemoryStream[(Long, String)]
      val verdicts2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
      val q2 = graft.ops.IncrementalDedup.ingestStream(
        stream2.toDF().select(col("_1").as("doc_id"), col("_2").as("text")),
        "doc_id", "text", "inc_stream",
        (v, _) => verdicts2 ++= v.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))),
        ckpt2)
      try {
        stream2.addData((10L, "m n o p q r s t u v"))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(verdicts2.toSet == Set((10L, None)), s"campaign 2: $verdicts2")
      val stored2 = graft.ops.IncrementalDedup.loadStore(spark, "inc_stream_docs")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(stored2 == Set(0L, 3L, 10L),
        s"fresh-checkpoint campaign's admission was dropped: $stored2")
    } finally {
      resetTable("inc_stream"); resetTable("inc_stream_docs"); resetTable("inc_stream_meta")
    }
  }

  test("banded signatures match the batch pipeline's banding bit-for-bit") {
    // the store must be the SAME family as Dedup.minhashCandidates: a
    // batch-vs-batch probe through IncrementalDedup reproduces the batch
    // pipeline's candidate pairs
    val banded = IncrementalDedup.bandedSignatures(docs, "doc_id", "text")
    val viaInc = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBatch = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaInc == viaBatch)
  }
}
