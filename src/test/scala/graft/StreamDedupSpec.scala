package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup: exact-content and simhash-bucket variants over a real
  * memory stream (duplicates within AND across micro-batches), plus
  * batch-mode parity.
  */
class StreamDedupSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("exact: duplicates drop across micro-batches, first instance survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = StreamDedup.exact(
      stream.toDS().toDF("doc_id", "ts", "text"), "ts", "text", watermark = "10 minutes")
    val query = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate
      stream.addData(
        (1L, ts(60000), "the quick brown fox"),
        (2L, ts(61000), "a completely different doc"),
        (3L, ts(62000), "the quick brown fox"))
      query.processAllAvailable()
      // batch 2: cross-batch duplicate of doc 1 + one new doc
      stream.addData(
        (4L, ts(63000), "the quick brown fox"),
        (5L, ts(64000), "yet another new document"))
      query.processAllAvailable()
      val out = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 2L, 5L),
        s"expected docs 1,2,5 to survive; got ${out.toSeq}")
    } finally query.stop()
  }

  test("simhash: near-identical docs (same signature) dedup, distinct docs survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = StreamDedup.simhash(
      stream.toDS().toDF("doc_id", "ts", "text"), "ts", "text", watermark = "10 minutes")
    val query = deduped.writeStream.format("memory").queryName("simdedup_out")
      .outputMode("append").start()
    try {
      val words = (0 until 60).map(i => s"w$i")
      val docA = words.mkString(" ")
      // same multiset of majority tokens -> identical simhash votes
      val docADup = words.mkString(" ")
      val docB = (0 until 60).map(i => s"zz$i").mkString(" ")
      stream.addData((1L, ts(60000), docA), (2L, ts(61000), docB))
      query.processAllAvailable()
      stream.addData((3L, ts(62000), docADup))
      query.processAllAvailable()
      val out = spark.table("simdedup_out").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 2L), s"expected 1,2; got ${out.toSeq}")
    } finally query.stop()
  }

  test("simhashBanded: hamming<=3 variant pairs detected across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Build a near-duplicate deterministically: swap single tokens until the
    // simhash lands within hamming distance 1..3 of the original (signature
    // function is deterministic, so this search is stable across runs).
    val words = (0 until 80).map(i => s"tok$i")
    val docA = words.mkString(" ")
    val sigA = graft.ops.Dedup.simhashOf(words)
    val variant = (0 until 400).iterator.map { j =>
      val cand = words.updated(j % 80, s"alt${j}")
      val d = java.lang.Long.bitCount(graft.ops.Dedup.simhashOf(cand) ^ sigA)
      (cand.mkString(" "), d)
    }.find { case (_, d) => d >= 1 && d <= 3 }
    assert(variant.isDefined, "no hamming-1..3 variant found in 400 tries")
    val (docAVar, dist) = variant.get
    val docB = (0 until 80).map(i => s"other$i").mkString(" ")

    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val pairs = StreamDedup.simhashBanded(
      stream.toDS().toDF("doc_id", "ts", "text"),
      "ts", "doc_id", "text", maxDist = 3, watermark = "10 minutes")
    val query = pairs.writeStream.format("memory").queryName("banded_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(60000), docA), (2L, ts(61000), docB))
      query.processAllAvailable()
      // cross-batch: the hamming-dist variant of doc 1 arrives later
      stream.addData((3L, ts(120000), docAVar))
      query.processAllAvailable()
      val out = spark.table("banded_out")
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      assert(out == Set((1L, 3L, dist)),
        s"expected exactly pair (1,3,$dist); got $out")
    } finally query.stop()
  }

  test("simhashBanded: late-but-within-watermark arrival still pairs and does not expire newer state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val words = (0 until 80).map(i => s"tok$i")
    val docA = words.mkString(" ")
    val sigA = graft.ops.Dedup.simhashOf(words)
    val variant = (0 until 400).iterator.map { j =>
      val cand = words.updated(j % 80, s"alt${j}")
      val d = java.lang.Long.bitCount(graft.ops.Dedup.simhashOf(cand) ^ sigA)
      (cand.mkString(" "), d)
    }.find { case (_, d) => d >= 1 && d <= 3 }.get
    val (docAVar, dist) = variant

    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val pairs = StreamDedup.simhashBanded(
      stream.toDS().toDF("doc_id", "ts", "text"),
      "ts", "doc_id", "text", maxDist = 3, watermark = "10 minutes")
    val query = pairs.writeStream.format("memory").queryName("banded_late_out")
      .outputMode("append").start()
    try {
      // batch 1: doc 1 at t=300s
      stream.addData((1L, ts(300000), docA))
      query.processAllAvailable()
      // batch 2: LATE duplicate at t=120s — older than doc 1 but within the
      // 10-minute horizon (watermark is still below it). Before the r7 fix
      // this batch (a) moved the key timeout back to 120s+horizon, and
      // (b) prepended the older entry at the head of the state list.
      stream.addData((2L, ts(120000), docAVar))
      query.processAllAvailable()
      // batch 3: another variant at t=310s must still pair with doc 1 —
      // proving the late batch neither expired nor evicted the newer entry
      stream.addData((3L, ts(310000), docA))
      query.processAllAvailable()
      val out = spark.table("banded_late_out")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(out.contains((1L, 2L)), s"late arrival should pair with doc 1; got $out")
      assert(out.contains((1L, 3L)), s"doc 1 must survive the late batch and pair with doc 3; got $out")
      assert(out.contains((2L, 3L)), s"doc 2 within horizon of doc 3; got $out")
    } finally query.stop()
  }

  test("simhashCandidates: oversized chunk buckets are dropped (skew guard)") {
    import spark.implicits._
    // 30 identical docs share every chunk value -> one 30-doc bucket per
    // chunk; with the cap below 30 the quadratic bucket contributes no
    // pairs, while the two distinct near-variants still pair up.
    val boiler = (1L to 30L).map(i => (i, "the same boilerplate text repeated everywhere"))
    // identical pair (hamming 0) in its own small bucket: survives the
    // guard deterministically (a one-token variant can flip > 3 sign bits
    // on short docs, so it would make the assertion flaky)
    val variants = Seq(
      (100L, "a unique document about distributed clustering engines and data"),
      (101L, "a unique document about distributed clustering engines and data"))
    val df = (boiler ++ variants).toDF("doc_id", "text")
    val all = graft.ops.Dedup.simhashCandidates(df, "doc_id", "text", maxDist = 3)
    assert(all.where(col("id_a") <= 30 && col("id_b") <= 30).count() == 30L * 29 / 2)
    val guarded = graft.ops.Dedup.simhashCandidates(df, "doc_id", "text",
      maxDist = 3, maxBucketSize = 16)
    val g = guarded.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!g.exists { case (x, y) => x <= 30 && y <= 30 },
      s"boilerplate bucket should be dropped, got $g")
    assert(g.contains((100L, 101L)), s"near-variant pair must survive the guard, got $g")
  }

  test("batch frames dedup with plain dropDuplicates semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(1000), "same text"),
      (2L, ts(2000), "same text"),
      (3L, ts(3000), "other text")).toDF("doc_id", "ts", "text")
    val out = StreamDedup.exact(df, "ts", "text").select("doc_id").as[Long].collect()
    assert(out.length == 2)
    assert(out.toSet.contains(3L))
    assert(out.toSet.intersect(Set(1L, 2L)).size == 1)
  }
}
