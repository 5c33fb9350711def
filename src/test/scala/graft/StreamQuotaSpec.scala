package graft

import graft.streaming.StreamQuota
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming per-domain admission quotas: the lifetime cap holds across
  * micro-batches, admission order is (ts, id), and batch mode agrees
  * with the batch capPerDomain count contract.
  */
class StreamQuotaSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("quota admits in (ts, id) order and holds across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, java.sql.Timestamp)]
    val out = StreamQuota.domainQuota(
      stream.toDS().toDF("domain", "doc_id", "ts"), "ts", "domain", "doc_id", maxDocs = 3L)
    val query = out.writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    try {
      // batch 1: domain a sends 2 (out of ts order), domain b sends 1
      stream.addData(
        ("a", 11L, ts(62000)),
        ("a", 10L, ts(61000)),
        ("b", 20L, ts(61500)))
      query.processAllAvailable()
      // batch 2: domain a sends 3 more — only ONE seat left; earliest ts wins
      stream.addData(
        ("a", 14L, ts(65000)),
        ("a", 12L, ts(63000)),
        ("a", 13L, ts(64000)),
        ("b", 21L, ts(66000)))
      query.processAllAvailable()
      val rows = spark.table("quota_out")
        .select("domain", "id", "rk").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("a", 10L, 1L), ("a", 11L, 2L), // batch 1, ts order not arrival order
        ("a", 12L, 3L),                 // batch 2: earliest ts takes the last seat
        ("b", 20L, 1L), ("b", 21L, 2L)))
    } finally query.stop()
  }

  test("quota never exceeds the cap under a flood; batch mode agrees with capPerDomain counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, java.sql.Timestamp)]
    val out = StreamQuota.domainQuota(
      stream.toDS().toDF("domain", "doc_id", "ts"), "ts", "domain", "doc_id", maxDocs = 5L)
    val query = out.writeStream.format("memory").queryName("quota_flood")
      .outputMode("append").start()
    try {
      (0 until 4).foreach { b =>
        stream.addData((0 until 25).map(i =>
          ("d" + (i % 3), (b * 100 + i).toLong, ts(100000L + b * 1000 + i))): _*)
        query.processAllAvailable()
      }
      val counts = spark.table("quota_flood").groupBy("domain").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("d0" -> 5L, "d1" -> 5L, "d2" -> 5L), counts.toString)
    } finally query.stop()

    // batch mode: one pass, same per-domain counts as the batch cap
    val batch = (0 until 50).map(i => ("d" + (i % 4), i.toLong, ts(200000L + i)))
      .toDF("domain", "doc_id", "ts")
    val admitted = StreamQuota.domainQuota(batch, "ts", "domain", "doc_id", 7L)
    val bc = admitted.groupBy(col("domain")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bc.values.forall(_ == 7L) && bc.size == 4)
    // rk is a contiguous 1..7 per domain
    val rks = admitted.where(col("domain") === "d0").select("rk").collect()
      .map(_.getLong(0)).sorted
    assert(rks.toSeq == (1L to 7L))
  }

  test("rateLimit: windowed caps across micro-batches; new windows reset the budget") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, java.sql.Timestamp)]
    // 60-second windows, 2 docs per domain per window
    val out = graft.streaming.StreamQuota.rateLimit(
      stream.toDS().toDF("domain", "doc_id", "ts"), "ts", "domain", "doc_id",
      maxDocs = 2L, windowSeconds = 60L, watermark = "5 minutes")
    val query = out.writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      // window [60, 120): a sends 2; batch 2 sends 2 MORE into the same
      // window (rejected) plus 2 into the next window (admitted)
      stream.addData(("a", 1L, ts(61000)), ("a", 2L, ts(62000)))
      query.processAllAvailable()
      stream.addData(
        ("a", 3L, ts(63000)), ("a", 4L, ts(64000)), // same window, over cap
        ("a", 5L, ts(121000)), ("a", 6L, ts(122000))) // next window
      query.processAllAvailable()
      val rows = spark.table("rate_out")
        .select("id", "win_start_s", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(
        (1L, 60L, 1L), (2L, 60L, 2L),
        (5L, 120L, 1L), (6L, 120L, 2L)), rows.toString)
    } finally query.stop()
  }

  test("rateLimit batch parity: per-(domain, window) rank caps match the window replay") {
    import spark.implicits._
    val batch = (0 until 30).map { i =>
      ("d" + (i % 2), i.toLong, ts(1000000L + i * 20000L)) // every 20s
    }.toDF("domain", "doc_id", "ts")
    val admitted = graft.streaming.StreamQuota.rateLimit(
      batch, "ts", "domain", "doc_id", maxDocs = 2L, windowSeconds = 60L)
    // 20s cadence, 2 domains alternating -> each domain lands ~1-2 docs
    // per 60s window; cap 2 per window admits everything except windows
    // with 3+ hits of one domain (none here), so verify via exact replay
    val rows = admitted.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSet
    val expected = (0 until 30).map { i =>
      ("d" + (i % 2), i.toLong, 1000L + i * 20) // epoch s
    }.groupBy { case (d, _, s) => (d, (s / 60) * 60) }
      .flatMap { case (_, grp) =>
        grp.sortBy(_._3).zipWithIndex.filter(_._2 < 2)
          .map { case ((d, id, _), r0) => (d, id, r0 + 1L) }
      }.toSet
    assert(rows == expected, s"${rows.size} vs ${expected.size}")
  }

  test("rateLimit windows floor pre-epoch event times (div-truncation regression)") {
    import spark.implicits._
    // epoch -70s belongs to window [-120, -60), NOT [-60, 0): truncating
    // division put it in the wrong window before the pmod floor fix
    val batch = Seq(
      ("d", 1L, ts(-70000L)), // epoch -70 -> window -120
      ("d", 2L, ts(-10000L)), // epoch -10 -> window -60
      ("d", 3L, ts(10000L))   // epoch  10 -> window 0
    ).toDF("domain", "doc_id", "ts")
    val wins = graft.streaming.StreamQuota.rateLimit(
      batch, "ts", "domain", "doc_id", maxDocs = 5L, windowSeconds = 60L)
      .select("id", "win_start_s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wins == Map(1L -> -120L, 2L -> -60L, 3L -> 0L), wins.toString)
    // invariant: every row's window contains it
    wins.foreach { case (_, w) => assert(w % 60 == 0) }
  }
}
