package graft

import graft.ops.Curate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** One-call streaming curation over a real memory stream: each stage
  * (quality filter, language filter, exact dedup, simhash near-dup dedup,
  * decontamination) must act on exactly the rows built to trigger it,
  * across micro-batches, including a late arrival inside the watermark
  * horizon.
  *
  * Fixture note: simhash is a bag-of-tokens majority vote, so documents
  * sharing a dominant boilerplate base are (correctly) near-dups of each
  * other — every doc meant to SURVIVE dedup gets its own token base.
  */
class StreamCurateSpec extends SparkSpec {

  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  // three long clean English fillers with disjoint dominant vocabulary
  private def en(extra: String): String =
    ("the quick brown fox jumps over the lazy dog and then the dog is " +
      "very happy to see it again in the morning of a bright day ") * 6 + extra
  private def en2(extra: String): String =
    ("a small boat drifts along the calm river while birds sing songs " +
      "in tall green trees near the old wooden bridge every evening ") * 6 + extra
  private def en3(extra: String): String =
    ("deep inside the ancient library countless dusty volumes rest upon " +
      "endless shelves and the scholars read them late into the night ") * 6 + extra

  private val evalDoc = "benchmark answer alpha beta gamma delta epsilon zeta eta theta"

  test("curateStream: filter -> dedup -> decontaminate composition across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val curated = Curate.curateStream(
      stream.toDS().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
      ev, "text", lang = "en", minQuality = 0.4, watermark = "10 minutes", n = 5)
    val query = curated.writeStream.format("memory").queryName("curate_stream_out")
      .outputMode("append").start()
    try {
      val keeper = en("unique first body")
      // same token multiset as keeper (word swap) -> identical simhash,
      // different exact hash: must fall to the NEAR-DUP stage
      val nearDup = en("first unique body")
      val contaminated = en3("contains benchmark answer alpha beta gamma delta epsilon overlap")
      stream.addData(
        (1L, ts(600000), keeper),
        (2L, ts(601000), keeper), // exact dup, same batch
        (5L, ts(602000), "el la de que el la de que el la de que"), // spanish -> filtered
        (6L, ts(603000), "zzz !!!")) // low quality -> filtered
      query.processAllAvailable()
      stream.addData(
        (3L, ts(660000), keeper), // exact dup, later batch
        (4L, ts(661000), nearDup), // simhash near-dup, later batch
        (7L, ts(662000), contaminated), // shares a 5-gram with the eval set
        (8L, ts(663000), en2("genuinely novel second body"))) // clean survivor
      query.processAllAvailable()
      // LATE arrival inside the watermark horizon: duplicate content with
      // an event time older than rows already seen -> still dedups
      stream.addData((9L, ts(604000), keeper))
      query.processAllAvailable()
      val rows = spark.table("curate_stream_out").collect()
      val ids = rows.map(_.getLong(0)).toSet
      assert(ids == Set(1L, 8L),
        s"expected only 1 (first instance) and 8 (novel) to survive; got $ids")
      // survivors carry the quality/token profile
      rows.foreach { r =>
        assert(r.getDouble(2) >= 0.4 && r.getInt(3) > 50, s"bad profile row $r")
      }
    } finally query.stop()
  }

  test("curateStream: batch-mode parity (same composition on a static frame)") {
    val ev = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, ts(600000), en("unique first body")),
      (2L, ts(601000), en("unique first body")), // exact dup of 1
      (7L, ts(602000), en3("contains benchmark answer alpha beta gamma delta epsilon overlap")),
      (6L, ts(603000), "zzz !!!"))
      .toDF("doc_id", "ts", "text")
    val out = Curate.curateStream(docs, "doc_id", "ts", "text", ev, "text",
      lang = "en", minQuality = 0.4, n = 5)
    // batch keeper is deterministic: earliest (ts, id) — doc 1
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("curateStream: bloom eval filter never admits what exact drops") {
    val ev = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, ts(600000), en("unique first body")),
      (3L, ts(601000), en2("unique second body")),
      (7L, ts(602000), en3("contains benchmark answer alpha beta gamma delta epsilon overlap")),
      (6L, ts(603000), "zzz !!!"))
      .toDF("doc_id", "ts", "text")
    val exact = Curate.curateStream(docs, "doc_id", "ts", "text", ev, "text",
      lang = "en", minQuality = 0.4, n = 5)
      .select("doc_id").as[Long].collect().toSet
    val bloom = Curate.curateStream(docs, "doc_id", "ts", "text", ev, "text",
      lang = "en", minQuality = 0.4, n = 5, evalFilter = "bloom")
      .select("doc_id").as[Long].collect().toSet
    // zero false negatives: bloom can only DROP extra docs, never admit
    // a doc the exact filter flags as contaminated
    assert(bloom.subsetOf(exact), s"bloom admitted $bloom beyond exact $exact")
    // on this fixture the ~0.8%/shingle FP rate should change nothing
    assert(bloom == exact, s"bloom $bloom vs exact $exact")
    assert(exact == Set(1L, 3L))
  }

  test("curateStream: bloom eval filter works on a real memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val curated = Curate.curateStream(
      stream.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "ts", "text", ev, "text",
      lang = "en", minQuality = 0.4, n = 5, nearDupDedup = false,
      evalFilter = "bloom")
    val q = curated.writeStream.format("memory").queryName("bloom_curated")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(600000), en("unique first body")),
        (7L, ts(601000), en3("contains benchmark answer alpha beta gamma delta epsilon overlap")))
      q.processAllAvailable()
      val got = spark.table("bloom_curated").select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L), s"stream survivors: $got")
    } finally q.stop()
  }
}
