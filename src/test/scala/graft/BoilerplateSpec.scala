package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal: token windows recurring in many
  * DISTINCT documents are cut; in-document repetition alone never fires.
  */
class BoilerplateSpec extends SparkSpec {

  // "nav home about contact" is a 4-token footer shared by docs 1-3;
  // doc 4 pastes its own unique phrase 5 times (high occurrence count,
  // df = 1); doc 5 is unique and shorter than n.
  private def corpus = {
    import spark.implicits._
    val footer = "nav home about contact"
    Seq(
      (1L, "alpha beta gamma " + footer),
      (2L, footer + " delta epsilon"),
      (3L, "zeta " + footer + " eta theta"),
      (4L, "own phrase here own phrase here own phrase here own phrase here own phrase here"),
      (5L, "iota kappa")
    ).toDF("doc_id", "text")
  }

  test("windows in >= minDf distinct docs are cut from every doc; df counts docs, not occurrences") {
    val out = Dedup.boilerplateCut(corpus, "doc_id", "text",
      n = 3, minDf = 3, hashWindows = true)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(rows.size == 5)
    // the two 3-token windows of the footer appear in docs 1,2,3 -> both
    // flagged, merged into the maximal 4-token span, cut everywhere
    assert(rows(1L) == ((7L, 4L, "alpha beta gamma")))
    assert(rows(2L) == ((6L, 4L, "delta epsilon")))
    assert(rows(3L) == ((7L, 4L, "zeta eta theta")))
    // doc 4: every window repeats 5x WITHIN the doc but df = 1 -> kept
    assert(rows(4L)._2 == 0L)
    // doc 5: shorter than n -> untouched
    assert(rows(5L) == ((2L, 0L, "iota kappa")))
  }

  test("minDf above the document frequency leaves text untouched") {
    val out = Dedup.boilerplateCut(corpus, "doc_id", "text",
      n = 3, minDf = 4, hashWindows = true)
    assert(out.agg(sum(col("boiler_tokens"))).head.getLong(0) == 0L)
  }

  test("hashed and string window paths agree on real documents") {
    val docs = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val hashed = Dedup.boilerplateCut(docs, "doc_id", "text", n = 3, minDf = 3)
    val strings = Dedup.boilerplateCut(docs, "doc_id", "text", n = 3, minDf = 3,
      hashWindows = false)
    assert(hashed.exceptAll(strings).isEmpty && strings.exceptAll(hashed).isEmpty)
    assert(hashed.where(col("boiler_tokens") > 0).count() > 0)
  }

  test("substringDedup still distinguishes occurrences: doc 4 IS cut by the occurrence rule") {
    // the span repeated 5x inside one doc fires substringDedup (count
    // based) but not boilerplateCut (df based) — the two operators'
    // contract difference, asserted side by side
    val sub = Dedup.substringDedup(corpus, "doc_id", "text",
      minLen = 3, minCount = 2, hashWindows = true)
      .where(col("doc_id") === 4L).head
    assert(sub.getLong(2) > 0L)
  }
}
