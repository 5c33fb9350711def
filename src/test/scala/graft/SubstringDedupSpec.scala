package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Substring-level exact dedup: duplicated token spans are found, merged
  * into maximal spans, and cut; hashed and string window paths agree.
  */
class SubstringDedupSpec extends SparkSpec {

  // 12-token span shared by docs 1 and 2; doc 3 is shorter than minLen;
  // doc 4 is unique; doc 5 is an 8-token block repeated back to back.
  private def corpus = {
    import spark.implicits._
    val s = "a b c d e f g h i j k l"
    Seq(
      (1L, s + " x1 y1 z1"),
      (2L, "p2 q2 " + s + " r2"),
      (3L, "u3 v3 w3"),
      (4L, "k4 l4 m4 n4 o4 p4 q4 r4 s4 t4"),
      (5L, "m n o p q r s t m n o p q r s t")
    ).toDF("doc_id", "text")
  }

  test("shared spans are merged to maximal extent and cut from every occurrence") {
    val out = Dedup.substringDedup(corpus, "doc_id", "text",
      minLen = 8, minCount = 2, hashWindows = true)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(rows.size == 5)
    // doc 1: 12-token prefix covered (5 windows merged into one span)
    assert(rows(1L) == ((15L, 12L, 0.8, "x1 y1 z1")))
    // doc 2: same span mid-document
    assert(rows(2L) == ((15L, 12L, 0.8, "p2 q2 r2")))
    // doc 3: shorter than minLen -> untouched
    assert(rows(3L) == ((3L, 0L, 0.0, "u3 v3 w3")))
    // doc 4: unique windows -> untouched
    assert(rows(4L)._2 == 0L && rows(4L)._4 == "k4 l4 m4 n4 o4 p4 q4 r4 s4 t4")
    // doc 5: within-doc back-to-back repeat -> adjacent windows merge,
    // whole doc covered, clean text empty
    assert(rows(5L) == ((16L, 16L, 1.0, "")))
  }

  test("minCount above the occurrence count leaves text untouched") {
    val out = Dedup.substringDedup(corpus, "doc_id", "text",
      minLen = 8, minCount = 3, hashWindows = true)
    assert(out.agg(sum(col("dup_tokens"))).head.getLong(0) == 0L)
  }

  test("hashed and string window paths agree on real documents") {
    val docs = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val hashed = Dedup.substringDedup(docs, "doc_id", "text", minLen = 8)
    val strings = Dedup.substringDedup(docs, "doc_id", "text", minLen = 8,
      hashWindows = false)
    assert(hashed.exceptAll(strings).isEmpty && strings.exceptAll(hashed).isEmpty)
    // and the operator actually finds duplicated spans in this corpus
    assert(hashed.where(col("dup_tokens") > 0).count() > 0)
  }
}
