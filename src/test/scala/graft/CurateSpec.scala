package graft

import graft.ops.Curate

/** End-to-end corpus curation semantics on a handcrafted corpus: each
  * stage (language filter, quality filter, exact dedup, near-dup
  * grouping, best-quality representative) must act on exactly the rows
  * built to trigger it.
  */
class CurateSpec extends SparkSpec {

  import spark.implicits._

  // long, clean English fillers that pass the quality score; the two
  // fillers share no 3-word shingles, so docs built on different fillers
  // are NOT near-dups of each other
  private def en(extra: String): String =
    ("the quick brown fox jumps over the lazy dog and then the dog is " +
      "very happy to see it again in the morning of a bright day ") * 6 + extra
  private def en2(extra: String): String =
    ("a small boat drifts along the calm river while birds sing songs " +
      "in tall green trees near the old wooden bridge every evening ") * 6 + extra

  test("curate filters, dedups, groups, and keeps the best representative") {
    val nearA = en("shared tail one two three")
    val nearB = en("shared tail one two three four") // near-dup of nearA, slightly longer (higher quality cap)
    val docs = Seq(
      (1L, en2("alpha unique body")),
      (2L, en2("alpha unique body")), // exact dup of 1 -> min id survives
      (3L, nearA),
      (4L, nearB), // near-dup pair {3,4}: same quality or higher; one survivor
      (5L, "el la de que el la de que el la de que"), // spanish -> filtered
      (6L, "zzz !!!")) // low quality -> filtered
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text",
      lang = "en", minQuality = 0.4, jaccardThreshold = 0.6)
    val ids = out.select("doc_id").as[Long].collect().toSet
    out.unpersist()
    assert(!ids.contains(5L) && !ids.contains(6L), "language/quality filters")
    assert(ids.contains(1L) && !ids.contains(2L), "exact dedup keeps min id")
    // exactly one of the near-dup pair survives (equal capped quality ->
    // tie broken to the smaller id)
    assert(Seq(3L, 4L).count(ids.contains) == 1, s"near-dup pair collapsed: $ids")
    assert(ids == Set(1L, 3L))
  }

  test("curate output carries quality and token counts for survivors") {
    val docs = Seq((1L, en("body one")), (2L, en("totally different body two here")))
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text", minQuality = 0.0, jaccardThreshold = 0.9)
    val rows = out.collect()
    out.unpersist()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0 && r.getInt(2) > 50)
    }
  }
}
