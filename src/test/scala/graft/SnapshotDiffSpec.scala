package graft

import graft.ops.SnapshotDiff

/** [[graft.ops.SnapshotDiff]]: the four status classes, multi-column
  * digest boundaries, null contents, and the stats rollup.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "de"), (4L, "delta", "fr")
  ).toDF("doc_id", "text", "lang")
  private val newSnap = Seq(
    (1L, "alpha", "en"), // unchanged
    (2L, "beta EDITED", "en"), // changed
    (3L, "gamma", "en"), // changed (second content column)
    (5L, "epsilon", "en") // added; 4 removed
  ).toDF("doc_id", "text", "lang")

  test("statuses classify added/removed/changed/unchanged correctly") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    val slim = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", Seq("text", "lang"),
      keepUnchanged = false)
    assert(slim.count() == 4)
  }

  test("column boundaries don't collide: (ab, c) vs (a, bc) is a change") {
    val o = Seq((1L, "ab", "c")).toDF("doc_id", "a", "b")
    val n = Seq((1L, "a", "bc")).toDF("doc_id", "a", "b")
    val got = SnapshotDiff.diff(o, n, "doc_id", Seq("a", "b")).collect()
    assert(got.head.getString(1) == "changed")
  }

  test("null content digests as empty and stays stable") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("doc_id", "text")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(o, n, "doc_id", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diffStats rolls up the counts") {
    val got = SnapshotDiff.diffStats(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("unchanged" -> 1L, "changed" -> 2L, "removed" -> 1L, "added" -> 1L))
  }
}
