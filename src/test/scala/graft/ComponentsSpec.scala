package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Connected components over near-dup pairs: chains, cliques, isolated
  * pairs, convergence cap.
  */
class ComponentsSpec extends SparkSpec {

  test("chain + clique + isolated pair resolve to min-id components") {
    import spark.implicits._
    // component A: chain 1-2-3-4 (diameter 3); component B: clique 10,11,12;
    // component C: isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
    assert(cc.size == 9)
  }

  test("nearDupGroups: keeper is min id, sizes correct") {
    import spark.implicits._
    val pairs = Seq((5L, 3L), (3L, 9L), (100L, 101L)).toDF("id_a", "id_b")
    val g = Dedup.nearDupGroups(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(g == Set((3L, 3L, 3L), (100L, 100L, 2L)))
  }

  test("long chain beyond the iteration cap throws instead of mislabeling (BSP path)") {
    import spark.implicits._
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // force the distributed path: the local union-find tier has no
    // iteration cap to test
    spark.conf.set("graft.components.localMaxEdges", "0")
    try {
      val ex = intercept[IllegalArgumentException] {
        Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 3).collect()
      }
      assert(ex.getMessage.contains("did not converge"))
      // and with enough iterations the same chain resolves
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 40)
        .agg(countDistinct(col("comp"))).head().getLong(0)
      assert(cc == 1L)
    } finally spark.conf.unset("graft.components.localMaxEdges")
  }

  test("local union-find tier and BSP path label identically") {
    import spark.implicits._
    // chain + clique + stars + isolates, with non-contiguous ids
    val pairs = (Seq((7L, 3L), (3L, 11L), (11L, 5L), (40L, 41L), (40L, 42L),
      (41L, 42L), (90L, 13L)) ++ (100L until 120L).map(i => (200L, i))).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("graft.components.localMaxEdges", "0")
    val bsp =
      try Dedup.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("graft.components.localMaxEdges")
    assert(local == bsp)
    assert(local(5L) == 3L && local(42L) == 40L && local(13L) == 13L && local(119L) == 100L)
  }

  test("leakageSafeSplit: every near-dup group shares one split; singletons match the id split") {
    val docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val out = Dedup.leakageSafeSplit(docs, "doc_id", "text",
      Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == docs.count())
    // all docs sharing a group_key share the split (true by construction;
    // asserts the key join didn't duplicate or drop)
    rows.groupBy(_._2).foreach { case (k, g) =>
      assert(g.map(_._3).distinct.length == 1, s"group $k split disagreement")
    }
    // at least one multi-doc group exists at threshold 0.7 on this corpus
    assert(rows.groupBy(_._2).exists(_._2.length > 1), "fixture must contain a near-dup group")
    // singletons: split equals the plain hash split of the id itself
    val single = rows.filter(r => r._1 == r._2).take(50)
    val plain = graft.ops.TextOps.splitByHash(
        docs.select(org.apache.spark.sql.functions.col("doc_id")), "doc_id",
        Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    single.foreach { case (id, _, s) => assert(plain(id) == s, s"singleton $id") }
    // members of a group get the KEEPER's split, not their own
    rows.find(r => r._1 != r._2).foreach { case (id, key, s) =>
      assert(plain(key) == s, s"doc $id must take group $key's split")
    }
  }
}
