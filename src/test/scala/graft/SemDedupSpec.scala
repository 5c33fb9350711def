package graft

import graft.ops.SemDedup
import org.apache.spark.sql.functions._

/** Semantic dedup (SemDeDup): within-cluster cosine grouping, keeper
  * strategies, partition invariance, skew refusal, trained end-to-end.
  */
class SemDedupSpec extends SparkSpec {

  // two well-separated unit directions in 4-D with small deterministic
  // jitter: ids 0-2 are mutual near-dups of e1, ids 10-12 of e2; ids 3 and
  // 13 are distinct members of each cluster (below the 0.99 threshold)
  private def corpus = {
    import spark.implicits._
    def j(base: Array[Double], eps: Double): Array[Double] =
      base.zipWithIndex.map { case (v, i) => v + eps * (if (i % 2 == 0) 1 else -1) }
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    Seq(
      (0L, e1), (1L, j(e1, 0.01)), (2L, j(e1, 0.02)),
      (3L, Array(1.0, 0.3, 0.3, 0.0)),
      (10L, e2), (11L, j(e2, 0.01)), (12L, j(e2, 0.02)),
      (13L, Array(0.3, 1.0, 0.0, 0.3))
    ).toDF("id", "v")
  }

  private val centers = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))

  test("fixed centers: planted near-dups group per cluster, min-id keeper") {
    val out = SemDedup.semDedupFixed(corpus, "id", "v", centers, epsilon = 0.99)
    try {
      val rows = out.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toMap
      assert(rows.size == 8)
      // cluster assignment follows the dominant direction
      assert(Seq(0L, 1L, 2L, 3L).forall(rows(_)._1 == 0L))
      assert(Seq(10L, 11L, 12L, 13L).forall(rows(_)._1 == 1L))
      // duplicate groups: {0,1,2} and {10,11,12}; 3 and 13 unaffected
      assert(Seq(0L, 1L, 2L).forall(rows(_)._2 == 0L))
      assert(Seq(10L, 11L, 12L).forall(rows(_)._2 == 10L))
      assert(rows(3L)._2 == -1L && rows(13L)._2 == -1L)
      // min-id keepers survive; other group members do not; singles keep
      assert(rows(0L)._3 && rows(10L)._3 && rows(3L)._3 && rows(13L)._3)
      assert(!rows(1L)._3 && !rows(2L)._3 && !rows(11L)._3 && !rows(12L)._3)
    } finally out.unpersist()
  }

  test("far_from_centroid keeper keeps the least prototypical member") {
    // id 2 has the largest jitter in group {0,1,2} -> lowest centroid sim
    val out = SemDedup.semDedupFixed(corpus, "id", "v", centers, epsilon = 0.99,
      keeper = SemDedup.KeepFarFromCentroid)
    try {
      val keep = out.where(col("keep")).collect().map(_.getLong(0)).toSet
      assert(keep == Set(2L, 3L, 12L, 13L))
      // sanity: the kept member really has the group-min centroid sim
      val sims = out.where(col("comp") === 0L)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(sims(2L) == sims.values.min)
    } finally out.unpersist()
  }

  test("result is invariant under input partitioning") {
    val base = SemDedup.semDedupFixed(corpus, "id", "v", centers, epsilon = 0.99)
    val shuffled = SemDedup.semDedupFixed(corpus.repartition(7), "id", "v",
      centers, epsilon = 0.99)
    try {
      val a = base.orderBy("id").collect().toSeq
      val b = shuffled.orderBy("id").collect().toSeq
      assert(a == b)
    } finally { base.unpersist(); shuffled.unpersist() }
  }

  test("oversized cluster refuses with the offending sizes") {
    val e = intercept[IllegalArgumentException] {
      SemDedup.semDedupFixed(corpus, "id", "v", centers, epsilon = 0.99,
        maxClusterSize = 3)
    }
    assert(e.getMessage.contains("maxClusterSize"))
    assert(e.getMessage.contains("4 rows"))
  }

  test("trained end-to-end: spherical k-means + dedup removes planted dups") {
    val out = SemDedup.semDedup(corpus, "id", "v", k = 2, epsilon = 0.99,
      seed = 7L, maxIter = 5)
    try {
      val kept = out.where(col("keep")).count()
      // one representative per planted group + the two distinct vectors
      assert(kept == 4L)
      // members of the same planted group always share a component
      val comps = out.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(comps(0L) == comps(1L) && comps(1L) == comps(2L) && comps(0L) >= 0L)
      assert(comps(10L) == comps(11L) && comps(11L) == comps(12L) && comps(10L) >= 0L)
    } finally out.unpersist()
  }

  test("assignFixed: closure argmax equals the join+min_by formulation " +
    "bit-for-bit (real vectors, null ids, null/mismatched vectors, dup ids)") {
    import spark.implicits._
    // the pre-optimization formulation, verbatim (r19: assignFixed became
    // a per-row closure argmax + the same id-collapse aggregation; this
    // pins value equality INCLUDING the min_by null-ordering semantics)
    def joinAssign(vectors: org.apache.spark.sql.DataFrame,
        cs: Array[Array[Double]]): org.apache.spark.sql.DataFrame = {
      val centersDf = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toSeq.toDF("cluster", "cv")
      val pts = vectors.select(col("id").cast("long").as("id"),
        col("v").cast("array<double>").as("v"))
      pts.join(broadcast(centersDf))
        .withColumn("sim", graft.functions.ArrayMath.cosine(col("v"), col("cv")))
        .groupBy(col("id"))
        .agg(min_by(struct(col("cluster"), col("sim"), col("v")),
          struct(lit(1.0) - col("sim"), col("cluster"))).as("a"))
        .select(col("id"), col("a.cluster").as("cluster"),
          col("a.sim").as("centroid_sim"), col("a.v").as("v"))
    }
    val rnd = new scala.util.Random(7L)
    def unit(d: Int): Array[Double] = {
      val a = Array.fill(d)(rnd.nextGaussian()); a
    }
    val rows: Seq[(java.lang.Long, Array[Double])] =
      (0 until 200).map(i => (java.lang.Long.valueOf(i.toLong), unit(8))) ++
        Seq(
          (null.asInstanceOf[java.lang.Long], unit(8)),     // null id
          (null.asInstanceOf[java.lang.Long], unit(8)),     // second null id (collapse)
          (java.lang.Long.valueOf(500L), null),             // null vector
          (java.lang.Long.valueOf(501L), Array(1.0, 2.0)),  // dimension mismatch
          (java.lang.Long.valueOf(77L), unit(8)))           // duplicate id
    val df = rows.toDF("id", "v")
    val cs = Array.fill(5)(unit(8))
    val want = joinAssign(df, cs).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0)) ->
        ((if (r.isNullAt(1)) null else r.getLong(1)),
         (if (r.isNullAt(2)) null else r.getDouble(2)),
         (if (r.isNullAt(3)) null else r.getSeq[Double](3)))).toMap
    val got = graft.ops.SemDedup.assignFixed(df, "id", "v", cs).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0)) ->
        ((if (r.isNullAt(1)) null else r.getLong(1)),
         (if (r.isNullAt(2)) null else r.getDouble(2)),
         (if (r.isNullAt(3)) null else r.getSeq[Double](3)))).toMap
    assert(got.keySet == want.keySet)
    got.keySet.foreach { k =>
      assert(got(k) == want(k), s"id=$k: got ${got(k)} want ${want(k)}")
    }
  }

  test("assignFixed: a null ELEMENT inside a vector reads as 0.0 — the " +
    "ArrayCosine unsafe-slot semantics, preserved by the closure argmax") {
    import spark.implicits._
    // r19 advice: the closure decoded Seq[Double] and NPE'd at unboxing
    // on a null element where the former expression formulation read the
    // slot as 0.0 and produced an assignment. Pin the preserved behavior:
    // the null-element vector assigns exactly like its zero-filled twin.
    val rows: Seq[(Long, Array[java.lang.Double])] = Seq(
      (1L, Array[java.lang.Double](1.0, null, 0.25, -0.5)),
      (2L, Array[java.lang.Double](1.0, 0.0, 0.25, -0.5)))
    val df = rows.toDF("id", "v")
    val cs = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 1.0, 0.0),
      Array(-1.0, 0.5, 0.0, 1.0))
    val got = graft.ops.SemDedup.assignFixed(df, "id", "v", cs)
      .select("id", "cluster", "centroid_sim").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == got(2L),
      s"null element must read as 0.0: got ${got(1L)} vs zero-twin ${got(2L)}")
  }
}
