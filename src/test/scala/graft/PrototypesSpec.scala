package graft

import graft.ops.Prototypes
import org.apache.spark.sql.functions._

/** [[graft.ops.Prototypes]]: SSL-prototypes scoring against a brute-force
  * reference, integer keep boundaries, and the two pruning regimes.
  */
class PrototypesSpec extends SparkSpec {
  import spark.implicits._

  // 2-D fixture: two obvious clusters around (0,0) and (10,10)
  private val vecs = Seq(
    (1L, Seq(0.1, 0.0)), (2L, Seq(0.0, 0.2)), (3L, Seq(0.3, 0.3)), (4L, Seq(-0.2, 0.1)),
    (5L, Seq(10.0, 10.1)), (6L, Seq(9.8, 10.0)), (7L, Seq(10.3, 9.7))
  )
  private val centers = Array(Array(0.0, 0.1), Array(10.0, 10.0))

  private def df = vecs.toDF("vec_id", "embedding")

  private def cos(a: Seq[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    d / (na * nb)
  }

  test("assignment, cosine, and rank match the brute-force reference") {
    val got = Prototypes.prototypicality(df, "vec_id", "embedding", centers)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val byCluster = vecs.groupBy { case (_, v) =>
      centers.zipWithIndex.minBy { case (c, i) =>
        (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }._2
    }
    byCluster.foreach { case (cl, members) =>
      val ranked = members.map { case (id, v) => (id, cos(v, centers(cl))) }
        .sortBy { case (id, s) => (-s, id) }
      ranked.zipWithIndex.foreach { case ((id, s), i) =>
        val (gc, gn, gr, gs) = got(id)
        assert(gc == cl && gn == members.size && gr == i + 1, s"row $id: got $gc/$gn/$gr")
        assert(math.abs(gs - s) < 1e-12, s"cosine mismatch for $id: $gs vs $s")
      }
    }
  }

  test("prunePrototypes keeps ceil(n*num/den) per cluster — hardest by default, easiest on request") {
    // cluster 0 has 4 members, cluster 1 has 3; keep 1/2 -> 2 and 2
    val hardest = Prototypes.prunePrototypes(df, "vec_id", "embedding", centers, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
    val perCluster = hardest.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perCluster == Map(0L -> 2, 1L -> 2))
    // hardest = the HIGHEST ranks (lowest cosine)
    hardest.foreach { case (_, cl, rk) =>
      val n = if (cl == 0L) 4 else 3
      assert(rk > n - ((n + 1) / 2), s"cluster $cl kept rank $rk — not the hardest half")
    }
    val easiest = Prototypes.prunePrototypes(df, "vec_id", "embedding", centers, 1L, 2L,
      keepHardest = false)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toList
    easiest.foreach { case (cl, rk) =>
      assert(rk <= (if (cl == 0L) 2 else 2), s"cluster $cl kept rank $rk — not the easiest half")
    }
  }

  test("keep fraction 1 keeps everything; partitioning does not change the result") {
    val all = Prototypes.prunePrototypes(df, "vec_id", "embedding", centers, 1L, 1L)
    assert(all.count() == vecs.size)
    val a = Prototypes.prototypicality(df.repartition(7), "vec_id", "embedding", centers)
      .orderBy("vec_id").collect().toSeq
    val b = Prototypes.prototypicality(df.coalesce(1), "vec_id", "embedding", centers)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("bad inputs are rejected with remediation") {
    intercept[IllegalArgumentException] {
      Prototypes.prototypicality(df, "vec_id", "embedding", Array.empty[Array[Double]])
    }
    intercept[IllegalArgumentException] {
      Prototypes.prunePrototypes(df, "vec_id", "embedding", centers, 3L, 2L)
    }
  }
}
