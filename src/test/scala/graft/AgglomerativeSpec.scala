package graft

import graft.clustering._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AgglomerativeSpec extends SparkSpec {

  import spark.implicits._

  /** Two parallel chains of tightly spaced points: within-chain neighbor
    * spacing 0.5, chain separation 5. Single linkage follows the chains;
    * centroid methods would cut them in half.
    */
  def chains(len: Int = 30): DataFrame = {
    val pts = (0 until len).flatMap { i =>
      Seq((Seq(i * 0.5, 0.0), 0), (Seq(i * 0.5, 5.0), 1))
    }
    pts.toDF("features", "label")
  }

  def blobs(perBlob: Int = 40, seed: Int = 7): DataFrame = {
    val rnd = new java.util.Random(seed)
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 8.0))
    val pts = for {
      ((cx, cy), label) <- centers.zipWithIndex
      _ <- 1 to perBlob
    } yield (Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5), label)
    pts.toDF("features", "label")
  }

  def purity(pred: DataFrame): Double = {
    val rows = pred.groupBy("prediction", "label").count().collect()
    rows.groupBy(_.getInt(0)).values.map(_.map(_.getLong(2)).max).sum.toDouble /
      rows.map(_.getLong(2)).sum
  }

  test("single linkage follows chains that compact linkages would cut") {
    val df = chains().cache()
    val single = new AgglomerativeBregman().setNumClusters(2).setLinkage("single").fit(df)
    assert(purity(single.transform(df)) == 1.0, "single linkage must recover both chains exactly")
    df.unpersist()
  }

  test("complete and ward linkages recover compact blobs") {
    val df = blobs().cache()
    for (l <- Seq("complete", "ward", "average")) {
      val m = new AgglomerativeBregman().setNumClusters(3).setLinkage(l).fit(df)
      val p = purity(m.transform(df))
      assert(p >= 0.95, s"linkage=$l purity $p")
    }
    df.unpersist()
  }

  test("dendrogram: n-k merges, sizes accumulate, single-linkage distances monotone") {
    val df = blobs(perBlob = 20)
    val m = new AgglomerativeBregman().setNumClusters(3).setLinkage("single").fit(df)
    assert(m.dendrogram.length == 60 - 3)
    assert(m.dendrogram.last.size <= 60)
    val dists = m.mergeDistances
    assert(dists.sliding(2).forall(p => p.last >= p.head - 1e-12),
      "single-linkage merge distances must be non-decreasing")
    // training assignments cover exactly 3 clusters
    assert(m.trainingAssignments.distinct.length == 3)
  }

  test("distanceThreshold stops merging early (more clusters survive)") {
    val df = blobs()
    // tiny threshold: only near-identical points merge -> many clusters
    val m = new AgglomerativeBregman().setNumClusters(1).setDistanceThreshold(0.05)
      .setLinkage("single").fit(df)
    assert(m.numClusters > 3, s"expected many clusters, got ${m.numClusters}")
    // no merge in the history exceeded the threshold
    assert(m.mergeDistances.forall(_ <= 0.05))
  }

  test("refuses inputs above maxDriverPoints") {
    val df = blobs(perBlob = 40)
    val e = intercept[IllegalArgumentException] {
      new AgglomerativeBregman().setNumClusters(2).setMaxDriverPoints(10).fit(df)
    }
    assert(e.getMessage.contains("O(n^2)"))
  }

  test("kl divergence agglomeration on positive data symmetrizes cleanly") {
    val rnd = new java.util.Random(3)
    val pts = (1 to 30).map(_ => Seq(1.0 + rnd.nextDouble() * 0.1, 2.0 + rnd.nextDouble() * 0.1)) ++
      (1 to 30).map(_ => Seq(8.0 + rnd.nextDouble() * 0.1, 0.5 + rnd.nextDouble() * 0.1))
    val df = pts.toDF("features")
    val m = new AgglomerativeBregman().setNumClusters(2).setDivergence("kl")
      .setLinkage("average").fit(df)
    assert(m.numClusters == 2)
    val sizes = m.trainingAssignments.groupBy(identity).values.map(_.length).toSeq.sorted
    assert(sizes == Seq(30, 30), s"sizes $sizes")
  }
}
