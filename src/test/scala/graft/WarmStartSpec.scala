package graft

import graft.clustering._
import org.apache.spark.sql.functions._

/** Warm-start (explicit initialCenters) across the estimator family:
  * deterministic resume semantics, validation, and agreement between the
  * warm-started paths the fit-oracle harness queries rely on.
  */
class WarmStartSpec extends SparkSpec {

  import spark.implicits._

  // two tight 2-d blobs; initial centers ON the blob means
  private def tiny = Seq(
    Seq(0.0, 0.0), Seq(0.2, 0.0), Seq(0.0, 0.2), Seq(0.2, 0.2),
    Seq(10.0, 10.0), Seq(10.2, 10.0), Seq(10.0, 10.2), Seq(10.2, 10.2)
  ).toDF("f")

  test("warm start converges to the exact blob means in one iteration") {
    val m = new GeneralizedKMeans().setK(2).setFeaturesCol("f").setMaxIter(1)
      .setTol(0.0).setInitialCenters(Array(Array(0.0, 0.0), Array(10.0, 10.0)))
      .fit(tiny)
    val c = m.clusterCenters.sortBy(_.head)
    assert(c(0).zip(Array(0.1, 0.1)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(c(1).zip(Array(10.1, 10.1)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("warm start from a converged model moves nothing") {
    val m1 = new GeneralizedKMeans().setK(2).setFeaturesCol("f").setMaxIter(10)
      .setSeed(1).fit(tiny)
    val m2 = new GeneralizedKMeans().setK(2).setFeaturesCol("f").setMaxIter(1)
      .setTol(0.0).setInitialCenters(m1.clusterCenters).fit(tiny)
    assert(m2.summary.movementHistory.head < 1e-12)
  }

  test("k / dim mismatches are rejected with the typed error") {
    val e1 = intercept[GKMException] {
      new GeneralizedKMeans().setK(3).setFeaturesCol("f")
        .setInitialCenters(Array(Array(0.0, 0.0))).fit(tiny)
    }
    assert(e1.getMessage.contains("initialCenters"))
    val e2 = intercept[GKMException] {
      new GeneralizedKMeans().setK(2).setFeaturesCol("f")
        .setInitialCenters(Array(Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))).fit(tiny)
    }
    assert(e2.getMessage.contains("dim"))
  }

  test("elkan and exact loops agree from the same warm start") {
    val init = Array(Array(0.1, 0.1), Array(9.0, 9.5))
    def fit(strategy: String) =
      new GeneralizedKMeans().setK(2).setFeaturesCol("f").setMaxIter(5)
        .setTol(0.0).setAssignmentStrategy(strategy).setInitialCenters(init)
        .fit(tiny).clusterCenters
    val exact = fit("auto")
    val elkan = fit("elkan")
    exact.zip(elkan).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
  }

  test("SoftKMeans / BregmanMixture / SparseKMeans honor warm starts") {
    val init = Array(Array(0.1, 0.1), Array(10.1, 10.1))
    val soft = new SoftKMeans().setK(2).setFeaturesCol("f").setBeta(5.0)
      .setMaxIter(2).setTol(0.0).setInitialCenters(init).fit(tiny)
    assert(soft.clusterCenters.length == 2)
    // sharp blobs: soft centers stay near the blob means
    assert(soft.clusterCenters.sortBy(_.head).head.head < 1.0)

    val mix = new BregmanMixture().setK(2).setFeaturesCol("f")
      .setMaxIter(2).setTol(0.0).setInitialCenters(init).fit(tiny)
    assert(mix.componentCenters.length == 2)
    assert(math.abs(mix.componentWeights.sum - 1.0) < 1e-9)

    val sp = new SparseKMeans().setK(2).setFeaturesCol("f")
      .setSparseMode("sparse").setMaxIter(2).setTol(0.0)
      .setInitialCenters(init).fit(tiny)
    // sparse path from the same start lands on the same means
    val c = sp.clusterCenters.sortBy(_.head)
    assert(math.abs(c(0)(0) - 0.1) < 1e-9 && math.abs(c(1)(0) - 10.1) < 1e-9)
  }

  test("MiniBatch / Coreset / Robust / Balanced honor warm starts") {
    val init = Array(Array(0.1, 0.1), Array(10.1, 10.1))
    val mb = new MiniBatchKMeans().setK(2).setFeaturesCol("f").setMaxIter(2)
      .setBatchSize(8).setSeed(5).setInitialCenters(init).fit(tiny)
    assert(mb.clusterCenters.length == 2)
    val cs = new CoresetKMeans().setK(2).setFeaturesCol("f").setMaxIter(3)
      .setCoresetSize(8).setSeed(5).setInitialCenters(init).fit(tiny)
    assert(cs.clusterCenters.sortBy(_.head).head.head < 1.0)
    val rb = new RobustKMeans().setK(2).setFeaturesCol("f").setMaxIter(3)
      .setOutlierFraction(0.1).setSeed(5).setInitialCenters(init).fit(tiny)
    assert(rb.clusterCenters.length == 2)
    val bl = new BalancedKMeans().setK(2).setFeaturesCol("f").setMaxIter(3)
      .setSeed(5).setInitialCenters(init).fit(tiny)
    assert(bl.clusterCenters.length == 2)
  }

  test("MultiViewKMeans honors per-view warm starts") {
    val two = tiny.select(col("f").as("v1"), transform(col("f"), x => x * 2).as("v2"))
    val init = Array(
      Array(Array(0.1, 0.1), Array(10.1, 10.1)),
      Array(Array(0.2, 0.2), Array(20.2, 20.2)))
    val m = new MultiViewKMeans()
      .setViews(Seq(ViewSpec("v1", 1.0), ViewSpec("v2", 1.0)))
      .setK(2).setMaxIter(2).setTol(0.0).setInitialCenters(init).fit(two)
    assert(m.numClusters == 2)
    val v2c = m.viewCenters(1).sortBy(_.head)
    assert(math.abs(v2c(0)(0) - 0.2) < 1e-9 && math.abs(v2c(1)(0) - 20.2) < 1e-9)
  }
}
