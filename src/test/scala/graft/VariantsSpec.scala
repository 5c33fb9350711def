package graft

import graft.clustering._
import org.apache.spark.sql.functions._

/** Wave-1 estimator variants, mirroring the reference's per-algorithm
  * suites (blob recovery, determinism, parameter behavior).
  */
class VariantsSpec extends SparkSpec {

  def blobs(perBlob: Int = 50, seed: Int = 7) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 8.0), (20.0, -15.0))
    val pts = for {
      (cx, cy) <- centers
      _ <- 1 to perBlob
    } yield Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5)
    pts.toDF("features")
  }

  test("BisectingKMeans recovers 4 blobs with balanced sizes") {
    val m = new BisectingKMeans().setK(4).setSeed(1).setMaxIter(10).fit(blobs())
    assert(m.numClusters == 4)
    val sizes = m.transform(blobs()).groupBy("prediction").count()
      .collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(50L, 50L, 50L, 50L), s"got ${sizes.toSeq}")
    assert(m.summary.algorithm == "BisectingKMeans")
    assert(m.summary.iterations == 3) // k-1 splits
  }

  test("BisectingKMeans respects minDivisibleClusterSize") {
    // with minDivisible > n no split can happen -> 1 cluster
    val m = new BisectingKMeans().setK(4).setSeed(1).setMaxIter(5)
      .setMinDivisibleClusterSize(10000).fit(blobs())
    assert(m.numClusters == 1)
  }

  test("BisectingKMeans is deterministic under a fixed seed") {
    def fit() = new BisectingKMeans().setK(4).setSeed(33).setMaxIter(10).fit(blobs())
    val (a, b) = (fit(), fit())
    a.clusterCenters.zip(b.clusterCenters).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
  }

  test("XMeans never picks fewer clusters than the separated structure") {
    // With variance re-estimated per k, the Gaussian-BIC of the reference
    // keeps improving slowly past the true k on dense blobs; the hard
    // guarantee is it must NOT merge well-separated blobs.
    val m = new XMeans().setMinK(2).setMaxK(7).setSeed(5).setMaxIter(10).fit(blobs())
    assert(m.numClusters >= 4, s"picked ${m.numClusters}")
  }

  test("XMeans BIC score formula (hand-check) and aic option") {
    val x = new XMeans().setCriterion("bic")
    // cost=100, k=2, n=100, d=2: variance=1, sigma=1, ll = -50 - 0 - 100*log(2pi)/2
    val ll = -50.0 - 100.0 * math.log(2 * math.Pi) / 2
    val bic = -2 * ll + 5 * math.log(100.0)
    assert(math.abs(x.score(100.0, 2, 100L, 2) - bic) < 1e-9)
    val a = new XMeans().setCriterion("aic")
    val aic = -2 * ll + 2 * 5
    assert(math.abs(a.score(100.0, 2, 100L, 2) - aic) < 1e-9)
  }

  test("SoftKMeans: probabilities sum to 1, soft cost decreases, hard predictions recover blobs") {
    val df = blobs()
    val m = new SoftKMeans().setK(4).setBeta(5.0).setSeed(2).setMaxIter(15).fit(df)
    val out = m.transform(df)
    val sums = out.select(aggregate(col("probability"), lit(0.0), (a, v) => a + v).as("s"))
      .agg(min("s"), max("s")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9 && math.abs(sums.getDouble(1) - 1.0) < 1e-9)
    val d = m.summary.distortionHistory
    assert(d.length >= 2 && d.last <= d.head * 1.0001, s"soft cost should decrease: $d")
    val sizes = out.groupBy("prediction").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(50L, 50L, 50L, 50L), s"got ${sizes.toSeq}")
  }

  test("SoftKMeans honors minMembership floor") {
    val df = blobs()
    val m = new SoftKMeans().setK(4).setBeta(5.0).setSeed(2).setMaxIter(5)
      .setMinMembership(0.05).fit(df)
    val minP = m.transform(df)
      .select(array_min(col("probability")).as("p")).agg(min("p")).head().getDouble(0)
    assert(minP >= 0.04, s"floor not applied: $minP") // 0.05 pre-renormalization
  }

  test("MiniBatchKMeans converges to blob centers without collecting batches") {
    val df = blobs(perBlob = 100)
    val m = new MiniBatchKMeans().setK(4).setSeed(9).setMaxIter(30)
      .setBatchSize(100).fit(df)
    assert(m.numClusters == 4)
    val trueCs = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 8.0), (20.0, -15.0))
    // every true center has a learned center within 1.5
    trueCs.foreach { case (tx, ty) =>
      assert(m.clusterCenters.exists(c =>
        math.sqrt((c(0) - tx) * (c(0) - tx) + (c(1) - ty) * (c(1) - ty)) < 1.5))
    }
    assert(m.summary.algorithm == "MiniBatchKMeans")
  }

  test("DPMeans discovers cluster count from lambda") {
    val df = blobs()
    // blobs are ~14-36 apart; SE divergence = 0.5*d^2, so lambda=20 (~6.3
    // euclidean) separates blobs while lambda=1e6 lumps everything
    val m = new DPMeans().setLambda(20.0).setSeed(3).setMaxIter(20).fit(df)
    assert(m.numClusters == 4, s"expected 4 clusters, got ${m.numClusters}")
    val sizes = m.transform(df).groupBy("prediction").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(50L, 50L, 50L, 50L))
    val one = new DPMeans().setLambda(1e6).setSeed(3).setMaxIter(10).fit(df)
    assert(one.numClusters == 1)
  }

  test("DPMeans respects maxK cap") {
    val m = new DPMeans().setLambda(0.01).setMaxK(3).setSeed(3).setMaxIter(10).fit(blobs())
    assert(m.numClusters == 3)
  }
}
