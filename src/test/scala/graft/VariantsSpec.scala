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

  test("MiniBatchKMeans.step reassigns a dying center to the batch's " +
      "highest-cost point; ratio 0 disables the rule") {
    import spark.implicits._
    // 2-d fixture with distinct assignment costs: center 1 is far off
    // ([1000, 1000]) so it attracts nothing and its 0 count dies at any
    // ratio > 0; the point farthest from center 0 must claim it
    val batch = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(9.0, 9.0)))
      .toDF("id", "f")
    val centers = Array(Array(0.5, 0.0), Array(1000.0, 1000.0))
    val counts = Array(10.0, 0.0)
    val (cs, cn) = MiniBatchKMeans.step(batch, "f", "id", centers, counts,
      "squaredEuclidean", 1e-10, reassignmentRatio = 0.01)
    // inputs untouched
    assert(centers(1).toSeq == Seq(1000.0, 1000.0) && counts(1) == 0.0)
    // center 0: closed-form merge of its 3 assigned points at prior 10
    assert(math.abs(cs(0)(0) - (10.0 * 0.5 + 10.0) / 13.0) < 1e-12)
    assert(math.abs(cs(0)(1) - 9.0 / 13.0) < 1e-12)
    assert(cn(0) == 13.0)
    // center 1: moved to (9, 9) — the max-cost point — count reset to 1
    assert(cs(1).toSeq == Seq(9.0, 9.0), s"got ${cs(1).toSeq}")
    assert(cn(1) == 1.0)
    // ratio 0: the dying center is left alone
    val (cs0, cn0) = MiniBatchKMeans.step(batch, "f", "id", centers, counts,
      "squaredEuclidean", 1e-10, reassignmentRatio = 0.0)
    assert(cs0(1).toSeq == Seq(1000.0, 1000.0) && cn0(1) == 0.0)
    // stepDf round-trip (the py4j bridge) agrees with step
    val state = Seq((0L, Seq(0.5, 0.0), 10.0), (1L, Seq(1000.0, 1000.0), 0.0))
      .toDF("cluster", "cv", "cnt")
    val out = MiniBatchKMeans.stepDf(batch, "f", "id", state,
      "squaredEuclidean", 1e-10, 0.01)
      .orderBy("cluster").collect()
    assert(out(1).getSeq[Double](1) == Seq(9.0, 9.0) && out(1).getDouble(2) == 1.0)
  }

  test("MiniBatchKMeans fit rescues a dead initial center via " +
      "reassignmentRatio (and leaves it dead at 0)") {
    val df = blobs(perBlob = 50)
    val init = Array(Array(0.0, 0.0), Array(10.0, 10.0), Array(-10.0, 8.0),
      Array(1000.0, 1000.0))
    def fitWith(ratio: Double) = new MiniBatchKMeans().setK(4).setSeed(3)
      .setMaxIter(8).setBatchSize(100).setInitialCenters(init)
      .setReassignmentRatio(ratio).fit(df)
    // ratio 0: nothing is ever assigned to the far center, so the Sculley
    // running mean never moves it
    val dead = fitWith(0.0).clusterCenters
    assert(dead.exists(c => c(0) == 1000.0 && c(1) == 1000.0))
    // default-style ratio: the dying center is reassigned into the data
    // and ends up inside the blob bounding box
    val aliveModel = fitWith(0.01)
    val alive = aliveModel.clusterCenters
    assert(alive.forall(c => math.abs(c(0)) < 100 && math.abs(c(1)) < 100),
      s"far center not rescued: ${alive.map(_.toSeq).toSeq}")
    // telemetry: the summary counts the reassignment events; the rule-off
    // fit reports None (rule never evaluated)
    assert(aliveModel.summary.reassignments.exists(_ >= 1L),
      s"reassignments not counted: ${aliveModel.summary.reassignments}")
    assert(fitWith(0.0).summary.reassignments.isEmpty)
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
