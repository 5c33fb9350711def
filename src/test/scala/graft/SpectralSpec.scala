package graft

import graft.clustering._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SpectralClustering + SpectralGraph: ring recovery (the canonical
  * "k-means cannot, spectral can" case), Laplacian/affinity modes,
  * Nystrom agreement, out-of-sample transform.
  */
class SpectralSpec extends SparkSpec {

  import spark.implicits._

  /** Two concentric rings: labels 0 (r=1) and 1 (r=4). */
  def rings(perRing: Int = 100, seed: Int = 11): DataFrame = {
    val rnd = new java.util.Random(seed)
    val pts = for {
      (r, label) <- Seq((1.0, 0), (4.0, 1))
      i <- 1 to perRing
    } yield {
      val theta = 2 * math.Pi * i / perRing
      (Seq(r * math.cos(theta) + rnd.nextGaussian() * 0.05,
        r * math.sin(theta) + rnd.nextGaussian() * 0.05), label)
    }
    pts.toDF("features", "label")
  }

  /** Four well-separated Gaussian blobs, labeled. */
  def blobs(perBlob: Int = 100, seed: Int = 7): DataFrame = {
    val rnd = new java.util.Random(seed)
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 8.0), (20.0, -15.0))
    val pts = for {
      ((cx, cy), label) <- centers.zipWithIndex
      _ <- 1 to perBlob
    } yield (Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5), label)
    pts.toDF("features", "label")
  }

  /** Majority-label purity of predictions vs the label column. */
  def purity(pred: DataFrame): Double = {
    val rows = pred.groupBy("prediction", "label").count().collect()
    val byCluster = rows.groupBy(_.getInt(0))
    val correct = byCluster.values.map(_.map(_.getLong(2)).max).sum
    correct.toDouble / rows.map(_.getLong(2)).sum
  }

  test("spectral separates concentric rings that plain k-means cannot") {
    val df = rings().cache()
    val spec = new SpectralClustering().setK(2).setKernelType("rbf").setGamma(2.0)
      .setLaplacianType("symmetric").setSeed(42).setMaxIter(20).fit(df)
    val specPurity = purity(spec.transform(df))
    val plain = new GeneralizedKMeans().setK(2).setSeed(42).setMaxIter(20).fit(df)
    val plainPurity = purity(plain.transform(df))
    assert(specPurity >= 0.95, s"spectral purity $specPurity")
    assert(plainPurity <= 0.8, s"plain k-means should fail on rings, purity $plainPurity")
    df.unpersist()
  }

  test("all three Laplacians recover well-separated blobs") {
    val df = blobs().cache()
    for (lt <- Seq("symmetric", "unnormalized", "randomWalk")) {
      val m = new SpectralClustering().setK(4).setKernelType("rbf").setGamma(0.5)
        .setLaplacianType(lt).setSeed(42).setMaxIter(20).fit(df)
      val p = purity(m.transform(df))
      assert(p >= 0.9, s"laplacian=$lt purity $p")
    }
    df.unpersist()
  }

  test("knn and epsilon affinities separate the rings") {
    val df = rings().cache()
    val knn = new SpectralClustering().setK(2).setKernelType("rbf").setGamma(2.0)
      .setAffinityType("knn").setNumNeighbors(8).setSeed(42).fit(df)
    assert(purity(knn.transform(df)) >= 0.95)
    val eps = new SpectralClustering().setK(2).setKernelType("rbf").setGamma(2.0)
      .setAffinityType("epsilon").setEpsilon(1.0).setSeed(42).fit(df)
    assert(purity(eps.transform(df)) >= 0.95)
    df.unpersist()
  }

  test("nystrom path agrees with blob structure without any full collect") {
    val df = blobs(perBlob = 150).cache()
    val m = new SpectralClustering().setK(4).setKernelType("rbf").setGamma(0.5)
      .setUseNystrom(true).setNumLandmarks(64).setSeed(42).setMaxIter(15).fit(df)
    assert(m.isInstanceOf[NystromSpectralModel])
    val p = purity(m.transform(df))
    assert(p >= 0.9, s"nystrom purity $p")
    df.unpersist()
  }

  test("nystrom auto-engages above maxDriverPoints and transforms out-of-sample rows") {
    val df = blobs(perBlob = 100).cache()
    val m = new SpectralClustering().setK(4).setKernelType("rbf").setGamma(0.5)
      .setMaxDriverPoints(50) // force the nystrom branch
      .setNumLandmarks(64).setSeed(42).setMaxIter(15).fit(df)
    assert(m.isInstanceOf[NystromSpectralModel])
    // held-out points drawn near each blob center must land with their blob
    val holdout = blobs(perBlob = 20, seed = 99).cache()
    val p = purity(m.transform(holdout))
    assert(p >= 0.9, s"out-of-sample purity $p")
    df.unpersist(); holdout.unpersist()
  }

  test("exact model maps out-of-sample rows through nearest training embedding") {
    val df = blobs(perBlob = 60).cache()
    val m = new SpectralClustering().setK(4).setKernelType("rbf").setGamma(0.5)
      .setSeed(42).fit(df)
    assert(m.isInstanceOf[ExactSpectralModel])
    val holdout = blobs(perBlob = 15, seed = 123)
    assert(purity(m.transform(holdout)) >= 0.9)
    df.unpersist()
  }

  test("SpectralGraph: laplacian structure sanity (rows sum to ~0 for unnormalized)") {
    val pts = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(5.0, 5.0))
    val w = SpectralGraph.buildAffinity(pts, graft.kernels.RBFKernel(1.0), "full")
    assert(w(0)(0) == 0.0 && math.abs(w(0)(1) - math.exp(-1.0)) < 1e-12)
    val l = SpectralGraph.laplacian(w, "unnormalized")
    (0 until 4).foreach { i =>
      assert(math.abs(l(i).sum) < 1e-9, s"row $i of D-W must sum to 0")
    }
    val lsym = SpectralGraph.laplacian(w, "symmetric")
    (0 until 4).foreach(i => assert(math.abs(lsym(i)(i) - 1.0) < 1e-9))
  }
}
