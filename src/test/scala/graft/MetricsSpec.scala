package graft

import graft.clustering.{ClusteringMetrics, GeneralizedKMeans}
import graft.kernels.SquaredEuclideanKernel

/** Hand-computed checks for the evaluation-metrics layer (formulas match
  * the reference: ml/GeneralizedKMeansModel.scala:493-728).
  */
class MetricsSpec extends SparkSpec {

  // points (0,0),(0,2),(10,0),(10,2); centers (0,1),(10,1); SE kernel
  // (with the 1/2 factor):
  //   per-point dist to own center = 0.5      -> WCSS = 2
  //   sizes (2,2); overall centroid (5,1)     -> BCSS = 2*12.5 + 2*12.5 = 50
  //   CH = (50/(2-1)) / (2/(4-2)) = 50
  //   center-pair divergence = 0.5*100 = 50   -> DB = (1/2)*2*(0.5+0.5)/50 = 0.02
  //   Dunn = 50 / max-point-dist 0.5 = 100
  private def fixture = {
    import spark.implicits._
    val df = Seq(
      Seq(0.0, 0.0), Seq(0.0, 2.0), Seq(10.0, 0.0), Seq(10.0, 2.0)
    ).toDF("f")
    val centers = Array(Array(0.0, 1.0), Array(10.0, 1.0))
    (df, centers)
  }

  test("metrics match hand-computed WCSS/BCSS/CH/DB/Dunn") {
    val (df, centers) = fixture
    val m = ClusteringMetrics.compute(df, "f", new SquaredEuclideanKernel, centers)
    assert(m.clusterSizes.toSeq == Seq(2L, 2L))
    assert(math.abs(m.wcss - 2.0) < 1e-9)
    assert(math.abs(m.bcss - 50.0) < 1e-9)
    assert(math.abs(m.calinskiHarabasz - 50.0) < 1e-9)
    assert(math.abs(m.daviesBouldin - 0.02) < 1e-9)
    assert(math.abs(m.dunn - 100.0) < 1e-9)
    assert(math.abs(m.balanceRatio - 1.0) < 1e-9)
  }

  test("silhouette (center-proxy) matches hand computation") {
    val (df, centers) = fixture
    // every point: a = 0.5, b = 0.5*(100+1) = 50.5 -> s = 50/50.5
    val s = ClusteringMetrics.silhouette(df, "f", new SquaredEuclideanKernel,
      centers, sampleFraction = 1.0)
    assert(math.abs(s - 50.0 / 50.5) < 1e-9)
  }

  test("model.metrics + silhouette on separated blobs are sane") {
    import spark.implicits._
    val rnd = new java.util.Random(4)
    val pts = for {
      (cx, cy) <- Seq((0.0, 0.0), (20.0, 0.0), (0.0, 20.0))
      _ <- 1 to 60
    } yield Seq(cx + rnd.nextGaussian() * 0.3, cy + rnd.nextGaussian() * 0.3)
    val df = pts.toDF("features")
    val model = new GeneralizedKMeans().setK(3).setSeed(7).setMaxIter(10).fit(df)
    val m = model.metrics(df)
    assert(m.clusterSizes.sorted.toSeq == Seq(60L, 60L, 60L))
    assert(m.calinskiHarabasz > 1000, s"CH=${m.calinskiHarabasz}")  // tight, separated
    assert(m.daviesBouldin < 0.1, s"DB=${m.daviesBouldin}")
    assert(m.dunn > 10, s"Dunn=${m.dunn}")
    assert(model.silhouette(df, 1.0) > 0.95)
  }

  test("elbowCurve: wcss decreases past the true k structure") {
    import spark.implicits._
    val rnd = new java.util.Random(9)
    val pts = for {
      (cx, cy) <- Seq((0.0, 0.0), (15.0, 0.0), (0.0, 15.0), (15.0, 15.0))
      _ <- 1 to 40
    } yield Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5)
    val df = pts.toDF("features").cache()
    val curve = ClusteringMetrics.elbowCurve(df, minK = 2, maxK = 5, maxIter = 10, seed = 3)
    assert(curve.map(_._1) == Seq(2, 3, 4, 5))
    val w = curve.toMap
    assert(w(4) < w(2), s"wcss(4)=${w(4)} not < wcss(2)=${w(2)}")
    // at the true k the curve has collapsed: marginal gain from k=5 is small
    assert(w(4) < 0.1 * w(2), s"no elbow: ${curve}")
    df.unpersist()
  }
}
