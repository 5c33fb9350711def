package graft

import graft.clustering._
import graft.kernels._
import org.apache.spark.sql.functions._

/** Center-update machinery: typed aggregator (constant-size plan at any
  * dimension), exact weighted median, empty-cluster reseed.
  */
class LloydsUpdateSpec extends SparkSpec {

  test("CentroidAggregator gradMean equals hand-computed weighted mean + distortion") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), 1.0, 0, 0.5),
      (Seq(3.0, 4.0), 3.0, 0, 1.0),
      (Seq(10.0, 0.0), 2.0, 1, 2.0)
    ).toDF("features", "w", "cluster", "dist")
    val res = Update.gradMean(df, "features", col("w"), new SquaredEuclideanKernel, 2)
    // cluster 0: mean = (1*1+3*3, 2*1+4*3)/(1+3) = (10/4, 14/4)
    assert(res.centers(0).toSeq == Seq(2.5, 3.5))
    assert(res.centers(1).toSeq == Seq(10.0, 0.0))
    // distortion = sum dist*w = 0.5*1 + 1*3 + 2*2 = 7.5
    assert(math.abs(res.distortion - 7.5) < 1e-12)
    assert(res.weights(0) == 4.0 && res.weights(1) == 2.0)
  }

  test("fit at d=1024 works (constant-size aggregation plan)") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val base = Array.fill(2)(Array.fill(1024)(rnd.nextGaussian() * 5))
    val pts = for {
      b <- base.toSeq
      _ <- 1 to 40
    } yield b.map(v => v + rnd.nextGaussian() * 0.1).toSeq
    val df = pts.toDF("features")
    val m = new GeneralizedKMeans().setK(2).setSeed(3).setMaxIter(5).fit(df)
    assert(m.numFeatures == 1024)
    val sizes = m.transform(df).groupBy("prediction").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(40L, 40L))
  }

  test("weighted median update matches hand-computed cumulative-weight medians") {
    import spark.implicits._
    // cluster 0, dim 0: values 1(w=1), 2(w=1), 100(w=5) -> total 7, half 3.5,
    // cum: 1->1, 2->2, 100->7 => median 100.
    // dim 1: values 5(w=1), 6(w=1), 7(w=5) -> median 7
    val df = Seq(
      (Seq(1.0, 5.0), 1.0, 0, 1.0),
      (Seq(2.0, 6.0), 1.0, 0, 1.0),
      (Seq(100.0, 7.0), 5.0, 0, 1.0)
    ).toDF("features", "w", "cluster", "dist")
    val res = Update.median(df, "features", col("w"), 2)
    assert(res.centers(0).toSeq == Seq(100.0, 7.0))
    // unweighted: 3 equal weights -> cum half = 1.5 -> second value
    val dfU = df.withColumn("w", lit(1.0))
    val resU = Update.median(dfU, "features", col("w"), 2)
    assert(resU.centers(0).toSeq == Seq(2.0, 6.0))
  }

  test("L1 k-medians end-to-end: centers are per-dimension medians, robust to outlier") {
    import spark.implicits._
    // blob A (19 tight points) + an outlier that still belongs to A, plus a
    // far blob B: A's mean would be dragged ~1 unit by the outlier; the
    // median stays on the blob.
    val pts = (1 to 19).map(i => Seq(10.0 + (i % 3) * 0.01, -5.0)) ++
      Seq(Seq(30.0, -5.0)) ++ (1 to 20).map(_ => Seq(1000.0, 1000.0))
    val df = pts.toDF("features")
    val m = new GeneralizedKMeans().setK(2).setDivergence("l1").setSeed(1).setMaxIter(10).fit(df)
    val cA = m.clusterCenters.minBy(_.head)
    assert(math.abs(cA(0) - 10.01) < 0.02, s"median center expected ~10.01, got ${cA(0)}")
    assert(cA(1) == -5.0)
  }

  test("empty-cluster reseed: k greater than distinct points still yields k centers") {
    import spark.implicits._
    val df = Seq(Seq(0.0, 0.0), Seq(0.0, 0.0), Seq(1.0, 1.0)).toDF("features")
    val m = new GeneralizedKMeans().setK(3).setSeed(1).setMaxIter(5)
      .setEmptyClusterStrategy("reseedRandom").fit(df)
    assert(m.numClusters == 3)
    // drop strategy shrinks instead
    val m2 = new GeneralizedKMeans().setK(3).setSeed(1).setMaxIter(5)
      .setEmptyClusterStrategy("drop").fit(df)
    assert(m2.numClusters <= 3)
  }
}
