package graft

import graft.clustering.BregmanMixture
import org.apache.spark.sql.functions._

/** BregmanMixture EM: log-likelihood monotonicity (the EM guarantee),
  * blob recovery, responsibility normalization, component weights.
  */
class MixtureSpec extends SparkSpec {

  private def blobs(perBlob: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val centers = Seq((0.0, 0.0), (8.0, 0.0), (0.0, 8.0))
    val pts = for {
      (cx, cy) <- centers
      _ <- 1 to perBlob
    } yield Seq(cx + rnd.nextGaussian() * 0.6, cy + rnd.nextGaussian() * 0.6)
    pts.toDF("features")
  }

  test("log-likelihood is monotonically non-decreasing (EM guarantee)") {
    val df = blobs(80, 3).cache()
    val m = new BregmanMixture().setK(3).setSeed(5).setMaxIter(12).setTol(0.0).fit(df)
    val ll = m.logLikelihoodHistory
    assert(ll.size >= 3)
    ll.zip(ll.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-6 * math.abs(a), s"LL decreased: $a -> $b (history $ll)")
    }
    df.unpersist()
  }

  test("recovers 3 blobs; MAP predictions pure; probabilities sum to 1") {
    val df = blobs(80, 3).cache()
    val m = new BregmanMixture().setK(3).setSeed(5).setMaxIter(15).fit(df)
    assert(m.numComponents == 3)
    val out = m.transform(df)
    val sizes = out.groupBy("prediction").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(80L, 80L, 80L), s"sizes ${sizes.toSeq}")
    val sums = out.select(aggregate(col("probability"), lit(0.0), (a, v) => a + v).as("s"))
      .agg(min("s"), max("s")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9 && math.abs(sums.getDouble(1) - 1.0) < 1e-9)
    // component weights are a distribution near (1/3, 1/3, 1/3)
    assert(math.abs(m.componentWeights.sum - 1.0) < 1e-9)
    m.componentWeights.foreach(w => assert(math.abs(w - 1.0 / 3) < 0.05, s"pi=$w"))
    df.unpersist()
  }

  test("seed determinism") {
    val df = blobs(50, 7)
    def fit() = new BregmanMixture().setK(3).setSeed(9).setMaxIter(8).fit(df)
    val (a, b) = (fit(), fit())
    a.componentCenters.zip(b.componentCenters).foreach { case (x, y) =>
      assert(x.toSeq == y.toSeq)
    }
    assert(a.componentWeights.toSeq == b.componentWeights.toSeq)
  }

  test("KL mixture on simplex data stays in domain") {
    import spark.implicits._
    val rnd = new java.util.Random(21)
    def simplex(base: Array[Double]) = {
      val v = base.map(b => math.max(0.01, b + rnd.nextGaussian() * 0.05))
      val s = v.sum
      v.map(_ / s).toSeq
    }
    val df = ((1 to 60).map(_ => simplex(Array(0.9, 0.05, 0.05))) ++
      (1 to 60).map(_ => simplex(Array(0.05, 0.05, 0.9)))).toDF("features")
    val m = new BregmanMixture().setK(2).setDivergence("kl").setSeed(3).setMaxIter(10).fit(df)
    assert(m.numComponents == 2)
    m.componentCenters.foreach(c => c.foreach(v => assert(v >= 0 && !v.isNaN)))
    val sizes = m.transform(df).groupBy("prediction").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(60L, 60L))
  }
}
