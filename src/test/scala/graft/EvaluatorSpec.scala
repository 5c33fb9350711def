package graft

import graft.clustering.{BregmanClusteringEvaluator, GeneralizedKMeans}
import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit}
import org.apache.spark.sql.functions._

/** BregmanClusteringEvaluator: metric correctness against the model's own
  * training objective, and end-to-end model selection through Spark ML
  * tuning (the integration the evaluator exists for).
  */
class EvaluatorSpec extends SparkSpec {

  private def blobs(k: Int, n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val centers = Array.fill(k)(Array.fill(4)(rnd.nextGaussian() * 8))
    (0 until n).map { i =>
      val c = centers(i % k)
      c.map(_ + rnd.nextGaussian() * 0.4).toSeq
    }.toDF("features")
  }

  test("negDistortion matches the fitted model's computeCost (SE)") {
    val df = blobs(4, 400, 1).cache()
    val m = new GeneralizedKMeans().setK(4).setFeaturesCol("features")
      .setSeed(42).setMaxIter(10).fit(df)
    val scored = m.transform(df)
    val eval = new BregmanClusteringEvaluator()
      .setMetricName("negDistortion").setFeaturesCol("features")
    val got = eval.evaluate(scored)
    val want = -m.computeCost(df)
    // evaluator reconstructs centers from assignments; at a Lloyd fixed
    // point the gradient-mean of the final assignment IS the center set,
    // so the two agree tightly
    assert(math.abs(got - want) < 1e-6 * (1 + math.abs(want)),
      s"evaluator $got vs model ${want}")
    df.unpersist()
  }

  test("better k scores better on well-separated blobs") {
    val df = blobs(5, 500, 2).cache()
    val eval = new BregmanClusteringEvaluator()
      .setMetricName("negDistortion").setFeaturesCol("features")
    def score(k: Int): Double = {
      val m = new GeneralizedKMeans().setK(k).setFeaturesCol("features")
        .setSeed(42).setMaxIter(10).fit(df)
      eval.evaluate(m.transform(df))
    }
    assert(score(5) > score(2), "true k must beat under-clustering")
    df.unpersist()
  }

  test("silhouette metric is high on separated blobs, low on one smeared blob") {
    import spark.implicits._
    val good = blobs(3, 300, 3)
    val m = new GeneralizedKMeans().setK(3).setFeaturesCol("features")
      .setSeed(42).setMaxIter(10).fit(good)
    val eval = new BregmanClusteringEvaluator()
      .setMetricName("silhouette").setFeaturesCol("features")
    val sGood = eval.evaluate(m.transform(good))
    assert(sGood > 0.6, s"separated blobs silhouette $sGood")
    val rnd = new java.util.Random(4)
    val smear = Seq.fill(300)(Seq.fill(4)(rnd.nextGaussian())).toDF("features")
    val m2 = new GeneralizedKMeans().setK(3).setFeaturesCol("features")
      .setSeed(42).setMaxIter(10).fit(smear)
    val sBad = eval.evaluate(m2.transform(smear))
    assert(sGood > sBad, s"separated $sGood should beat smeared $sBad")
  }

  test("TrainValidationSplit selects the true k through the evaluator") {
    val df = blobs(4, 600, 5).cache()
    val est = new GeneralizedKMeans().setFeaturesCol("features")
      .setSeed(42).setMaxIter(10)
    val grid = new ParamGridBuilder().addGrid(est.k, Array(2, 4)).build()
    val tvs = new TrainValidationSplit()
      .setEstimator(est)
      .setEvaluator(new BregmanClusteringEvaluator()
        .setMetricName("silhouette").setFeaturesCol("features"))
      .setEstimatorParamMaps(grid)
      .setTrainRatio(0.75).setSeed(7)
    val model = tvs.fit(df)
    val bestK = model.bestModel.asInstanceOf[graft.clustering.GeneralizedKMeansModel]
      .clusterCenters.length
    assert(bestK == 4, s"expected k=4 selected, got $bestK")
    df.unpersist()
  }
}
