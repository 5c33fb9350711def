package graft

import graft.clustering._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MultiViewSpec extends SparkSpec {

  import spark.implicits._

  /** 4 latent clusters labeled by (a, b) in {0,1}^2. View 1 sees only `a`
    * (collapses the b split), view 2 sees only `b`. Only the COMBINATION
    * of views distinguishes all four clusters.
    */
  def disagreeingViews(perCluster: Int = 80, seed: Int = 5): DataFrame = {
    val rnd = new java.util.Random(seed)
    val rows = for {
      a <- Seq(0, 1); b <- Seq(0, 1)
      _ <- 1 to perCluster
    } yield (
      Seq(a * 8.0 + rnd.nextGaussian() * 0.4, rnd.nextGaussian() * 0.4),
      Seq(b * 8.0 + rnd.nextGaussian() * 0.4, rnd.nextGaussian() * 0.4),
      a * 2 + b)
    rows.toDF("view1", "view2", "label")
  }

  def purity(pred: DataFrame): Double = {
    val rows = pred.groupBy("prediction", "label").count().collect()
    val byCluster = rows.groupBy(_.getInt(0))
    byCluster.values.map(_.map(_.getLong(2)).max).sum.toDouble / rows.map(_.getLong(2)).sum
  }

  test("combining views recovers clusters no single view can separate") {
    val df = disagreeingViews().cache()
    val mv = new MultiViewKMeans().setK(4).setSeed(42).setMaxIter(20)
      .setViews(Seq(ViewSpec("view1"), ViewSpec("view2")))
      .fit(df)
    val mvPurity = purity(mv.transform(df))
    assert(mvPurity >= 0.9, s"multi-view purity $mvPurity")
    // single view: k=4 on view1 alone cannot beat ~0.5 + slack (two latent
    // clusters are identical in view1)
    val single = new GeneralizedKMeans().setK(4).setFeaturesCol("view1")
      .setSeed(42).setMaxIter(20).fit(df)
    val singlePurity = purity(single.transform(df))
    assert(singlePurity <= 0.75, s"single-view purity should cap at ~0.5, got $singlePurity")
    df.unpersist()
  }

  test("view weights normalize and are exposed on the model") {
    val df = disagreeingViews()
    val m = new MultiViewKMeans().setK(4).setSeed(42).setMaxIter(10)
      .setViews(Seq(ViewSpec("view1", weight = 3.0), ViewSpec("view2", weight = 1.0)))
      .fit(df)
    assert(math.abs(m.viewWeights.sum - 1.0) < 1e-12)
    assert(math.abs(m.viewWeights(0) - 0.75) < 1e-12)
    assert(m.numClusters == 4)
    assert(m.summary.algorithm == "MultiViewKMeans")
  }

  test("max and min combine strategies fit and predict") {
    val df = disagreeingViews()
    for (strat <- Seq("max", "min")) {
      val m = new MultiViewKMeans().setK(4).setSeed(42).setMaxIter(10)
        .setCombineStrategy(strat)
        .setViews(Seq(ViewSpec("view1"), ViewSpec("view2")))
        .fit(df)
      val preds = m.transform(df).select("prediction").distinct().count()
      assert(preds >= 2, s"strategy $strat produced $preds clusters")
    }
  }

  test("per-view divergences: kl view over positive features") {
    val df = disagreeingViews()
      .withColumn("view1", transform(col("view1"), v => abs(v) + lit(0.1)))
    val m = new MultiViewKMeans().setK(4).setSeed(42).setMaxIter(10)
      .setViews(Seq(ViewSpec("view1", divergence = "kl"), ViewSpec("view2")))
      .fit(df)
    // kl view centers must stay in the positive domain
    assert(m.viewCenters(0).flatten.forall(_ > 0.0))
  }
}
