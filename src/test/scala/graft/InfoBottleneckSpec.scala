package graft

import graft.clustering._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class InfoBottleneckSpec extends SparkSpec {

  import spark.implicits._

  /** 6 discrete x-states; states 0..2 emit y=1 w.p. 0.9, states 3..5 emit
    * y=1 w.p. 0.1. The optimal 2-state compression groups {0,1,2} vs
    * {3,4,5}.
    */
  def xyData(perState: Int = 200, seed: Int = 9): DataFrame = {
    val rnd = new java.util.Random(seed)
    val rows = for {
      x <- 0 until 6
      _ <- 1 to perState
    } yield {
      val p1 = if (x < 3) 0.9 else 0.1
      (x, if (rnd.nextDouble() < p1) 1 else 0)
    }
    rows.toDF("x", "y")
  }

  test("IB groups x-states by their relevance profile") {
    val df = xyData().cache()
    val m = new InformationBottleneck().setK(2).setBeta(10.0)
      .setFeaturesCol("x").setRelevanceCol("y").setMaxIter(200).setSeed(42).fit(df)
    val pred = m.transform(df).select("x", "prediction").distinct().collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(pred.size == 6)
    // states 0,1,2 share one cluster; 3,4,5 the other
    assert(pred(0) == pred(1) && pred(1) == pred(2), s"low states split: $pred")
    assert(pred(3) == pred(4) && pred(4) == pred(5), s"high states split: $pred")
    assert(pred(0) != pred(3), s"groups merged: $pred")
    df.unpersist()
  }

  test("information plane: I(T;Y) <= I(X;Y) and grows with beta") {
    val df = xyData().cache()
    val ixy = graft.ops.MutualInformation.mutualInformation(
      df.select(col("x").cast("string").as("x"), col("y").cast("string").as("y")), "x", "y")
    val low = new InformationBottleneck().setK(2).setBeta(0.1)
      .setFeaturesCol("x").setRelevanceCol("y").setMaxIter(200).setSeed(42).fit(df)
    val high = new InformationBottleneck().setK(2).setBeta(20.0)
      .setFeaturesCol("x").setRelevanceCol("y").setMaxIter(200).setSeed(42).fit(df)
    assert(high.getRelevanceInfo <= ixy + 1e-6,
      s"I(T;Y)=${high.getRelevanceInfo} must not exceed I(X;Y)=$ixy")
    assert(high.getRelevanceInfo >= low.getRelevanceInfo - 1e-9,
      s"beta=20 I(T;Y)=${high.getRelevanceInfo} < beta=0.1 I(T;Y)=${low.getRelevanceInfo}")
    // strong-beta solution should capture most of the available information
    assert(high.getRelevanceInfo >= 0.8 * ixy,
      s"I(T;Y)=${high.getRelevanceInfo} vs I(X;Y)=$ixy")
    df.unpersist()
  }

  test("deterministic under a fixed seed") {
    val df = xyData()
    def fitOnce() = new InformationBottleneck().setK(3).setBeta(5.0)
      .setFeaturesCol("x").setRelevanceCol("y").setMaxIter(100).setSeed(7).fit(df)
    val a = fitOnce(); val b = fitOnce()
    assert(a.getRelevanceInfo == b.getRelevanceInfo)
    assert(a.pTgivenX.flatten.toSeq == b.pTgivenX.flatten.toSeq)
  }

  test("continuous features hash-bin through a Catalyst expression") {
    val rnd = new java.util.Random(3)
    val rows = (1 to 300).map { _ =>
      val c = rnd.nextInt(2)
      (Seq(c * 5.0 + rnd.nextGaussian() * 0.01), c)
    }
    val df = rows.toDF("features", "label")
    val m = new InformationBottleneck().setK(2).setBeta(10.0)
      .setFeaturesCol("features").setRelevanceCol("label")
      .setNumBins(20).setMaxIter(100).setSeed(42).fit(df)
    val out = m.transform(df)
    assert(out.columns.contains("prediction") && out.columns.contains("probability"))
    assert(!m.getRelevanceInfo.isNaN && m.getRelevanceInfo >= 0)
  }
}
