package graft

import graft.clustering.GeneralizedKMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._

/** Differential quality check against Spark MLlib's KMeans: on the same
  * data / k / iteration budget, graft's SE objective must land within a
  * few percent of MLlib's (inits differ, so exact equality is not
  * defined; the ratio bounds real regressions — observed ~1.00).
  */
class MllibParitySpec extends SparkSpec {

  test("SE objective within 5% of MLlib KMeans on the embeddings table") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val withVec = e.select(col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("fv"))
      .cache()

    val mllib = new org.apache.spark.ml.clustering.KMeans()
      .setK(10).setSeed(42).setMaxIter(10).setFeaturesCol("fv")
      .fit(withVec)
    val mllibSse = mllib.summary.trainingCost

    val graftModel = new GeneralizedKMeans()
      .setK(10).setSeed(42).setMaxIter(10).setFeaturesCol("embedding")
      .fit(e)
    // graft SE divergence carries the 1/2 factor -> x2 for SSE
    val graftSse = 2.0 * graftModel.computeCost(e)

    val ratio = graftSse / mllibSse
    assert(ratio < 1.05 && ratio > 0.5,
      f"graft SSE $graftSse%.2f vs MLlib $mllibSse%.2f (ratio $ratio%.4f)")
    withVec.unpersist()
  }

  test("BisectingKMeans SE objective within 15% of MLlib BisectingKMeans") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val withVec = e.select(col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        col("embedding").cast("array<double>")).as("fv"))
      .cache()

    val mllib = new org.apache.spark.ml.clustering.BisectingKMeans()
      .setK(8).setSeed(42).setMaxIter(10).setFeaturesCol("fv")
      .fit(withVec)
    val mllibCost = mllib.computeCost(withVec)

    val graftModel = new graft.clustering.BisectingKMeans()
      .setK(8).setSeed(42).setMaxIter(10).setFeaturesCol("embedding")
      .fit(e)
    val graftSse = 2.0 * graftModel.computeCost(e)

    // split heuristics differ (both are greedy bisecting, neither optimal),
    // so parity is a band, not equality — a real regression (wrong
    // distance, wrong update, leaked points) lands far outside 15%
    val ratio = graftSse / mllibCost
    assert(ratio < 1.15 && ratio > 0.5,
      f"graft bisecting SSE $graftSse%.2f vs MLlib $mllibCost%.2f (ratio $ratio%.4f)")
    withVec.unpersist()
  }
}
