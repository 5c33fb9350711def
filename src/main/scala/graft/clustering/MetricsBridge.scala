package graft.clustering

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.kernels.KernelFactory

/** py4j-friendly facade over [[ClusteringMetrics]]: every method takes
  * the MODEL (whose java object PySpark already holds) plus plain
  * primitives — no Array[Array[Double]] or Option crossing the bridge
  * (CLAUDE.md rule 7), and frame-shaped results come back as DataFrames
  * so the Python side stays a thin `_call` + wrap.
  */
object MetricsBridge {

  private def kernelOf(m: GeneralizedKMeansModel) =
    KernelFactory(m.divergenceName, m.smoothingValue)

  /** Sampled center-proxy silhouette; `fraction` in (0, 1]. */
  def silhouette(
      model: GeneralizedKMeansModel,
      df: DataFrame,
      featuresCol: String,
      fraction: Double,
      seed: Long): Double =
    ClusteringMetrics.silhouette(
      df, featuresCol, kernelOf(model), model.clusterCenters, fraction, seed)

  /** Exact O(n²) silhouette, refused above `maxPoints` rows. */
  def exactSilhouette(
      model: GeneralizedKMeansModel,
      df: DataFrame,
      featuresCol: String,
      maxPoints: Int): Double =
    ClusteringMetrics.exactSilhouette(
      df, featuresCol, kernelOf(model), model.clusterCenters, maxPoints)

  /** All single-pass metrics as a one-row DataFrame
    * (wcss, bcss, calinski_harabasz, davies_bouldin, dunn, balance_ratio,
    * n_points, k).
    */
  def compute(
      model: GeneralizedKMeansModel,
      df: DataFrame,
      featuresCol: String): DataFrame = {
    val m = ClusteringMetrics.compute(
      df, featuresCol, kernelOf(model), model.clusterCenters)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((m.wcss, m.bcss, m.calinskiHarabasz, m.daviesBouldin, m.dunn,
        m.balanceRatio, m.numPoints, m.k))
      .toDF("wcss", "bcss", "calinski_harabasz", "davies_bouldin", "dunn",
        "balance_ratio", "n_points", "k")
  }

  /** Per-cluster sizes as a DataFrame (cluster, n). */
  def clusterSizes(
      model: GeneralizedKMeansModel,
      df: DataFrame,
      featuresCol: String): DataFrame = {
    val m = ClusteringMetrics.compute(
      df, featuresCol, kernelOf(model), model.clusterCenters)
    val spark = df.sparkSession
    import spark.implicits._
    m.clusterSizes.zipWithIndex.map { case (n, c) => (c, n) }.toSeq
      .toDF("cluster", "n")
  }

  /** Elbow sweep as a DataFrame (k, wcss). Seeded init (the library
    * default); `spark` comes off the input frame.
    */
  def elbowCurve(
      df: DataFrame,
      featuresCol: String,
      minK: Int,
      maxK: Int,
      divergence: String,
      maxIter: Int,
      seed: Long): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    ClusteringMetrics.elbowCurve(df, minK, maxK, featuresCol, divergence,
        maxIter, seed)
      .toDF("k", "wcss")
  }
}
