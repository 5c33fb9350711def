package graft.clustering

import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.{Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.kernels.KernelFactory

/** Spark-ML `Evaluator` for Bregman clusterings — plugs graft models into
  * `CrossValidator` / `TrainValidationSplit` for k / divergence /
  * hyper-parameter selection, which Spark's built-in
  * `ClusteringEvaluator` (squared-euclidean / cosine silhouette only)
  * can't do for general divergences.
  *
  * Works from the TRANSFORMED frame alone (featuresCol + predictionCol):
  * cluster centers are reconstructed as the gradient-space mean per
  * cluster (the Bregman-optimal centroid — one aggregation), then the
  * metric is computed against them in one more pass. No model internals
  * needed, so it also scores externally-produced assignments.
  *
  * Metrics (all returned so that LARGER IS BETTER):
  *  - `negDistortion`: −Σ w·D(x, μ_assigned)   (the Lloyd objective)
  *  - `silhouette`: center-proxy silhouette in [−1, 1]
  */
class BregmanClusteringEvaluator(override val uid: String)
    extends Evaluator with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("bregmanEval"))

  final val metricName = new Param[String](this, "metricName",
    "negDistortion|silhouette",
    ParamValidators.inArray(Array("negDistortion", "silhouette")))
  def getMetricName: String = $(metricName)
  def setMetricName(v: String): this.type = set(metricName, v)

  final val divergence = new Param[String](this, "divergence",
    "divergence kernel name (se, kl, is, generalizedI, logistic, l1, spherical)")
  def getDivergence: String = $(divergence)
  def setDivergence(v: String): this.type = set(divergence, v)

  final val smoothing = new org.apache.spark.ml.param.DoubleParam(this, "smoothing",
    "epsilon smoothing for domain-restricted divergences", ParamValidators.gt(0.0))
  def setSmoothing(v: Double): this.type = set(smoothing, v)

  final val featuresCol = new Param[String](this, "featuresCol", "features column")
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)

  final val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  setDefault(metricName -> "negDistortion", divergence -> "squaredEuclidean",
    smoothing -> 1e-10, featuresCol -> "features", predictionCol -> "prediction")

  override def isLargerBetter: Boolean = true

  override def evaluate(dataset: Dataset[_]): Double = {
    val kern = KernelFactory($(divergence), $(smoothing))
    val (dfArr, arrCol) = FeatureCols.asArray(dataset.toDF(), $(featuresCol))
    val assigned = dfArr
      .select(col(arrCol), col($(predictionCol)).cast("int").as("cluster"))
      .withColumn("dist", lit(0.0)) // centers only; metric pass follows
    val dim = assigned.select(col(arrCol)).head().getSeq[Double](0).length
    val upd = Update.gradMean(assigned, arrCol, lit(1.0), kern, dim)
    val ids = upd.centers.keys.toArray.sorted
    val centers = ids.map(upd.centers)
    val idToPos = ids.zipWithIndex.toMap

    $(metricName) match {
      case "silhouette" =>
        ClusteringMetrics.silhouette(dfArr, arrCol, kern, centers, sampleFraction = 1.0)
      case _ =>
        val sc = dfArr.sparkSession.sparkContext
        val bc = sc.broadcast(centers)
        val bk = sc.broadcast(kern)
        val bPos = sc.broadcast(idToPos)
        val dUdf = udf { (xs: Seq[Double], cl: Int) =>
          bPos.value.get(cl) match {
            case Some(p) => bk.value.divergence(xs.toArray, bc.value(p))
            case None    => 0.0 // empty/unknown cluster id contributes nothing
          }
        }
        val total = assigned
          .select(dUdf(col(arrCol), col("cluster")).as("d"))
          .agg(sum(col("d"))).head().getDouble(0)
        -total
    }
  }

  override def copy(extra: ParamMap): BregmanClusteringEvaluator = defaultCopy(extra)
}

object BregmanClusteringEvaluator extends DefaultParamsReadable[BregmanClusteringEvaluator]
