package graft.clustering

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** X-Means: model selection over a k range via BIC/AIC scoring of
  * GeneralizedKMeans fits (reference: ml/XMeans.scala:117,143-271).
  *
  * The score matches the reference's Gaussian-likelihood formulation:
  * variance = cost/n, log-likelihood = -cost/(2*var) - n*log(sigma)
  * - n*log(2*pi)/2, p = k*d + 1,
  * BIC = -2*ll + p*log(n); AIC = -2*ll + 2*p; lower is better.
  */
class XMeans(override val uid: String)
    extends Estimator[GeneralizedKMeansModel] with GeneralizedKMeansParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("xmeans"))

  final val minK = new IntParam(this, "minK", "minimum k to try", ParamValidators.gt(1))
  final val maxK = new IntParam(this, "maxK", "maximum k to try", ParamValidators.gt(1))
  final val criterion = new Param[String](this, "criterion", "bic|aic",
    ParamValidators.inArray(Array("bic", "aic")))
  def getMinK: Int = $(minK)
  def getMaxK: Int = $(maxK)
  def getCriterion: String = $(criterion)

  setDefault(minK -> 2, maxK -> 10, criterion -> "bic")

  def setMinK(v: Int): this.type = set(minK, v)
  def setMaxK(v: Int): this.type = set(maxK, v)
  def setCriterion(v: String): this.type = set(criterion, v)
  def setEmptyClusterStrategy(v: String): this.type = set(emptyClusterStrategy, v)
  def setDivergence(v: String): this.type = set(divergence, v)
  def setSmoothing(v: Double): this.type = set(smoothing, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setWeightCol(v: String): this.type = set(weightCol, v)

  /** Score of the kept model (populated after fit). */
  @transient private[graft] var bestScore: Double = Double.NaN

  /** Every candidate's (k, score), ascending k (populated after fit) —
    * the full model-selection trace, so callers (and the correctness
    * oracle) can check the whole BIC/AIC curve, not just the winner.
    */
  @transient private[graft] var allScores: Seq[(Int, Double)] = Nil

  /** Optional deterministic warm start per candidate k: when set, the
    * k-candidate fit seeds from `fn(k)` instead of k-means|| — this pins
    * every source of randomness out of the whole selection loop, making
    * the end-to-end fit SQL-replayable (same recipe as
    * GeneralizedKMeans.setInitialCenters).
    */
  @transient private var initialCentersForK: Option[Int => Array[Array[Double]]] = None
  def setInitialCentersForK(fn: Int => Array[Array[Double]]): this.type = {
    initialCentersForK = Some(fn); this
  }

  override def fit(dataset: Dataset[_]): GeneralizedKMeansModel = {
    require($(minK) <= $(maxK), s"minK=${$(minK)} must be <= maxK=${$(maxK)}")
    val df = dataset.toDF().persist(StorageLevel.MEMORY_AND_DISK)
    val n = df.count()
    // The per-k fits are independent — run them CONCURRENTLY against the
    // shared cached input (Spark schedules concurrent jobs from one
    // session fine; wall-clock becomes ~max(fit) instead of sum(fit)).
    // Each sub-fit skips its own persist/validate/count (r3 verdict #5).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = ($(minK) to $(maxK)).map { kTry =>
      Future {
        val est = new GeneralizedKMeans(s"${uid}_k$kTry")
          .setK(kTry).setDivergence($(divergence)).setSmoothing($(smoothing))
          .setMaxIter($(maxIter)).setTol($(tol)).setSeed($(seed))
          .setFeaturesCol($(featuresCol)).setPredictionCol($(predictionCol))
          .setEmptyClusterStrategy($(emptyClusterStrategy))
        get(weightCol).filter(_.nonEmpty).foreach(est.setWeightCol)
        initialCentersForK.foreach(fn => est.setInitialCenters(fn(kTry)))
        est.reuseCachedInput = true // df persisted + counted above, once
        est.knownN = Some(n)
        val m = est.fit(df)
        val cost = m.computeCost(df)
        (kTry, m, score(cost, kTry, n, m.numFeatures))
      }
    }
    val results = futures.map(f => Await.result(f, Duration.Inf))
    df.unpersist()
    allScores = results.map { case (kTry, _, s) => (kTry, s) }
    // deterministic winner: lowest score, ties to the smaller k
    val (_, best, bestS) = results.minBy { case (kTry, _, s) => (s, kTry) }
    bestScore = bestS
    copyValues(best.setParent(this))
    best
  }

  /** BIC/AIC from the Gaussian log-likelihood of the clustering cost. */
  private[graft] def score(cost: Double, k: Int, n: Long, d: Int): Double = {
    val nd = n.toDouble
    val variance = math.max(cost / nd, 1e-10)
    val sigma = math.sqrt(variance)
    val ll = -cost / (2 * variance) - nd * math.log(sigma) - nd * math.log(2 * math.Pi) / 2
    val p = k * d + 1
    $(criterion) match {
      case "aic" => -2 * ll + 2 * p
      case _     => -2 * ll + p * math.log(nd)
    }
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): XMeans = defaultCopy(extra)
}

object XMeans extends org.apache.spark.ml.util.DefaultParamsReadable[XMeans]
