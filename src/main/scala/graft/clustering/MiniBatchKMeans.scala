package graft.clustering

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Mini-batch k-means (Sculley-style incremental updates)
  * (reference: ml/MiniBatchKMeans.scala:98,152-338).
  *
  * Batches stay ON EXECUTORS — the reference collects every batch to the
  * driver (ml/MiniBatchKMeans.scala:243-247); here a batch is a Bernoulli
  * sample that is assigned via broadcast centers and reduced to k
  * (sum, count, distortion) rows by the typed Aggregator. The driver-side
  * merge c' = (n_c*c + sum_c)/(n_c + m_c) is EXACTLY the reference's
  * per-point eta = 1/count running mean, applied batch-at-a-time.
  */
class MiniBatchKMeans(override val uid: String)
    extends Estimator[GeneralizedKMeansModel] with GeneralizedKMeansParams {

  def this() = this(Identifiable.randomUID("minibatch-kmeans"))

  final val batchSize = new IntParam(this, "batchSize",
    "expected rows per mini-batch", ParamValidators.gt(0))
  def getBatchSize: Int = $(batchSize)
  def setBatchSize(v: Int): this.type = set(batchSize, v)

  final val maxNoImprovement = new IntParam(this, "maxNoImprovement",
    "stop after this many batches without distortion improvement (0 = never)",
    ParamValidators.gtEq(0))
  def getMaxNoImprovement: Int = $(maxNoImprovement)
  def setMaxNoImprovement(v: Int): this.type = set(maxNoImprovement, v)

  setDefault(batchSize -> 1024, maxNoImprovement -> 10)

  def setK(v: Int): this.type = set(k, v)
  def setDivergence(v: String): this.type = set(divergence, v)
  def setSmoothing(v: Double): this.type = set(smoothing, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setInitMode(v: String): this.type = set(initMode, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setWeightCol(v: String): this.type = set(weightCol, v)

  override def fit(dataset: Dataset[_]): GeneralizedKMeansModel = {
    val t0 = System.currentTimeMillis()
    val df0 = dataset.toDF()
    transformSchema(df0.schema)
    val (dfArr, arrCol) = FeatureCols.asArray(df0, $(featuresCol))
    val kern = kernel
    val wOpt = get(weightCol).filter(_.nonEmpty)
    val wCol = wOpt.map(col).getOrElse(lit(1.0))
    val data = dfArr.select((Seq(arrCol) ++ wOpt).distinct.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val numPoints = data.count()
    val dim = data.select(col(arrCol)).head().getSeq[Double](0).length
    require(numPoints > 0, "empty input")

    // init: local k-means++ over a sampled candidate pool (one small
    // collect; a bare k-row sample misses a 1/k-mass cluster with
    // probability ~(1-1/k)^k ~ 37%, while a full k-means|| pass would cost
    // more than several batches)
    val pool = CenterInit.samplePoints(data, arrCol, math.max(10 * $(k), 20), $(seed), numPoints)
      .map(_.clone()).toArray
    val centers =
      if (pool.length <= $(k)) pool
      else CenterInit.localKMeansPlusPlus(pool, Array.fill(pool.length)(1.0), $(k), kern, $(seed))
    val counts = new Array[Double]($(k))
    val fraction = math.min(1.0, $(batchSize).toDouble / numPoints)
    val aggFn = udaf(new CentroidAggregator(dim))

    val distHist = Seq.newBuilder[Double]
    var best = Double.MaxValue
    var noImprove = 0
    var iter = 0
    var converged = false

    while (iter < $(maxIter) && !converged) {
      val batch = data.sample(withReplacement = false, fraction, $(seed) + iter)
      val assigned = Assignment.assign(batch, arrCol, kern, centers, $(assignmentStrategy))
      val rows = assigned
        .groupBy(col("cluster"))
        .agg(aggFn(col(arrCol), wCol.cast("double"), col("dist")).as("r"))
        .select(col("cluster"), col("r._1"), col("r._2"), col("r._3"))
        .collect()

      var batchW = 0.0
      var batchCost = 0.0
      rows.foreach { r =>
        val c = r.getInt(0)
        val xsum = r.getSeq[Double](1)
        val w = r.getDouble(2)
        batchCost += r.getDouble(3)
        batchW += w
        if (w > 0) {
          val newCount = counts(c) + w
          var i = 0
          while (i < dim) {
            centers(c)(i) = (counts(c) * centers(c)(i) + xsum(i)) / newCount
            i += 1
          }
          counts(c) = newCount
        }
      }
      if (batchW > 0) {
        val avg = batchCost / batchW
        distHist += avg
        if (avg < best - $(tol)) { best = avg; noImprove = 0 }
        else noImprove += 1
        if ($(maxNoImprovement) > 0 && noImprove >= $(maxNoImprovement)) converged = true
      }
      iter += 1
    }
    data.unpersist()

    val model = new GeneralizedKMeansModel(uid, centers, $(divergence), $(smoothing))
    copyValues(model.setParent(this))
    model.trainingSummary = Some(TrainingSummary(
      "MiniBatchKMeans", $(k), centers.length, dim, numPoints, iter, converged,
      distHist.result(), Nil, kern.name, System.currentTimeMillis() - t0))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): MiniBatchKMeans = defaultCopy(extra)
}
