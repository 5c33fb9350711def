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
    extends Estimator[GeneralizedKMeansModel] with GeneralizedKMeansParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

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

  /** Warm start: train from these centers instead of initMode (same
    * contract as GeneralizedKMeans.setInitialCenters; not persisted).
    */
  @transient private var initialCentersOpt: Option[Array[Array[Double]]] = None
  def setInitialCenters(cs: Array[Array[Double]]): this.type = {
    initialCentersOpt = Option(cs); this
  }
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

    // init: local k-means++ over a candidate pool folded into the FIRST
    // mini-batch — one collect seeds the centers AND applies the batch-0
    // update driver-side (r3 verdict #3: a separate pool job plus its
    // orderBy(rand) stage made a scheduler-bound fit 2.1x slower). A bare
    // k-row sample would miss a 1/k-mass cluster with probability
    // ~(1-1/k)^k ~ 37%, so the pooled seeding stays.
    val poolN = math.max(10 * $(k), 20)
    val fraction = math.min(1.0, $(batchSize).toDouble / numPoints)
    val batch0 = data
      .sample(withReplacement = false,
        math.min(1.0, math.max(fraction, 2.0 * poolN / math.max(1L, numPoints))), $(seed))
      .select(col(arrCol), wCol.cast("double").as("__w"))
      .collect()
    // driver-side shuffle de-biases the partition-prefix order of a
    // Bernoulli sample before the pool is cut from it
    val rnd = new scala.util.Random($(seed))
    val shuffled = rnd.shuffle(batch0.toVector)
    val b0pts = shuffled.map(_.getSeq[Double](0).toArray).toArray
    val b0w = shuffled.map(_.getDouble(1)).toArray
    val pool = b0pts.take(poolN)
    val centers = initialCentersOpt match {
      case Some(cs) =>
        CenterInit.validateExplicit(cs, $(k), dim)
        cs.map(_.clone())
      case None =>
        if (pool.length <= $(k)) pool.map(_.clone())
        else CenterInit.localKMeansPlusPlusBest(pool, b0w.take(poolN), $(k), kern, $(seed))
    }
    val counts = new Array[Double]($(k))
    val aggFn = udaf(new CentroidAggregator(dim))

    val distHist = Seq.newBuilder[Double]
    var best = Double.MaxValue
    var noImprove = 0
    var iter = 0
    var converged = false

    // batch 0: already on the driver — apply the Sculley update locally
    {
      val take = math.min(b0pts.length, math.max($(batchSize), 1))
      var batchW = 0.0
      var batchCost = 0.0
      val sums = Array.fill($(k))(new Array[Double](dim))
      val ws = new Array[Double]($(k))
      var p = 0
      while (p < take) {
        val x = b0pts(p)
        var bi = 0; var bd = Double.MaxValue; var c = 0
        while (c < centers.length) {
          val d = kern.divergence(x, centers(c))
          if (d < bd) { bd = d; bi = c }
          c += 1
        }
        val w = b0w(p)
        var i = 0
        while (i < dim) { sums(bi)(i) += x(i) * w; i += 1 }
        ws(bi) += w
        batchW += w
        batchCost += bd * w
        p += 1
      }
      var c = 0
      while (c < $(k)) {
        if (ws(c) > 0) {
          val newCount = counts(c) + ws(c)
          var i = 0
          while (i < dim) { centers(c)(i) = (counts(c) * centers(c)(i) + sums(c)(i)) / newCount; i += 1 }
          counts(c) = newCount
        }
        c += 1
      }
      if (batchW > 0) { distHist += batchCost / batchW; best = batchCost / batchW }
      iter = 1
    }

    while (iter < $(maxIter) && !converged) {
      val batch = data.sample(withReplacement = false, fraction, $(seed) + iter)
      val assigned = Assignment.assign(batch, arrCol, kern, centers, $(assignmentStrategy), oneShot = false)
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

object MiniBatchKMeans extends org.apache.spark.ml.util.DefaultParamsReadable[MiniBatchKMeans]
