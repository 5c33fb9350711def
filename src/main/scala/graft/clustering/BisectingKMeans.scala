package graft.clustering

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Top-down hierarchical k-means: repeatedly split the largest divisible
  * cluster with a k=2 Lloyd run until k clusters exist.
  * (reference: ml/BisectingKMeans.scala:93,136-190, split loop at :202,323)
  *
  * Scale design: cluster membership lives in a DataFrame column, updated by
  * reassigning ONLY the split cluster's rows each round (one filtered
  * assignment job per split, never a full-data reassignment). The evolving
  * membership frame is the one place in the engine where lineage genuinely
  * grows (one union per split), so `checkpointInterval` is honored here via
  * localCheckpoint.
  */
class BisectingKMeans(override val uid: String)
    extends Estimator[GeneralizedKMeansModel] with GeneralizedKMeansParams {

  def this() = this(Identifiable.randomUID("bisecting-kmeans"))

  /** Minimum cluster size eligible for splitting (count of rows). */
  final val minDivisibleClusterSize = new DoubleParam(this, "minDivisibleClusterSize",
    "minimum number of points a cluster must have to be split", ParamValidators.gtEq(1.0))
  def getMinDivisibleClusterSize: Double = $(minDivisibleClusterSize)
  def setMinDivisibleClusterSize(v: Double): this.type = set(minDivisibleClusterSize, v)

  setDefault(minDivisibleClusterSize -> 1.0)

  def setK(v: Int): this.type = set(k, v)
  def setDivergence(v: String): this.type = set(divergence, v)
  def setSmoothing(v: Double): this.type = set(smoothing, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setWeightCol(v: String): this.type = set(weightCol, v)
  def setCheckpointInterval(v: Int): this.type = set(checkpointInterval, v)

  override def fit(dataset: Dataset[_]): GeneralizedKMeansModel = {
    val t0 = System.currentTimeMillis()
    val df0 = dataset.toDF()
    transformSchema(df0.schema)
    val (dfArr, arrCol) = FeatureCols.asArray(df0, $(featuresCol))
    val kern = kernel
    val wOpt = get(weightCol).filter(_.nonEmpty)
    val keep = (Seq(arrCol) ++ wOpt).distinct
    val wCol = wOpt.map(col).getOrElse(lit(1.0))

    var asg = dfArr.select(keep.map(col): _*).withColumn("__cid", lit(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val numPoints = asg.count()
    val dim = asg.select(col(arrCol)).head().getSeq[Double](0).length

    // initial center: global mean (one aggregation)
    val root = Update.gradMean(
      asg.withColumn("cluster", col("__cid")).withColumn("dist", lit(0.0)),
      arrCol, wCol, kern, dim)
    val centers = scala.collection.mutable.Map[Int, Array[Double]](0 -> root.centers(0))
    var nextId = 1
    var numSplits = 0

    while (centers.size < $(k)) {
      val sizes = asg.groupBy(col("__cid")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val divisible = sizes.filter { case (_, n) => n >= $(minDivisibleClusterSize) && n >= 2 }
      if (divisible.isEmpty) {
        // nothing left to split — return fewer clusters
        asg.unpersist()
        return finish(centers.toMap, numSplits, numPoints, dim, kern.name, t0)
      }
      // largest first; id tie-break for determinism
      val target = divisible.toSeq.maxBy { case (id, n) => (n, -id) }._1
      val subset = asg.where(col("__cid") === target).select(keep.map(col): _*)
      val cfg = LloydsConfig(
        k = 2, kernel = kern, maxIter = $(maxIter), tol = $(tol),
        seed = $(seed) + numSplits, initMode = "random",
        assignmentStrategy = $(assignmentStrategy),
        emptyClusterStrategy = "drop",
        featuresCol = arrCol, weightCol = wOpt, validate = false)
      val split = LloydsIterator.run(subset, cfg)
      if (split.centers.length < 2) {
        // degenerate split (all points identical): stop
        asg.unpersist()
        return finish(centers.toMap, numSplits, numPoints, dim, kern.name, t0)
      }
      val reassigned = Assignment
        .assign(subset, arrCol, kern, split.centers, $(assignmentStrategy))
        .withColumn("__cid",
          when(col("cluster") === 0, lit(target)).otherwise(lit(nextId)))
        .select((keep.map(col) :+ col("__cid")): _*)
      val newAsg0 = asg.where(col("__cid") =!= target).union(reassigned)
      val newAsg =
        if ((numSplits + 1) % $(checkpointInterval) == 0) newAsg0.localCheckpoint()
        else newAsg0.persist(StorageLevel.MEMORY_AND_DISK)
      newAsg.count()
      asg.unpersist()
      asg = newAsg
      centers(target) = split.centers(0)
      centers(nextId) = split.centers(1)
      nextId += 1
      numSplits += 1
    }
    asg.unpersist()
    finish(centers.toMap, numSplits, numPoints, dim, kern.name, t0)
  }

  private def finish(
      centers: Map[Int, Array[Double]],
      numSplits: Int,
      numPoints: Long,
      dim: Int,
      kernName: String,
      t0: Long): GeneralizedKMeansModel = {
    val arr = (0 until centers.size).map(centers).toArray
    val model = new GeneralizedKMeansModel(uid, arr, $(divergence), $(smoothing))
    copyValues(model.setParent(this))
    model.trainingSummary = Some(TrainingSummary(
      "BisectingKMeans", $(k), arr.length, dim, numPoints,
      iterations = numSplits, converged = arr.length == $(k),
      distortionHistory = Nil, movementHistory = Nil,
      divergence = kernName, elapsedMillis = System.currentTimeMillis() - t0))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): BisectingKMeans = defaultCopy(extra)
}
