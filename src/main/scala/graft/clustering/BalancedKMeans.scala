package graft.clustering

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Size-balanced k-means (soft mode): the assignment cost of a cluster
  * already over `maxClusterSize` is inflated by
  * `1 + penalty * oversize/maxSize`, steering points to emptier clusters
  * while staying a plain Lloyd loop.
  * (reference: ml/BalancedKMeans.scala:110-320, soft path at :384-425. The
  * reference's `hard` mode redistributes points in a driver-side loop over
  * the COLLECTED dataset — that shape cannot scale and is deliberately not
  * reproduced; the soft penalty is the distributed formulation.)
  *
  * Scale design: two jobs per iteration — a plain argmin assignment to
  * measure sizes (k-row collect), then a penalized-argmin UDF (sizes
  * broadcast) folded straight into the update aggregation.
  */
class BalancedKMeans(override val uid: String)
    extends Estimator[GeneralizedKMeansModel] with GeneralizedKMeansParams {

  def this() = this(Identifiable.randomUID("balancedkmeans"))

  final val maxClusterSize = new IntParam(this, "maxClusterSize",
    "soft size cap; 0 = auto (n/k * 1.1)", ParamValidators.gtEq(0))
  def getMaxClusterSize: Int = $(maxClusterSize)
  def setMaxClusterSize(v: Int): this.type = set(maxClusterSize, v)

  final val balancePenalty = new DoubleParam(this, "balancePenalty",
    "penalty multiplier for oversized clusters", ParamValidators.gtEq(0))
  def getBalancePenalty: Double = $(balancePenalty)
  def setBalancePenalty(v: Double): this.type = set(balancePenalty, v)

  setDefault(maxClusterSize -> 0, balancePenalty -> 0.5)

  def setK(v: Int): this.type = set(k, v)
  def setDivergence(v: String): this.type = set(divergence, v)
  def setSmoothing(v: Double): this.type = set(smoothing, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setInitMode(v: String): this.type = set(initMode, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  override def fit(dataset: Dataset[_]): GeneralizedKMeansModel = {
    val t0 = System.currentTimeMillis()
    val df0 = dataset.toDF()
    transformSchema(df0.schema)
    val (dfArr, arrCol) = FeatureCols.asArray(df0, $(featuresCol))
    val kern = kernel
    val data = dfArr.select(col(arrCol)).persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    val dim = data.select(col(arrCol)).head().getSeq[Double](0).length
    val maxSize =
      if ($(maxClusterSize) > 0) $(maxClusterSize)
      else math.ceil(n.toDouble / $(k) * 1.1).toInt
    val penalty = $(balancePenalty)

    var centers = CenterInit.initialize(data,
      LloydsConfig(k = $(k), kernel = kern, seed = $(seed), initMode = $(initMode),
        featuresCol = arrCol), dim, n)
    var iter = 0
    var converged = false
    val distHist = Seq.newBuilder[Double]
    val sc = data.sparkSession.sparkContext

    while (iter < $(maxIter) && !converged) {
      // pass 1: plain assignment -> sizes (k rows)
      val plain = Assignment.assign(data, arrCol, kern, centers, $(assignmentStrategy))
      val sizes = plain.groupBy(col("cluster")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // pass 2: penalized argmin folded into the update aggregation
      val bcC = sc.broadcast(centers)
      val bcK = sc.broadcast(kern)
      val bcS = sc.broadcast(sizes)
      val balUdf = udf { (xs: Seq[Double]) =>
        val x = xs.toArray
        val cs = bcC.value
        var best = 0
        var bd = Double.MaxValue
        var i = 0
        while (i < cs.length) {
          val d = bcK.value.divergence(x, cs(i))
          val over = math.max(0L, bcS.value.getOrElse(i, 0L) - maxSize).toDouble
          val pd = d * (1.0 + penalty * over / maxSize)
          if (pd < bd) { bd = pd; best = i }
          i += 1
        }
        (best, bd)
      }
      val assigned = data.withColumn("__b", balUdf(col(arrCol)))
        .withColumn("cluster", col("__b._1"))
        .withColumn("dist", col("__b._2"))
        .drop("__b")
      val upd = Update.gradMean(assigned, arrCol, lit(1.0), kern, dim)
      distHist += upd.distortion
      // a cluster emptied by the penalty is RESEEDED, not dropped — with a
      // multiplicative size penalty, dropping feeds back (survivors grow
      // more oversized, shed more clusters) and collapses k to 1
      val missing = centers.indices.filterNot(upd.centers.contains)
      val next: Array[Array[Double]] =
        if (missing.isEmpty) Array.tabulate(centers.length)(i => upd.centers(i))
        else {
          val repl = missing.zip(
            CenterInit.samplePoints(data, arrCol, missing.size, $(seed) + iter, n)).toMap
          Array.tabulate(centers.length)(i =>
            upd.centers.getOrElse(i, repl.getOrElse(i, centers(i))))
        }
      val movement =
        if (missing.nonEmpty) Double.MaxValue
        else centers.zip(next).map { case (a, b) =>
          math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        }.max
      centers = next
      iter += 1
      if (movement < $(tol)) converged = true
    }
    data.unpersist()

    val model = new GeneralizedKMeansModel(uid, centers, $(divergence), $(smoothing))
    copyValues(model.setParent(this))
    model.trainingSummary = Some(TrainingSummary(
      "BalancedKMeans", $(k), centers.length, dim, n, iter, converged,
      distHist.result(), Nil, kern.name, System.currentTimeMillis() - t0))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): BalancedKMeans = defaultCopy(extra)
}
