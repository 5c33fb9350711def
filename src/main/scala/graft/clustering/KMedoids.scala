package graft.clustering

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distance functions for medoid methods (true metrics, not Bregman
  * divergences — PAM cost is sum of distances, not squared).
  */
private[clustering] object MedoidDistance {
  def apply(name: String): (Array[Double], Array[Double]) => Double =
    name.trim.toLowerCase match {
      case "euclidean" => (a, b) => {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        math.sqrt(s)
      }
      case "manhattan" => (a, b) => {
        var s = 0.0; var i = 0
        while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
        s
      }
      case "cosine" => (a, b) => {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        1.0 - dot / math.max(1e-300, math.sqrt(na) * math.sqrt(nb))
      }
      case other => throw new IllegalArgumentException(
        s"Unknown distance '$other' (euclidean|manhattan|cosine)")
    }
}

trait KMedoidsParams extends GeneralizedKMeansParams {
  final val distanceFunction = new Param[String](this, "distanceFunction",
    "euclidean|manhattan|cosine",
    ParamValidators.inArray(Array("euclidean", "manhattan", "cosine")))
  def getDistanceFunction: String = $(distanceFunction)
  setDefault(distanceFunction -> "euclidean")
}

/** PAM (Partitioning Around Medoids): BUILD then SWAP.
  * (reference: ml/KMedoids.scala:89-330 — same BUILD/SWAP semantics; the
  * reference also collects the dataset, PAM is inherently O(k(n-k)^2)
  * local work. The driver cap is explicit here; [[CLARA]] is the
  * at-scale variant — PAM on samples, candidate sets scored DISTRIBUTED.)
  */
class KMedoids(override val uid: String)
    extends Estimator[KMedoidsModel] with KMedoidsParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("kmedoids"))

  final val maxDriverPoints = new IntParam(this, "maxDriverPoints",
    "refuse to collect more rows than this (use CLARA beyond)", ParamValidators.gt(0))
  setDefault(maxDriverPoints -> 20000)
  def setMaxDriverPoints(v: Int): this.type = set(maxDriverPoints, v)

  def setK(v: Int): this.type = set(k, v)
  def setDistanceFunction(v: String): this.type = set(distanceFunction, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  override def fit(dataset: Dataset[_]): KMedoidsModel = {
    val t0 = System.currentTimeMillis()
    val df0 = dataset.toDF()
    transformSchema(df0.schema)
    val (dfArr, arrCol) = FeatureCols.asArray(df0, $(featuresCol))
    val n = dfArr.count()
    require(n <= $(maxDriverPoints),
      s"KMedoids (PAM) is O(k(n-k)^2) local work; n=$n exceeds maxDriverPoints=${$(maxDriverPoints)}. Use CLARA.")
    val pts = dfArr.select(col(arrCol)).collect().map(_.getSeq[Double](0).toArray)
    val distFn = MedoidDistance($(distanceFunction))
    val (medoidIdx, iters, costHist) =
      KMedoids.pam(pts, $(k), $(maxIter), distFn)
    val model = new KMedoidsModel(uid, medoidIdx.map(pts), $(distanceFunction))
    copyValues(model.setParent(this))
    model.trainingSummary = Some(TrainingSummary(
      "KMedoids", $(k), medoidIdx.length,
      pts.headOption.map(_.length).getOrElse(0), n, iters,
      converged = iters < $(maxIter), costHist, Nil, $(distanceFunction),
      System.currentTimeMillis() - t0))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): KMedoids = defaultCopy(extra)
}

object KMedoids extends org.apache.spark.ml.util.DefaultParamsReadable[KMedoids] {

  /** BUILD + SWAP on local points. Returns (medoid indices, swap
    * iterations, cost history).
    */
  private[clustering] def pam(
      pts: Array[Array[Double]],
      k: Int,
      maxIter: Int,
      dist: (Array[Double], Array[Double]) => Double): (Array[Int], Int, Seq[Double]) = {
    val n = pts.length
    require(n >= k, s"need at least k=$k points, got $n")

    // BUILD: first medoid minimizes total distance; then greedy adds
    val medoids = scala.collection.mutable.ArrayBuffer[Int]()
    val minDist = Array.fill(n)(Double.MaxValue)
    var first = 0
    var bestTotal = Double.MaxValue
    var i = 0
    while (i < n) {
      var tot = 0.0
      var j = 0
      while (j < n) { tot += dist(pts(j), pts(i)); j += 1 }
      if (tot < bestTotal) { bestTotal = tot; first = i }
      i += 1
    }
    medoids += first
    i = 0
    while (i < n) { minDist(i) = dist(pts(i), pts(first)); i += 1 }
    while (medoids.length < k) {
      var bestGain = Double.NegativeInfinity
      var bestIdx = -1
      var c = 0
      while (c < n) {
        if (!medoids.contains(c)) {
          var gain = 0.0
          var j = 0
          while (j < n) {
            val d = dist(pts(j), pts(c))
            if (d < minDist(j)) gain += minDist(j) - d
            j += 1
          }
          if (gain > bestGain) { bestGain = gain; bestIdx = c }
        }
        c += 1
      }
      medoids += bestIdx
      i = 0
      while (i < n) {
        val d = dist(pts(i), pts(bestIdx))
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
    }

    def totalCost(ms: Seq[Int]): Double = {
      var tot = 0.0
      var j = 0
      while (j < n) {
        var best = Double.MaxValue
        ms.foreach { m => val d = dist(pts(j), pts(m)); if (d < best) best = d }
        tot += best
        j += 1
      }
      tot
    }

    // SWAP: best-improvement swaps until no improvement or maxIter
    var cost = totalCost(medoids.toSeq)
    val costHist = Seq.newBuilder[Double]
    costHist += cost
    var iter = 0
    var improved = true
    while (iter < maxIter && improved) {
      improved = false
      var bestCost = cost
      var bestM = -1
      var bestC = -1
      var mi = 0
      while (mi < medoids.length) {
        var c = 0
        while (c < n) {
          if (!medoids.contains(c)) {
            val trial = medoids.toArray
            trial(mi) = c
            val tc = totalCost(trial.toSeq)
            if (tc < bestCost - 1e-12) { bestCost = tc; bestM = mi; bestC = c }
          }
          c += 1
        }
        mi += 1
      }
      if (bestM >= 0) {
        medoids(bestM) = bestC
        cost = bestCost
        costHist += cost
        improved = true
        iter += 1
      }
    }
    (medoids.toArray, iter, costHist.result())
  }
}

/** CLARA: PAM on `numSamples` random samples; each candidate medoid set is
  * scored over the FULL dataset with one distributed aggregation; the best
  * set wins.
  * (reference: ml/CLARA.scala:72-168 — same sampling scheme; the
  * reference scores candidates over collected data, here scoring is a
  * distributed agg so the full data never moves.)
  */
class CLARA(override val uid: String)
    extends Estimator[KMedoidsModel] with KMedoidsParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("clara"))

  final val numSamples = new IntParam(this, "numSamples",
    "number of PAM samples", ParamValidators.gt(0))
  def setNumSamples(v: Int): this.type = set(numSamples, v)

  final val sampleSize = new IntParam(this, "sampleSize",
    "rows per sample; -1 = auto (40 + 2k)")
  def setSampleSize(v: Int): this.type = set(sampleSize, v)

  setDefault(numSamples -> 5, sampleSize -> -1)

  def setK(v: Int): this.type = set(k, v)
  def setDistanceFunction(v: String): this.type = set(distanceFunction, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  override def fit(dataset: Dataset[_]): KMedoidsModel = {
    val t0 = System.currentTimeMillis()
    val df0 = dataset.toDF()
    transformSchema(df0.schema)
    val (dfArr, arrCol) = FeatureCols.asArray(df0, $(featuresCol))
    val data = dfArr.select(col(arrCol)).persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    val s = if ($(sampleSize) == -1) math.min(n, 40L + 2L * $(k)).toInt
      else math.min(n, $(sampleSize).toLong).toInt
    val distFn = MedoidDistance($(distanceFunction))
    val sc = data.sparkSession.sparkContext

    var bestMedoids: Array[Array[Double]] = null
    var bestCost = Double.MaxValue
    val costs = Seq.newBuilder[Double]
    (0 until $(numSamples)).foreach { si =>
      // the limit runs over a RANDOMLY ORDERED sampled subset (a plain
      // sample().limit() keeps input order and takes a prefix — rows from
      // early partitions only); the sort touches ~3s rows, not the data
      val sample = data
        .sample(withReplacement = false, math.min(1.0, 3.0 * s / math.max(1L, n)), $(seed) + si)
        .orderBy(rand($(seed) + 1000 + si))
        .limit(s).collect().map(_.getSeq[Double](0).toArray)
      if (sample.length >= $(k)) {
        val (mIdx, _, _) = KMedoids.pam(sample, $(k), $(maxIter), distFn)
        val medoids = mIdx.map(sample)
        // distributed scoring: one agg over the full data
        val bc = sc.broadcast(medoids)
        val bd = sc.broadcast($(distanceFunction))
        val costUdf = udf { (xs: Seq[Double]) =>
          val x = xs.toArray
          val fn = MedoidDistance(bd.value)
          var best = Double.MaxValue
          var i = 0
          while (i < bc.value.length) {
            val d = fn(x, bc.value(i)); if (d < best) best = d; i += 1
          }
          best
        }
        val cost = data.agg(sum(costUdf(col(arrCol)))).head().getDouble(0)
        costs += cost
        if (cost < bestCost) { bestCost = cost; bestMedoids = medoids }
      }
    }
    data.unpersist()
    require(bestMedoids != null, "no CLARA sample produced k medoids")

    val model = new KMedoidsModel(uid, bestMedoids, $(distanceFunction))
    copyValues(model.setParent(this))
    model.trainingSummary = Some(TrainingSummary(
      "CLARA", $(k), bestMedoids.length,
      bestMedoids.headOption.map(_.length).getOrElse(0), n, $(numSamples),
      converged = true, costs.result(), Nil, $(distanceFunction),
      System.currentTimeMillis() - t0))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): CLARA = defaultCopy(extra)
}

/** Medoid model: centers ARE data points; assignment/cost use the metric
  * distance (not a squared divergence).
  */
class KMedoidsModel(
    override val uid: String,
    val medoids: Array[Array[Double]],
    val distanceName: String)
    extends Model[KMedoidsModel] with KMedoidsParams
    with org.apache.spark.ml.util.MLWritable {

  override def write: org.apache.spark.ml.util.MLWriter = new KMedoidsModel.Writer(this)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  private[graft] var trainingSummary: Option[TrainingSummary] = None
  def summary: TrainingSummary = trainingSummary.getOrElse(
    throw new IllegalStateException("No training summary"))
  def numClusters: Int = medoids.length

  private def assignUdf(sc: org.apache.spark.SparkContext) = {
    val bc = sc.broadcast(medoids)
    val bd = sc.broadcast(distanceName)
    udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      val fn = MedoidDistance(bd.value)
      var bestI = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < bc.value.length) {
        val d = fn(x, bc.value(i))
        if (d < bestD) { bestD = d; bestI = i }
        i += 1
      }
      (bestI, bestD)
    }
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    val (df, arrCol) = FeatureCols.asArray(dataset.toDF(), $(featuresCol))
    val tmp = s"__${uid}_b"
    val out = df.withColumn(tmp, assignUdf(df.sparkSession.sparkContext)(col(arrCol)))
      .withColumn($(predictionCol), col(s"$tmp._1"))
      .drop(tmp)
    if (arrCol != $(featuresCol)) out.drop(arrCol) else out
  }

  /** Total metric cost (sum of distances to nearest medoid). */
  def computeCost(dataset: Dataset[_]): Double = {
    val (df, arrCol) = FeatureCols.asArray(dataset.toDF(), $(featuresCol))
    val tmp = s"__${uid}_b"
    df.withColumn(tmp, assignUdf(df.sparkSession.sparkContext)(col(arrCol)))
      .agg(sum(col(s"$tmp._2"))).head().getDouble(0)
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): KMedoidsModel = {
    val m = new KMedoidsModel(uid, medoids, distanceName)
    m.trainingSummary = trainingSummary
    copyValues(m, extra).setParent(parent)
  }
}

object KMedoidsModel extends org.apache.spark.ml.util.MLReadable[KMedoidsModel] {
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.json4s._
  import org.json4s.JsonDSL._

  private[graft] class Writer(m: KMedoidsModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      ModelIO.writeMeta(path, sparkSession, m, "distance" -> m.distanceName, Seq("medoids"))
      ModelIO.writeMatrix(path, "medoids", sparkSession, m.medoids)
    }
  }

  override def read: MLReader[KMedoidsModel] = new MLReader[KMedoidsModel] {
    override def load(path: String): KMedoidsModel = {
      implicit val fmt: Formats = DefaultFormats
      val (uid, paramMap, extra) = ModelIO.extract(ModelIO.readMeta(path, sparkSession))
      val m = new KMedoidsModel(uid,
        ModelIO.readMatrix(path, "medoids", sparkSession),
        (extra \ "distance").extract[String])
      GeneralizedKMeansModel.restoreParams(m, paramMap)
      m
    }
  }
}

object CLARA extends org.apache.spark.ml.util.DefaultParamsReadable[CLARA]
