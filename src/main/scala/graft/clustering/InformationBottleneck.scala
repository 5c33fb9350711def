package graft.clustering

import graft.ops.MutualInformation
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Information Bottleneck: find a soft compression T of X (k states) that
  * preserves information about a relevance variable Y — maximize
  * I(T;Y) - I(X;T)/beta via the Blahut-Arimoto fixed point
  *   p(t|x) ∝ p(t) exp(-beta KL(p(y|x) || p(y|t))).
  * (reference: ml/InformationBottleneck.scala:181-330 — same algorithm and
  * parameter surface. The reference COLLECTS all feature vectors to
  * discretize on the driver; here discretization is a Catalyst expression
  * (xxhash64 binning) and the joint p(x,y) comes from ONE distributed
  * groupBy — only the (numX x numY) support ever reaches the driver, so
  * 100 TB of rows reduce to a contingency table before any driver math.)
  */
class InformationBottleneck(override val uid: String)
    extends Estimator[InformationBottleneckModel] with InformationBottleneckParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("ib"))

  /** Warm start: deterministic initial encoder p0(t|x), given the x key
    * and k; rows must be positive length-k and are normalized. Not part
    * of the persisted param map — a loaded estimator re-initializes from
    * the seed. Enables engine-replayable fits (q_ib_info chains the
    * oracle from this exact p0) and resuming a deterministic-annealing
    * run from a previous encoder.
    */
  @transient private var initialEncoderOpt: Option[(String, Int) => Array[Double]] = None
  def setInitialEncoder(f: (String, Int) => Array[Double]): this.type = {
    initialEncoderOpt = Option(f); this
  }

  def setK(v: Int): this.type = set(k, v)
  def setBeta(v: Double): this.type = set(beta, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setRelevanceCol(v: String): this.type = set(relevanceCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setProbabilityCol(v: String): this.type = set(probabilityCol, v)
  def setNumBins(v: Int): this.type = set(numBins, v)
  def setSmoothing(v: Double): this.type = set(smoothing, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def fit(dataset: Dataset[_]): InformationBottleneckModel = {
    val t0 = System.currentTimeMillis()
    val df = dataset.toDF()
    val xKey = InformationBottleneck.xKeyExpr(df, $(featuresCol), $(numBins))
    val proj = df.select(xKey.as("__x"), col($(relevanceCol)).cast("string").as("__y"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ONE distributed job: the (x, y) contingency table
    val (joint, xVals, yVals) = MutualInformation.estimateJoint(proj, "__x", "__y")
    proj.unpersist()
    // NULL y is a legitimate relevance category (it flows through the
    // matrix math untouched), but a NULL x key has no encoder row — its
    // string form keys the initial encoder and the model's cluster map.
    // Refuse typed instead of NPE-ing in toString below.
    require(!xVals.contains(null),
      s"InformationBottleneck: ${$(featuresCol)} contains NULL keys — a " +
        "null row has no encoder entry. Filter null rows or coalesce the " +
        "column to a sentinel value before fitting.")
    val numX = xVals.length
    val numY = yVals.length
    val total = joint.map(_.sum).sum
    val pX = joint.map(_.sum / total)
    val eps = $(smoothing)
    // p(y|x) rows, smoothed
    val pYgX = joint.map { row =>
      val s = row.sum + eps * numY
      row.map(v => (v + eps) / s)
    }

    // Blahut-Arimoto fixed point (driver: k x numX / k x numY matrices)
    val kk = $(k)
    var pTgX = initialEncoderOpt match {
      case Some(f) =>
        Array.tabulate(numX) { xi =>
          val r = f(xVals(xi).toString, kk)
          require(r.length == kk && r.forall(_ > 0.0),
            s"initial encoder rows must be positive length-$kk")
          val s = r.sum
          r.map(_ / s)
        }
      case None =>
        val rnd = new java.util.Random($(seed))
        Array.fill(numX) {
          val r = Array.fill(kk)(0.1 + rnd.nextDouble())
          val s = r.sum
          r.map(_ / s)
        }
    }
    var iter = 0
    var converged = false
    val bVal = $(beta)
    while (iter < $(maxIter) && !converged) {
      // p(t) and p(y|t)
      val pT = Array.tabulate(kk)(t => (0 until numX).map(x => pX(x) * pTgX(x)(t)).sum)
      val pYgT = Array.tabulate(kk) { t =>
        val row = new Array[Double](numY)
        var x = 0
        while (x < numX) {
          val w = pX(x) * pTgX(x)(t)
          var y = 0
          while (y < numY) { row(y) += w * pYgX(x)(y); y += 1 }
          x += 1
        }
        val s = row.sum
        if (s > 0) row.map(_ / s) else Array.fill(numY)(1.0 / numY)
      }
      // new p(t|x) ∝ p(t) exp(-beta KL(p(y|x)||p(y|t))) — log-space
      var maxChange = 0.0
      val newPTgX = Array.tabulate(numX) { x =>
        val logits = Array.tabulate(kk) { t =>
          var klv = 0.0
          var y = 0
          while (y < numY) {
            val p = pYgX(x)(y)
            if (p > 0) klv += p * math.log(p / math.max(pYgT(t)(y), 1e-300))
            y += 1
          }
          math.log(math.max(pT(t), 1e-300)) - bVal * klv
        }
        val mx = logits.max
        val ex = logits.map(l => math.exp(l - mx))
        val s = ex.sum
        val row = ex.map(_ / s)
        var t = 0
        while (t < kk) {
          maxChange = math.max(maxChange, math.abs(row(t) - pTgX(x)(t))); t += 1
        }
        row
      }
      pTgX = newPTgX
      iter += 1
      if (maxChange < $(tol)) converged = true
    }

    // information metrics
    val pT = Array.tabulate(kk)(t => (0 until numX).map(x => pX(x) * pTgX(x)(t)).sum)
    val pYgT = Array.tabulate(kk) { t =>
      val row = new Array[Double](numY)
      var x = 0
      while (x < numX) {
        val w = pX(x) * pTgX(x)(t)
        var y = 0
        while (y < numY) { row(y) += w * pYgX(x)(y); y += 1 }
        x += 1
      }
      val s = row.sum
      if (s > 0) row.map(_ / s) else Array.fill(numY)(1.0 / numY)
    }
    // I(X;T) from joint p(x)p(t|x); I(T;Y) from joint p(t)p(y|t)
    val jointXT = Array.tabulate(numX, kk)((x, t) => pX(x) * pTgX(x)(t))
    val jointTY = Array.tabulate(kk, numY)((t, y) => pT(t) * pYgT(t)(y))
    val iXT = MutualInformation.mutualInformation(jointXT)
    val iTY = MutualInformation.mutualInformation(jointTY)

    val model = new InformationBottleneckModel(uid,
      xVals.map(_.toString).toArray, pTgX, pT, pYgT)
    copyValues(model.setParent(this))
    model.compressionInfo = iXT
    model.relevanceInfo = iTY
    model.iterationsRun = iter
    model.hasConverged = converged
    model.elapsedMillis = System.currentTimeMillis() - t0
    model
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(featuresCol)), s"missing ${$(featuresCol)}")
    require(schema.fieldNames.contains($(relevanceCol)), s"missing ${$(relevanceCol)}")
    schema.add($(predictionCol), IntegerType, nullable = false)
  }
  override def copy(extra: ParamMap): InformationBottleneck = defaultCopy(extra)
}

trait InformationBottleneckParams extends Params {
  final val k = new IntParam(this, "k", "number of compressed states T", ParamValidators.gt(1))
  final val beta = new DoubleParam(this, "beta",
    "relevance-compression trade-off (higher = preserve more I(T;Y))",
    ParamValidators.gt(0))
  final val featuresCol = new Param[String](this, "featuresCol", "X column (vector/array hashed to bins; discrete kept as-is)")
  final val relevanceCol = new Param[String](this, "relevanceCol", "relevance variable Y")
  final val predictionCol = new Param[String](this, "predictionCol", "argmax_t p(t|x) output")
  final val probabilityCol = new Param[String](this, "probabilityCol", "p(t|x) vector output")
  final val numBins = new IntParam(this, "numBins",
    "bins per side for hash discretization of continuous X", ParamValidators.gt(1))
  final val smoothing = new DoubleParam(this, "smoothing", "additive smoothing for p(y|x)",
    ParamValidators.gt(0))
  final val maxIter = new IntParam(this, "maxIter", "Blahut-Arimoto iterations", ParamValidators.gtEq(1))
  final val tol = new DoubleParam(this, "tol", "max-change convergence threshold", ParamValidators.gtEq(0))
  final val seed = new LongParam(this, "seed", "init seed")

  setDefault(k -> 2, beta -> 5.0, featuresCol -> "features", relevanceCol -> "label",
    predictionCol -> "prediction", probabilityCol -> "probability",
    numBins -> 10, smoothing -> 1e-10, maxIter -> 100, tol -> 1e-6, seed -> 42L)
}

object InformationBottleneck extends org.apache.spark.ml.util.DefaultParamsReadable[InformationBottleneck] {
  /** X discretization as a Catalyst expression: continuous (array/vector)
    * features hash-bin via xxhash64 (reference hashes on the driver,
    * ml/InformationBottleneck.scala:252-258); discrete columns pass
    * through. Keyed as string for uniform model lookup.
    */
  def xKeyExpr(df: DataFrame, featuresCol: String, numBins: Int): Column = {
    df.schema(featuresCol).dataType match {
      case t if t == org.apache.spark.ml.linalg.SQLDataTypes.VectorType =>
        pmod(xxhash64(org.apache.spark.ml.functions.vector_to_array(col(featuresCol))),
          lit(numBins.toLong * numBins)).cast("string")
      case _: ArrayType =>
        pmod(xxhash64(col(featuresCol)), lit(numBins.toLong * numBins)).cast("string")
      case _ => col(featuresCol).cast("string")
    }
  }
}

/** Fitted IB model: the compressed encoder p(t|x) over the observed X
  * support. transform() appends the hard assignment (argmax_t) and the
  * soft p(t|x) vector; unseen x-states fall back to the prior p(t).
  */
class InformationBottleneckModel(
    override val uid: String,
    val xKeys: Array[String],
    val pTgivenX: Array[Array[Double]],
    val pT: Array[Double],
    val pYgivenT: Array[Array[Double]])
    extends Model[InformationBottleneckModel] with InformationBottleneckParams
    with org.apache.spark.ml.util.MLWritable {

  override def write: org.apache.spark.ml.util.MLWriter = new InformationBottleneckModel.Writer(this)

  private[graft] var compressionInfo: Double = Double.NaN // I(X;T)
  private[graft] var relevanceInfo: Double = Double.NaN // I(T;Y)
  private[graft] var iterationsRun: Int = 0
  private[graft] var hasConverged: Boolean = false
  private[graft] var elapsedMillis: Long = 0L

  def getCompressionInfo: Double = compressionInfo
  def getRelevanceInfo: Double = relevanceInfo
  def iterations: Int = iterationsRun
  def converged: Boolean = hasConverged
  def numClusters: Int = pT.length

  override def transform(dataset: Dataset[_]): DataFrame = {
    val df = dataset.toDF()
    val xKey = InformationBottleneck.xKeyExpr(df, $(featuresCol), $(numBins))
    val sc = df.sparkSession.sparkContext
    val lookup = xKeys.zip(pTgivenX).toMap
    val bcL = sc.broadcast(lookup)
    val bcPrior = sc.broadcast(pT)
    val probUdf = udf { (key: String) =>
      bcL.value.getOrElse(key, bcPrior.value).toSeq
    }
    val predUdf = udf { (key: String) =>
      val p = bcL.value.getOrElse(key, bcPrior.value)
      var best = 0; var bp = p(0); var t = 1
      while (t < p.length) { if (p(t) > bp) { bp = p(t); best = t }; t += 1 }
      best
    }
    df.withColumn($(predictionCol), predUdf(xKey))
      .withColumn($(probabilityCol), probUdf(xKey))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), IntegerType, nullable = false)
      .add($(probabilityCol), ArrayType(DoubleType), nullable = false)

  override def copy(extra: ParamMap): InformationBottleneckModel = {
    val m = new InformationBottleneckModel(uid, xKeys, pTgivenX, pT, pYgivenT)
    m.compressionInfo = compressionInfo
    m.relevanceInfo = relevanceInfo
    m.iterationsRun = iterationsRun
    m.hasConverged = hasConverged
    copyValues(m, extra).setParent(parent)
  }
}

object InformationBottleneckModel
    extends org.apache.spark.ml.util.MLReadable[InformationBottleneckModel] {
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.json4s._
  import org.json4s.JsonDSL._

  private[graft] class Writer(m: InformationBottleneckModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      ModelIO.writeMeta(path, sparkSession, m,
        ("xKeys" -> m.xKeys.toSeq) ~ ("pT" -> m.pT.toSeq) ~
          ("compressionInfo" -> m.getCompressionInfo) ~
          ("relevanceInfo" -> m.getRelevanceInfo),
        Seq("pTgivenX", "pYgivenT"))
      ModelIO.writeMatrix(path, "pTgivenX", sparkSession, m.pTgivenX)
      ModelIO.writeMatrix(path, "pYgivenT", sparkSession, m.pYgivenT)
    }
  }

  override def read: MLReader[InformationBottleneckModel] =
    new MLReader[InformationBottleneckModel] {
      override def load(path: String): InformationBottleneckModel = {
        implicit val fmt: Formats = DefaultFormats
        val (uid, paramMap, extra) = ModelIO.extract(ModelIO.readMeta(path, sparkSession))
        val m = new InformationBottleneckModel(uid,
          (extra \ "xKeys").extract[Seq[String]].toArray,
          ModelIO.readMatrix(path, "pTgivenX", sparkSession),
          (extra \ "pT").extract[Seq[Double]].toArray,
          ModelIO.readMatrix(path, "pYgivenT", sparkSession))
        m.compressionInfo = (extra \ "compressionInfo").extract[Double]
        m.relevanceInfo = (extra \ "relevanceInfo").extract[Double]
        GeneralizedKMeansModel.restoreParams(m, paramMap)
        m
      }
    }
}
