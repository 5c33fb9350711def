package graft.clustering

import graft.kernels.MercerKernel
import org.apache.spark.ml.Estimator
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Kernel k-means: cluster in the Mercer kernel's implicit feature space.
  * (reference: ml/KernelKMeans.scala:156-270 — exact Gram-based algorithm;
  * the reference collects the data and builds the n x n Gram for every n.)
  *
  * Two modes:
  *  - `exact` (n <= maxDriverPoints): the classical Gram iteration on the
  *    driver — ||phi(x)-mu_C||^2 = K_xx - 2/|C| sum_{j in C} K_xj
  *    + 1/|C|^2 sum_{j,l in C} K_jl.
  *  - `nystrom` (default, the 100-TB path): m landmark rows are sampled,
  *    K_mm is eigendecomposed ONCE on the driver (m x m), and every row is
  *    mapped DISTRIBUTED to the m-dim Nystrom embedding
  *    phi(x) = K_mm^{-1/2} k(x, landmarks); ordinary distributed k-means
  *    runs on that embedding. The n x n Gram is never materialized.
  *    (SURVEY §1.1 graphs row: Nystrom approximation for n > driver size.)
  */
class KernelKMeans(override val uid: String)
    extends Estimator[GeneralizedKMeansModel] with GeneralizedKMeansParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("kernelkmeans"))

  final val kernelType = new Param[String](this, "kernelType",
    "linear|polynomial|rbf", ParamValidators.inArray(Array("linear", "polynomial", "rbf")))
  def setKernelType(v: String): this.type = set(kernelType, v)

  final val gamma = new DoubleParam(this, "gamma", "RBF/poly gamma", ParamValidators.gt(0))
  def setGamma(v: Double): this.type = set(gamma, v)

  final val degree = new IntParam(this, "degree", "polynomial degree", ParamValidators.gtEq(1))
  def setDegree(v: Int): this.type = set(degree, v)

  final val mode = new Param[String](this, "mode",
    "exact|nystrom", ParamValidators.inArray(Array("exact", "nystrom")))
  def setMode(v: String): this.type = set(mode, v)

  final val numLandmarks = new IntParam(this, "numLandmarks",
    "Nystrom landmark count", ParamValidators.gt(1))
  def setNumLandmarks(v: Int): this.type = set(numLandmarks, v)

  final val maxDriverPoints = new IntParam(this, "maxDriverPoints",
    "exact-mode row cap (Gram is n^2)", ParamValidators.gt(0))

  setDefault(kernelType -> "rbf", gamma -> 1.0, degree -> 3, mode -> "nystrom",
    numLandmarks -> 128, maxDriverPoints -> 5000)

  def setK(v: Int): this.type = set(k, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  /** Warm start for exact mode: row indices (into the collected input
    * order) used as the k initial singleton seeds, bypassing the
    * kernel-space k-means++ sampling. Deterministic-fit counterpart of
    * setInitialCenters on the centroid estimators; not persisted.
    */
  @transient private var initialSeedIndicesOpt: Option[Array[Int]] = None
  def setInitialSeedIndices(idx: Array[Int]): this.type = {
    initialSeedIndicesOpt = Option(idx); this
  }

  private def mercer: MercerKernel = MercerKernel($(kernelType), $(gamma), $(degree))

  override def fit(dataset: Dataset[_]): GeneralizedKMeansModel = {
    val t0 = System.currentTimeMillis()
    val df0 = dataset.toDF()
    transformSchema(df0.schema)
    val (dfArr, arrCol) = FeatureCols.asArray(df0, $(featuresCol))
    $(mode) match {
      case "exact"   => fitExact(dfArr, arrCol, t0)
      case "nystrom" => fitNystrom(dfArr, arrCol, t0)
    }
  }

  /** Nystrom: embed distributed, then delegate to the shared engine. The
    * returned model's centers live in EMBEDDING space; `embed` reproduces
    * the mapping for scoring new data.
    */
  private def fitNystrom(df: DataFrame, arrCol: String, t0: Long): GeneralizedKMeansModel = {
    val data = df.select(col(arrCol)).persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    val m = math.min($(numLandmarks).toLong, n).toInt
    val landmarks = CenterInit.samplePoints(data, arrCol, m, $(seed), n).toArray
    val kern = mercer

    // K_mm^{-1/2} via symmetric eigendecomposition (m x m driver math)
    val kmm = kern.gram(landmarks)
    val eig = breeze.linalg.eigSym(breeze.linalg.DenseMatrix(kmm.map(_.toSeq): _*))
    val evals = eig.eigenvalues.toArray
    val evecs = eig.eigenvectors // columns are eigenvectors
    val invSqrt = Array.ofDim[Double](m, m) // W = V diag(1/sqrt(l)) V^T
    var a = 0
    while (a < m) {
      var b = 0
      while (b < m) {
        var s = 0.0
        var e = 0
        while (e < m) {
          val l = evals(e)
          if (l > 1e-10) s += evecs(a, e) * evecs(b, e) / math.sqrt(l)
          e += 1
        }
        invSqrt(a)(b) = s
        b += 1
      }
      a += 1
    }

    val sc = data.sparkSession.sparkContext
    val bcL = sc.broadcast(landmarks)
    val bcW = sc.broadcast(invSqrt)
    val bcK = sc.broadcast(kern)
    val embedUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      val ls = bcL.value
      val kx = new Array[Double](ls.length)
      var i = 0
      while (i < ls.length) { kx(i) = bcK.value(x, ls(i)); i += 1 }
      val w = bcW.value
      val out = new Array[Double](ls.length)
      i = 0
      while (i < ls.length) {
        var s = 0.0
        var j = 0
        while (j < ls.length) { s += w(i)(j) * kx(j); j += 1 }
        out(i) = s
        i += 1
      }
      out
    }
    // Materialize the embedding ONCE (the m^2-per-row UDF is the expensive
    // projection) and tell the inner fit to reuse it: n is already counted
    // and the embedding is internally produced (finite by construction), so
    // the sub-fit's own persist/validation-sample/count jobs are pure waste.
    val embedded = data.withColumn("__phi", embedUdf(col(arrCol))).select(col("__phi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gk = new GeneralizedKMeans()
      .setK($(k)).setSeed($(seed)).setMaxIter($(maxIter)).setTol($(tol))
      .setFeaturesCol("__phi")
    gk.reuseCachedInput = true
    gk.knownN = Some(n)
    val inner = gk.fit(embedded)
    embedded.unpersist()
    data.unpersist()

    val model = new KernelKMeansModel(uid, inner.clusterCenters,
      landmarks, invSqrt, $(kernelType), $(gamma), $(degree))
    copyValues(model.setParent(this))
    model.trainingSummary = inner.trainingSummary.map(_.copy(
      algorithm = "KernelKMeans", elapsedMillis = System.currentTimeMillis() - t0))
    model
  }

  /** Exact Gram-based kernel k-means (driver, n capped). */
  private def fitExact(df: DataFrame, arrCol: String, t0: Long): GeneralizedKMeansModel = {
    val rows = df.select(col(arrCol)).collect()
    val n = rows.length
    require(n <= $(maxDriverPoints),
      s"exact kernel k-means builds an n^2 Gram; n=$n exceeds ${$(maxDriverPoints)}. Use mode=nystrom.")
    val pts = rows.map(_.getSeq[Double](0).toArray)
    val kern = mercer
    val g = kern.gram(pts)
    val rnd = new java.util.Random($(seed))
    val kk = $(k)
    // kernel-space k-means++ seeding (random-partition init collapses
    // well-separated clusters onto near-identical means): D^2 sampling on
    // the induced distance d^2(i,j) = g_ii - 2 g_ij + g_jj
    val seeds = initialSeedIndicesOpt match {
      case Some(idx) =>
        require(idx.length == kk, s"${idx.length} seed indices provided but k=$kk")
        require(idx.forall(i => i >= 0 && i < n), s"seed index out of range [0, $n)")
        require(idx.distinct.length == idx.length,
          s"duplicate seed indices: coincident seeds collapse into empty clusters mid-fit")
        scala.collection.mutable.ArrayBuffer[Int](idx: _*)
      case None =>
        val s0 = scala.collection.mutable.ArrayBuffer[Int](rnd.nextInt(n))
        val minD = Array.tabulate(n)(i => g(i)(i) - 2 * g(i)(s0(0)) + g(s0(0))(s0(0)))
        while (s0.length < kk) {
          val total = minD.sum
          var pick = 0
          if (total > 0) {
            var r = rnd.nextDouble() * total
            var i = 0
            while (i < n - 1 && r > minD(i)) { r -= minD(i); i += 1 }
            pick = i
          } else pick = rnd.nextInt(n)
          s0 += pick
          var i = 0
          while (i < n) {
            val d = g(i)(i) - 2 * g(i)(pick) + g(pick)(pick)
            if (d < minD(i)) minD(i) = d
            i += 1
          }
        }
        s0
    }
    val assign = Array.tabulate(n) { i =>
      var best = 0
      var bd = Double.MaxValue
      var s = 0
      while (s < seeds.length) {
        val d = g(i)(i) - 2 * g(i)(seeds(s)) + g(seeds(s))(seeds(s))
        if (d < bd) { bd = d; best = s }
        s += 1
      }
      best
    }
    var iter = 0
    var changed = true
    while (iter < $(maxIter) && changed) {
      changed = false
      val members = Array.fill(kk)(scala.collection.mutable.ArrayBuffer[Int]())
      var i = 0
      while (i < n) { members(assign(i)) += i; i += 1 }
      val selfTerm = Array.tabulate(kk) { c =>
        val ms = members(c)
        if (ms.isEmpty) 0.0
        else {
          var s = 0.0
          ms.foreach(j => ms.foreach(l => s += g(j)(l)))
          s / (ms.length.toDouble * ms.length)
        }
      }
      i = 0
      while (i < n) {
        var best = assign(i)
        var bd = Double.MaxValue
        var c = 0
        while (c < kk) {
          val ms = members(c)
          if (ms.nonEmpty) {
            var cross = 0.0
            ms.foreach(j => cross += g(i)(j))
            val d = g(i)(i) - 2.0 * cross / ms.length + selfTerm(c)
            if (d < bd) { bd = d; best = c }
          }
          c += 1
        }
        if (best != assign(i)) { assign(i) = best; changed = true }
        i += 1
      }
      iter += 1
    }
    // the feature-space centroids have no finite pre-image; the exact
    // model keeps the (small, capped) support points + assignments and
    // scores new rows by kernel distance to each cluster:
    // d^2(phi(x), mu_C) = K(x,x) - 2/|C| sum_{j in C} K(x, x_j) + selfTerm(C)
    val dims = pts.headOption.map(_.length).getOrElse(0)
    val centers = (0 until kk).map { c =>
      val ms = pts.indices.filter(assign(_) == c)
      val mean = new Array[Double](dims)
      ms.foreach { j => var t = 0; while (t < dims) { mean(t) += pts(j)(t); t += 1 } }
      if (ms.nonEmpty) { var t = 0; while (t < dims) { mean(t) /= ms.length; t += 1 } }
      mean
    }.toArray
    val model = new ExactKernelKMeansModel(uid, centers, pts, assign,
      $(kernelType), $(gamma), $(degree))
    copyValues(model.setParent(this))
    model.trainingSummary = Some(TrainingSummary(
      "KernelKMeans", kk, centers.length, dims, n, iter,
      converged = iter < $(maxIter), Nil, Nil, kern.name,
      System.currentTimeMillis() - t0))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): KernelKMeans = defaultCopy(extra)
}

/** Nystrom kernel k-means model: embeds rows with the stored landmarks
  * before scoring against the embedding-space centers.
  */
class KernelKMeansModel(
    uid: String,
    embeddedCenters: Array[Array[Double]],
    val landmarks: Array[Array[Double]],
    val whitener: Array[Array[Double]],
    val kernelTypeName: String,
    val gammaValue: Double,
    val degreeValue: Int)
    extends GeneralizedKMeansModel(uid, embeddedCenters, "squaredEuclidean", 1e-10) {

  override def write: org.apache.spark.ml.util.MLWriter = new KernelKMeansModel.Writer(this)

  private def kern: MercerKernel = MercerKernel(kernelTypeName, gammaValue, degreeValue)

  /** Map a frame's features to the Nystrom embedding column. */
  def embed(df: DataFrame, featuresCol: String, outCol: String): DataFrame = {
    val (arr, arrCol) = FeatureCols.asArray(df, featuresCol)
    val sc = df.sparkSession.sparkContext
    val bcL = sc.broadcast(landmarks)
    val bcW = sc.broadcast(whitener)
    val bcK = sc.broadcast(kern)
    val u = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      val ls = bcL.value
      val kx = new Array[Double](ls.length)
      var i = 0
      while (i < ls.length) { kx(i) = bcK.value(x, ls(i)); i += 1 }
      val w = bcW.value
      val out = new Array[Double](ls.length)
      i = 0
      while (i < ls.length) {
        var s = 0.0
        var j = 0
        while (j < ls.length) { s += w(i)(j) * kx(j); j += 1 }
        out(i) = s
        i += 1
      }
      out
    }
    val out = arr.withColumn(outCol, u(col(arrCol)))
    if (arrCol != featuresCol) out.drop(arrCol) else out
  }

  override def transform(dataset: Dataset[_]): DataFrame = {
    val tmp = s"__${uid}_phi"
    val embedded = embed(dataset.toDF(), $(featuresCol), tmp)
    val assigned = Assignment.assign(embedded, tmp, kernel0, clusterCenters,
      getAssignmentStrategy, s"__${uid}_c", s"__${uid}_d")
    assigned
      .withColumn($(predictionCol), col(s"__${uid}_c"))
      .drop(tmp, s"__${uid}_c", s"__${uid}_d")
  }

  private def kernel0 = new graft.kernels.SquaredEuclideanKernel
}

/** Exact kernel k-means model: support points + training assignments are
  * broadcast, and a new row x is scored by feature-space distance
  * K(x,x) - 2/|C| sum_{j in C} K(x, x_j) + selfTerm(C) — O(n_support * d)
  * per row. Exact mode is gated to driver-size support sets, so the
  * broadcast is small by construction; the `clusterCenters` field holds
  * pre-image means for reporting only.
  */
class ExactKernelKMeansModel(
    uid: String,
    preImageMeans: Array[Array[Double]],
    val supports: Array[Array[Double]],
    val assignments: Array[Int],
    val kernelTypeName: String,
    val gammaValue: Double,
    val degreeValue: Int)
    extends GeneralizedKMeansModel(uid, preImageMeans, "squaredEuclidean", 1e-10) {

  override def write: org.apache.spark.ml.util.MLWriter = new ExactKernelKMeansModel.Writer(this)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val (df, arrCol) = FeatureCols.asArray(dataset.toDF(), $(featuresCol))
    val sc = df.sparkSession.sparkContext
    val kern = MercerKernel(kernelTypeName, gammaValue, degreeValue)
    val k = preImageMeans.length
    // per-cluster member lists + self terms (driver, support-size work)
    val members = Array.fill(k)(scala.collection.mutable.ArrayBuffer[Int]())
    assignments.zipWithIndex.foreach { case (c, i) => members(c) += i }
    val selfTerm = Array.tabulate(k) { c =>
      val ms = members(c)
      if (ms.isEmpty) 0.0
      else {
        var s = 0.0
        ms.foreach(j => ms.foreach(l => s += kern(supports(j), supports(l))))
        s / (ms.length.toDouble * ms.length)
      }
    }
    val bcS = sc.broadcast(supports)
    val bcM = sc.broadcast(members.map(_.toArray))
    val bcT = sc.broadcast(selfTerm)
    val bcK = sc.broadcast(kern)
    val u = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      val kxx = bcK.value(x, x)
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < bcM.value.length) {
        val ms = bcM.value(c)
        if (ms.nonEmpty) {
          var cross = 0.0
          var i = 0
          while (i < ms.length) { cross += bcK.value(x, bcS.value(ms(i))); i += 1 }
          val d = kxx - 2.0 * cross / ms.length + bcT.value(c)
          if (d < bd) { bd = d; best = c }
        }
        c += 1
      }
      best
    }
    val out = df.withColumn($(predictionCol), u(col(arrCol)))
    if (arrCol != $(featuresCol)) out.drop(arrCol) else out
  }
}

object KernelKMeansModel extends org.apache.spark.ml.util.MLReadable[KernelKMeansModel] {
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.json4s._
  import org.json4s.JsonDSL._

  private[graft] class Writer(m: KernelKMeansModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      ModelIO.writeMeta(path, sparkSession, m,
        ("kernelType" -> m.kernelTypeName) ~ ("gamma" -> m.gammaValue) ~
          ("degree" -> m.degreeValue),
        Seq("centers", "landmarks", "whitener"))
      ModelIO.writeMatrix(path, "centers", sparkSession, m.clusterCenters)
      ModelIO.writeMatrix(path, "landmarks", sparkSession, m.landmarks)
      ModelIO.writeMatrix(path, "whitener", sparkSession, m.whitener)
    }
  }

  override def read: MLReader[KernelKMeansModel] = new MLReader[KernelKMeansModel] {
    override def load(path: String): KernelKMeansModel = {
      implicit val fmt: Formats = DefaultFormats
      val (uid, paramMap, extra) = ModelIO.extract(ModelIO.readMeta(path, sparkSession))
      val m = new KernelKMeansModel(uid,
        ModelIO.readMatrix(path, "centers", sparkSession),
        ModelIO.readMatrix(path, "landmarks", sparkSession),
        ModelIO.readMatrix(path, "whitener", sparkSession),
        (extra \ "kernelType").extract[String],
        (extra \ "gamma").extract[Double],
        (extra \ "degree").extract[Int])
      GeneralizedKMeansModel.restoreParams(m, paramMap)
      m
    }
  }
}

object ExactKernelKMeansModel extends org.apache.spark.ml.util.MLReadable[ExactKernelKMeansModel] {
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.json4s._
  import org.json4s.JsonDSL._

  private[graft] class Writer(m: ExactKernelKMeansModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      ModelIO.writeMeta(path, sparkSession, m,
        ("kernelType" -> m.kernelTypeName) ~ ("gamma" -> m.gammaValue) ~
          ("degree" -> m.degreeValue) ~
          ("assignments" -> m.assignments.toSeq),
        Seq("centers", "supports"))
      ModelIO.writeMatrix(path, "centers", sparkSession, m.clusterCenters)
      ModelIO.writeMatrix(path, "supports", sparkSession, m.supports)
    }
  }

  override def read: MLReader[ExactKernelKMeansModel] = new MLReader[ExactKernelKMeansModel] {
    override def load(path: String): ExactKernelKMeansModel = {
      implicit val fmt: Formats = DefaultFormats
      val (uid, paramMap, extra) = ModelIO.extract(ModelIO.readMeta(path, sparkSession))
      val m = new ExactKernelKMeansModel(uid,
        ModelIO.readMatrix(path, "centers", sparkSession),
        ModelIO.readMatrix(path, "supports", sparkSession),
        (extra \ "assignments").extract[Seq[Int]].toArray,
        (extra \ "kernelType").extract[String],
        (extra \ "gamma").extract[Double],
        (extra \ "degree").extract[Int])
      GeneralizedKMeansModel.restoreParams(m, paramMap)
      m
    }
  }
}

object KernelKMeans extends org.apache.spark.ml.util.DefaultParamsReadable[KernelKMeans]
