package graft.clustering

import graft.kernels.{BregmanKernel, KernelFactory, SquaredEuclideanKernel}
import org.apache.spark.ml.Estimator
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.types.StructType

/** One merge in the dendrogram: clusters `a` and `b` (ids in the 2n-1
  * node numbering: leaves 0..n-1, internal nodes n..2n-2) joined at
  * `distance` into a cluster of `size` points.
  */
case class MergeStep(a: Int, b: Int, distance: Double, size: Int)

/** Hierarchical agglomerative clustering under a Bregman divergence with
  * single / complete / average / ward linkage and a full dendrogram.
  * (reference: ml/AgglomerativeBregman.scala:155-245 — same surface:
  * numClusters OR distanceThreshold stop, 4 linkages, merge history.)
  *
  * Driver-local BY NATURE (O(n^2) distances; the reference warns at
  * 10k points, we refuse above `maxDriverPoints` like KMedoids) — the
  * scale path for hierarchical structure is BisectingKMeans, which is
  * distributed top-down. Linkage updates use the Lance-Williams
  * recurrences on a mutable distance matrix: O(n^2) memory, O(n^2) work
  * per merge worst case.
  *
  * Asymmetric divergences (KL, IS) are symmetrized for linkage:
  * d(i,j) = (D(x_i,x_j) + D(x_j,x_i)) / 2 — linkage needs a symmetric
  * dissimilarity to be well-defined.
  */
class AgglomerativeBregman(override val uid: String)
    extends Estimator[GeneralizedKMeansModel] with GeneralizedKMeansParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("agglomerative"))

  final val numClusters = new IntParam(this, "numClusters",
    "target cluster count", ParamValidators.gtEq(1))
  def getNumClusters: Int = $(numClusters)
  def setNumClusters(v: Int): this.type = set(numClusters, v)

  final val distanceThreshold = new DoubleParam(this, "distanceThreshold",
    "stop merging above this linkage distance (0 = ignore)", ParamValidators.gtEq(0))
  def setDistanceThreshold(v: Double): this.type = set(distanceThreshold, v)

  final val linkage = new Param[String](this, "linkage",
    "single|complete|average|ward",
    ParamValidators.inArray(Array("single", "complete", "average", "ward")))
  def getLinkage: String = $(linkage)
  def setLinkage(v: String): this.type = set(linkage, v)

  final val maxDriverPoints = new IntParam(this, "maxDriverPoints",
    "row cap (O(n^2) distance matrix)", ParamValidators.gt(0))
  def setMaxDriverPoints(v: Int): this.type = set(maxDriverPoints, v)

  setDefault(numClusters -> 2, distanceThreshold -> 0.0, linkage -> "average",
    maxDriverPoints -> 10000)

  def setDivergence(v: String): this.type = set(divergence, v)
  def setSmoothing(v: Double): this.type = set(smoothing, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def fit(dataset: Dataset[_]): AgglomerativeBregmanModel = {
    val t0 = System.currentTimeMillis()
    val df0 = dataset.toDF()
    transformSchema(df0.schema)
    val (dfArr, arrCol) = FeatureCols.asArray(df0, $(featuresCol))
    val rows = dfArr.select(org.apache.spark.sql.functions.col(arrCol)).collect()
    val n = rows.length
    require(n <= $(maxDriverPoints),
      s"agglomerative clustering is O(n^2); n=$n exceeds maxDriverPoints=${$(maxDriverPoints)}. " +
        "Use BisectingKMeans for distributed hierarchical structure.")
    require(n >= 1, "empty input")
    val pts = rows.map(_.getSeq[Double](0).toArray)
    val kern = kernel
    val dim = pts.headOption.map(_.length).getOrElse(0)

    val (assign, dendro) = AgglomerativeBregman.run(
      pts, kern, $(linkage), $(numClusters), $(distanceThreshold))

    // centers: per-cluster Bregman centroid (invGrad of mean gradient)
    val ids = assign.distinct.sorted
    val remap = ids.zipWithIndex.toMap
    val centers = ids.map { cid =>
      val members = pts.indices.filter(assign(_) == cid)
      val gsum = new Array[Double](dim)
      members.foreach { p =>
        val g = kern.grad(pts(p))
        var j = 0
        while (j < dim) { gsum(j) += g(j); j += 1 }
      }
      var j = 0
      while (j < dim) { gsum(j) /= members.size; j += 1 }
      kern.invGrad(gsum)
    }

    val model = new AgglomerativeBregmanModel(uid, centers, dendro,
      assign.map(remap), $(divergence), $(smoothing))
    copyValues(model.setParent(this))
    model.trainingSummary = Some(TrainingSummary(
      "AgglomerativeBregman", $(numClusters), centers.length, dim, n,
      dendro.length, converged = true, dendro.map(_.distance).toSeq, Nil,
      s"${kern.name}(${$(linkage)})", System.currentTimeMillis() - t0))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
  override def copy(extra: ParamMap): AgglomerativeBregman = defaultCopy(extra)
}

object AgglomerativeBregman extends org.apache.spark.ml.util.DefaultParamsReadable[AgglomerativeBregman] {

  /** Driver-local agglomeration. Returns (leaf assignments as dendrogram
    * node ids, merge history). Node ids: leaves 0..n-1, merge i creates
    * node n+i.
    */
  def run(
      pts: Array[Array[Double]],
      kern: BregmanKernel,
      linkage: String,
      numClusters: Int,
      distanceThreshold: Double): (Array[Int], Array[MergeStep]) = {
    val n = pts.length
    val targetK = math.max(1, math.min(numClusters, n))
    val symmetric = kern.isInstanceOf[SquaredEuclideanKernel] ||
      kern.isInstanceOf[graft.kernels.L1Kernel] ||
      kern.isInstanceOf[graft.kernels.SphericalKernel]
    def dist0(i: Int, j: Int): Double =
      if (symmetric) kern.divergence(pts(i), pts(j))
      else 0.5 * (kern.divergence(pts(i), pts(j)) + kern.divergence(pts(j), pts(i)))

    // active cluster state
    val active = Array.fill(n)(true)
    val size = Array.fill(n)(1)
    val nodeId = Array.tabulate(n)(identity) // dendrogram id of each slot
    val d = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { val v = dist0(i, j); d(i)(j) = v; d(j)(i) = v; j += 1 }
      i += 1
    }
    val merges = scala.collection.mutable.ArrayBuffer[MergeStep]()
    var remaining = n
    var nextNode = n
    var stop = false

    while (remaining > targetK && !stop) {
      // find the closest active pair
      var bi = -1; var bj = -1; var bd = Double.MaxValue
      i = 0
      while (i < n) {
        if (active(i)) {
          var j = i + 1
          while (j < n) {
            if (active(j) && d(i)(j) < bd) { bd = d(i)(j); bi = i; bj = j }
            j += 1
          }
        }
        i += 1
      }
      if (distanceThreshold > 0 && bd > distanceThreshold) {
        stop = true
      } else {
        // Lance-Williams update: merged cluster lives in slot bi
        val ni = size(bi).toDouble
        val nj = size(bj).toDouble
        var k = 0
        while (k < n) {
          if (active(k) && k != bi && k != bj) {
            val dik = d(bi)(k)
            val djk = d(bj)(k)
            val dn = linkage match {
              case "single"   => math.min(dik, djk)
              case "complete" => math.max(dik, djk)
              case "average"  => (ni * dik + nj * djk) / (ni + nj)
              case "ward" =>
                val nk = size(k).toDouble
                ((ni + nk) * dik + (nj + nk) * djk - nk * d(bi)(bj)) / (ni + nj + nk)
            }
            d(bi)(k) = dn; d(k)(bi) = dn
          }
          k += 1
        }
        merges += MergeStep(nodeId(bi), nodeId(bj), bd, size(bi) + size(bj))
        size(bi) += size(bj)
        nodeId(bi) = nextNode
        nextNode += 1
        active(bj) = false
        remaining -= 1
      }
    }

    // leaf -> surviving slot assignment via union of merge history: walk
    // slots instead — each leaf's slot chain collapsed into whichever slot
    // absorbed it. Rebuild by replaying merges on a union-find.
    val parent = Array.tabulate(2 * n - 1)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    var m = 0
    val mergedNode = Array.fill(merges.length)(0)
    while (m < merges.length) {
      val node = n + m
      mergedNode(m) = node
      parent(find(merges(m).a)) = node
      parent(find(merges(m).b)) = node
      m += 1
    }
    val assign = Array.tabulate(n)(find)
    (assign, merges.toArray)
  }
}

/** Fitted agglomerative model: inherits the standard nearest-center
  * transform (new rows score against the per-cluster Bregman centroids);
  * exposes the dendrogram and the training assignments.
  */
class AgglomerativeBregmanModel(
    uid: String,
    centers: Array[Array[Double]],
    val dendrogram: Array[MergeStep],
    val trainingAssignments: Array[Int],
    divergenceName: String,
    smoothingValue: Double)
    extends GeneralizedKMeansModel(uid, centers, divergenceName, smoothingValue) {

  override def write: org.apache.spark.ml.util.MLWriter = new AgglomerativeBregmanModel.Writer(this)

  /** Merge distances in merge order (monotone for single/complete/average
    * on metric-ish data).
    */
  def mergeDistances: Array[Double] = dendrogram.map(_.distance)
}

object AgglomerativeBregmanModel extends org.apache.spark.ml.util.MLReadable[AgglomerativeBregmanModel] {
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.json4s._
  import org.json4s.JsonDSL._

  private[graft] class Writer(m: AgglomerativeBregmanModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      ModelIO.writeMeta(path, sparkSession, m,
        ("divergence" -> m.divergenceName) ~ ("smoothing" -> m.smoothingValue) ~
          ("assignments" -> m.trainingAssignments.toSeq),
        Seq("centers", "dendrogram"))
      ModelIO.writeMatrix(path, "centers", sparkSession, m.clusterCenters)
      ModelIO.writeMatrix(path, "dendrogram", sparkSession,
        m.dendrogram.map(s => Array(s.a.toDouble, s.b.toDouble, s.distance, s.size.toDouble)))
    }
  }

  override def read: MLReader[AgglomerativeBregmanModel] = new MLReader[AgglomerativeBregmanModel] {
    override def load(path: String): AgglomerativeBregmanModel = {
      implicit val fmt: Formats = DefaultFormats
      val (uid, paramMap, extra) = ModelIO.extract(ModelIO.readMeta(path, sparkSession))
      val dendro = ModelIO.readMatrix(path, "dendrogram", sparkSession)
        .map(r => MergeStep(r(0).toInt, r(1).toInt, r(2), r(3).toInt))
      val m = new AgglomerativeBregmanModel(uid,
        ModelIO.readMatrix(path, "centers", sparkSession),
        dendro,
        (extra \ "assignments").extract[Seq[Int]].toArray,
        (extra \ "divergence").extract[String],
        (extra \ "smoothing").extract[Double])
      GeneralizedKMeansModel.restoreParams(m, paramMap)
      m
    }
  }
}
