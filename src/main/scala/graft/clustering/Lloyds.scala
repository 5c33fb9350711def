package graft.clustering

import graft.kernels._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Configuration for one Lloyd's run. The single-loop-with-pluggable-
  * strategies design mirrors the reference architecture
  * (reference: ARCHITECTURE.md:3-50, df/LloydsIterator.scala:70-110) but all
  * per-iteration dataflow is a single DataFrame aggregation — no RDD hops,
  * no per-iteration collect beyond the k x d center rows.
  */
case class LloydsConfig(
    k: Int,
    kernel: BregmanKernel,
    maxIter: Int = 20,
    tol: Double = 1e-4,
    seed: Long = 42L,
    initMode: String = "k-means||", // or "random"
    initSteps: Int = 2,
    assignmentStrategy: String = "auto", // auto | broadcast | expression
    emptyClusterStrategy: String = "reseedRandom", // or "drop"
    checkpointInterval: Int = 10,
    featuresCol: String = "features",
    weightCol: Option[String] = None)

case class LloydsResult(
    centers: Array[Array[Double]],
    iterations: Int,
    converged: Boolean,
    distortionHistory: Seq[Double],
    movementHistory: Seq[Double],
    numPoints: Long)

/** Assignment: append a `cluster` (argmin-divergence index) and `dist`
  * (min divergence) column for a broadcast set of centers.
  *
  * Two physical strategies:
  *  - expression: for kernels with a pure-Catalyst distance and modest k*d,
  *    build array(struct(dist_i, i)) and take array_min — struct ordering
  *    compares dist first then index, which reproduces the reference's
  *    first-min tie-break (reference: df/strategies/impl/
  *    BroadcastUDFAssignment.scala:74-90) entirely inside codegen.
  *  - broadcast closure: a scala UDF looping over a Broadcast'd k x d array;
  *    O(n*k*d) with no shuffle (reference: BroadcastUDFAssignment.scala:31-93).
  */
object Assignment {

  /** Max k*d for the expression path. Above this the generated expression
    * falls out of WholeStageCodegen (observed at k=10 x d=64 already) and
    * the broadcast-closure path wins.
    */
  val ExpressionMaxElems = 512

  def assign(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]],
      strategy: String = "auto"): DataFrame = {
    val useExpr = strategy match {
      case "expression" => true
      case "broadcast"  => false
      case _ =>
        kernel.supportsExpressionOptimization &&
          centers.length.toLong * centers.headOption.map(_.length).getOrElse(0) <= ExpressionMaxElems
    }
    if (useExpr && centers.forall(c => kernel.distExpr(col(featuresCol), c).isDefined))
      assignExpr(df, featuresCol, kernel, centers)
    else assignBroadcast(df, featuresCol, kernel, centers)
  }

  def assignExpr(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]]): DataFrame = {
    val f = col(featuresCol)
    val candidates = array(centers.zipWithIndex.map { case (c, i) =>
      struct(kernel.distExpr(f, c).get.as("dist"), lit(i).as("cluster"))
    }.toIndexedSeq: _*)
    val best = array_min(candidates)
    df.withColumn("__best", best)
      .withColumn("cluster", col("__best.cluster"))
      .withColumn("dist", col("__best.dist"))
      .drop("__best")
  }

  def assignBroadcast(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]]): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bc: Broadcast[Array[Array[Double]]] = sc.broadcast(centers)
    val bk = sc.broadcast(kernel)
    val assignUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      val cs = bc.value
      val kern = bk.value
      var bestI = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < cs.length) {
        val d = kern.divergence(x, cs(i))
        if (d < bestD) { bestD = d; bestI = i }
        i += 1
      }
      (bestI, bestD)
    }
    df.withColumn("__best", assignUdf(col(featuresCol)))
      .withColumn("cluster", col("__best._1"))
      .withColumn("dist", col("__best._2"))
      .drop("__best")
  }
}

/** Center update + distortion in ONE aggregation job.
  *
  * For a Bregman kernel the new center is invGrad(weighted mean of grads).
  * We aggregate, per cluster, d per-dimension sums of the gradient plus the
  * weight sum and weighted distortion — all as built-in `sum` aggregates
  * over `element_at`, which stay inside whole-stage codegen and do
  * partial (map-side) aggregation before the k-row shuffle.
  * (Replaces the reference's rdd.aggregateByKey + collectAsMap hop,
  * reference: df/strategies/UpdateStrategy.scala:46-135.)
  */
object Update {

  /** Returns (newCenters sparse map cluster->center, distortion, counts). */
  case class UpdateResult(
      centers: Map[Int, Array[Double]],
      distortion: Double,
      weights: Map[Int, Double])

  def gradMean(
      assigned: DataFrame,
      featuresCol: String,
      weightCol: Column,
      kernel: BregmanKernel,
      dim: Int): UpdateResult = {
    val sc = assigned.sparkSession.sparkContext
    val bk = sc.broadcast(kernel)
    val needGrad = !(kernel.isInstanceOf[SquaredEuclideanKernel] || kernel.isInstanceOf[L1Kernel])
    val gradCol: Column =
      if (needGrad) {
        val gradUdf = udf { (xs: Seq[Double]) => bk.value.grad(xs.toArray) }
        gradUdf(col(featuresCol))
      } else col(featuresCol) // identity grad: skip the UDF entirely
    val w = weightCol
    val dimSums = (0 until dim).map(i =>
      sum(element_at(col("__grad"), i + 1) * w).as(s"g$i"))
    val aggs = dimSums ++ Seq(
      sum(w).as("wsum"),
      sum(col("dist") * w).as("dsum"))
    val rows = assigned
      .withColumn("__grad", gradCol)
      .groupBy(col("cluster"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()

    var distortion = 0.0
    val centers = Map.newBuilder[Int, Array[Double]]
    val weights = Map.newBuilder[Int, Double]
    rows.foreach { r =>
      val cid = r.getInt(0)
      val wsum = r.getDouble(dim + 1)
      distortion += r.getDouble(dim + 2)
      if (wsum > 0) {
        val mean = new Array[Double](dim)
        var i = 0
        while (i < dim) { mean(i) = r.getDouble(i + 1) / wsum; i += 1 }
        centers += cid -> kernel.invGrad(mean)
        weights += cid -> wsum
      }
    }
    UpdateResult(centers.result(), distortion, weights.result())
  }

  /** K-medians: per-dimension median per cluster in ONE job via
    * percentile_approx over all dims (replaces the reference's one-job-per-
    * (cluster, dimension) loop, reference: df/strategies/
    * UpdateStrategy.scala:145-252).
    */
  def median(
      assigned: DataFrame,
      featuresCol: String,
      weightCol: Column,
      dim: Int): UpdateResult = {
    val meds = (0 until dim).map(i =>
      percentile_approx(element_at(col(featuresCol), i + 1), lit(0.5), lit(10000)).as(s"m$i"))
    val aggs = meds ++ Seq(sum(weightCol).as("wsum"), sum(col("dist") * weightCol).as("dsum"))
    val rows = assigned.groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*).collect()
    var distortion = 0.0
    val centers = Map.newBuilder[Int, Array[Double]]
    val weights = Map.newBuilder[Int, Double]
    rows.foreach { r =>
      val cid = r.getInt(0)
      val wsum = r.getDouble(dim + 1)
      distortion += r.getDouble(dim + 2)
      if (wsum > 0) {
        val c = new Array[Double](dim)
        var i = 0
        while (i < dim) { c(i) = r.getDouble(i + 1); i += 1 }
        centers += cid -> c
        weights += cid -> wsum
      }
    }
    UpdateResult(centers.result(), distortion, weights.result())
  }
}

/** The Lloyd loop. One assignment projection + one aggregation job per
  * iteration; input cached once. (reference: df/LloydsIterator.scala:110-240)
  */
object LloydsIterator {

  def run(df: DataFrame, cfg: LloydsConfig): LloydsResult = {
    val spark = df.sparkSession
    val data = df.persist(StorageLevel.MEMORY_AND_DISK)
    val numPoints = data.count()
    require(numPoints > 0, "empty input")
    val dim = data.select(col(cfg.featuresCol)).head().getSeq[Double](0).length
    // Fit-time domain validation on a sample, like the reference
    // (reference: df/ClusteringOps.scala:170-182): catches e.g. negative
    // inputs under KL/IS before they produce NaN centers.
    val sample = data.select(col(cfg.featuresCol)).limit(1000).collect()
    sample.foreach { r =>
      val x = r.getSeq[Double](0).toArray
      require(x.length == dim,
        s"inconsistent dimension: expected $dim, found ${x.length}")
      require(cfg.kernel.validate(x),
        s"input point ${x.take(8).mkString("[", ",", if (x.length > 8) ",...]" else "]")} " +
          s"violates the domain of divergence '${cfg.kernel.name}' " +
          "(e.g. KL/Itakura-Saito/generalized-I require non-negative values, logistic requires [0,1])")
    }
    val wCol: Column = cfg.weightCol.map(col).getOrElse(lit(1.0))

    var centers = CenterInit.initialize(data, cfg, dim, numPoints)
    var iter = 0
    var converged = false
    val distHist = Seq.newBuilder[Double]
    val moveHist = Seq.newBuilder[Double]
    val isMedian = cfg.kernel.isInstanceOf[L1Kernel]

    while (iter < cfg.maxIter && !converged) {
      val assigned = Assignment.assign(data, cfg.featuresCol, cfg.kernel, centers, cfg.assignmentStrategy)
      val upd =
        if (isMedian) Update.median(assigned, cfg.featuresCol, wCol, dim)
        else Update.gradMean(assigned, cfg.featuresCol, wCol, cfg.kernel, dim)

      // Empty-cluster handling: reseed missing ids from a random sample
      // (reference: df/strategies/EmptyClusterHandler.scala:41-93, with the
      // self-comparing guard at line 57 fixed — we compare against cfg.k).
      val missing = (0 until centers.length).filterNot(upd.centers.contains)
      val newCenters: Array[Array[Double]] =
        if (missing.isEmpty) {
          Array.tabulate(centers.length)(i => upd.centers(i))
        } else if (cfg.emptyClusterStrategy == "drop") {
          centers.indices.flatMap(upd.centers.get).toArray
        } else {
          val replacements = CenterInit.samplePoints(data, cfg.featuresCol, missing.size, cfg.seed + iter, numPoints)
          val repl = missing.zip(replacements).toMap
          Array.tabulate(centers.length)(i =>
            upd.centers.getOrElse(i, repl.getOrElse(i, centers(i))))
        }

      // Movement: max L2 shift over surviving centers (driver-side, k x d).
      val movement =
        if (newCenters.length != centers.length) Double.MaxValue
        else {
          var m = 0.0
          var i = 0
          while (i < centers.length) {
            var s = 0.0
            var j = 0
            val a = centers(i); val b = newCenters(i)
            while (j < dim) { val d = a(j) - b(j); s += d * d; j += 1 }
            m = math.max(m, math.sqrt(s))
            i += 1
          }
          m
        }
      distHist += upd.distortion
      moveHist += movement
      centers = newCenters
      iter += 1
      if (movement < cfg.tol) converged = true
    }
    data.unpersist()
    LloydsResult(centers, iter, converged, distHist.result(), moveHist.result(), numPoints)
  }
}

/** Center initialization: uniform random or distributed k-means||.
  *
  * Unlike the reference — whose "k-means||" collects the ENTIRE dataset to
  * the driver (reference: df/CenterInitializer.scala:145-231, collect at
  * line 156) — this is the true distributed algorithm: initSteps rounds of
  * D^2-weighted oversampling on executors, then a weighted local k-means++
  * on the ~O(l * initSteps) candidate pool on the driver.
  */
object CenterInit {

  def initialize(df: DataFrame, cfg: LloydsConfig, dim: Int, numPoints: Long): Array[Array[Double]] =
    cfg.initMode.toLowerCase match {
      case "random" => samplePoints(df, cfg.featuresCol, cfg.k, cfg.seed, numPoints).toArray
      case _        => kMeansParallel(df, cfg, numPoints)
    }

  /** ~uniform random sample of n feature rows, scale-safe: Bernoulli sample
    * with 10x oversampling then limit(n) — no global sort.
    */
  def samplePoints(df: DataFrame, featuresCol: String, n: Int, seed: Long, numPoints: Long): Seq[Array[Double]] = {
    val fraction = math.min(1.0, (10.0 * n) / math.max(1L, numPoints))
    var rows = df.select(col(featuresCol)).sample(withReplacement = false, fraction, seed)
      .limit(n).collect()
    if (rows.length < n) rows = df.select(col(featuresCol)).limit(n).collect()
    rows.map(_.getSeq[Double](0).toArray).toSeq
  }

  def kMeansParallel(df: DataFrame, cfg: LloydsConfig, numPoints: Long): Array[Array[Double]] = {
    val kernel = cfg.kernel
    val sc = df.sparkSession.sparkContext
    val f = col(cfg.featuresCol)
    val l = 2.0 * cfg.k // oversampling per round

    var centers = samplePoints(df, cfg.featuresCol, 1, cfg.seed, numPoints).toBuffer
    var step = 0
    while (step < math.max(1, cfg.initSteps)) {
      val bc = sc.broadcast(centers.toArray)
      val bk = sc.broadcast(kernel)
      val costUdf = udf { (xs: Seq[Double]) =>
        val x = xs.toArray
        var best = Double.MaxValue
        val cs = bc.value
        var i = 0
        while (i < cs.length) { val d = bk.value.divergence(x, cs(i)); if (d < best) best = d; i += 1 }
        best
      }
      val withCost = df.select(f.as("__f")).withColumn("__c", costUdf(col("__f")))
      val totalCost = withCost.agg(sum("__c")).head().getDouble(0)
      if (totalCost <= 0) {
        step = cfg.initSteps // degenerate: all points identical to centers
      } else {
        val seeded = withCost
          .withColumn("__r", rand(cfg.seed + 17 * step))
          .where(col("__r") < col("__c") * l / totalCost)
          .select("__f")
          .collect()
        centers ++= seeded.map(_.getSeq[Double](0).toArray)
        step += 1
      }
    }
    val cand = centers.toArray.distinct
    if (cand.length <= cfg.k) {
      // pad with random points if underprovisioned
      val pad = samplePoints(df, cfg.featuresCol, cfg.k - cand.length + 1, cfg.seed + 99, numPoints)
      (cand ++ pad).distinct.take(cfg.k)
    } else {
      // weight candidates by how many points they attract, then local
      // weighted k-means++ on the driver (candidate pool is O(l*initSteps)).
      val assigned = Assignment.assignBroadcast(df.select(f.as(cfg.featuresCol)), cfg.featuresCol, kernel, cand)
      val counts = assigned.groupBy("cluster").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val weights = cand.indices.map(i => counts.getOrElse(i, 0L).toDouble + 1.0).toArray
      localKMeansPlusPlus(cand, weights, cfg.k, kernel, cfg.seed)
    }
  }

  /** Weighted k-means++ seeding on a driver-side candidate pool. */
  def localKMeansPlusPlus(
      points: Array[Array[Double]],
      weights: Array[Double],
      k: Int,
      kernel: BregmanKernel,
      seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    val chosen = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val first = pickWeighted(weights, rnd)
    chosen += points(first)
    val minDist = points.map(p => kernel.divergence(p, chosen(0)))
    while (chosen.length < k) {
      val probs = minDist.zip(weights).map { case (d, w) => d * w }
      val total = probs.sum
      val idx = if (total <= 0) rnd.nextInt(points.length) else pickWeighted(probs, rnd)
      chosen += points(idx)
      var i = 0
      while (i < points.length) {
        val d = kernel.divergence(points(i), chosen.last)
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
    }
    chosen.toArray
  }

  private def pickWeighted(w: Array[Double], rnd: java.util.Random): Int = {
    val total = w.sum
    var r = rnd.nextDouble() * total
    var i = 0
    while (i < w.length - 1) {
      r -= w(i)
      if (r <= 0) return i
      i += 1
    }
    w.length - 1
  }
}
