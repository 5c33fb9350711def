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
    // Lineage-truncation cadence. The core loop itself has FLAT lineage
    // (every iteration re-derives one projection + one aggregation from the
    // cached input, so there is nothing to checkpoint); estimators that
    // maintain an evolving DataFrame across rounds (e.g. BisectingKMeans'
    // membership column) honor this via localCheckpoint().
    checkpointInterval: Int = 10,
    featuresCol: String = "features",
    weightCol: Option[String] = None,
    // Skip the fit-time domain-validation sample for internal sub-runs
    // (e.g. per-split 2-means inside BisectingKMeans) whose input was
    // already validated by the outer estimator.
    validate: Boolean = true,
    // Pre-known input stats: sub-runs over frames the caller already
    // materialized pass these to skip the count()/head() jobs.
    knownDim: Option[Int] = None,
    knownNumPoints: Option[Long] = None,
    // Caller already persisted the input (sub-runs): skip persist/unpersist.
    managePersistence: Boolean = true,
    // Warm start: explicit initial centers (k x dim) bypass initMode
    // entirely — resume training from a previous model's centers, or pin
    // a deterministic start for reproducible runs.
    initialCenters: Option[Array[Array[Double]]] = None,
    // Typed training-event stream (IterationStarted/Completed, empty-
    // cluster + convergence events); Silent by default.
    sink: SummarySink = SummarySink.Silent)

case class LloydsResult(
    centers: Array[Array[Double]],
    iterations: Int,
    converged: Boolean,
    distortionHistory: Seq[Double],
    movementHistory: Seq[Double],
    numPoints: Long,
    // Fraction of row-iteration steps the cross-iteration triangle bounds
    // resolved with ZERO distance computations (Elkan/Hamerly loops only;
    // None for plain Lloyd). Telemetry from accumulators — approximate
    // under cache-eviction recomputation.
    boundSkipRate: Option[Double] = None)

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

  /** Max k*d elements for ONE broadcast. Above this the centers are
    * broadcast in chunks so no single broadcast (or its per-task
    * deserialized copy) exceeds ~128 MB of doubles.
    * (reference: impl/ChunkedBroadcastAssignment.scala:22-120 chunks by a
    * fixed 100 centers; sizing by elements adapts to d.)
    */
  val ChunkMaxElems: Long = 16L * 1024 * 1024

  /** Executor-memory-probed chunk budget: at most 1/16 of the configured
    * executor heap per chunk of broadcast centers, capped by
    * [[ChunkMaxElems]] (reference: impl/AdaptiveBroadcastAssignment.scala
    * picks chunk size from an executor memory estimate).
    * `graft.assign.chunkElems` overrides the probe outright — the knob the
    * chunked-tier gate query uses to force a multi-chunk fold at test-scale
    * k*d, and an operator escape hatch when the heap probe misjudges an
    * exotic deployment.
    *
    * SESSION-SCOPED, read at plan-build time of every assignment: a forced
    * override set mid-flight leaks into any OTHER fit planning concurrently
    * in the same session. Safe under sequential use (Verify/Bench, a single
    * notebook); a shared multi-tenant session should set it once up front,
    * or save/restore around the fit the way q_kmeans_fit_chunked does
    * (restore-not-unset, so a pre-existing user override survives).
    */
  def chunkElemsBudget(spark: org.apache.spark.sql.SparkSession): Long = {
    val forced = graft.util.Conf.long(spark, "graft.assign.chunkElems", -1L)
    if (forced > 0) forced
    else chunkElemsBudgetOf(parseMemory(
      spark.conf.getOption("spark.executor.memory").getOrElse("4g")))
  }

  /** Pure sizing rule: 1/16 of the heap as doubles, floored at 1M elems,
    * capped at [[ChunkMaxElems]] — separated out so specs can pin the
    * chunk count a given executor size produces.
    */
  private[graft] def chunkElemsBudgetOf(heapBytes: Long): Long =
    math.min(ChunkMaxElems, math.max(1L << 20, heapBytes / 8 / 16))

  private[graft] def parseMemory(s: String): Long = {
    val t = s.trim.toLowerCase
    val (num, mult) =
      if (t.endsWith("k")) (t.dropRight(1), 1L << 10)
      else if (t.endsWith("m")) (t.dropRight(1), 1L << 20)
      else if (t.endsWith("g")) (t.dropRight(1), 1L << 30)
      else if (t.endsWith("t")) (t.dropRight(1), 1L << 40)
      else (t, 1L)
    (num.toDouble * mult).toLong
  }

  /** @param oneShot whether this assignment runs ONCE over the data
    *   (model.transform, metrics) rather than inside an iterative fit
    *   loop. The literal-expression tier embeds the center values in the
    *   plan, so each loop iteration would produce a NEW plan and pay a
    *   whole-stage-codegen (Janino) compile — ~100-300ms of driver time
    *   per iteration that the broadcast tier amortizes to one compile for
    *   the whole loop (broadcast values change, the plan does not). Auto
    *   therefore only picks the expression tier for one-shot scans, where
    *   the single compile is amortized over the full read and the
    *   codegen'd distance math wins.
    */
  def assign(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]],
      strategy: String = "auto",
      clusterCol: String = "cluster",
      distCol: String = "dist",
      oneShot: Boolean = true): DataFrame = {
    if ((strategy == "elkan" || strategy == "hamerly") &&
        kernel.isInstanceOf[SquaredEuclideanKernel])
      return ElkanAssignment.assign(df, featuresCol, centers, clusterCol, distCol)
    if (strategy == "crossjoin")
      return assignCrossJoin(df, featuresCol, kernel, centers, clusterCol, distCol)
    val dim = centers.headOption.map(_.length).getOrElse(0)
    val elems = centers.length.toLong * dim
    val useExpr = strategy match {
      case "expression" => true
      case "broadcast" | "chunked" => false
      case _ => oneShot && kernel.supportsExpressionOptimization && elems <= ExpressionMaxElems
    }
    if (useExpr && centers.forall(c => kernel.distExpr(col(featuresCol), c).isDefined))
      assignExpr(df, featuresCol, kernel, centers, clusterCol, distCol)
    else {
      // memory-adaptive: both the DECISION to chunk and the chunk size
      // derive from the executor heap (a 512m executor starts chunking
      // at k*d the 4g default would broadcast whole) — reference:
      // impl/AdaptiveBroadcastAssignment.scala sizes from executor memory
      val budget = chunkElemsBudget(df.sparkSession)
      if (strategy == "chunked" || (strategy != "broadcast" && elems > budget)) {
        val perChunk = math.max(1, (budget / math.max(1, dim)).toInt)
        assignChunked(df, featuresCol, kernel, centers, perChunk, clusterCol, distCol)
      } else assignBroadcast(df, featuresCol, kernel, centers, clusterCol, distCol)
    }
  }

  /** Memory-bounded tier: centers broadcast in chunks of `perChunk`; each
    * chunk contributes a (dist, cluster) struct column and `least` folds
    * them — struct ordering compares dist first then cluster id, which
    * preserves the global first-min tie-break. One projection, no extra
    * scans; peak broadcast memory is one chunk.
    */
  def assignChunked(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]],
      perChunk: Int,
      clusterCol: String = "cluster",
      distCol: String = "dist"): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bk = sc.broadcast(kernel)
    val chunkCols: Seq[Column] = centers.grouped(perChunk).zipWithIndex.map {
      case (chunk, ci) =>
        val offset = ci * perChunk
        val bc = sc.broadcast(chunk)
        val u = udf { (xs: Seq[Double]) =>
          val x = xs.toArray
          val cs = bc.value
          var bestI = 0
          var bestD = Double.MaxValue
          var i = 0
          while (i < cs.length) {
            val d = bk.value.divergence(x, cs(i))
            if (d < bestD) { bestD = d; bestI = i }
            i += 1
          }
          (bestD, offset + bestI)
        }
        u(col(featuresCol))
    }.toSeq
    val tmp = s"__${clusterCol}_best"
    val combined = if (chunkCols.size == 1) chunkCols.head else least(chunkCols: _*)
    df.withColumn(tmp, combined)
      .withColumn(clusterCol, col(s"$tmp._2"))
      .withColumn(distCol, col(s"$tmp._1"))
      .drop(tmp)
  }

  /** Join-based assignment: broadcast-hash-join the k-row centers frame
    * against the data, then a `min_by` hash aggregate picks each row's
    * best center (reference: df/strategies/impl/SECrossJoinAssignment
    * .scala:17-74 — the reference sorts a Window over ALL input columns +
    * row_number; min_by makes it a hash-agg top-1, no sort). The struct
    * (dist, cid) ordering keeps the lowest-index tie-break identical to
    * the broadcast path. All original columns ride through the
    * aggregation via first().
    */
  def assignCrossJoin(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]],
      clusterCol: String = "cluster",
      distCol: String = "dist"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val bk = sc.broadcast(kernel)
    val rowId = s"__${clusterCol}_rid"
    val withId = df.withColumn(rowId, monotonically_increasing_id())
    val centersDf = broadcast(
      centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("__cid", "__cv"))
    val distUdf = udf { (xs: Seq[Double], cv: Seq[Double]) =>
      bk.value.divergence(xs.toArray, cv.toArray)
    }
    val joined = withId.crossJoin(centersDf)
      .withColumn("__cd", distUdf(col(featuresCol), col("__cv")))
    val originals = df.columns
    val aggs =
      originals.map(c => first(col(c)).as(c)) :+
        min_by(struct(col("__cid"), col("__cd")), struct(col("__cd"), col("__cid"))).as("__best")
    joined.groupBy(col(rowId)).agg(aggs.head, aggs.tail: _*)
      .withColumn(clusterCol, col("__best.__cid"))
      .withColumn(distCol, col("__best.__cd"))
      .drop(rowId, "__best")
  }

  def assignExpr(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]],
      clusterCol: String = "cluster",
      distCol: String = "dist"): DataFrame = {
    val f = col(featuresCol)
    val candidates = array(centers.zipWithIndex.map { case (c, i) =>
      struct(kernel.distExpr(f, c).get.as("dist"), lit(i).as("cluster"))
    }.toIndexedSeq: _*)
    val tmp = s"__${clusterCol}_best"
    val best = array_min(candidates)
    df.withColumn(tmp, best)
      .withColumn(clusterCol, col(s"$tmp.cluster"))
      .withColumn(distCol, col(s"$tmp.dist"))
      .drop(tmp)
  }

  def assignBroadcast(
      df: DataFrame,
      featuresCol: String,
      kernel: BregmanKernel,
      centers: Array[Array[Double]],
      clusterCol: String = "cluster",
      distCol: String = "dist"): DataFrame = {
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
    val tmp = s"__${clusterCol}_best"
    df.withColumn(tmp, assignUdf(col(featuresCol)))
      .withColumn(clusterCol, col(s"$tmp._1"))
      .withColumn(distCol, col(s"$tmp._2"))
      .drop(tmp)
  }
}

/** Typed aggregator summing (gradient * weight, weight, dist * weight) per
  * cluster with ONE buffer per group — the plan is constant-size in the
  * dimension (a d-wide `sum(element_at)` layout makes the logical plan
  * O(d) and breaks codegen at embedding widths; observed "plan too large"
  * truncation at d=64 in round 1). Partial aggregation still happens
  * map-side (ObjectHashAggregate), so the shuffle carries k rows per
  * partition, exactly like the per-column formulation.
  * (Direct analogue of the reference's aggregateByKey hop, re-expressed as
  * a Spark `Aggregator`; reference: df/strategies/UpdateStrategy.scala:46-135.)
  */
class CentroidAggregator(dim: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      (Seq[Double], Double, Double), (Array[Double], Double, Double), (Seq[Double], Double, Double)] {
  import org.apache.spark.sql.{Encoder, Encoders}

  override def zero: (Array[Double], Double, Double) = (new Array[Double](dim), 0.0, 0.0)

  override def reduce(
      b: (Array[Double], Double, Double),
      a: (Seq[Double], Double, Double)): (Array[Double], Double, Double) = {
    val (g, w, d) = a
    val s = b._1
    var i = 0
    while (i < dim) { s(i) += g(i) * w; i += 1 }
    (s, b._2 + w, b._3 + d * w)
  }

  override def merge(
      b1: (Array[Double], Double, Double),
      b2: (Array[Double], Double, Double)): (Array[Double], Double, Double) = {
    val s = b1._1
    val t = b2._1
    var i = 0
    while (i < dim) { s(i) += t(i); i += 1 }
    (s, b1._2 + b2._2, b1._3 + b2._3)
  }

  override def finish(r: (Array[Double], Double, Double)): (Seq[Double], Double, Double) =
    (r._1.toSeq, r._2, r._3)

  override def bufferEncoder: Encoder[(Array[Double], Double, Double)] =
    Encoders.product[(Array[Double], Double, Double)]
  override def outputEncoder: Encoder[(Seq[Double], Double, Double)] =
    Encoders.product[(Seq[Double], Double, Double)]
}

/** Center update + distortion in ONE aggregation job.
  *
  * For a Bregman kernel the new center is invGrad(weighted mean of grads).
  * (Replaces the reference's rdd.aggregateByKey + collectAsMap hop,
  * reference: df/strategies/UpdateStrategy.scala:46-135.)
  */
object Update {

  /** Returns (newCenters sparse map cluster->center, distortion, counts). */
  case class UpdateResult(
      centers: Map[Int, Array[Double]],
      distortion: Double,
      weights: Map[Int, Double])

  /** Max dimension for the per-column codegen'd sum path. Below this the
    * d+2 `sum(element_at)` aggregates stay inside one whole-stage-codegen'd
    * HashAggregate and beat the Aggregator path ~2x (no per-row Seq[Double]
    * boxing through ObjectHashAggregate); above it the plan width itself
    * becomes the bottleneck and the constant-size typed Aggregator wins.
    */
  val ColumnSumMaxDim = 128

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

    var distortion = 0.0
    val centers = Map.newBuilder[Int, Array[Double]]
    val weights = Map.newBuilder[Int, Double]

    if (dim <= ColumnSumMaxDim) {
      // Tier 1: d+2 codegen'd column sums in ONE HashAggregate — no object
      // aggregation, no boxing; the shuffle carries k rows of d+2 doubles.
      val base = assigned
        .withColumn("__grad", gradCol)
        .withColumn("__w", weightCol.cast("double"))
      val aggs =
        (0 until dim).map(i => sum(element_at(col("__grad"), i + 1) * col("__w")).as(s"g$i")) ++
          Seq(sum(col("__w")).as("wsum"), sum(col("dist") * col("__w")).as("dsum"))
      val rows = base.groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*).collect()
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
    } else {
      // Tier 2: constant-size typed Aggregator — plan size independent of d
      // (required at embedding widths; d=1024 covered by tests).
      val centroidAgg = udaf(new CentroidAggregator(dim))
      val rows = assigned
        .withColumn("__grad", gradCol)
        .groupBy(col("cluster"))
        .agg(centroidAgg(col("__grad"), weightCol.cast("double"), col("dist")).as("r"))
        .select(col("cluster"), col("r._1").as("gsum"), col("r._2").as("wsum"), col("r._3").as("dsum"))
        .collect()
      rows.foreach { r =>
        val cid = r.getInt(0)
        val gsum = r.getSeq[Double](1)
        val wsum = r.getDouble(2)
        distortion += r.getDouble(3)
        if (wsum > 0) {
          val mean = new Array[Double](dim)
          var i = 0
          while (i < dim) { mean(i) = gsum(i) / wsum; i += 1 }
          centers += cid -> kernel.invGrad(mean)
          weights += cid -> wsum
        }
      }
    }
    UpdateResult(centers.result(), distortion, weights.result())
  }

  /** K-medians: EXACT per-dimension weighted median per cluster in two
    * jobs, both distributed (replaces the reference's one-job-per-
    * (cluster, dimension) driver loop, reference: df/strategies/
    * UpdateStrategy.scala:145-252 computeWeightedMedian).
    *
    * Weighted median definition (matches the reference): the smallest
    * value v in the cluster's dimension-i column whose cumulative weight
    * (values sorted ascending) reaches half the total weight.
    *
    * Physical shape: posexplode the features to (cluster, dim, value)
    * rows, pre-aggregate equal values, then a window cumulative-sum per
    * (cluster, dim) partition — a sort of n*d rows, but sorted WITHIN
    * hash partitions of (cluster, dim), so it scales out; no driver
    * collect beyond the final k*d medians.
    */
  def median(
      assigned: DataFrame,
      featuresCol: String,
      weightCol: Column,
      dim: Int): UpdateResult = {
    import org.apache.spark.sql.expressions.Window

    // distortion + weight totals per cluster (one small agg job)
    val totals = assigned.groupBy(col("cluster"))
      .agg(sum(weightCol.cast("double")).as("wsum"), sum(col("dist") * weightCol).as("dsum"))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val exploded = assigned
      .select(col("cluster"), weightCol.cast("double").as("__w"),
        posexplode(col(featuresCol)).as(Seq("d", "v")))
      .groupBy(col("cluster"), col("d"), col("v"))
      .agg(sum(col("__w")).as("w"))
    val part = Window.partitionBy(col("cluster"), col("d"))
    val byValue = part.orderBy(col("v"))
    val medians = exploded
      .withColumn("cw", sum(col("w")).over(byValue.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum(col("w")).over(part))
      .where(col("cw") >= col("tw") / 2)
      .groupBy(col("cluster"), col("d"))
      .agg(min(col("v")).as("med"))
      .collect()

    val centers = scala.collection.mutable.Map[Int, Array[Double]]()
    medians.foreach { r =>
      val c = centers.getOrElseUpdate(r.getInt(0), new Array[Double](dim))
      c(r.getInt(1)) = r.getDouble(2)
    }
    var distortion = 0.0
    val weights = Map.newBuilder[Int, Double]
    totals.foreach { case (cid, (wsum, dsum)) =>
      distortion += dsum
      if (wsum > 0) weights += cid -> wsum
    }
    UpdateResult(centers.filter { case (cid, _) => totals.get(cid).exists(_._1 > 0) }.toMap,
      distortion, weights.result())
  }
}

/** The Lloyd loop. One assignment projection + one aggregation job per
  * iteration; input cached once. (reference: df/LloydsIterator.scala:110-240)
  */
object LloydsIterator {

  def run(df: DataFrame, cfg: LloydsConfig): LloydsResult = {
    val spark = df.sparkSession
    val data = if (cfg.managePersistence) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    val numPoints = cfg.knownNumPoints.getOrElse(data.count())
    if (numPoints <= 0) throw new GKMException(GKMError.EmptyInput("LloydsIterator"))
    val dim = cfg.knownDim.getOrElse {
      val first = data.select(col(cfg.featuresCol))
        .where(col(cfg.featuresCol).isNotNull).limit(1).collect()
      if (first.isEmpty)
        throw new GKMException(GKMError.EmptyInput(
          "features column (every row is null)"))
      first(0).getSeq[Double](0).length
    }
    // Fit-time validation on a sample through the typed validator chain
    // (reference: df/ClusteringOps.scala:170-182 + df/Validator.scala):
    // catches null/NaN/ragged/out-of-domain inputs before they produce
    // NaN centers, with remediation text in the raised GKMException.
    // Null rows must survive extraction as nulls (not NPE in getSeq) so
    // NotNullFinite can refuse them with the typed error.
    if (cfg.validate) {
      val sample = data.select(col(cfg.featuresCol)).limit(1000).collect()
        .map(r => if (r.isNullAt(0)) null else r.getSeq[Double](0).toArray)
      Validators.validateSample(sample, Validators.forKernel(cfg.kernel, dim), dim)
        .foreach(e => throw new GKMException(e))
    }
    val wCol: Column = cfg.weightCol.map(col).getOrElse(lit(1.0))

    var centers = CenterInit.initialize(data, cfg, dim, numPoints)
    var iter = 0
    var converged = false
    val distHist = Seq.newBuilder[Double]
    val moveHist = Seq.newBuilder[Double]
    val isMedian = cfg.kernel.isInstanceOf[L1Kernel]

    while (iter < cfg.maxIter && !converged) {
      cfg.sink.emit(TrainingEvent.IterationStarted(iter))
      val assigned = Assignment.assign(data, cfg.featuresCol, cfg.kernel, centers, cfg.assignmentStrategy, oneShot = false)
      val upd =
        if (isMedian) Update.median(assigned, cfg.featuresCol, wCol, dim)
        else Update.gradMean(assigned, cfg.featuresCol, wCol, cfg.kernel, dim)

      // Empty-cluster handling: reseed missing ids from a random sample
      // (reference: df/strategies/EmptyClusterHandler.scala:41-93, with the
      // self-comparing guard at line 57 fixed — we compare against cfg.k).
      val missing = (0 until centers.length).filterNot(upd.centers.contains)
      if (missing.nonEmpty) cfg.sink.emit(TrainingEvent.EmptyClustersDetected(iter, missing))
      val newCenters: Array[Array[Double]] =
        if (missing.isEmpty) {
          Array.tabulate(centers.length)(i => upd.centers(i))
        } else if (cfg.emptyClusterStrategy == "drop") {
          centers.indices.flatMap(upd.centers.get).toArray
        } else {
          val replacements = CenterInit.samplePoints(data, cfg.featuresCol, missing.size, cfg.seed + iter, numPoints)
          val repl = missing.zip(replacements).toMap
          cfg.sink.emit(TrainingEvent.ReseedPerformed(iter, missing))
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
      cfg.sink.emit(TrainingEvent.IterationCompleted(iter, upd.distortion, movement))
      centers = newCenters
      iter += 1
      if (movement < cfg.tol) {
        converged = true
        cfg.sink.emit(TrainingEvent.ConvergenceDetected(iter, movement))
      }
    }
    if (cfg.managePersistence) data.unpersist()
    LloydsResult(centers, iter, converged, distHist.result(), moveHist.result(), numPoints)
  }
}

/** Driver-local weighted Lloyd for sub-problems that fit in driver memory
  * (e.g. the lower levels of BisectingKMeans' split tree, where a cluster's
  * rows are a few MB): identical semantics to the distributed loop —
  * argmin-divergence assignment, gradient-mean (or exact weighted median
  * for L1) update, max-center-movement convergence, empty clusters
  * dropped — with zero Spark jobs. The hybrid distributed-top/local-leaves
  * split is the scale-correct shape: at 100 TB the first splits run
  * distributed, and each leaf sub-fit stops paying per-job scheduling
  * overhead the moment its cluster fits on the driver.
  */
object LocalLloyds {

  def run(
      points: Array[Array[Double]],
      weights: Array[Double],
      k: Int,
      kernel: BregmanKernel,
      maxIter: Int,
      tol: Double,
      seed: Long,
      initCenters: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    val n = points.length
    if (n == 0) return Array.empty
    val dim = points(0).length
    val rnd = new java.util.Random(seed)
    var centers = initCenters.map(_.map(_.clone)).getOrElse {
      // random-init: k distinct row picks (mirrors CenterInit "random" mode)
      val idx = scala.collection.mutable.LinkedHashSet[Int]()
      var guard = 0
      while (idx.size < math.min(k, n) && guard < 20 * k) { idx += rnd.nextInt(n); guard += 1 }
      idx.toArray.map(i => points(i).clone)
    }
    val isMedian = kernel.isInstanceOf[L1Kernel]
    val assign = new Array[Int](n)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged && centers.length > 0) {
      var p = 0
      while (p < n) {
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < centers.length) {
          val d = kernel.divergence(points(p), centers(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val newCenters = Array.ofDim[Array[Double]](centers.length)
      var c = 0
      while (c < centers.length) {
        newCenters(c) =
          if (isMedian) localMedian(points, weights, assign, c, dim)
          else localGradMean(points, weights, assign, c, dim, kernel)
        c += 1
      }
      val survivors = newCenters.filter(_ != null)
      var movement =
        if (survivors.length != centers.length) Double.MaxValue
        else {
          var m = 0.0; var i = 0
          while (i < centers.length) {
            var s = 0.0; var j = 0
            while (j < dim) { val d = centers(i)(j) - survivors(i)(j); s += d * d; j += 1 }
            m = math.max(m, math.sqrt(s)); i += 1
          }
          m
        }
      centers = survivors
      iter += 1
      if (movement < tol) converged = true
    }
    centers
  }

  private def localGradMean(
      points: Array[Array[Double]], weights: Array[Double], assign: Array[Int],
      c: Int, dim: Int, kernel: BregmanKernel): Array[Double] = {
    val gsum = new Array[Double](dim)
    var wsum = 0.0
    var p = 0
    while (p < points.length) {
      if (assign(p) == c) {
        val g = kernel.grad(points(p))
        val w = weights(p)
        var j = 0
        while (j < dim) { gsum(j) += g(j) * w; j += 1 }
        wsum += w
      }
      p += 1
    }
    if (wsum <= 0) null
    else {
      var j = 0
      while (j < dim) { gsum(j) /= wsum; j += 1 }
      kernel.invGrad(gsum)
    }
  }

  private def localMedian(
      points: Array[Array[Double]], weights: Array[Double], assign: Array[Int],
      c: Int, dim: Int): Array[Double] = {
    val members = points.indices.filter(assign(_) == c)
    if (members.isEmpty) return null
    val med = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      val vw = members.map(p => (points(p)(j), weights(p))).sortBy(_._1)
      val half = vw.map(_._2).sum / 2
      var cw = 0.0
      var i = 0
      while (i < vw.length && cw < half) { cw += vw(i)._2; i += 1 }
      med(j) = vw(math.max(0, i - 1))._1
      j += 1
    }
    med
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

  /** Typed validation for explicitly-provided (warm-start) centers — one
    * contract for every estimator's setInitialCenters, whether the fit
    * runs through the distributed Lloyd loop or a driver-local path.
    */
  def validateExplicit(cs: Array[Array[Double]], k: Int, dim: Int): Unit = {
    if (cs.length != k)
      throw new GKMException(GKMError.InvalidParam(
        "initialCenters", s"${cs.length} centers provided but k=$k"))
    cs.find(_.length != dim).foreach(c =>
      throw new GKMException(GKMError.InvalidParam(
        "initialCenters", s"center has dim ${c.length}, data has dim $dim")))
  }

  def initialize(df: DataFrame, cfg: LloydsConfig, dim: Int, numPoints: Long): Array[Array[Double]] =
    cfg.initialCenters match {
      case Some(cs) =>
        validateExplicit(cs, cfg.k, dim)
        cs.map(_.clone())
      case None => cfg.initMode.toLowerCase match {
        case "random" => samplePoints(df, cfg.featuresCol, cfg.k, cfg.seed, numPoints).toArray
        case _        => kMeansParallel(df, cfg, numPoints)
      }
    }

  /** ~uniform random sample of n feature rows, scale-safe: Bernoulli sample
    * with 10x oversampling, then limit(n) over a RANDOMLY ORDERED subset —
    * a bare limit would take a prefix of the sampled rows in input order,
    * biasing picks toward early partitions. The sort touches only the
    * ~10n sampled rows, never the data.
    */
  def samplePoints(df: DataFrame, featuresCol: String, n: Int, seed: Long, numPoints: Long): Seq[Array[Double]] = {
    val fraction = math.min(1.0, (10.0 * n) / math.max(1L, numPoints))
    var rows = df.select(col(featuresCol)).sample(withReplacement = false, fraction, seed)
      .orderBy(rand(seed + 7))
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
      localKMeansPlusPlusBest(cand, weights, cfg.k, kernel, cfg.seed)
    }
  }

  /** Multi-restart pool seeding: run weighted k-means++ `restarts` times
    * and keep the seeding with the lowest pool quantization cost. A single
    * D^2 pass puts two seeds in one cluster with a few-percent probability
    * even on well-separated data; restarts drive that to ~zero for free
    * (driver-side, pool-sized work).
    */
  def localKMeansPlusPlusBest(
      points: Array[Array[Double]],
      weights: Array[Double],
      k: Int,
      kernel: BregmanKernel,
      seed: Long,
      restarts: Int = 5): Array[Array[Double]] = {
    var best: Array[Array[Double]] = null
    var bestCost = Double.MaxValue
    var r = 0
    while (r < math.max(1, restarts)) {
      val cand = localKMeansPlusPlus(points, weights, k, kernel, seed + 1000L * r)
      var cost = 0.0
      var i = 0
      while (i < points.length) {
        var bd = Double.MaxValue
        var c = 0
        while (c < cand.length) {
          val d = kernel.divergence(points(i), cand(c))
          if (d < bd) bd = d
          c += 1
        }
        cost += bd * weights(i)
        i += 1
      }
      if (cost < bestCost) { bestCost = cost; best = cand }
      r += 1
    }
    best
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
