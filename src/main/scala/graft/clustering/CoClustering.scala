package graft.clustering

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.Model
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Bregman block co-clustering over long-format (rowIndex, colIndex, value)
  * triples: alternately reassign row clusters and column clusters against
  * the current block means, which are the exact Bregman centroids of each
  * (rowCluster, colCluster) block.
  * (reference: ml/CoClustering.scala:188-300 — same alternating algorithm
  * and parameter surface. The reference COLLECTS every matrix entry to the
  * driver for each row/col update, ml/CoClustering.scala:395-404; here the
  * updates are distributed via sufficient statistics.)
  *
  * Scale design — the key identity: for any scalar Bregman divergence
  * D_F(v, mu) = F(v) - F(mu) - F'(mu)(v - mu), a row i's cost under row
  * cluster r is
  *   sum_j D(v_ij, mu_{r,c(j)})
  *     = sum_j F(v_ij)  +  sum_c [ n_ic * A(r,c) + s_ic * B(r,c) ]
  * with A(r,c) = -F(mu_rc) + F'(mu_rc) mu_rc, B(r,c) = -F'(mu_rc), and
  * (n_ic, s_ic) = count/sum of row i's values in column-cluster c. The
  * first term is constant in r, so the argmin needs ONLY the per-
  * (rowIndex, colCluster) counts and sums — one groupBy — plus the
  * kRow x kCol coefficient matrices on the driver. No entry ever reaches
  * the driver; shuffles carry ~numRows * kCol stat rows, not the matrix.
  */
class CoClustering(override val uid: String)
    extends Estimator[CoClusteringModel] with CoClusteringParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("cocluster"))

  def setNumRowClusters(v: Int): this.type = set(numRowClusters, v)
  def setNumColClusters(v: Int): this.type = set(numColClusters, v)
  def setRowIndexCol(v: String): this.type = set(rowIndexCol, v)
  def setColIndexCol(v: String): this.type = set(colIndexCol, v)
  def setValueCol(v: String): this.type = set(valueCol, v)
  def setRowPredictionCol(v: String): this.type = set(rowPredictionCol, v)
  def setColPredictionCol(v: String): this.type = set(colPredictionCol, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTolerance(v: Double): this.type = set(tolerance, v)
  def setRegularization(v: Double): this.type = set(regularization, v)
  def setDivergence(v: String): this.type = set(divergence, v)
  def setSeed(v: Long): this.type = set(seed, v)

  final val localMatrixMax = new IntParam(this, "localMatrixMax",
    "matrices with at most this many entries run the whole alternation on " +
      "the driver off one collect (the distributed path pays ~6 shuffle " +
      "jobs per iteration, pure scheduler overhead on small matrices)",
    ParamValidators.gtEq(0))
  def setLocalMatrixMax(v: Int): this.type = set(localMatrixMax, v)
  setDefault(localMatrixMax -> 2000000)

  override def fit(dataset: Dataset[_]): CoClusteringModel = {
    val t0 = System.currentTimeMillis()
    val df = dataset.toDF()
      .select(col($(rowIndexCol)).cast("long").as("__r"),
        col($(colIndexCol)).cast("long").as("__c"),
        col($(valueCol)).cast("double").as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEntries = df.count()
    if (nEntries <= $(localMatrixMax)) {
      val m = fitLocal(df, t0)
      df.unpersist()
      return m
    }
    val kr = $(numRowClusters)
    val kc = $(numColClusters)
    val sf = CoClustering.scalarF($(divergence))
    val fExpr = CoClustering.fExpr($(divergence), col("__v"))

    // deterministic hash init — no job, stable under repartitioning
    var rowAssign = df.select(col("__r")).distinct()
      .withColumn("__rc", pmod(xxhash64(col("__r"), lit($(seed))), lit(kr)).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var colAssign = df.select(col("__c")).distinct()
      .withColumn("__cc", pmod(xxhash64(col("__c"), lit($(seed) + 1)), lit(kc)).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rowAssign.count(); colAssign.count()

    var centers = Array.ofDim[Double](kr, kc)
    var objective = Double.MaxValue
    var prevObjective = Double.MaxValue
    var iter = 0
    var converged = false

    while (iter < $(maxIter) && !converged) {
      // block centers + exact objective in ONE distributed pass:
      // groupBy(rc, cc).agg(sum v, count, sum F(v)) -> driver kr x kc math
      val blocks = df.join(rowAssign, "__r").join(colAssign, "__c")
        .groupBy(col("__rc"), col("__cc"))
        .agg(sum(col("__v")).as("s"), count(lit(1)).as("n"), sum(fExpr).as("fs"))
        .collect()
      val cNew = Array.fill(kr, kc)($(regularization))
      var obj = 0.0
      blocks.foreach { r =>
        val rc = r.getInt(0); val cc = r.getInt(1)
        val s = r.getDouble(2); val n = r.getLong(3).toDouble; val fs = r.getDouble(4)
        if (n > 0) {
          val mu = s / n
          cNew(rc)(cc) = mu
          // sum_block D(v, mu) = sum F(v) - n F(mu) - F'(mu)(sum v - n mu)
          obj += fs - n * sf.f(mu) - sf.fp(mu) * (s - n * mu)
        }
      }
      centers = cNew
      objective = obj
      if (prevObjective != Double.MaxValue &&
          math.abs(prevObjective - objective) <= $(tolerance) * math.abs(prevObjective)) {
        converged = true
      } else {
        prevObjective = objective
        // row update: per-(row, colCluster) stats -> argmin over r
        val newRow = reseedEmpties(
          assignSide(df, colAssign, "__r", "__c", "__cc", "__rc", kr, centers, sf,
            transposed = false), "__r", "__rc", kr, $(seed) + 31 * iter)
        newRow.count()
        rowAssign.unpersist()
        rowAssign = newRow
        // col update against the NEW row assignment
        val newCol = reseedEmpties(
          assignSide(df, rowAssign, "__c", "__r", "__rc", "__cc", kc, centers, sf,
            transposed = true), "__c", "__cc", kc, $(seed) + 37 * iter)
        newCol.count()
        colAssign.unpersist()
        colAssign = newCol
        iter += 1
      }
    }
    df.unpersist()

    val model = new CoClusteringModel(uid,
      rowAssign.withColumnRenamed("__r", "index").withColumnRenamed("__rc", "cluster"),
      colAssign.withColumnRenamed("__c", "index").withColumnRenamed("__cc", "cluster"),
      centers)
    copyValues(model.setParent(this))
    model.trainingObjective = objective
    model.trainingIterations = iter
    model.trainingMillis = System.currentTimeMillis() - t0
    model
  }

  /** Driver-local alternation for driver-sized matrices: the same math as
    * the distributed path (deterministic hash init, scalar-Bregman
    * objective, reseed-on-empty by splitting the largest) with zero
    * per-iteration Spark jobs.
    */
  private def fitLocal(df: DataFrame, t0: Long): CoClusteringModel = {
    val spark = df.sparkSession
    val rows = df.collect()
    val kr = $(numRowClusters)
    val kc = $(numColClusters)
    val sf = CoClustering.scalarF($(divergence))
    val rIds = rows.map(_.getLong(0)).distinct.sorted
    val cIds = rows.map(_.getLong(1)).distinct.sorted
    val rPos = rIds.zipWithIndex.toMap
    val cPos = cIds.zipWithIndex.toMap
    val tr = rows.map(r => (rPos(r.getLong(0)), cPos(r.getLong(1)), r.getDouble(2)))
    val rnd = new java.util.Random($(seed))
    val rc = rIds.map(id => (math.floorMod(scala.util.hashing.MurmurHash3.productHash(
      (id, $(seed))), kr)))
    val cc = cIds.map(id => (math.floorMod(scala.util.hashing.MurmurHash3.productHash(
      (id, $(seed) + 1)), kc)))
    var centers = Array.ofDim[Double](kr, kc)
    var objective = Double.MaxValue
    var prevObjective = Double.MaxValue
    var iter = 0
    var converged = false

    def blocksPass(): Double = {
      val s = Array.ofDim[Double](kr, kc)
      val n = Array.ofDim[Long](kr, kc)
      var fs = 0.0
      tr.foreach { case (r, c, v) =>
        s(rc(r))(cc(c)) += v; n(rc(r))(cc(c)) += 1; fs += sf.f(v)
      }
      var obj = fs
      for (a <- 0 until kr; b <- 0 until kc) {
        if (n(a)(b) > 0) {
          val mu = s(a)(b) / n(a)(b)
          centers(a)(b) = mu
          obj += -n(a)(b) * sf.f(mu) - sf.fp(mu) * (s(a)(b) - n(a)(b) * mu)
        } else centers(a)(b) = $(regularization)
      }
      obj
    }

    def updateSide(
        ownAssign: Array[Int], otherAssign: Array[Int], kOwn: Int, kOther: Int,
        entriesByOwn: Array[Array[(Int, Double)]], muAt: (Int, Int) => Double): Unit = {
      val aMat = Array.tabulate(kOwn, kOther) { (o, c) =>
        val mu = muAt(o, c); -sf.f(mu) + sf.fp(mu) * mu
      }
      val bMat = Array.tabulate(kOwn, kOther) { (o, c) => -sf.fp(muAt(o, c)) }
      var i = 0
      while (i < ownAssign.length) {
        val stats = new Array[Double](2 * kOther) // n, s per other cluster
        entriesByOwn(i).foreach { case (oc, v) =>
          stats(oc) += 1.0; stats(kOther + oc) += v
        }
        var best = 0; var bd = Double.MaxValue
        var o = 0
        while (o < kOwn) {
          var cost = 0.0
          var c = 0
          while (c < kOther) {
            cost += stats(c) * aMat(o)(c) + stats(kOther + c) * bMat(o)(c)
            c += 1
          }
          if (cost < bd) { bd = cost; best = o }
          o += 1
        }
        ownAssign(i) = best
        i += 1
      }
      // reseed empties by splitting the largest (same rule as distributed)
      val sizes = new Array[Int](kOwn)
      ownAssign.foreach(sizes(_) += 1)
      val empties = (0 until kOwn).filter(sizes(_) == 0)
      if (empties.nonEmpty) {
        val largest = sizes.indices.maxBy(sizes)
        val targets = (largest +: empties).toArray
        var j = 0
        while (j < ownAssign.length) {
          if (ownAssign(j) == largest) ownAssign(j) = targets(rnd.nextInt(targets.length))
          j += 1
        }
      }
    }

    // pre-index entries by row and by col (entries store the OTHER side's
    // assignment lookup at use time via the closure over rc/cc arrays)
    val byRow = Array.fill(rIds.length)(scala.collection.mutable.ArrayBuffer[(Int, Double)]())
    val byCol = Array.fill(cIds.length)(scala.collection.mutable.ArrayBuffer[(Int, Double)]())
    tr.foreach { case (r, c, v) => byRow(r) += ((c, v)); byCol(c) += ((r, v)) }

    while (iter < $(maxIter) && !converged) {
      objective = blocksPass()
      if (prevObjective != Double.MaxValue &&
          math.abs(prevObjective - objective) <= $(tolerance) * math.abs(prevObjective)) {
        converged = true
      } else {
        prevObjective = objective
        updateSide(rc, cc, kr, kc,
          byRow.map(_.map { case (c, v) => (cc(c), v) }.toArray),
          (o, c) => centers(o)(c))
        updateSide(cc, rc, kc, kr,
          byCol.map(_.map { case (r, v) => (rc(r), v) }.toArray),
          (o, c) => centers(c)(o))
        iter += 1
      }
    }

    import spark.implicits._
    val model = new CoClusteringModel(uid,
      rIds.zip(rc).toSeq.toDF("index", "cluster"),
      cIds.zip(cc).toSeq.toDF("index", "cluster"),
      centers)
    copyValues(model.setParent(this))
    model.trainingObjective = objective
    model.trainingIterations = iter
    model.trainingMillis = System.currentTimeMillis() - t0
    model
  }

  /** One side's reassignment. For the row side: join the OTHER side's
    * assignment, aggregate (n, s) per (id, otherCluster), then a driver-
    * broadcast coefficient argmin per id. The col side passes
    * transposed=true so the coefficient lookup reads centers(r)(own).
    */
  private def assignSide(
      df: DataFrame,
      otherAssign: DataFrame,
      idCol: String,
      otherIdCol: String,
      otherClusterCol: String,
      outClusterCol: String,
      kOwn: Int,
      centers: Array[Array[Double]],
      sf: CoClustering.ScalarF,
      transposed: Boolean): DataFrame = {
    val kr = centers.length
    val kc = if (kr > 0) centers(0).length else 0
    // coefficient matrices indexed [ownCandidate][otherCluster]
    val kOther = if (transposed) kr else kc
    val aMat = Array.tabulate(kOwn, kOther) { (o, c) =>
      val mu = if (transposed) centers(c)(o) else centers(o)(c)
      -sf.f(mu) + sf.fp(mu) * mu
    }
    val bMat = Array.tabulate(kOwn, kOther) { (o, c) =>
      val mu = if (transposed) centers(c)(o) else centers(o)(c)
      -sf.fp(mu)
    }
    val sc = df.sparkSession.sparkContext
    val bcA = sc.broadcast(aMat)
    val bcB = sc.broadcast(bMat)
    val argminUdf = udf { (stats: Seq[org.apache.spark.sql.Row]) =>
      var best = 0
      var bd = Double.MaxValue
      var o = 0
      while (o < kOwn) {
        var cost = 0.0
        stats.foreach { st =>
          val c = st.getInt(0)
          val n = st.getLong(1).toDouble
          val s = st.getDouble(2)
          cost += n * bcA.value(o)(c) + s * bcB.value(o)(c)
        }
        if (cost < bd) { bd = cost; best = o }
        o += 1
      }
      best
    }
    df.join(otherAssign, otherIdCol)
      .groupBy(col(idCol), col(otherClusterCol))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("s"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col(otherClusterCol), col("n"), col("s"))).as("stats"))
      .select(col(idCol), argminUdf(col("stats")).as(outClusterCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Alternating argmin can empty a cluster permanently: once two block-
    * center columns degenerate, one cluster absorbs everything and the
    * loser never gets members again (its empty-block center sits at the
    * regularization value). Reseed by hash-splitting the LARGEST cluster
    * across the empty ids — the split centers then differ next iteration
    * and refinement proceeds. Deterministic (xxhash64 on the id), no
    * random state.
    */
  private def reseedEmpties(
      assign: DataFrame,
      idCol: String,
      clusterCol: String,
      k: Int,
      seed: Long): DataFrame = {
    val sizes = assign.groupBy(col(clusterCol)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val empties = (0 until k).filterNot(sizes.contains)
    if (empties.isEmpty) assign
    else {
      val largest = sizes.maxBy(_._2)._1
      val targets = largest +: empties
      val targetArr = array(targets.map(lit(_)): _*)
      val pick = element_at(targetArr,
        pmod(xxhash64(col(idCol), lit(seed)), lit(targets.size)).cast("int") + 1)
      val out = assign.withColumn(clusterCol,
        when(col(clusterCol) === largest, pick).otherwise(col(clusterCol)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      assign.unpersist()
      out
    }
  }

  override def transformSchema(schema: StructType): StructType =
    validateCoClusteringSchema(schema)
  override def copy(extra: ParamMap): CoClustering = defaultCopy(extra)
}

trait CoClusteringParams extends Params {
  final val numRowClusters = new IntParam(this, "numRowClusters",
    "row cluster count", ParamValidators.gt(1))
  final val numColClusters = new IntParam(this, "numColClusters",
    "column cluster count", ParamValidators.gt(1))
  final val rowIndexCol = new Param[String](this, "rowIndexCol", "row index column")
  final val colIndexCol = new Param[String](this, "colIndexCol", "column index column")
  final val valueCol = new Param[String](this, "valueCol", "matrix value column")
  final val rowPredictionCol = new Param[String](this, "rowPredictionCol",
    "output row-cluster column")
  final val colPredictionCol = new Param[String](this, "colPredictionCol",
    "output column-cluster column")
  final val maxIter = new IntParam(this, "maxIter", "max alternations", ParamValidators.gtEq(1))
  final val tolerance = new DoubleParam(this, "tolerance",
    "relative objective-change convergence threshold", ParamValidators.gtEq(0))
  final val regularization = new DoubleParam(this, "regularization",
    "center value for empty blocks")
  final val divergence = new Param[String](this, "divergence",
    "squaredEuclidean|kl|itakuraSaito (scalar Bregman)",
    ParamValidators.inArray(Array("squaredEuclidean", "kl", "itakuraSaito")))
  final val seed = new LongParam(this, "seed", "init seed")

  setDefault(numRowClusters -> 2, numColClusters -> 2,
    rowIndexCol -> "rowIndex", colIndexCol -> "colIndex", valueCol -> "value",
    rowPredictionCol -> "rowPrediction", colPredictionCol -> "colPrediction",
    maxIter -> 20, tolerance -> 1e-4, regularization -> 0.0,
    divergence -> "squaredEuclidean", seed -> 42L)

  protected def validateCoClusteringSchema(schema: StructType): StructType = {
    Seq($(rowIndexCol), $(colIndexCol), $(valueCol)).foreach { c =>
      require(schema.fieldNames.contains(c), s"column '$c' not found in ${schema.fieldNames.mkString(",")}")
    }
    schema
  }
}

object CoClustering extends org.apache.spark.ml.util.DefaultParamsReadable[CoClustering] {
  /** Scalar Bregman generator F and derivative F'. */
  case class ScalarF(f: Double => Double, fp: Double => Double)

  private val Eps = 1e-10

  def scalarF(divergence: String): ScalarF = divergence match {
    case "squaredEuclidean" => ScalarF(v => 0.5 * v * v, v => v)
    case "kl" => ScalarF(v => (v + Eps) * math.log(v + Eps), v => math.log(v + Eps) + 1.0)
    case "itakuraSaito" => ScalarF(v => -math.log(v + Eps), v => -1.0 / (v + Eps))
    case other => throw new IllegalArgumentException(s"unsupported scalar divergence '$other'")
  }

  /** Catalyst expression for F(v) (used in the block aggregation pass). */
  def fExpr(divergence: String, v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    divergence match {
      case "squaredEuclidean" => v * v * lit(0.5)
      case "kl" => (v + lit(Eps)) * log(v + lit(Eps))
      case "itakuraSaito" => -log(v + lit(Eps))
      case other => throw new IllegalArgumentException(s"unsupported scalar divergence '$other'")
    }
}

/** Fitted co-clustering: row/col assignment frames (distributed — never a
  * driver map, unlike the reference) + the kRow x kCol block centers.
  * transform() appends row/col prediction columns by key join.
  */
class CoClusteringModel(
    override val uid: String,
    val rowAssignments: DataFrame,
    val colAssignments: DataFrame,
    val blockCenters: Array[Array[Double]])
    extends Model[CoClusteringModel] with CoClusteringParams
    with org.apache.spark.ml.util.MLWritable {

  override def write: org.apache.spark.ml.util.MLWriter = new CoClusteringModel.Writer(this)

  private[graft] var trainingObjective: Double = Double.NaN
  private[graft] var trainingIterations: Int = 0
  private[graft] var trainingMillis: Long = 0L

  def objective: Double = trainingObjective
  def iterations: Int = trainingIterations

  override def transform(dataset: Dataset[_]): DataFrame = {
    val df = dataset.toDF()
    val ra = rowAssignments.select(col("index").as("__ri"), col("cluster").as($(rowPredictionCol)))
    val ca = colAssignments.select(col("index").as("__ci"), col("cluster").as($(colPredictionCol)))
    df.join(ra, df.col($(rowIndexCol)).cast("long") === ra("__ri"), "left")
      .join(ca, df.col($(colIndexCol)).cast("long") === ca("__ci"), "left")
      .drop("__ri", "__ci")
  }

  override def transformSchema(schema: StructType): StructType =
    validateCoClusteringSchema(schema)

  override def copy(extra: ParamMap): CoClusteringModel = {
    val m = new CoClusteringModel(uid, rowAssignments, colAssignments, blockCenters)
    m.trainingObjective = trainingObjective
    m.trainingIterations = trainingIterations
    copyValues(m, extra).setParent(parent)
  }
}

object CoClusteringModel extends org.apache.spark.ml.util.MLReadable[CoClusteringModel] {
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.apache.spark.ml.util.{MLReader, MLWriter}
  import org.json4s._
  import org.json4s.JsonDSL._

  private[graft] class Writer(m: CoClusteringModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      ModelIO.writeMeta(path, sparkSession, m,
        ("objective" -> m.objective) ~ ("iterations" -> m.iterations),
        Seq("blockCenters"))
      ModelIO.writeMatrix(path, "blockCenters", sparkSession, m.blockCenters)
      // assignment frames persist as plain parquet (distributed state)
      m.rowAssignments.write.mode("overwrite").parquet(s"$path/rowAssignments")
      m.colAssignments.write.mode("overwrite").parquet(s"$path/colAssignments")
    }
  }

  override def read: MLReader[CoClusteringModel] = new MLReader[CoClusteringModel] {
    override def load(path: String): CoClusteringModel = {
      implicit val fmt: Formats = DefaultFormats
      val (uid, paramMap, extra) = ModelIO.extract(ModelIO.readMeta(path, sparkSession))
      val m = new CoClusteringModel(uid,
        sparkSession.read.parquet(s"$path/rowAssignments"),
        sparkSession.read.parquet(s"$path/colAssignments"),
        ModelIO.readMatrix(path, "blockCenters", sparkSession))
      m.trainingObjective = (extra \ "objective").extract[Double]
      m.trainingIterations = (extra \ "iterations").extract[Int]
      GeneralizedKMeansModel.restoreParams(m, paramMap)
      m
    }
  }
}
