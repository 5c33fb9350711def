package graft

import graft.clustering._
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** Wave-2 estimators: Coreset, Robust, Balanced, Constrained, Sparse. */
class Wave2Spec extends SparkSpec {

  def blobs(perBlob: Int = 50, seed: Int = 7) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 8.0), (20.0, -15.0))
    val pts = for {
      (cx, cy) <- centers
      _ <- 1 to perBlob
    } yield Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5)
    pts.toDF("features")
  }

  // ---- CoresetKMeans ----

  test("CoresetKMeans: coreset fit quality within 20% of full fit") {
    val df = blobs(perBlob = 200).cache() // 800 points, coreset 100
    val full = new GeneralizedKMeans().setK(4).setSeed(3).setMaxIter(15).fit(df)
    val core = new CoresetKMeans().setK(4).setSeed(3).setMaxIter(15)
      .setCoresetSize(100).setRefinementIterations(2).fit(df)
    assert(core.numClusters == 4)
    assert(core.summary.algorithm == "CoresetKMeans")
    val r = core.computeCost(df) / full.computeCost(df)
    assert(r < 1.2, s"coreset cost ratio $r")
    df.unpersist()
  }

  test("CoresetKMeans: small data skips the coreset (uses full rows)") {
    val df = blobs(perBlob = 20) // 80 points << 2*coresetSize
    val m = new CoresetKMeans().setK(4).setSeed(3).setMaxIter(10)
      .setCoresetSize(1000).fit(df)
    val sizes = m.transform(df).groupBy("prediction").count()
      .collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(20L, 20L, 20L, 20L))
  }

  test("CoresetKMeans: sensitivity strategies all produce k centers") {
    val df = blobs(perBlob = 100).cache()
    Seq("uniform", "distance", "density", "hybrid").foreach { s =>
      val m = new CoresetKMeans().setK(4).setSeed(5).setMaxIter(8)
        .setCoresetSize(80).setSensitivityStrategy(s).fit(df)
      assert(m.numClusters == 4, s"strategy $s")
    }
    df.unpersist()
  }

  // ---- RobustKMeans ----

  test("RobustKMeans trim: far outliers do not drag centers (plain k-means does)") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val inliers = for {
      (cx, cy) <- Seq((0.0, 0.0), (10.0, 0.0))
      _ <- 1 to 100
    } yield Seq(cx + rnd.nextGaussian() * 0.3, cy + rnd.nextGaussian() * 0.3)
    val outliers = (1 to 10).map(_ => Seq(500.0 + rnd.nextGaussian(), 500.0 + rnd.nextGaussian()))
    val df = (inliers ++ outliers).toDF("features").cache()
    // random init: D^2-weighted seeding would deterministically put a seed
    // ON the 500-distant outliers, which is its job — the trim contrast
    // needs both estimators to start from the blobs
    val m = new RobustKMeans().setK(2).setSeed(12).setMaxIter(15)
      .setInitMode("random")
      .setOutlierFraction(0.1).setOutlierMode("trim").fit(df)
    val cs = m.clusterCenters.map(_.toSeq).sortBy(_.head)
    assert(math.abs(cs(0)(0)) < 1.5 && math.abs(cs(0)(1)) < 1.5, s"center0 ${cs(0)}")
    assert(math.abs(cs(1)(0) - 10) < 1.5 && math.abs(cs(1)(1)) < 1.5, s"center1 ${cs(1)}")
    // contrast: plain k-means from the same init IS dragged toward 500
    val plain = new GeneralizedKMeans().setK(2).setSeed(12).setMaxIter(15)
      .setInitMode("random").fit(df)
    val drag = plain.clusterCenters.map(c => math.abs(c(1))).max
    assert(drag > 5, s"plain k-means unexpectedly robust (drag=$drag)")
    df.unpersist()
  }

  test("RobustKMeans m_estimator also resists outliers; OutlierDetection marks them") {
    import spark.implicits._
    val rnd = new java.util.Random(13)
    val inliers = for {
      (cx, cy) <- Seq((0.0, 0.0), (10.0, 0.0))
      _ <- 1 to 100
    } yield Seq(cx + rnd.nextGaussian() * 0.3, cy + rnd.nextGaussian() * 0.3)
    val outliers = (1 to 10).map(_ => Seq(300.0 + rnd.nextGaussian(), 300.0 + rnd.nextGaussian()))
    val df = (inliers ++ outliers).toDF("features").cache()
    val m = new RobustKMeans().setK(2).setSeed(12).setMaxIter(15)
      .setInitMode("random")
      .setOutlierFraction(0.1).setOutlierMode("m_estimator").fit(df)
    val cs = m.clusterCenters.map(_.toSeq).sortBy(_.head)
    assert(math.abs(cs(0)(0)) < 3 && math.abs(cs(0)(1)) < 3, s"center0 ${cs(0)}")
    assert(math.abs(cs(1)(0) - 10) < 3 && math.abs(cs(1)(1)) < 3, s"center1 ${cs(1)}")
    val thr = OutlierDetection.trimThreshold(df, m, 0.1)
    val marked = OutlierDetection.markOutliers(df, m, thr)
    val flagged = marked.where(col("is_outlier")).count()
    assert(flagged >= 10 && flagged <= 25, s"flagged $flagged")
    assert(marked.columns.contains("outlier_score"))
    df.unpersist()
  }

  // ---- BalancedKMeans ----

  test("BalancedKMeans soft penalty balances a skewed dataset") {
    import spark.implicits._
    val rnd = new java.util.Random(5)
    // one big wide blob adjacent to a small tight one: the size penalty
    // flips the big blob's boundary points toward the small cluster
    val big = (1 to 300).map(_ => Seq(rnd.nextGaussian() * 2.0, rnd.nextGaussian() * 2.0))
    val small = (1 to 60).map(_ => Seq(6.0 + rnd.nextGaussian() * 0.5, rnd.nextGaussian() * 0.5))
    val df = (big ++ small).toDF("features").cache()
    val plain = new GeneralizedKMeans().setK(2).setSeed(8).setMaxIter(15).fit(df)
    val bal = new BalancedKMeans().setK(2).setSeed(8).setMaxIter(15)
      .setMaxClusterSize(200).setBalancePenalty(4.0).fit(df)
    def spread(m: GeneralizedKMeansModel): Long = {
      val s = m.transform(df).groupBy("prediction").count().collect().map(_.getLong(1))
      s.max - s.min
    }
    assert(spread(bal) < spread(plain), s"balanced=${spread(bal)} plain=${spread(plain)}")
    assert(bal.summary.algorithm == "BalancedKMeans")
    df.unpersist()
  }

  // ---- ConstrainedKMeans ----

  test("ConstrainedKMeans must-link pulls boundary points together, cannot-link separates") {
    import spark.implicits._
    val rnd = new java.util.Random(17)
    val a = (0 until 50).map(i => (i.toLong, Seq(rnd.nextGaussian() * 0.4, rnd.nextGaussian() * 0.4)))
    val b = (0 until 50).map(i => ((i + 50).toLong, Seq(6.0 + rnd.nextGaussian() * 0.4, rnd.nextGaussian() * 0.4)))
    // two points midway between the blobs, slightly on opposite sides
    val mid = Seq((100L, Seq(2.4, 0.0)), (101L, Seq(3.6, 0.0)))
    val df = (a ++ b ++ mid).toDF("id", "features").cache()

    val free = new ConstrainedKMeans().setK(2).setSeed(4).setMaxIter(15).fit(df)
    val freeAsg = free.transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(freeAsg(100L) != freeAsg(101L), "unconstrained midpoints should split")

    val est = new ConstrainedKMeans().setK(2).setSeed(4).setMaxIter(15)
      .setConstraintWeight(100.0)
      .setConstraints(mustLinks = Seq((100L, 101L)), cannotLinks = Nil)
    val linked = est.fit(df)
    assert(est.countViolations(df, linked) == 0, "must-link still violated")

    val est2 = new ConstrainedKMeans().setK(2).setSeed(4).setMaxIter(15)
      .setConstraintWeight(100.0)
      .setConstraints(mustLinks = Nil, cannotLinks = Seq((0L, 1L)))
    val sep = est2.fit(df)
    assert(est2.countViolations(df, sep) == 0, "cannot-link still violated")

    // an unsatisfiable set (cannot inside a must component) is refused
    // up front with remediation, before any cluster work starts
    val bad = new ConstrainedKMeans().setK(2).setSeed(4).setMaxIter(15)
      .setConstraints(mustLinks = Seq((0L, 1L), (1L, 2L)), cannotLinks = Seq((0L, 2L)))
    val ex = intercept[IllegalArgumentException](bad.fit(df))
    assert(ex.getMessage.contains("unsatisfiable"))
    df.unpersist()
  }

  test("ConstraintSet satisfiability + adjacency") {
    val cs = ConstraintSet(Seq(MustLink(1, 2), CannotLink(1, 2)))
    assert(!cs.isSatisfiable)
    val ok = ConstraintSet.of(Seq((1L, 2L)), Seq((2L, 3L)))
    assert(ok.isSatisfiable)
    assert(ok.adjacency(2L).toSet == Set((1L, true, 1.0), (3L, false, 1.0)))
    // transitive closure: must(a,b)+must(b,c) fuses {a,b,c}; cannot(a,c)
    // inside the component is unsatisfiable even with no direct conflict
    val trans = ConstraintSet.of(Seq((1L, 2L), (2L, 3L)), Seq((1L, 3L)))
    assert(!trans.isSatisfiable, "cannot-link within a must component must be rejected")
    val chain = ConstraintSet.of(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq((3L, 10L), (4L, 5L)))
    assert(chain.isSatisfiable, "cannot-link across components is fine")
  }

  // ---- SparseKMeans ----

  def sparseBlobs(n: Int, dim: Int, nnz: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    // 4 "topic" blobs in disjoint index bands; each blob has a fixed
    // 4-index signature (like topical stopwords) plus random in-band
    // indices, so same-blob points actually overlap
    (0 until n).map { i =>
      val blob = i % 4
      val base = blob * (dim / 4)
      val sig = (0 until 4).map(_ + base)
      val rest = scala.util.Random.javaRandomToRandom(rnd)
        .shuffle((4 until dim / 4).toList).take(nnz - 4).map(_ + base)
      val idx = (sig ++ rest).sorted.toArray
      val vals = idx.map(j => if (j < base + 4) 3.0 else 1.0 + rnd.nextDouble())
      (i.toLong, Vectors.sparse(dim, idx, vals))
    }.toDF("id", "features")
  }

  test("SparseKMeans recovers disjoint-support blobs without densifying") {
    val df = sparseBlobs(n = 400, dim = 1000, nnz = 12, seed = 23).cache()
    val m = new SparseKMeans().setK(4).setSeed(6).setMaxIter(10).fit(df)
    assert(m.summary.algorithm == "SparseKMeans", "auto mode must pick the sparse path")
    // disjoint supports => perfect recovery
    val purity = m.transform(df)
      .withColumn("blob", col("id") % 4)
      .groupBy("prediction").agg(countDistinct(col("blob")).as("nb"))
      .collect().map(_.getLong(1))
    assert(m.numClusters == 4)
    assert(purity.forall(_ == 1L), s"mixed clusters: ${purity.toSeq}")
    df.unpersist()
  }

  test("SparseKMeans auto mode falls back to dense on dense data") {
    import spark.implicits._
    val rnd = new java.util.Random(3)
    val df = (1 to 100).map(_ => Vectors.dense(Array.fill(8)(rnd.nextGaussian())))
      .map(Tuple1(_)).toDF("features")
    val m = new SparseKMeans().setK(2).setSeed(6).setMaxIter(5).fit(df)
    assert(m.summary.algorithm == "GeneralizedKMeans", "dense data must use the dense engine")
  }

  test("SparseKMeans sparse path is >=5x faster than densified path at d=10k") {
    val df = sparseBlobs(n = 1000, dim = 10000, nnz = 30, seed = 31).cache()
    df.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warmup both paths on a slice so JIT noise doesn't decide the ratio
    new SparseKMeans().setSparseMode("sparse").setK(2).setMaxIter(2).setSeed(1).fit(df.limit(100))
    new SparseKMeans().setSparseMode("dense").setK(2).setMaxIter(2).setSeed(1).fit(df.limit(100))
    val (ms, tSparse) = time(
      new SparseKMeans().setSparseMode("sparse").setK(4).setMaxIter(5).setSeed(1).fit(df))
    val (md, tDense) = time(
      new SparseKMeans().setSparseMode("dense").setK(4).setMaxIter(5).setSeed(1).fit(df))
    assert(ms.numClusters == 4 && md.numClusters == 4)
    assert(tDense / tSparse >= 5.0, f"speedup ${tDense / tSparse}%.1fx (sparse $tSparse%.2fs dense $tDense%.2fs)")
    df.unpersist()
  }
}
