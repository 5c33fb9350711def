package graft

import graft.clustering._
import graft.kernels._
import graft.ops.MutualInformation
import org.apache.spark.sql.functions._

/** Wave-3: KMedoids/CLARA, KernelKMeans (exact + Nystrom), sequence
  * kernels (DTW family + DBA), TimeSeriesKMeans, MutualInformation.
  */
class Wave3Spec extends SparkSpec {

  private def blobs2(perBlob: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val pts = for {
      (cx, cy) <- Seq((0.0, 0.0), (10.0, 0.0))
      _ <- 1 to perBlob
    } yield Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5)
    pts.toDF("features")
  }

  // ---- KMedoids / CLARA ----

  test("KMedoids: medoids are actual data points near blob centers; robust to an outlier") {
    import spark.implicits._
    val rnd = new java.util.Random(5)
    // moderate outlier: serving it from a blob (cost ~36) beats giving it
    // a medoid (cost ~400 from merged blobs); a MEAN-based center would
    // still shift by ~0.9 toward it — the medoid must not move at all
    val pts = (for {
      (cx, cy) <- Seq((0.0, 0.0), (10.0, 0.0))
      _ <- 1 to 40
    } yield Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5)) :+ Seq(30.0, 30.0)
    val df = pts.toDF("features")
    val m = new KMedoids().setK(2).setSeed(3).setMaxIter(20).fit(df)
    val dataset = pts.map(_.toArray.toSeq).toSet
    m.medoids.foreach(md => assert(dataset.contains(md.toSeq), "medoid must be a data point"))
    val xs = m.medoids.map(_(0)).sorted
    assert(math.abs(xs(0)) < 2 && math.abs(xs(1) - 10) < 2,
      s"medoids dragged: ${m.medoids.map(_.toSeq).toSeq}")
    assert(m.summary.algorithm == "KMedoids")
    // cost history decreases across swaps
    val h = m.summary.distortionHistory
    h.zip(h.tail).foreach { case (a, b) => assert(b <= a + 1e-9) }
  }

  test("KMedoids refuses to collect oversized data; manhattan distance works") {
    import spark.implicits._
    val df = blobs2(30, 7)
    intercept[IllegalArgumentException] {
      new KMedoids().setK(2).setMaxDriverPoints(10).fit(df)
    }
    val m = new KMedoids().setK(2).setSeed(1).setDistanceFunction("manhattan").fit(df)
    assert(m.numClusters == 2)
  }

  test("CLARA matches blob structure with distributed candidate scoring") {
    val df = blobs2(150, 9).cache()
    val m = new CLARA().setK(2).setSeed(4).setNumSamples(3).setMaxIter(10).fit(df)
    val sizes = m.transform(df).groupBy("prediction").count()
      .collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(150L, 150L), s"${sizes.toSeq}")
    assert(m.summary.algorithm == "CLARA")
    assert(m.computeCost(df) > 0)
    df.unpersist()
  }

  // ---- KernelKMeans ----

  test("KernelKMeans exact with linear kernel reproduces plain k-means partitions") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    val pts = (for {
      (cx, cy) <- Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
      _ <- 1 to 50
    } yield Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5))
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "features").cache()
    // linear kernel => feature space IS input space; the Gram iteration
    // must find the same 3-blob partition as the direct algorithm
    val km = new KernelKMeans().setK(3).setMode("exact").setKernelType("linear")
      .setSeed(3).setMaxIter(40).fit(df)
    val plain = new GeneralizedKMeans().setK(3).setSeed(3).setMaxIter(20).fit(df)
    def partition(m: org.apache.spark.ml.Model[_]) =
      m.asInstanceOf[org.apache.spark.ml.Model[_] with org.apache.spark.ml.param.Params]
        .transform(df).select("id", "prediction").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pa = partition(km)
    val pb = partition(plain)
    // same partition up to label permutation: group ids by label and compare
    def blocks(p: Map[Long, Int]) = p.groupBy(_._2).values.map(_.keySet).toSet
    assert(blocks(pa) == blocks(pb), "linear-kernel partition differs from plain k-means")
    df.unpersist()
  }

  test("KernelKMeans Nystrom RBF recovers blobs end to end incl. transform") {
    import spark.implicits._
    val rnd = new java.util.Random(13)
    val pts = (for {
      (cx, cy) <- Seq((0.0, 0.0), (6.0, 0.0), (0.0, 6.0), (6.0, 6.0))
      _ <- 1 to 50
    } yield Seq(cx + rnd.nextGaussian() * 0.4, cy + rnd.nextGaussian() * 0.4))
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "features").cache()
    val m = new KernelKMeans().setK(4).setMode("nystrom").setKernelType("rbf")
      .setGamma(0.3).setNumLandmarks(40).setSeed(5).setMaxIter(20).fit(df)
    val pred = m.transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    // each true blob maps to one dominant predicted cluster, all distinct
    val majors = (0 until 4).map { b =>
      pred.filter(t => (t._1 / 50) == b).map(_._2)
        .groupBy(identity).maxBy(_._2.length)
    }
    val purity = majors.map(_._2.length).sum.toDouble / 200
    assert(majors.map(_._1).distinct.size == 4, s"blob collisions: ${majors.map(_._1)}")
    assert(purity >= 0.95, s"purity $purity")
    df.unpersist()
  }

  test("Mercer kernels: values and induced distance") {
    val x = Array(1.0, 0.0)
    val y = Array(0.0, 1.0)
    assert(LinearKernel()(x, y) == 0.0)
    assert(math.abs(RBFKernel(1.0)(x, y) - math.exp(-2.0)) < 1e-12)
    assert(math.abs(PolynomialKernel(2, 1.0, 1.0)(x, x) - 4.0) < 1e-12)
    // induced distance: rbf k(x,x)=1 -> d^2 = 2 - 2k(x,y)
    val d2 = RBFKernel(1.0).inducedDist2(x, y)
    assert(math.abs(d2 - (2 - 2 * math.exp(-2.0))) < 1e-12)
  }

  // ---- Sequence kernels ----

  test("DTW: shift-invariance vs euclidean, identity, window") {
    val a = Array(0.0, 0.0, 1.0, 2.0, 1.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 2.0, 1.0, 0.0, 0.0, 0.0) // same peak, shifted
    val dtw = DTWKernel()
    assert(dtw.distance(a, a) == 0.0)
    val dDtw = dtw.distance(a, b)
    val dEuc = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(dDtw < dEuc, s"DTW $dDtw should beat euclidean $dEuc on shifted series")
    // a Sakoe-Chiba band wide enough to cover the shift gives the same alignment
    assert(math.abs(DTWKernel(Some(2)).distance(a, b) - dDtw) < 1e-12)
    // path is monotone and boundary-complete
    val p = dtw.alignmentPath(a, b)
    assert(p.head == (0, 0) && p.last == (a.length - 1, b.length - 1))
    p.zip(p.tail).foreach { case ((i1, j1), (i2, j2)) =>
      assert(i2 >= i1 && j2 >= j1 && (i2 - i1) <= 1 && (j2 - j1) <= 1)
    }
  }

  test("SoftDTW approaches DTW^2 as gamma -> 0; GAK is a proper similarity") {
    val a = Array(0.0, 1.0, 2.0, 1.0, 0.0)
    val b = Array(0.0, 0.0, 1.0, 2.0, 1.0)
    val hard = { val d = DTWKernel().distance(a, b); d * d }
    val soft = SoftDTWKernel(gamma = 0.001).distance(a, b)
    assert(math.abs(soft - hard) < 0.05 * math.max(1.0, hard), s"soft $soft vs hard $hard")
    val gak = GAKKernel(1.0)
    assert(gak.distance(a, a) < 1e-6)
    assert(gak.distance(a, b) > 0)
    val c = Array(5.0, 5.0, 5.0, 5.0, 5.0)
    assert(gak.distance(a, c) > gak.distance(a, b))
  }

  test("DBA barycenter averages aligned peaks") {
    val series = Seq(
      Array(0.0, 2.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 2.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 2.0, 0.0))
    val bar = DTWKernel().barycenter(series, series(1), maxIter = 10)
    // the barycenter keeps one clear peak of height ~2 (alignment folds
    // the shifted peaks together instead of smearing to 2/3)
    assert(bar.max > 1.5, s"barycenter smeared: ${bar.toSeq}")
  }

  test("weighted DBA: zero-weight series is ignored; uniform matches unweighted") {
    val series = Seq(
      Array(0.0, 2.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 2.0, 0.0, 0.0),
      Array(9.0, 9.0, 9.0, 9.0, 9.0)) // outlier, weight 0
    val k = DTWKernel()
    val w = k.barycenter(series, series(0), maxIter = 10,
      weights = Some(Array(1.0, 1.0, 0.0)))
    val noOutlier = k.barycenter(series.take(2), series(0), maxIter = 10)
    assert(w.toSeq == noOutlier.toSeq, "zero weight must equal dropping the series")
    assert(w.max < 5.0, s"outlier leaked into barycenter: ${w.toSeq}")
    val uniform = k.barycenter(series.take(2), series(0), maxIter = 10,
      weights = Some(Array(1.0, 1.0)))
    assert(uniform.toSeq == noOutlier.toSeq)
  }

  test("SoftDTW gradient matches finite differences") {
    val x = Array(0.3, 1.2, -0.5, 0.8)
    val y = Array(0.1, 0.9, 0.4, -0.2, 0.5)
    val k = SoftDTWKernel(gamma = 0.5)
    val g = k.gradient(x, y)
    val eps = 1e-6
    x.indices.foreach { i =>
      val xp = x.clone; xp(i) += eps
      val xm = x.clone; xm(i) -= eps
      val fd = (k.distance(xp, y) - k.distance(xm, y)) / (2 * eps)
      assert(math.abs(g(i) - fd) < 1e-4,
        s"grad($i)=${g(i)} vs finite-diff $fd")
    }
    // windowed variant must differentiate the WINDOWED objective
    val xs = Array(0.3, 1.2, -0.5, 0.8, 0.1)
    val ys = Array(0.1, 0.9, 0.4, -0.2, 0.5)
    val kw = SoftDTWKernel(gamma = 0.5, window = Some(1))
    val gw = kw.gradient(xs, ys)
    xs.indices.foreach { i =>
      val xp = xs.clone; xp(i) += eps
      val xm = xs.clone; xm(i) -= eps
      val fd = (kw.distance(xp, ys) - kw.distance(xm, ys)) / (2 * eps)
      assert(math.abs(gw(i) - fd) < 1e-4,
        s"windowed grad($i)=${gw(i)} vs finite-diff $fd")
    }
  }

  test("sequence-kernel properties: symmetry, identity, window tightening") {
    val rnd = new java.util.Random(29)
    (0 until 30).foreach { _ =>
      val n = 4 + rnd.nextInt(8)
      val x = Array.fill(n)(rnd.nextGaussian())
      val y = Array.fill(n)(rnd.nextGaussian())
      val dtw = DTWKernel()
      assert(math.abs(dtw.distance(x, y) - dtw.distance(y, x)) < 1e-12, "DTW symmetry")
      assert(dtw.distance(x, x) == 0.0, "DTW identity")
      val soft = SoftDTWKernel(gamma = 0.3)
      assert(math.abs(soft.distance(x, y) - soft.distance(y, x)) < 1e-9, "SoftDTW symmetry")
      // a tighter band can only REMOVE alignments: windowed DTW >= unwindowed
      val banded = DTWKernel(Some(1)).distance(x, y)
      assert(banded >= dtw.distance(x, y) - 1e-12, "window tightening lowers cost?")
      // barycenter of a single series from itself is itself
      val bar = dtw.barycenter(Seq(x), x, maxIter = 3)
      assert(bar.zip(x).forall { case (a, b) => math.abs(a - b) < 1e-12 }, "singleton barycenter")
    }
  }

  test("SoftDTW barycenter improves the soft objective over its DBA start") {
    val series = Seq(
      Array(0.0, 2.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 2.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 2.0, 0.0, 0.0))
    val k = SoftDTWKernel(gamma = 0.1)
    def obj(c: Array[Double]) = series.map(s => k.distance(c, s)).sum
    val dbaStart = DTWKernel().barycenter(series, series(1), maxIter = 10)
    val soft = k.barycenter(series, series(1), maxIter = 20)
    assert(obj(soft) <= obj(dbaStart) + 1e-9,
      s"soft ${obj(soft)} should not exceed DBA ${obj(dbaStart)}")
    // barycenter of identical copies stays (numerically) on the series
    val same = k.barycenter(Seq(series(0), series(0)), series(0), maxIter = 5)
    assert(same.zip(series(0)).map { case (a, b) => math.abs(a - b) }.max < 1e-6)
  }

  test("TimeSeriesKMeans clusters shifted-peak families that euclidean k-means mixes") {
    import spark.implicits._
    val rnd = new java.util.Random(3)
    // family A: one peak, random shift; family B: two peaks
    def peak(at: Int): Seq[Double] =
      (0 until 16).map(i => (if (i == at || i == at + 1) 2.0 else 0.0) + rnd.nextGaussian() * 0.05)
    def twoPeak(at: Int): Seq[Double] =
      (0 until 16).map(i => (if (i == at || i == at + 8) 2.0 else 0.0) + rnd.nextGaussian() * 0.05)
    val a = (1 to 40).map(_ => peak(2 + rnd.nextInt(5)))
    val b = (1 to 40).map(_ => twoPeak(2 + rnd.nextInt(5)))
    val df = (a ++ b).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "features")
    val m = new TimeSeriesKMeans().setK(2).setSeed(7).setMaxIter(8)
      .setSakoeChibaWindow(8).fit(df)
    val pred = m.transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val fa = pred.filter(_._1 < 40).map(_._2)
    val fb = pred.filter(_._1 >= 40).map(_._2)
    val famA = fa.groupBy(identity).maxBy(_._2.length)._1
    val famB = fb.groupBy(identity).maxBy(_._2.length)._1
    val purity = (fa.count(_ == famA) + fb.count(_ == famB)).toDouble / 80
    assert(famA != famB && purity >= 0.85, s"purity $purity famA=$famA famB=$famB")
    assert(m.summary.algorithm == "TimeSeriesKMeans")
  }

  test("TimeSeriesKMeans soft-DTW centroid mode clusters shifted peaks") {
    import spark.implicits._
    val rnd = new java.util.Random(11)
    def peak(at: Int): Seq[Double] =
      (0 until 12).map(i => (if (i == at) 2.0 else 0.0) + rnd.nextGaussian() * 0.05)
    def plateau(at: Int): Seq[Double] =
      (0 until 12).map(i => (if (i >= at && i < at + 6) 1.0 else 0.0) + rnd.nextGaussian() * 0.05)
    val a = (1 to 25).map(_ => peak(3 + rnd.nextInt(4)))
    val b = (1 to 25).map(_ => plateau(1 + rnd.nextInt(4)))
    val df = (a ++ b).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "features")
    val m = new TimeSeriesKMeans().setK(2).setSeed(5).setMaxIter(8)
      .setTsDistance("softdtw").setGamma(0.1).setCentroidMode("softdtw").fit(df)
    val pred = m.transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val fa = pred.filter(_._1 < 25).map(_._2)
    val fb = pred.filter(_._1 >= 25).map(_._2)
    val famA = fa.groupBy(identity).maxBy(_._2.length)._1
    val famB = fb.groupBy(identity).maxBy(_._2.length)._1
    val purity = (fa.count(_ == famA) + fb.count(_ == famB)).toDouble / 50
    assert(famA != famB && purity >= 0.85, s"purity $purity")
    val h = m.summary.distortionHistory
    assert(h.last <= h.head + 1e-9, s"distortion did not improve: $h")
  }

  // ---- MutualInformation ----

  test("entropy/KL/JS/MI match hand-computed values") {
    assert(math.abs(MutualInformation.entropy(Array(0.5, 0.5)) - 1.0) < 1e-12)
    assert(math.abs(MutualInformation.entropy(Array(1.0, 0.0)) - 0.0) < 1e-12)
    // KL((0.5,0.5)||(0.25,0.75)) = 0.5 log2(2) + 0.5 log2(2/3)
    val kl = 0.5 + 0.5 * math.log(2.0 / 3.0) / math.log(2.0)
    assert(math.abs(MutualInformation.klDivergence(Array(0.5, 0.5), Array(0.25, 0.75)) - kl) < 1e-12)
    assert(MutualInformation.jsDivergence(Array(1.0, 0.0), Array(0.0, 1.0)) == 1.0)
    // independent joint -> MI 0; identity joint -> MI = H = 1 bit
    assert(math.abs(MutualInformation.mutualInformation(
      Array(Array(0.25, 0.25), Array(0.25, 0.25)))) < 1e-12)
    assert(math.abs(MutualInformation.mutualInformation(
      Array(Array(0.5, 0.0), Array(0.0, 0.5))) - 1.0) < 1e-12)
    assert(math.abs(MutualInformation.normalizedMutualInformation(
      Array(Array(0.5, 0.0), Array(0.0, 0.5))) - 1.0) < 1e-12)
  }

  test("NMI over DataFrame columns scores clustering vs truth") {
    import spark.implicits._
    val df = blobs2(60, 21).withColumn("truth", (monotonically_increasing_id() >= 60).cast("int"))
    val m = new GeneralizedKMeans().setK(2).setSeed(5).setMaxIter(10).fit(df)
    val scored = m.transform(df)
    val nmi = MutualInformation.normalizedMutualInformation(scored, "prediction", "truth")
    assert(nmi > 0.95, s"NMI $nmi for a clean 2-blob recovery")
    // conditional entropy of a perfectly dependent pair is 0
    val (joint, _, _) = MutualInformation.estimateJoint(scored, "prediction", "truth")
    assert(MutualInformation.conditionalEntropy(joint) < 0.1)
  }
}
