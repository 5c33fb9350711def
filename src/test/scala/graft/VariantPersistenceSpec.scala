package graft

import graft.clustering._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Save/load round-trip per model class, asserting TRANSFORM-OUTPUT
  * equality (not just field equality) — the r3 verdict's KernelKMeans
  * save/load produced silently wrong predictions; these tests pin every
  * variant.
  */
class VariantPersistenceSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-persist-$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "model").getAbsolutePath
  }

  def blobs(perBlob: Int = 60, seed: Int = 7): DataFrame = {
    val rnd = new java.util.Random(seed)
    val centers = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 8.0))
    val pts = for {
      ((cx, cy), label) <- centers.zipWithIndex
      _ <- 1 to perBlob
    } yield (Seq(cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5), label)
    pts.toDF("features", "label")
  }

  private def predictions(m: org.apache.spark.ml.Model[_], df: DataFrame): Seq[Int] =
    m.transform(df).select("prediction").collect().map(_.getInt(0)).toSeq

  test("KernelKMeansModel (nystrom) round-trips with identical predictions") {
    val df = blobs().cache()
    val m = new KernelKMeans().setK(3).setMode("nystrom").setKernelType("rbf")
      .setGamma(0.5).setNumLandmarks(32).setSeed(42).setMaxIter(8).fit(df)
      .asInstanceOf[KernelKMeansModel]
    val p = tmp("kk")
    m.write.overwrite().save(p)
    val loaded = KernelKMeansModel.read.load(p)
    assert(loaded.landmarks.length == m.landmarks.length)
    assert(predictions(loaded, df) == predictions(m, df),
      "loaded nystrom kernel model must predict identically (r3: silently wrong)")
    df.unpersist()
  }

  test("ExactKernelKMeansModel round-trips with identical predictions") {
    val df = blobs(perBlob = 30)
    val m = new KernelKMeans().setK(3).setMode("exact").setKernelType("rbf")
      .setGamma(0.5).setSeed(42).setMaxIter(8).fit(df)
      .asInstanceOf[ExactKernelKMeansModel]
    val p = tmp("ekk")
    m.write.overwrite().save(p)
    val loaded = ExactKernelKMeansModel.read.load(p)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("NystromSpectralModel round-trips with identical predictions") {
    val df = blobs().cache()
    val m = new SpectralClustering().setK(3).setKernelType("rbf").setGamma(0.5)
      .setUseNystrom(true).setNumLandmarks(32).setSeed(42).setMaxIter(8).fit(df)
      .asInstanceOf[NystromSpectralModel]
    val p = tmp("nspec")
    m.write.overwrite().save(p)
    val loaded = NystromSpectralModel.read.load(p)
    assert(predictions(loaded, df) == predictions(m, df))
    df.unpersist()
  }

  test("ExactSpectralModel round-trips with identical predictions") {
    val df = blobs(perBlob = 30)
    val m = new SpectralClustering().setK(3).setKernelType("rbf").setGamma(0.5)
      .setSeed(42).fit(df).asInstanceOf[ExactSpectralModel]
    val p = tmp("espec")
    m.write.overwrite().save(p)
    val loaded = ExactSpectralModel.read.load(p)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("KMedoidsModel round-trips (medoids + distance)") {
    val df = blobs(perBlob = 25)
    val m = new KMedoids().setK(3).setDistanceFunction("manhattan").setSeed(42).fit(df)
    val p = tmp("kmed")
    m.write.overwrite().save(p)
    val loaded = KMedoidsModel.read.load(p)
    assert(loaded.distanceName == "manhattan")
    assert(loaded.medoids.map(_.toSeq).toSeq == m.medoids.map(_.toSeq).toSeq)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("TimeSeriesKMeansModel round-trips (DTW params)") {
    val rnd = new java.util.Random(5)
    val series = (0 until 40).map { i =>
      val shift = if (i % 2 == 0) 0 else 8
      Seq.tabulate(16)(t => math.exp(-0.5 * (t - 4.0 - shift) * (t - 4.0 - shift)) + rnd.nextGaussian() * 0.01)
    }
    val df = series.toDF("features")
    val m = new TimeSeriesKMeans().setK(2).setSakoeChibaWindow(4).setSeed(42)
      .setMaxIter(3).fit(df)
    val p = tmp("ts")
    m.write.overwrite().save(p)
    val loaded = TimeSeriesKMeansModel.read.load(p)
    assert(loaded.tsDistanceName == m.tsDistanceName && loaded.window == m.window)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("BregmanMixtureModel round-trips (weights + centers)") {
    val df = blobs()
    val m = new BregmanMixture().setK(3).setSeed(42).setMaxIter(6).fit(df)
    val p = tmp("mix")
    m.write.overwrite().save(p)
    val loaded = BregmanMixtureModel.read.load(p)
    assert(loaded.componentWeights.toSeq == m.componentWeights.toSeq)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("SoftKMeansModel round-trips (beta + minMembership)") {
    val df = blobs()
    val m = new SoftKMeans().setK(3).setBeta(4.0).setSeed(42).setMaxIter(6).fit(df)
    val p = tmp("soft")
    m.write.overwrite().save(p)
    val loaded = SoftKMeansModel.read.load(p)
    assert(loaded.betaValue == m.betaValue)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("StreamingKMeansModel round-trips the CURRENT snapshot (decay + weights)") {
    val df = blobs()
    val est = new graft.streaming.StreamingKMeans().setK(3).setDecayFactor(0.7)
      .setSeed(42).setMaxIter(5)
    val m = est.fit(df).asInstanceOf[graft.streaming.StreamingKMeansModel]
    m.update(blobs(seed = 11)) // move the snapshot past fit-time state
    val p = tmp("stream")
    m.write.overwrite().save(p)
    val loaded = StreamingModelIO.read.load(p)
    assert(loaded.decay == m.decay && loaded.timeUnit == m.timeUnit)
    assert(loaded.clusterWeights.toSeq == m.clusterWeights.toSeq)
    assert(loaded.currentCenters.map(_.toSeq).toSeq == m.currentCenters.map(_.toSeq).toSeq)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("AgglomerativeBregmanModel round-trips (dendrogram + assignments)") {
    val df = blobs(perBlob = 20)
    val m = new AgglomerativeBregman().setNumClusters(3).setLinkage("average").fit(df)
      .asInstanceOf[AgglomerativeBregmanModel]
    val p = tmp("agg")
    m.write.overwrite().save(p)
    val loaded = AgglomerativeBregmanModel.read.load(p)
    assert(loaded.dendrogram.toSeq == m.dendrogram.toSeq)
    assert(loaded.trainingAssignments.toSeq == m.trainingAssignments.toSeq)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("MultiViewKMeansModel round-trips (views + weights + per-view centers)") {
    val df = blobs().select(col("features").as("v1"), col("features").as("v2"), col("label"))
    val m = new MultiViewKMeans().setK(3).setSeed(42).setMaxIter(6)
      .setViews(Seq(ViewSpec("v1", 2.0), ViewSpec("v2", 1.0, "squaredEuclidean"))).fit(df)
    val p = tmp("mv")
    m.write.overwrite().save(p)
    val loaded = MultiViewKMeansModel.read.load(p)
    assert(loaded.views == m.views)
    assert(loaded.viewWeights.toSeq == m.viewWeights.toSeq)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("CoClusteringModel round-trips (assignments as parquet + block centers)") {
    val triples = (for { r <- 0 until 20; c <- 0 until 10 }
      yield (r.toLong, c.toLong, if ((r < 10) == (c < 5)) 1.0 else 9.0))
      .toDF("rowIndex", "colIndex", "value")
    val m = new CoClustering().setNumRowClusters(2).setNumColClusters(2)
      .setMaxIter(8).setSeed(42).fit(triples)
    val p = tmp("cc")
    m.write.overwrite().save(p)
    val loaded = CoClusteringModel.read.load(p)
    assert(loaded.blockCenters.map(_.toSeq).toSeq == m.blockCenters.map(_.toSeq).toSeq)
    assert(loaded.objective == m.objective)
    val a = m.transform(triples).select("rowIndex", "rowPrediction", "colPrediction")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sorted
    val b = loaded.transform(triples).select("rowIndex", "rowPrediction", "colPrediction")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq.sorted
    assert(a == b)
  }

  test("InformationBottleneckModel round-trips (encoder + prior)") {
    val rnd = new java.util.Random(9)
    val rows = for { x <- 0 until 6; _ <- 1 to 100 }
      yield (x, if (rnd.nextDouble() < (if (x < 3) 0.9 else 0.1)) 1 else 0)
    val df = rows.toDF("x", "y")
    val m = new InformationBottleneck().setK(2).setBeta(10.0)
      .setFeaturesCol("x").setRelevanceCol("y").setMaxIter(100).setSeed(42).fit(df)
    val p = tmp("ib")
    m.write.overwrite().save(p)
    val loaded = InformationBottleneckModel.read.load(p)
    assert(loaded.getRelevanceInfo == m.getRelevanceInfo)
    assert(predictions(loaded, df) == predictions(m, df))
  }

  test("the base writer refuses subclass models without their own writer") {
    // construct an anonymous subclass that does NOT override write
    val rogue = new GeneralizedKMeansModel("rogue", Array(Array(0.0, 0.0)),
      "squaredEuclidean", 1e-10) {}
    val e = intercept[IllegalArgumentException] {
      rogue.write.overwrite().save(tmp("rogue"))
    }
    assert(e.getMessage.contains("own writer"))
  }
}
