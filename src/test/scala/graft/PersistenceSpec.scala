package graft

import graft.clustering.{GeneralizedKMeans, GeneralizedKMeansModel}
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.functions._

/** Model persistence: full param-map roundtrip (r1/r2 advice), Pipeline
  * compatibility, and user-column preservation in transform.
  */
class PersistenceSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("gkm-persist").toString

  private def data = {
    import spark.implicits._
    val rnd = new java.util.Random(2)
    (1 to 120).map { i =>
      val c = if (i % 3 == 0) 0.0 else if (i % 3 == 1) 10.0 else -10.0
      (i.toLong, Seq(c + rnd.nextGaussian(), c + rnd.nextGaussian()))
    }.toDF("id", "embedding")
  }

  test("save/load roundtrip preserves ALL params (non-default featuresCol)") {
    val df = data
    val model = new GeneralizedKMeans()
      .setK(3).setSeed(5).setMaxIter(10)
      .setFeaturesCol("embedding").setPredictionCol("cl").setDistanceCol("d")
      .fit(df)
    val path = tmpDir() + "/m"
    model.save(path, spark)
    val loaded = GeneralizedKMeansModel.load(path, spark)
    assert(loaded.getFeaturesCol == "embedding")
    assert(loaded.getPredictionCol == "cl")
    assert(loaded.getDistanceCol == "d")
    assert(loaded.uid == model.uid)
    assert(loaded.clusterCenters.map(_.toSeq).toSeq == model.clusterCenters.map(_.toSeq).toSeq)
    // the reloaded model must transform the SAME frame without renames
    val out = loaded.transform(df)
    assert(out.columns.contains("cl") && out.columns.contains("d"))
    assert(out.count() == 120)
    // predictions agree with the original model
    val a = model.transform(df).select("id", "cl").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = out.select("id", "cl").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("model runs inside a Pipeline and survives PipelineModel save/load") {
    val df = data
    val pipe = new Pipeline().setStages(Array(
      new GeneralizedKMeans().setK(3).setSeed(5).setMaxIter(10)
        .setFeaturesCol("embedding").setPredictionCol("cl")))
    val pm = pipe.fit(df)
    val path = tmpDir() + "/pipe"
    pm.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    val out = loaded.transform(df)
    assert(out.columns.contains("cl"))
    assert(out.select("cl").distinct().count() == 3)
  }

  test("estimator save/load (DefaultParamsWritable)") {
    val est = new GeneralizedKMeans().setK(7).setDivergence("kl").setMaxIter(3)
    val path = tmpDir() + "/est"
    est.write.overwrite().save(path)
    val loaded = GeneralizedKMeans.load(path)
    assert(loaded.getK == 7)
    assert(loaded.getDivergence == "kl")
    assert(loaded.getMaxIter == 3)
  }

  test("transform preserves pre-existing user columns named cluster/dist") {
    val df = data
      .withColumn("cluster", lit("user-cluster"))
      .withColumn("dist", lit(-1.5))
    val model = new GeneralizedKMeans()
      .setK(3).setSeed(5).setMaxIter(5).setFeaturesCol("embedding")
      .fit(df)
    val out = model.transform(df)
    assert(out.columns.count(_ == "cluster") == 1)
    assert(out.select("cluster").head().getString(0) == "user-cluster")
    assert(out.select("dist").head().getDouble(0) == -1.5)
    assert(out.columns.contains("prediction"))
  }
}
