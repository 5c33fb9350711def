package graft.tools

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.security.MessageDigest

/** One-off generator for the checked-in LayoutV1 interchange fixture
  * (`src/test/resources/fixtures/layoutv1/gkm_kl_k3d4/`).
  *
  * Deliberately does NOT go through [[graft.clustering.InterchangeV1]]:
  * it re-implements the REFERENCE writer's recipe independently —
  * field-for-field metadata in the reference's own key order, the
  * (center_id, weight, vector) parquet schema, the toJSON-in-center_id-
  * order SHA-256, and the two-pass metadata self-hash
  * (reference: df/persistence/PersistenceLayout.scala:82-144,
  * ml/GeneralizedKMeansModel.scala:262-335). InterchangeSpec then loads
  * the pinned artifact with strict checksum verification, so a drift in
  * OUR reader against the reference layout fails even if our writer
  * drifts the same way.
  *
  * Center values are sums of powers of two, so their JSON rendering (and
  * therefore the checksum) is stable across Spark/JVM versions.
  */
object MakeLayoutFixture {

  private def sha256(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes).map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/layoutv1/gkm_kl_k3d4")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val centers = Seq(
      (0, 1.0, Vectors.dense(0.5, 1.25, 2.0, 0.125)),
      (1, 1.0, Vectors.dense(3.75, 0.25, 1.5, 2.5)),
      (2, 1.0, Vectors.dense(0.0625, 4.0, 0.75, 1.0)))
    centers.toDF("center_id", "weight", "vector")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/centers.parquet")
    val cHash = sha256(
      spark.read.parquet(s"$out/centers.parquet").orderBy("center_id")
        .toJSON.collect().mkString("\n").getBytes(StandardCharsets.UTF_8))

    // metadata in the reference writer's field order; params carry a
    // non-default divergence config plus an unknown forward-compat key
    // the loader must ignore
    def meta(selfHash: String): String =
      s"""{"layoutVersion":1,"algo":"GeneralizedKMeansModel","sparkMLVersion":"3.5.0","scalaBinaryVersion":"2.13","divergence":"kl","k":3,"dim":4,"uid":"gkmeans_ref_fixture","kernelName":"KL(smoothing=1.0E-9)","params":{"maxIter":25,"tol":1.0E-5,"seed":4242,"assignmentStrategy":"auto","smoothing":1.0E-9,"emptyClusterStrategy":"reseedRandom","checkpointInterval":10,"initMode":"k-means||","initSteps":2,"featuresCol":"features","predictionCol":"prediction","distanceCol":"","weightCol":"","checkpointDir":"","futureParamOurReaderMustIgnore":true},"centers":{"count":3,"ordering":"center_id ASC (0..k-1)","storage":"parquet"},"checksums":{"centersParquetSHA256":"$cHash","metadataCanonicalSHA256":"$selfHash"}}"""

    val metaHash = sha256(meta("").getBytes(StandardCharsets.UTF_8))
    val p = Paths.get(s"$out/metadata.json")
    Files.createDirectories(p.getParent)
    Files.write(p, meta(metaHash).getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

    Files.write(Paths.get(s"$out/summary.json"),
      """{"iterations":7,"initialization":"k-means||","events":[{"iter":0,"distortion":41.5,"moved":3},{"iter":1,"distortion":12.25,"moved":1}],"strategy":"lloyd","elapsedMillis":1234}"""
        .getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

    println(s"fixture written to $out (centers sha $cHash)")
    spark.stop()
  }
}
