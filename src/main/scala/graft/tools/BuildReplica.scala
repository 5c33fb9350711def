package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-replica builder for the local scale-curve measurements: writes an
  * N-times row-replication of an sf directory's `documents` and
  * `embeddings` tables (the tables the dedup/curation/ANN family reads).
  *
  * Recipe — the same one the recorded sf1 points in PLANS.md used, now a
  * repo tool so the curve is reproducible:
  *  - documents: replica r > 0 prefixes EVERY token with "r<r>x" and
  *    offsets doc_id by r * 10^9. A constant per-replica prefix means no
  *    shingle ever matches across replicas, so the near-dup/substring
  *    structure of the base corpus is preserved per replica — dedup work
  *    grows linearly with rows, the honest scale shape (a naive copy
  *    would make every doc a cross-replica duplicate and explode the
  *    pair count quadratically). n_chars is recomputed from the new text.
  *  - embeddings: replica r > 0 adds deterministic per-(replica, vec)
  *    gaussian noise (sigma 0.05) and offsets vec_id — cosine structure
  *    persists, exact duplicates do not.
  *  - replica 0 is the untouched base, so sf0.1 results embed verbatim.
  *
  * Usage: runMain graft.tools.BuildReplica <srcSfDir> <outDir> <factor>
  */
object BuildReplica {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 2, s"factor must be >= 2, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idStride = 1000000000L

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docReplicas = (0 until factor).map { r =>
      if (r == 0) docs
      else {
        val pfx = s"r${r}x"
        docs.select(
          (col("doc_id") + lit(r * idStride)).as("doc_id"),
          array_join(transform(split(col("text"), " "), t => concat(lit(pfx), t)), " ")
            .as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")))
          .select("doc_id", "text", "lang", "source", "n_chars")
      }
    }
    docReplicas.reduce(_ union _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val noisyUdf = udf { (v: Seq[Float], vecId: Long, r: Int) =>
      val rnd = new java.util.Random(r.toLong * 1000003L + vecId)
      v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    }
    val embReplicas = (0 until factor).map { r =>
      if (r == 0) emb
      else emb.select(
        (col("vec_id") + lit(r * idStride)).as("vec_id"),
        noisyUdf(col("embedding"), col("vec_id"), lit(r)).as("embedding"),
        col("label"))
    }
    embReplicas.reduce(_ union _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events: replica r offsets event_id AND user_id by the id stride —
    // distinct users per replica means no session ever merges across
    // replicas, so the gap/session structure of the base is preserved
    // per replica and sessionization work grows LINEARLY with rows (the
    // honest scale shape; duplicating user_ids would instead interleave
    // identical timestamps into degenerate mega-sessions). ts is
    // unchanged: event-time distribution is scale-invariant.
    val evSrc = new java.io.File(s"$srcDir/events.parquet")
    if (evSrc.exists()) {
      val ev = spark.read.parquet(s"$srcDir/events.parquet")
      val evReplicas = (0 until factor).map { r =>
        if (r == 0) ev
        else ev.withColumn("event_id", col("event_id") + lit(r * idStride))
          .withColumn("user_id", col("user_id") + lit(r * idStride))
      }
      evReplicas.reduce(_ union _)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    // the relational tables are read by queries outside the scale
    // family — copy them so the outDir is a complete sf layout
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        val src = new org.apache.hadoop.fs.Path(s"$srcDir/$t.parquet")
        if (fs.exists(src))
          org.apache.hadoop.fs.FileUtil.copy(fs, src,
            fs, new org.apache.hadoop.fs.Path(s"$outDir/$t.parquet"),
            false, spark.sparkContext.hadoopConfiguration)
      }
    println(s"replica x$factor of $srcDir written to $outDir")
    spark.stop()
  }
}
