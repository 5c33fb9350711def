package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`/`array<double>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus, so the corpus is scanned once with no
  * shuffle of the big side. Scale path: IVF — partition the corpus by
  * nearest coarse centroid (trained with graft k-means), then search only
  * the nProbe closest cells; the corpus side is pre-bucketed so a query
  * touches |corpus| * nProbe / nCells rows.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns, pure Catalyst. */
  def cosineSim(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Sign-bit LSH signature: for plane p, the sign of <x, r_p> where r_p is
    * a deterministic pseudo-random unit direction derived from
    * hash(seed, p, dim-index). Pure expressions — no RNG state, fully
    * reproducible across executors.
    */
  def hyperplaneSignature(vec: Column, numPlanes: Int, seed: Long): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until numPlanes).map { p =>
      // r_p[i] = hash(seed, p, i) mapped to [-1, 1)
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * (pmod(xxhash64(lit(seed), lit(p), i), lit(2000000L)).cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0), (acc, t) => acc + t)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Brute-force cosine top-k: broadcast the query set, scan the corpus
    * once, per-query top-k via min_by-style window on (sim desc, id asc).
    * Deterministic tie-break on corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
    val scored = joined.withColumn("sim", cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), round(col("sim"), 6).as("cosine"))
  }

  /** IVF (inverted-file) approximate top-k: assign corpus rows to coarse
    * cells once (nearest centroid), assign each query to its nProbe
    * closest cells, and only score rows in those cells. The corpus-side
    * cell assignment is reusable across queries (write it out once for a
    * static corpus). Join is an equi-join on cell id — shuffle-free on the
    * broadcast query side.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Array[Array[Double]],
      nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    import graft.kernels.SquaredEuclideanKernel
    val kern = new SquaredEuclideanKernel
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val cellUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      var best = 0; var bd = Double.MaxValue
      var i = 0
      while (i < bc.value.length) {
        val d = kern.divergence(x, bc.value(i)); if (d < bd) { bd = d; best = i }; i += 1
      }
      best
    }
    val probeUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      bc.value.indices.map(i => (kern.divergence(x, bc.value(i)), i))
        .sortBy(t => (t._1, t._2)).take(nProbe).map(_._2)
    }
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", cellUdf(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(probeUdf(col("qv"))))
    val joined = c.join(broadcast(q), Seq("cell"))
      .where(if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
    val scored = joined.withColumn("sim", cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), round(col("sim"), 6).as("cosine"))
  }
}
