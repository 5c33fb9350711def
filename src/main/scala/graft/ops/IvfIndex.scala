package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.clustering.GeneralizedKMeans
import graft.kernels.SquaredEuclideanKernel

/** Materialized IVF (inverted-file) index for a static corpus.
  *
  * [[Similarity.ivfTopK]] recomputes the corpus→cell assignment on every
  * call — right for ad-hoc use, wasteful for the static-corpus case (the
  * common one: index once, serve many query batches). This builds the cell
  * assignment ONCE and either keeps it cached ([[IvfIndex.build]]) or
  * persists it to parquet **partitioned by cell**
  * ([[IvfIndex#write]] / [[IvfIndex.load]]), so a probe of `nProbe` cells
  * is a partition-pruned scan reading `nProbe/nCells` of the data — at
  * 100 TB that is the difference between scanning 100 TB and ~1 TB per
  * query batch.
  *
  * (reference has no ANN surface; this is part of the LLM-pipeline brief.
  * Coarse quantizer = graft k-means, same as FAISS's IVF-flat design.)
  */
final class IvfIndex private (
    val cells: DataFrame, // (corpus_id, cv: array<double>, cell: int)
    val centroids: Array[Array[Double]]) {

  /** Approximate cosine top-k for a (small, broadcastable) query set.
    * Queries probe their `nProbe` nearest cells; only those cells' rows
    * are scored. Equi-join on cell id; deterministic tie-break.
    */
  def search(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val kern = new SquaredEuclideanKernel
    val probeUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      bc.value.indices.map(i => (kern.divergence(x, bc.value(i)), i))
        .sortBy(t => (t._1, t._2)).take(nProbe).map(_._2)
    }
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(probeUdf(col("qv"))))
    // Broadcast the query side: the corpus side (disk-backed, partitioned
    // by cell) is filtered by partition pruning before the join when the
    // probed cell set is known; in-memory it is a hash equi-join on cell.
    val joined = cells.join(broadcast(q), Seq("cell"))
      .where(if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
    Similarity.topKByCosine(joined, k)
  }

  /** Persist the index: cells as parquet PARTITIONED BY cell (so probes
    * prune partitions), centroids as a small parquet of (cell, centroid).
    */
  def write(path: String): Unit = {
    cells.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val spark = cells.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.toSeq.toDF("centroid", "cell")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  def unpersist(): Unit = { cells.unpersist(); () }
}

object IvfIndex {

  /** Build the index in memory: train the coarse quantizer (graft k-means
    * on a single persisted projection — no re-validation/re-count jobs),
    * assign every corpus row to its nearest cell, persist the result.
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      maxIter: Int = 5,
      seed: Long = 42L): IvfIndex = {
    // fan out before persisting: the coarse-quantizer fit and the cell
    // assignment both scan this cached frame with CPU-heavy closures and
    // would otherwise inherit a single-row-group file's 1-task parallelism
    val c = Dedup.fanOut(corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = c.count()
    // random init: a coarse quantizer needs rough Voronoi cells, not
    // optimal clusters (FAISS trains IVF the same way) — k-means|| would
    // cost ~2 extra scans per init step for no recall benefit at nProbe>=2
    val gk = new GeneralizedKMeans()
      .setK(nCells).setFeaturesCol("cv").setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
    gk.reuseCachedInput = true
    gk.knownN = Some(n)
    val model = gk.fit(c)
    val cents = model.clusterCenters
    val cells = assignCells(c, cents)
    c.unpersist()
    new IvfIndex(cells, cents)
  }

  /** Build with a CALLER-SUPPLIED coarse quantizer instead of training
    * one — FAISS's `clustering_index` analogue. The index is then fully
    * DETERMINISTIC in its inputs: same centers, same cells, same probe
    * sets, which makes the cell-PRUNED search path (nProbe < nCells)
    * engine-replayable end to end (harness query q_ann_ivf_pruned) and
    * lets a quantizer trained on a sample, an earlier corpus snapshot,
    * or another engine be reused verbatim. Cell i = index i in
    * `centers`; nearest-center ties resolve to the lowest index.
    */
  def buildWithCenters(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centers: Array[Array[Double]]): IvfIndex = {
    require(centers.nonEmpty, "centers must be non-empty")
    // clone ONCE and use the clone everywhere: assignment broadcasts and
    // the stored centroids must be the same snapshot, or a caller-side
    // mutation after return could desynchronize a recomputed cells
    // partition from the probe-side centroids
    val snap = centers.map(_.clone)
    val c = Dedup.fanOut(corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cells = assignCells(c, snap)
    c.unpersist()
    new IvfIndex(cells, snap)
  }

  /** Nearest-center cell assignment, materialized once so every later
    * search skips it. Ties resolve to the lowest cell index.
    */
  private def assignCells(c: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val bc = c.sparkSession.sparkContext.broadcast(cents)
    val kern = new SquaredEuclideanKernel
    val cellUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      var best = 0; var bd = Double.MaxValue
      var i = 0
      while (i < bc.value.length) {
        val d = kern.divergence(x, bc.value(i)); if (d < bd) { bd = d; best = i }; i += 1
      }
      best
    }
    val cells = c.withColumn("cell", cellUdf(col("cv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cells.count()
    cells
  }

  /** Append a new batch to a WRITTEN index without retraining — the
    * ANN-side analogue of [[IncrementalDedup]]'s ingest path: the
    * persisted quantizer assigns the batch to cells (bit-identical rule
    * to build/load: nearest center, ties to the lowest index), and the
    * rows append into their cell partitions. Ingest cost is one batch
    * scan plus a partitioned write touching only the batch's cells —
    * independent of index size. Returns the number of rows appended.
    *
    * The quantizer is FROZEN by design: as the corpus distribution
    * drifts, cell populations skew, which degrades probe recall/cost
    * balance but never correctness (a probe still searches the nProbe
    * nearest cells of whatever is stored). Periodic retrain + rewrite
    * is the maintenance story, same as FAISS IVF. Batch ids must be
    * new — append performs no dedup (run the corpus through
    * [[IncrementalDedup]] first; that is the pipeline order anyway).
    */
  def append(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String): Long = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(cents.nonEmpty, s"no centroids at $path — not a written IvfIndex")
    val c = Dedup.fanOut(batch
      .select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv")))
    val cells = assignCells(c, cents)
    try {
      val n = cells.count()
      cells.write.mode("append").partitionBy("cell").parquet(s"$path/cells")
      n
    } finally { cells.unpersist(); () }
  }

  /** Reopen a written index. The cells scan stays lazy — Spark prunes the
    * `cell=` partitions a probe filter selects.
    */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val cells = spark.read.parquet(s"$path/cells")
      .select(col("corpus_id"), col("cv"), col("cell").cast("int").as("cell"))
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    new IvfIndex(cells, cents)
  }
}
