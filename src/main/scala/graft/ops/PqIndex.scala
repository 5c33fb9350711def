package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.clustering.{GeneralizedKMeans, LocalLloyds}
import graft.kernels.SquaredEuclideanKernel

/** Product quantization for the ANN path.
  *
  * A 64-dim float corpus row costs 512 bytes as doubles; its PQ code is
  * `m` small integers (m=8 -> 8 bytes at ksub<=256). At 100 TB of
  * embeddings that is the difference between a corpus that fits in
  * cluster memory and one that does not — IVF partition pruning bounds
  * the rows a probe READS, PQ bounds the bytes each row COSTS.
  *
  * Codebooks: the vector splits into `m` contiguous subspaces; each
  * subspace gets its own ksub-codeword k-means codebook (trained on a
  * driver-local sample, like FAISS's PQ training — the codebook is
  * k*dsub small, the corpus is what must stay distributed). Encoding
  * maps each subvector to its nearest codeword id. Search uses ADC
  * (asymmetric distance computation): per query, one lookup table of
  * dot(query_sub, codeword) per (subspace, codeword); a row's
  * approximate dot product is m table lookups, no float math on the
  * corpus side.
  *
  * (reference has no ANN surface; LLM-pipeline brief. Design follows
  * Jegou, Douze, Schmid 2011, "Product Quantization for Nearest
  * Neighbor Search".)
  */
final case class PqCodebook(
    codebooks: Array[Array[Array[Double]]], // [m][ksub][dsub]
    dim: Int) extends Serializable {
  require(codebooks.forall(_.length == codebooks(0).length),
    "ragged codebooks: every subspace must carry the same codeword count " +
      "(the ADC lookup table is strided by it)")
  require(codebooks.nonEmpty && dim % codebooks.length == 0,
    s"dim=$dim must divide evenly into m=${codebooks.length} subspaces")
  require(codebooks.forall(_.forall(_.length == dim / codebooks.length)),
    s"every codeword must have length dim/m=${dim / codebooks.length}: " +
      "encode/decode stride subvectors by that width")

  def m: Int = codebooks.length
  def ksub: Int = codebooks(0).length
  def dsub: Int = dim / m

  /** Nearest-codeword id per subspace. */
  def encode(v: Array[Double]): Array[Short] = {
    val out = new Array[Short](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < codebooks(s).length) {
        val cw = codebooks(s)(c)
        var d = 0.0
        var i = 0
        while (i < dsub) { val t = v(off + i) - cw(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(s) = best.toShort
      s += 1
    }
    out
  }

  /** ADC lookup table for one query: lut(s*ksub + c) = dot(q_sub_s, cw_c). */
  def dotLut(q: Array[Double]): Array[Double] = {
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var c = 0
      while (c < codebooks(s).length) {
        val cw = codebooks(s)(c)
        var d = 0.0
        var i = 0
        while (i < dsub) { d += q(off + i) * cw(i); i += 1 }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    lut
  }

  /** Approximate dot(query, decoded(codes)) from a precomputed table. */
  def adcDot(lut: Array[Double], codes: Array[Short]): Double = {
    var d = 0.0
    var s = 0
    while (s < m) { d += lut(s * ksub + codes(s)); s += 1 }
    d
  }

  /** Decoded (reconstructed) vector — for diagnostics/tests. */
  def decode(codes: Array[Short]): Array[Double] = {
    val v = new Array[Double](dim)
    var s = 0
    while (s < m) {
      System.arraycopy(codebooks(s)(codes(s)), 0, v, s * dsub, dsub)
      s += 1
    }
    v
  }
}

object PqCodebook {

  /** Train per-subspace codebooks on a driver-local sample of the corpus
    * (the codebook is m*ksub*dsub doubles — tiny; sampling to the driver
    * is the standard PQ training shape, not a scale compromise).
    */
  def train(
      corpus: DataFrame,
      vecCol: String,
      m: Int,
      ksub: Int,
      sampleSize: Int = 10000,
      maxIter: Int = 10,
      seed: Long = 42L,
      knownN: Option[Long] = None,
      knownDim: Option[Int] = None): PqCodebook = {
    // knownN/knownDim let a caller that already scanned the frame (e.g.
    // IvfPqIndex.build counts it for the coarse quantizer) skip two jobs
    val dim = knownDim.getOrElse(
      corpus.select(col(vecCol).cast("array<double>")).head().getSeq[Double](0).length)
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val n = knownN.getOrElse(corpus.count())
    val frac = math.min(1.0, sampleSize.toDouble * 2 / math.max(1L, n))
    val sample = corpus.select(col(vecCol).cast("array<double>").as("v"))
      .sample(withReplacement = false, frac, seed)
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    fromSample(sample, dim, m, ksub, maxIter, seed)
  }

  /** Train codebooks from an in-memory sample (one local k-means per
    * subspace via the shared LocalLloyds routine).
    */
  def fromSample(
      sample: Array[Array[Double]],
      dim: Int,
      m: Int,
      ksub: Int,
      maxIter: Int = 10,
      seed: Long = 42L): PqCodebook = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val dsub = dim / m
    val kern = new SquaredEuclideanKernel
    val w = Array.fill(sample.length)(1.0)
    val kTarget = math.min(ksub, sample.length)
    val books = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val trained = LocalLloyds.run(sub, w, kTarget, kern, maxIter, 1e-6, seed + s)
      // LocalLloyds drops emptied clusters; pad back to a UNIFORM kTarget
      // with copies of codeword 0 so the ADC stride stays rectangular.
      // Padded duplicates sit at higher code ids, so the encode argmin's
      // first-wins tie-break can never select them — dead code space,
      // never wrong scores.
      if (trained.length == kTarget) trained
      else trained ++ Array.fill(kTarget - trained.length)(trained(0).clone)
    }
    PqCodebook(books, dim)
  }

  /** Deterministic codebook from explicit vectors (subvector c of vector
    * c is codeword c in every subspace) — no training, so the whole
    * encode/ADC pipeline is SQL-replayable for the oracle harness.
    */
  def fromVectors(vectors: Array[Array[Double]], m: Int): PqCodebook = {
    require(vectors.nonEmpty, "no codebook vectors")
    val dim = vectors(0).length
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val books = Array.tabulate(m) { s =>
      vectors.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
    }
    PqCodebook(books, dim)
  }
}

/** IVF + PQ index: coarse cells for partition-pruned probes (same design
  * as [[IvfIndex]]) with PQ codes instead of raw vectors in the cells —
  * `codes` plus the row's norm are all a probe reads.
  *
  * With `residual = true` (the default, the IVFADC shape of Jegou/Douze/
  * Schmid 2011 §IV), the codebooks are trained on and encode x − c(x)
  * (the vector's offset from its cell centroid) instead of x itself:
  * residuals span a much smaller region than the raw corpus, so the same
  * m×ksub code budget quantizes them with far less error, and the ADC
  * estimate becomes dot(q, centroid) + adcDot(residual codes) — the
  * per-cell constant is driver-computed for the probed cells only.
  */
final class IvfPqIndex private[ops] (
    val cells: DataFrame, // (corpus_id, cell, codes: array<short>, norm)
    val centroids: Array[Array[Double]],
    val codebook: PqCodebook,
    val residual: Boolean = true) {

  /** Approximate cosine top-k: probe nProbe cells, score by
    * ADC dot / (|q| * stored corpus norm). The per-query LUT is built
    * once on the driver (queries are the small side) and broadcast.
    */
  def search(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val bcCent = spark.sparkContext.broadcast(centroids)
    val kern = new SquaredEuclideanKernel
    val qRows = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qRows.map(_._1).distinct.length == qRows.length,
      "duplicate query ids: the per-query ADC lookup table is keyed by id, " +
        "so duplicates would silently collapse (last one wins)")
    val cb = codebook
    import spark.implicits._
    val probePairs = qRows.flatMap { case (id, q) =>
      bcCent.value.indices.map(i => (kern.divergence(q, bcCent.value(i)), i))
        .sortBy(t => (t._1, t._2)).take(nProbe).map { case (_, cellId) => (id, cellId) }
    }.toSeq
    val probedByQuery = probePairs.groupBy(_._1)
    // per query: residual-ADC lookup table, |q|, and — in residual mode —
    // dot(q, centroid) for each of ITS probed cells (nProbe values; the
    // cell constant completes dot(q, x) ≈ dot(q, c) + dot(q, x − c))
    val isResidual = residual
    val luts: Map[Long, (Array[Double], Double, Map[Int, Double])] = qRows.map { case (id, q) =>
      val qn = math.sqrt(q.map(x => x * x).sum)
      val cellDots: Map[Int, Double] =
        if (!isResidual) Map.empty
        else probedByQuery.getOrElse(id, Nil).map { case (_, cellId) =>
          val cent = bcCent.value(cellId)
          var d = 0.0
          var i = 0
          while (i < q.length) { d += q(i) * cent(i); i += 1 }
          cellId -> d
        }.toMap
      id -> (cb.dotLut(q), qn, cellDots)
    }.toMap
    val bcLut = spark.sparkContext.broadcast(luts)
    val probes = probePairs.toDF("query_id", "cell")
    val scoreUdf = udf { (qid: Long, cell: Int, codes: Seq[Short], norm: Double) =>
      val (lut, qn, cellDots) = bcLut.value(qid)
      val d = cellDots.getOrElse(cell, 0.0) + cb.adcDot(lut, codes.toArray)
      if (qn > 0 && norm > 0) d / (qn * norm) else 0.0
    }
    // probe cells are driver-known (the query side was collected to build
    // the LUTs), so push a STATIC cell IN (...) filter into the scan —
    // guaranteed partition pruning on the on-disk layout, independent of
    // whether DPP fires for a LocalRelation-built broadcast side
    val probedCells = probePairs.map(_._2).distinct
    val joined = cells.where(col("cell").isin(probedCells: _*))
      .join(broadcast(probes), Seq("cell"))
      .where(if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
      .withColumn("sim", scoreUdf(col("query_id"), col("cell"), col("codes"), col("norm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("corpus_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), round(col("sim"), 6).as("cosine"))
  }

  /** ADC candidates + exact rerank (the FAISS IVFPQ+refine shape): the
    * coded cells produce `rerankK` candidates per query cheaply; only
    * those candidate ids join back to the full-precision corpus for the
    * exact cosine top-k. At scale the exact pass touches k' rows per
    * query instead of the probed cells' full contents — PQ bounds the
    * candidate scan's bytes, the rerank join bounds the float math.
    * `corpus` must carry the same id/vector columns the index was built
    * from (any frame with those columns works, e.g. the original table).
    */
  def searchRerank(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      corpus: DataFrame,
      k: Int,
      nProbe: Int = 2,
      rerankK: Int = 50,
      excludeSelf: Boolean = true): DataFrame = {
    require(rerankK >= k, s"rerankK=$rerankK must be >= k=$k")
    val cand = search(queries, idCol, vecCol, rerankK, nProbe, excludeSelf)
      .select(col("query_id"), col("corpus_id"))
    val cvs = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val qvs = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val exact = cand
      .join(cvs, Seq("corpus_id"))
      .join(broadcast(qvs), Seq("query_id"))
      .withColumn("sim", Similarity.cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("corpus_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), round(col("sim"), 6).as("cosine"))
  }

  /** Measured recall@k vs nProbe for the PRODUCTION path
    * ([[searchRerank]] — ADC candidates + exact rerank) against the
    * exact brute-force top-k, on a seeded sample of corpus vectors.
    * Unlike [[IvfIndex#recallCurve]]'s one-pass derivation, PQ recall
    * must be measured DIRECTLY per probe width: a true neighbor inside
    * a probed cell can still be dropped when the quantized ADC score
    * pushes it out of the rerankK candidate pool, so candidacy does not
    * imply retrieval and the cell-rank histogram is only an upper
    * bound. Cost: one sample × corpus brute-force pass + one
    * searchRerank per entry of `nProbes` — maintenance-cadence.
    * Returns (nProbe, recall) rows; deterministic given (seed, index).
    */
  def recallCurve(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbes: Seq[Int] = Seq(1, 2, 4, 8),
      rerankK: Int = 50,
      sampleN: Int = 256,
      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    require(k > 0 && sampleN > 0, "IvfPqIndex.recallCurve: k, sampleN > 0")
    require(nProbes.nonEmpty && nProbes.forall(_ > 0),
      "IvfPqIndex.recallCurve: nProbes must be positive")
    // the sample keeps the CALLER's column names: searchRerank applies
    // one (idCol, vecCol) pair to both its query and corpus sides
    val queries = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol).cast("long"), lit(seed)),
        col(idCol))
      .limit(sampleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    queries.count()
    try {
      val exact = Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
        .select(col("query_id"), col("corpus_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      require(exact.nonEmpty, "IvfPqIndex.recallCurve: empty corpus or sample")
      import spark.implicits._
      nProbes.sorted.map { p =>
        val got = searchRerank(queries, idCol, vecCol, corpus, k, p, rerankK)
          .select(col("query_id"), col("corpus_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (p, got.intersect(exact).size.toDouble / exact.size)
      }.toDF("nProbe", "recall")
    } finally { queries.unpersist(); () }
  }

  /** The smallest of `nProbes` whose measured [[recallCurve]] recall@k
    * meets `targetRecall`, or −1 when none does (unlike the IVF-flat
    * sizing, PQ recall is capped by the code budget — a −1 answer
    * means raise rerankK / m / ksub, not just nProbe; the quantized
    * candidate ordering, not the probe width, is then the binding
    * constraint).
    */
  def probeFor(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      targetRecall: Double,
      k: Int = 10,
      nProbes: Seq[Int] = Seq(1, 2, 4, 8),
      rerankK: Int = 50,
      sampleN: Int = 256,
      seed: Long = 42L): Int = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"IvfPqIndex.probeFor: targetRecall in (0, 1], got $targetRecall")
    recallCurve(corpus, idCol, vecCol, k, nProbes, rerankK, sampleN, seed)
      .where(col("recall") >= targetRecall)
      .orderBy(col("nProbe"))
      .collect().headOption.map(_.getInt(0)).getOrElse(-1)
  }

  /** Persist: coded cells partitioned by cell (probe = partition-pruned
    * scan of codes, not vectors), centroids + codebook as small parquet.
    */
  def write(path: String): Unit = {
    cells.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val spark = cells.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.toSeq.toDF("centroid", "cell")
      .write.mode("overwrite").parquet(s"$path/centroids")
    val cbRows = for {
      s <- codebook.codebooks.indices
      c <- codebook.codebooks(s).indices
    } yield (s, c, codebook.codebooks(s)(c).toSeq)
    cbRows.toDF("subspace", "code", "codeword")
      .write.mode("overwrite").parquet(s"$path/codebook")
    Seq(Tuple1(residual)).toDF("residual")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def unpersist(): Unit = { cells.unpersist(); () }

  /** Operational health — the frozen-quantizer drift audit, the
    * IDENTICAL code path as [[IvfIndex#health]]
    * ([[IvfIndex.cellHealth]]; hash-gated via q_ann_ivf_health):
    * (n_vectors, n_cells, max_cell, avg_cell, imbalance,
    * recommended_cells). As [[IvfPqIndex.append]] drifts the corpus
    * away from the trained coarse quantizer AND codebooks, cell skew is
    * the visible symptom (quantization error drifts silently with it —
    * both come from the same distribution shift). When
    * `recommended_cells` outgrows `n_cells`, [[IvfPqIndex.retrain]]
    * from the ORIGINAL corpus at the maintenance window.
    */
  def health(): DataFrame = IvfIndex.cellHealth(cells, centroids.length)
}

object IvfPqIndex {

  /** ONE fused pass encoding a batch against FROZEN model state —
    * nearest-cell assignment, raw norm, residual (when the index is
    * residual-mode), PQ codes — producing the exact cells schema.
    * Shared by [[append]]; bit-identical rule to [[build]]'s two-pass
    * form (same tie-break, same residual arithmetic, same codebook
    * argmin).
    */
  private def encodeBatch(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Double]],
      cb: PqCodebook,
      residual: Boolean): DataFrame = {
    val c = Dedup.fanOut(batch
      .select(col(idCol).cast("long").as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv")))
    val spark = c.sparkSession
    val bcCent = spark.sparkContext.broadcast(cents)
    val bcCb = spark.sparkContext.broadcast(cb)
    val kern = new SquaredEuclideanKernel
    val u = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      var best = 0; var bd = Double.MaxValue
      var i = 0
      while (i < bcCent.value.length) {
        val d = kern.divergence(x, bcCent.value(i))
        if (d < bd) { bd = d; best = i }
        i += 1
      }
      val norm = math.sqrt(x.map(v => v * v).sum)
      val enc =
        if (residual) {
          val cent = bcCent.value(best)
          val r = new Array[Double](x.length)
          var j = 0
          while (j < x.length) { r(j) = x(j) - cent(j); j += 1 }
          r
        } else x
      (best, bcCb.value.encode(enc), norm)
    }
    c.withColumn("__a", u(col("cv")))
      .select(col("corpus_id"), col("__a._1").as("cell"),
        col("__a._2").as("codes"), col("__a._3").as("norm"))
  }

  /** Append a new batch to a WRITTEN index without retraining — the
    * PQ twin of [[IvfIndex.append]]: the persisted coarse quantizer
    * assigns cells, the persisted CODEBOOKS encode (frozen by design —
    * codes from different codebooks cannot share an ADC table), and
    * the rows append into their cell partitions. Batch-proportional
    * cost; returns rows appended. Batch ids must be new (dedup first).
    * Distribution drift degrades quantization error as well as cell
    * balance — [[IvfPqIndex#health]] surfaces the latter; retrain from
    * the original corpus when it grows.
    */
  def append(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      vecCol: String): Long = {
    val idx = load(spark, path)
    val enc = encodeBatch(batch, idCol, vecCol, idx.centroids,
      idx.codebook, idx.residual)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = enc.count()
      enc.write.mode("append").partitionBy("cell").parquet(s"$path/cells")
      n
    } finally { enc.unpersist(); () }
  }

  /** STREAMING ingest into a WRITTEN index — the PQ twin of
    * [[IvfIndex.ingestStream]], same machinery end to end: each
    * micro-batch encodes against the FROZEN quantizer+codebooks
    * ([[append]] — one fused pass, cost ∝ batch, touching only the
    * batch's cell partitions) and the shared `ingest_meta.json` commit
    * marker gates replayed batches (re-delivered counts, skipped
    * appends). The crash-between-append-and-marker window re-appends
    * bit-identical coded rows; [[compact]] repairs at maintenance
    * cadence. Batch ids must be new for the index's lifetime.
    */
  def ingestStream(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      checkpointDir: String,
      sink: (Long, Long) => Unit = (_, _) => ()): org.apache.spark.sql.streaming.StreamingQuery =
    IvfIndex.markerGatedAppendStream(vectors, idCol, vecCol, path,
      checkpointDir, sink, "IvfPqIndex.ingestStream", append)

  /** Maintenance compaction — the PQ twin of [[IvfIndex.compact]]:
    * drop duplicate (corpus_id) coded rows (bit-identical by the
    * frozen-encoder determinism, so keep-any is exact) and rewrite via
    * the shared whole-dir stage-and-swap. Returns rows removed.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val cur = load(spark, path)
    IvfIndex.compactDedup(spark, path, "IvfPqIndex.compact", cur.cells)(
      d => new IvfPqIndex(d, cur.centroids, cur.codebook, cur.residual).write)
  }

  /** Retrain a WRITTEN index IN PLACE — from the ORIGINAL corpus, by
    * contract: PQ cells store lossy CODES only (the compression is the
    * point), and retraining codebooks on their own reconstructions
    * compounds quantization error instead of fixing it, so unlike
    * [[IvfIndex.retrain]] this cannot bootstrap from the store. `nCells
    * = 0` uses [[IvfIndex.recommendedCells]] of the corpus count;
    * `m/ksub = 0` keep the written index's code geometry. The WHOLE
    * index directory is staged as a sibling and swapped in one
    * delete+rename ([[IvfIndex.swapIndexDir]] — per-payload swaps
    * would open a crash window of new cells next to old
    * centroids/codebooks, a silently desynchronized index with no
    * digests to catch it; the whole-dir swap leaves either the intact
    * old index or a loudly-missing dir). Returns the RELOADED index.
    */
  def retrain(
      spark: SparkSession,
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int = 0,
      m: Int = 0,
      ksub: Int = 0,
      maxIter: Int = 5,
      sampleSize: Int = 10000,
      seed: Long = 42L): IvfPqIndex = {
    val cur = load(spark, path)
    val n = corpus.count()
    require(n > 0, "IvfPqIndex.retrain: empty corpus")
    val k = if (nCells > 0) nCells else IvfIndex.recommendedCells(n)
    val mm = if (m > 0) m else cur.codebook.m
    val kk = if (ksub > 0) ksub else cur.codebook.ksub
    val idx = build(corpus, idCol, vecCol, k, mm, kk, maxIter, sampleSize,
      seed, cur.residual)
    IvfIndex.swapIndexDir(spark, path, "IvfPqIndex.retrain")(idx.write)
    idx.unpersist()
    load(spark, path)
  }

  /** Build: train the coarse quantizer (shared with IvfIndex's design)
    * and the PQ codebooks, then encode every row ONCE. The cached cells
    * frame carries (id, cell, codes, norm) only — the raw vectors are
    * released after encoding.
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      m: Int = 8,
      ksub: Int = 256,
      maxIter: Int = 5,
      sampleSize: Int = 10000,
      seed: Long = 42L,
      residual: Boolean = true): IvfPqIndex = {
    val c = Dedup.fanOut(corpus
      .select(col(idCol).cast("long").as("corpus_id"), col(vecCol).cast("array<double>").as("cv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = c.count()
    val gk = new GeneralizedKMeans()
      .setK(nCells).setFeaturesCol("cv").setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
    gk.reuseCachedInput = true
    gk.knownN = Some(n)
    val cents = gk.fit(c).clusterCenters
    val spark = c.sparkSession
    val bcCent = spark.sparkContext.broadcast(cents)
    val kern = new SquaredEuclideanKernel
    // one assignment pass: (cell, encode-input vector, raw norm). In
    // residual mode the encode input is x − c(x); the norm is ALWAYS the
    // raw vector's (it is the cosine denominator at query time).
    val assignUdf = udf { (xs: Seq[Double]) =>
      val x = xs.toArray
      var best = 0; var bd = Double.MaxValue
      var i = 0
      while (i < bcCent.value.length) {
        val d = kern.divergence(x, bcCent.value(i)); if (d < bd) { bd = d; best = i }; i += 1
      }
      val norm = math.sqrt(x.map(v => v * v).sum)
      val enc =
        if (residual) {
          val cent = bcCent.value(best)
          val r = new Array[Double](x.length)
          var j = 0
          while (j < x.length) { r(j) = x(j) - cent(j); j += 1 }
          r
        } else x
      (best, enc, norm)
    }
    val assigned = c.withColumn("__a", assignUdf(col("cv")))
      .select(col("corpus_id"), col("__a._1").as("cell"),
        col("__a._2").as("ev"), col("__a._3").as("norm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    c.unpersist()
    // codebooks train on what they will encode — residuals in residual
    // mode (they span a far smaller region than the raw corpus, so the
    // same m x ksub budget quantizes them with much less error)
    val cb = PqCodebook.train(assigned, "ev", m, ksub, sampleSize, maxIter = 10, seed = seed,
      knownN = Some(n), knownDim = Some(cents(0).length))
    val bcCb = spark.sparkContext.broadcast(cb)
    val encodeUdf = udf { (ev: Seq[Double]) => bcCb.value.encode(ev.toArray) }
    val cells = assigned
      .select(col("corpus_id"), col("cell"), encodeUdf(col("ev")).as("codes"), col("norm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cells.count()
    assigned.unpersist()
    new IvfPqIndex(cells, cents, cb, residual)
  }

  /** Reopen a written index; the cells scan stays partition-prunable. */
  def load(spark: SparkSession, path: String): IvfPqIndex = {
    val cells = spark.read.parquet(s"$path/cells")
      .select(col("corpus_id"), col("cell").cast("int").as("cell"),
        col("codes"), col("norm"))
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell")).collect().map(_.getSeq[Double](0).toArray)
    val cbRows = spark.read.parquet(s"$path/codebook")
      .orderBy(col("subspace"), col("code")).collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(m) { s =>
      cbRows.filter(_.getInt(0) == s).map(_.getSeq[Double](2).toArray)
    }
    // indexes written before the residual flag existed carry no meta dir:
    // those were raw-encoded, so ABSENCE means false — but a present,
    // unreadable meta must propagate, not silently downgrade a residual
    // index to raw scoring (which would return wrong rankings, not errors)
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val residual =
      if (fs.exists(metaPath)) spark.read.parquet(s"$path/meta").head().getBoolean(0)
      else false
    new IvfPqIndex(cells, cents, PqCodebook(books, books(0)(0).length * m), residual)
  }
}
