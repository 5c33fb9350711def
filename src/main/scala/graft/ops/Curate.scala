package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-call corpus curation — the standard LLM training-data pipeline
  * composed from the engine's oracle-checked pieces:
  *
  *   1. language filter (n-gram heuristic language ID)
  *   2. quality filter (length/stopword/punctuation score)
  *   3. exact dedup (survivor = min id per identical text)
  *   4. near-dup grouping (MinHash-banded candidates, exact word-shingle
  *      Jaccard confirm, connected components)
  *   5. representative selection (max quality, tie -> min id, per group)
  *
  * Every stage is a shuffle-based DataFrame transform (hash aggregations,
  * banded equi-joins, BSP label propagation) — no driver collection — so
  * the pipeline holds at corpus scale; and every stage is deterministic,
  * so the whole composition is DuckDB-oracle-checkable end to end
  * (harness query q_curate_corpus).
  */
object Curate {

  /** Curate `docs`, returning surviving (doc_id, quality, n_tokens) rows.
    *
    * OWNERSHIP: the returned DataFrame is persisted (already
    * materialized); the caller owns the release — same contract as
    * [[Dedup.minhashDedup]].
    */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.7,
      shingleSize: Int = 3): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .withColumn("lang", TextOps.langId(col("text")))
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .where(col("lang") === lit(lang) && col("quality") >= lit(minQuality))
    // exact dedup: one survivor per identical text; lang/quality are pure
    // functions of the text, so min() over the group is THE group value
    val uniq = base.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("quality")).as("quality"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.minhashDedup(uniq, "doc_id", "text",
      threshold = jaccardThreshold, shingleSize = shingleSize)
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    pairs.unpersist()
    val labeled = uniq.join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
    // representative per component: lexicographic max of (quality, -id)
    val reps = labeled.where(col("comp").isNotNull)
      .groupBy(col("comp"))
      .agg(max_by(struct(col("doc_id"), col("text"), col("quality")),
        struct(col("quality"), -col("doc_id"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
        col("r.quality").as("quality"))
    val singles = labeled.where(col("comp").isNull)
      .select(col("doc_id"), col("text"), col("quality"))
    val out = reps.unionByName(singles)
      .select(col("doc_id"), round(col("quality"), 6).as("quality"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    uniq.unpersist()
    out
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * `minHits` word `n`-grams with any document of an evaluation set.
    *
    * Scale shape: the EVAL side is the small one by construction, so its
    * distinct shingle set broadcasts; the training corpus is exploded to
    * (doc_id, shingle) and hash-joined against the broadcast — the big
    * side never shuffles, and the per-doc hit count is a map-side partial
    * aggregation. Returns (doc_id, n_hits, contaminated).
    */
  def decontaminate(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      minHits: Int = 1): DataFrame = {
    val evalShingles = evalDocs
      .select(explode(TextOps.wordShingles(col(evalTextCol), n)).as("sh"))
      .distinct()
    val trainShingles = train
      .select(col(trainIdCol).cast("long").as("doc_id"),
        explode(TextOps.wordShingles(col(trainTextCol), n)).as("sh"))
    val hits = trainShingles
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    train.select(col(trainIdCol).cast("long").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** Streaming decontamination: flag documents of a STREAM against a
    * static eval set as they arrive. The stream side explodes to
    * (doc_id, shingle) and inner-joins the broadcast eval shingles — a
    * stateless stream-static join — then a streaming aggregation counts
    * hits per doc (update output mode; only contaminated docs surface).
    * A document's shingles all come from its single input row, so its
    * count is complete within the micro-batch that carried it; the
    * aggregation state is one counter per CONTAMINATED doc id (hit rows
    * only survive the join), which is small by construction — eval
    * overlap is the anomaly, not the norm.
    */
  def decontaminateStream(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      evalDocs: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      minHits: Int = 1): DataFrame = {
    // the static side of a stream-static join is re-evaluated every
    // micro-batch: materialize the distinct shingle set ONCE, to the
    // driver (it must fit there anyway — the join broadcasts it), and
    // re-enter it as a local relation. No session cache entry is left
    // behind, so nothing leaks across eval-set rotations in a
    // long-running service.
    val spark = train.sparkSession
    import spark.implicits._
    val distinctShingles = evalDocs
      .select(explode(TextOps.wordShingles(col(evalTextCol), n)).as("sh"))
      .distinct()
    // guard the driver collect: an unexpectedly large eval set should fail
    // with a clear message, not OOM the driver mid-collect
    val cap = spark.conf.getOption("graft.decontaminate.maxEvalShingles")
      .map(_.toLong).getOrElse(50000000L)
    val nShingles = distinctShingles.count()
    require(nShingles <= cap,
      s"eval set explodes to $nShingles distinct $n-gram shingles, above the " +
        s"driver-collect cap of $cap (the decontamination join broadcasts the " +
        "eval side, so it must fit on the driver). Shrink the eval set or " +
        "raise graft.decontaminate.maxEvalShingles.")
    val shingleSet = distinctShingles.as[String].collect().toSeq
    val evalShingles = shingleSet.toDF("sh")
    train
      .select(col(trainIdCol).cast("long").as("doc_id"),
        explode(TextOps.wordShingles(col(trainTextCol), n)).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }
}
