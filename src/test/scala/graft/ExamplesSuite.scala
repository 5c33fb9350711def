package graft

import graft.clustering._
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** The reference repo ships nine runnable `examples/` programs; this suite
  * ports each one to the graft API and asserts the same behavior, so it
  * doubles as migration documentation (reference:
  * src/main/scala/examples/, all nine programs). Naming differences from the
  * reference surface are called out inline:
  *   - probability column: graft default "probability"; set it to
  *     "probabilities" for a drop-in match
  *   - StreamingKMeansModel: `currentCenters`/`clusterWeights` instead of
  *     `currentWeights`; decay is `decay`
  *   - KMedoidsModel: `medoids` (no separate medoidIndices — medoids ARE
  *     data points; identity is by value)
  */
class ExamplesSuite extends SparkSpec {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-example-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/model"
  }

  /** examples/BisectingExample.scala:1-47 — a trivial GKM run with
    * training-summary introspection.
    */
  test("BisectingExample: basic fit, transform, training summary") {
    val df = Seq(
      Tuple1(Vectors.dense(0.0, 0.0)),
      Tuple1(Vectors.dense(1.0, 1.0)),
      Tuple1(Vectors.dense(9.0, 8.5)),
      Tuple1(Vectors.dense(8.5, 9.0))).toDF("features")
    val gkm = new GeneralizedKMeans()
      .setK(2).setDivergence("squaredEuclidean").setMaxIter(5).setSeed(42)
    val model = gkm.fit(df)
    val pred = model.transform(df)
    assert(pred.count() == 4)
    assert(pred.columns.contains("prediction"))
    assert(model.hasSummary)
    val summary = model.summary
    assert(summary.iterations >= 1)
    assert(summary.effectiveK <= summary.k)
    assert(summary.finalDistortion >= 0.0)
    assert(summary.avgIterationMillis >= 0.0)
    // graft's summary echoes the kernel's canonical name (capitalized)
    assert(summary.divergence.equalsIgnoreCase("squaredEuclidean"))
  }

  /** examples/SoftKMeansExample.scala:1-42 — soft memberships beside the
    * hard prediction. The reference's "probabilities" column is graft's
    * probabilityCol (default "probability") — set it for a drop-in match.
    */
  test("SoftKMeansExample: probabilities + prediction columns") {
    val df = Seq(
      Tuple1(Vectors.dense(0.0, 0.0)),
      Tuple1(Vectors.dense(1.0, 1.0)),
      Tuple1(Vectors.dense(9.0, 9.0)),
      Tuple1(Vectors.dense(10.0, 10.0))).toDF("features")
    val soft = new SoftKMeans().setK(2).setBeta(1.5)
      .setDivergence("squaredEuclidean").setSeed(11)
      .setProbabilityCol("probabilities")
    val model = soft.fit(df)
    val pred = model.transform(df)
    assert(pred.columns.contains("probabilities"))
    assert(pred.columns.contains("prediction"))
    // memberships are distributions: each row sums to ~1
    val sums = pred.select(aggregate(col("probabilities"), lit(0.0), _ + _).as("s"))
      .collect().map(_.getDouble(0))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-6))
    assert(model.hasSummary)
    assert(model.summary.iterations >= 1)
    assert(model.summary.effectiveK <= model.summary.k)
  }

  /** examples/SphericalKMeansExample.scala:1-110 — cosine-direction
    * clustering of simulated topic embeddings, plus the "cosine" alias.
    */
  test("SphericalKMeansExample: directional clustering + cosine alias") {
    val embeddings = Seq(
      Tuple1(Vectors.dense(0.8, 0.6, 0.0)),
      Tuple1(Vectors.dense(0.9, 0.5, 0.1)),
      Tuple1(Vectors.dense(0.7, 0.7, 0.1)),
      Tuple1(Vectors.dense(0.85, 0.55, 0.05)),
      Tuple1(Vectors.dense(0.1, 0.2, 0.95)),
      Tuple1(Vectors.dense(0.0, 0.3, 0.9)),
      Tuple1(Vectors.dense(0.15, 0.1, 0.98)),
      Tuple1(Vectors.dense(0.05, 0.25, 0.92))).toDF("features")
    val model = new GeneralizedKMeans()
      .setK(2).setDivergence("spherical").setMaxIter(20).setSeed(42)
      .fit(embeddings)
    val predictions = model.transform(embeddings)
    assert(predictions.count() == 8)
    val c0 = predictions.where(col("prediction") === 0).count()
    val c1 = predictions.where(col("prediction") === 1).count()
    assert(c0 >= 3 && c0 <= 5, s"cluster 0 should have ~4 docs, got $c0")
    assert(c1 >= 3 && c1 <= 5, s"cluster 1 should have ~4 docs, got $c1")
    assert(model.summary.finalDistortion < 1.0,
      "well-separated directions should give low cosine distortion")
    assert(model.summary.divergence.equalsIgnoreCase("spherical"))
    // alias: "cosine" resolves to the same kernel
    val cosineModel = new GeneralizedKMeans()
      .setK(2).setDivergence("cosine").setMaxIter(10).setSeed(42).fit(embeddings)
    assert(cosineModel.clusterCenters.length == 2)
  }

  /** examples/XMeansExample.scala:1-39 — BIC model selection over a k
    * range; summary reflects the winning fit.
    */
  test("XMeansExample: BIC selection over minK..maxK") {
    val df = Seq(
      Tuple1(Vectors.dense(0.0, 0.0)),
      Tuple1(Vectors.dense(1.0, 1.0)),
      Tuple1(Vectors.dense(9.0, 9.0)),
      Tuple1(Vectors.dense(10.0, 10.0))).toDF("features")
    val xm = new XMeans().setMinK(2).setMaxK(3)
      .setDivergence("squaredEuclidean").setSeed(7)
    val model = xm.fit(df)
    val kFound = model.numClusters
    assert(kFound >= 2 && kFound <= 3, s"XMeans returned invalid k=$kFound")
    assert(model.hasSummary)
    assert(model.summary.iterations >= 1)
    // the full selection trace is exposed: one score per candidate k
    assert(xm.allScores.map(_._1) == Seq(2, 3))
    assert(xm.bestScore == xm.allScores.map(_._2).min)
  }

  /** examples/PersistenceRoundTrip.scala:1-68 — GeneralizedKMeansModel
    * save/load with center-quality assertions.
    */
  test("PersistenceRoundTrip: GeneralizedKMeansModel save/load") {
    val path = tmpDir("gkm")
    val df = Seq(
      Tuple1(Vectors.dense(0.0, 0.0)),
      Tuple1(Vectors.dense(1.0, 1.0)),
      Tuple1(Vectors.dense(9.0, 9.0)),
      Tuple1(Vectors.dense(10.0, 10.0))).toDF("features")
    val model = new GeneralizedKMeans()
      .setK(2).setDivergence("squaredEuclidean").setSeed(123).fit(df)
    model.write.overwrite().save(path)
    val loaded = GeneralizedKMeansModel.load(path)
    assert(loaded.numClusters == 2)
    assert(loaded.clusterCenters.length == 2)
    assert(loaded.numFeatures == 2)
    assert(loaded.transform(df).count() == 4)
    val centers = loaded.clusterCenters.sortBy(_.apply(0))
    assert(math.abs(centers(0)(0) - 0.5) < 1.0,
      s"center 0 x should be near 0.5, got ${centers(0)(0)}")
    assert(math.abs(centers(1)(0) - 9.5) < 1.0,
      s"center 1 x should be near 9.5, got ${centers(1)(0)}")
  }

  /** examples/PersistenceRoundTripCoresetKMeans.scala:1-127 — coreset fit
    * on KL-shaped data, save, load, predict fresh points.
    */
  test("PersistenceRoundTripCoresetKMeans: coreset KL fit save/load") {
    val path = tmpDir("coreset")
    val data = Seq(
      Tuple1(Vectors.dense(0.9, 0.1)), Tuple1(Vectors.dense(0.85, 0.15)),
      Tuple1(Vectors.dense(0.8, 0.2)), Tuple1(Vectors.dense(0.88, 0.12)),
      Tuple1(Vectors.dense(0.92, 0.08)),
      Tuple1(Vectors.dense(0.1, 0.9)), Tuple1(Vectors.dense(0.15, 0.85)),
      Tuple1(Vectors.dense(0.2, 0.8)), Tuple1(Vectors.dense(0.12, 0.88)),
      Tuple1(Vectors.dense(0.08, 0.92))).toDF("features")
    val model = new CoresetKMeans()
      .setK(2).setDivergence("kl").setCoresetSize(6)
      .setSensitivityStrategy("hybrid").setRefinementIterations(2)
      .setMaxIter(20).setSeed(42)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(data)
    model.write.overwrite().save(path)
    val loaded = GeneralizedKMeansModel.load(path)
    assert(loaded.clusterCenters.length == 2)
    val testData = Seq(
      Tuple1(Vectors.dense(0.87, 0.13)),
      Tuple1(Vectors.dense(0.13, 0.87))).toDF("features")
    val predCol = loaded.getPredictionCol
    val clusters = loaded.transform(testData).select(predCol).collect().map(_.getInt(0))
    assert(clusters(0) != clusters(1),
      "test points from different clusters must predict differently")
  }

  /** examples/PersistenceRoundTripKMedoids.scala:1-101 — PAM medoids are
    * actual data points and survive a round trip.
    */
  test("PersistenceRoundTripKMedoids: medoid save/load") {
    val path = tmpDir("kmedoids")
    val df = Seq(
      Tuple1(Vectors.dense(0.0, 0.0)), Tuple1(Vectors.dense(0.5, 0.5)),
      Tuple1(Vectors.dense(1.0, 1.0)), Tuple1(Vectors.dense(9.0, 9.0)),
      Tuple1(Vectors.dense(9.5, 9.5)), Tuple1(Vectors.dense(10.0, 10.0))).toDF("features")
    val model = new KMedoids().setK(2).setSeed(5).fit(df)
    model.write.overwrite().save(path)
    val loaded = KMedoidsModel.load(path)
    assert(loaded.numClusters == 2)
    assert(loaded.medoids.length == 2)
    assert(loaded.medoids.head.length == 2) // numFeatures
    assert(loaded.transform(df).count() == 6)
    val medoids = loaded.medoids.sortBy(_.apply(0))
    assert(medoids(0)(0) < 2.0, s"medoid 0 should sit in the (0,0) cluster, got ${medoids(0).toSeq}")
    assert(medoids(1)(0) > 8.0, s"medoid 1 should sit in the (9,9) cluster, got ${medoids(1).toSeq}")
    // medoids are data points — each must equal one of the input rows
    val inputs = df.collect().map(_.getAs[org.apache.spark.ml.linalg.Vector](0).toArray.toSeq).toSet
    assert(loaded.medoids.forall(m => inputs.contains(m.toSeq)))
  }

  /** examples/PersistenceRoundTripSoftKMeans.scala:1-100 — soft model
    * params (beta, minMembership) and probability output survive reload.
    */
  test("PersistenceRoundTripSoftKMeans: soft params save/load") {
    val path = tmpDir("soft")
    val df = Seq(
      Tuple1(Vectors.dense(0.0, 0.0)), Tuple1(Vectors.dense(0.5, 0.5)),
      Tuple1(Vectors.dense(1.0, 1.0)), Tuple1(Vectors.dense(9.0, 9.0)),
      Tuple1(Vectors.dense(9.5, 9.5)), Tuple1(Vectors.dense(10.0, 10.0))).toDF("features")
    val model = new SoftKMeans()
      .setK(2).setBeta(2.0).setMinMembership(0.01).setSeed(9)
      .setProbabilityCol("probabilities")
      .fit(df)
    model.write.overwrite().save(path)
    val loaded = SoftKMeansModel.load(path)
    assert(math.abs(loaded.betaValue - 2.0) < 0.001)
    assert(math.abs(loaded.minMembershipValue - 0.01) < 0.001)
    val preds = loaded.setProbabilityCol("probabilities").transform(df)
    assert(preds.count() == 6)
    assert(preds.columns.contains("probabilities"))
    val centers = loaded.clusterCenters.sortBy(_.apply(0))
    assert(centers(0)(0) < 2.0)
    assert(centers(1)(0) > 8.0)
  }

  /** examples/PersistenceRoundTripStreamingKMeans.scala:1-134 — init from
    * one batch, update with a second, save, load, keep streaming. The
    * reference's `currentWeights` is graft's `clusterWeights`.
    */
  test("PersistenceRoundTripStreamingKMeans: weights survive reload, updates continue") {
    val path = tmpDir("streaming")
    val df1 = Seq(
      Tuple1(Vectors.dense(0.0, 0.0)), Tuple1(Vectors.dense(0.1, 0.1)),
      Tuple1(Vectors.dense(1.0, 1.0))).toDF("features")
    val df2 = Seq(
      Tuple1(Vectors.dense(9.0, 9.0)), Tuple1(Vectors.dense(9.1, 9.1)),
      Tuple1(Vectors.dense(10.0, 10.0))).toDF("features")
    val est = new graft.streaming.StreamingKMeans()
      .setK(2).setDivergence("squaredEuclidean").setDecayFactor(0.9)
      .setSmoothing(1e-9).setSeed(42)
    val model1 = est.fit(df1).asInstanceOf[graft.streaming.StreamingKMeansModel]
    assert(model1.hasSummary && model1.summary.iterations >= 1)
    val model2 = model1.update(df2)
    model2.write.overwrite().save(path)
    val loaded = graft.clustering.StreamingModelIO.read.load(path)
    assert(loaded.numClusters == 2)
    assert(loaded.currentCenters.length == 2)
    assert(loaded.currentCenters.head.length == 2)
    assert(loaded.decay == 0.9)
    val weights = loaded.clusterWeights
    assert(weights.length == 2 && weights.forall(_ > 0),
      s"cluster weights must be restored positive, got ${weights.toSeq}")
    assert(loaded.transform(df1).count() == 3)
    // streaming continues after reload
    val continued = loaded.update(df2)
    assert(continued.currentCenters.length == 2)
  }

  test("TrainingDataPipelineExample: the round-13 selection layer composed end to end") {
    // Executable documentation for the modern corpus-curation recipe:
    // canonicalize -> rule-filter -> cut cross-doc boilerplate ->
    // bucket by fluency -> cap per domain -> score with a trained LR —
    // every stage an oracle-checked operator, composed here the way a
    // pipeline user would.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

    // 1. canonical text (case/punct variants collapse downstream)
    val canon = docs.select(col("doc_id"), col("source"), col("lang"),
      graft.ops.TextOps.normalizeText(col("text")).as("text"))

    // 2. integer-threshold quality rules (word-soup docs: only the
    //    word-count band binds; keep = conjunction)
    val ruled = graft.ops.TextOps.gopherRules(canon, "doc_id", "text", minWords = 10)
      .where(col("word_count_ok"))
      .select(col("doc_id")).join(canon, "doc_id")

    // 3. cut cross-document boilerplate spans
    val cleaned = graft.ops.Dedup.boilerplateCut(ruled, "doc_id", "text", n = 3, minDf = 8)
      .select(col("doc_id"), col("clean_text").as("text"))
      .where(length(col("text")) > 0)
      .join(canon.select(col("doc_id"), col("source"), col("lang")), "doc_id")

    // 4. CCNet fluency thirds; train preferentially on the head+middle
    val bucketed = graft.ops.Curate.perplexityBuckets(cleaned, "doc_id", "text")
    val keptIds = bucketed.where(col("bucket") =!= "tail").select("doc_id")
    bucketed.unpersist()
    val kept = cleaned.join(keptIds, "doc_id")

    // 5. no domain dominates: deterministic per-source cap
    val capped = graft.ops.Sampling.capPerDomain(kept, "source", "doc_id", 12L, "ex")

    // 6. trained LR scores the survivors (label: English)
    val w = graft.ops.Classify.logisticFit(
      capped.withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0)),
      "doc_id", "text", "y", buckets = 64, iters = 3, lr = 0.5)
    val scored = graft.ops.Classify.logisticScore(capped, "doc_id", "text", w, buckets = 64)

    val n0 = docs.count(); val nKept = kept.count(); val nCap = capped.count()
    assert(nKept > 0 && nKept < n0, s"bucketing must drop the tail: $nKept of $n0")
    assert(nCap <= nKept)
    val maxPerSource = capped.groupBy(col("source")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxPerSource <= 12L)
    assert(scored.count() == nCap)
    assert(scored.agg(min(col("score")), max(col("score"))).head match {
      case r => r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0
    })
  }

  test("TemporalPipelineExample: the round-14 temporal/export layer composed end to end") {
    // Executable documentation for an event-data preparation recipe:
    // sessionize -> attribute events to sessions (range join) -> enrich
    // with the latest prior purchase (as-of) -> temporal eval split ->
    // export deterministic shards with an integrity manifest.
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    val ev = events.select(col("event_id"), col("user_id"),
      unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
      col("event_type"), col("value"))

    // 1. gap sessions (the native declarative form)
    val sessions = graft.streaming.EventOps.sessionizeNative(
        ev.select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"), col("value")),
        "user_id", "ts", "value", gap = "30 minutes")
      .select(col("key").as("user_id"), col("startMs"), col("endMs"),
        col("numEvents"))

    // 2. every event attributed to its containing session — a bucketed
    //    equi-join, never a nested loop
    val attributed = graft.ops.RangeJoin.rangeJoin(
      ev, sessions, "user_id", "ts_ms", "startMs", "endMs", widthMs = 3600000L)
    assert(attributed.count() == ev.count(), "each event belongs to exactly one session")

    // 3. enrich with the latest prior purchase within 24 h (one-shuffle
    //    union-window as-of; asofLookup is the broadcast serving twin)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("snap_id"), col("user_id"), col("ts_ms"),
        col("value").as("purchase_value"))
    val enriched = graft.ops.AsofJoin.asofJoin(
      attributed, purchases, "user_id", "ts_ms", Seq("purchase_value"),
      "snap_id", tolerance = Some(86400000L))
    assert(enriched.count() == ev.count())
    assert(enriched.where(col("asof_purchase_value").isNotNull).count() > 0)

    // 4. time-based eval hygiene: train strictly before the cutoff,
    //    a 6 h embargo absorbing boundary-straddling sessions
    val cutoff = ev.agg(expr("percentile(ts_ms, 0.8)")).head.getDouble(0).toLong
    val split = graft.ops.Sampling.timeSplit(enriched, "ts_ms", cutoff, 6 * 3600000L)
    val classes = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(classes.keySet == Set("train", "embargo", "test"))

    // 5. export the training slice as 4 deterministic shards + manifest
    val dir = java.nio.file.Files.createTempDirectory("graft-temporal-ex").toString
    val m = graft.sources.ShardExport.writeShards(
      split.where(col("split") === "train"), dir, "event_id",
      Seq("user_id", "ts_ms"), coalesce(col("asof_purchase_value"), lit(0.0)),
      nShards = 4, seed = "ex14")
    assert(m.count() == 4)
    assert(graft.sources.ShardExport.verifyExport(spark, dir, "event_id",
      Seq("user_id", "ts_ms"), coalesce(col("asof_purchase_value"), lit(0.0))).count() == 0)
  }

  /** Beyond the reference: the full rank-sketch lifecycle a telemetry
    * pipeline runs — per-day stratified sketches built independently,
    * persisted, merged into the week, rolled up, and asked percentile /
    * CDF questions — no step rescans a corpus after its own build.
    */
  test("RankSketchLifecycle: per-day sketches -> persist -> weekly merge " +
    "-> rollup -> percentile/CDF answers") {
    import graft.ops.{GroupedQuantileSketch, QuantileSketch}
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      // synthesize a 3-day ingest from the stable ids
      .withColumn("day", col("doc_id") % 3)

    // 1. each day's job builds ONLY its slice (in production: today's
    //    partition), stratified by (day, lang), and persists the sketch
    val dayDirs = (0 to 2).map { d =>
      val sk = GroupedQuantileSketch.buildGrouped(
        docs.where(col("day") === d), Seq("day", "lang"),
        "doc_id", "n_chars", 64, "wk1")
      val dir = java.nio.file.Files.createTempDirectory(s"gq_day$d").toString
      GroupedQuantileSketch.write(sk, dir)
      dir
    }

    // 2. the weekly job reads and merges the handles — 2s rows/stratum,
    //    never a document
    val week = dayDirs.map(GroupedQuantileSketch.read(spark, _))
      .reduce(_ merge _)

    // 3. per-(day, lang) p50/p90 off the samples
    val perDay = week.quantiles(Seq(50, 90))
    assert(perDay.count() > 0)

    // 4. rollups without rescanning: per-lang (exact vs the direct
    //    build) and corpus-global (exact vs the scalar build)
    val perLang = week.regroup(Seq("lang" -> col("lang")))
    val directLang = GroupedQuantileSketch.buildGrouped(
      docs, Seq("lang"), "doc_id", "n_chars", 64, "wk1")
    assert(perLang.quantiles(Seq(50)).select("lang", "value").collect().toSet ==
      directLang.quantiles(Seq(50)).select("lang", "value").collect().toSet)
    val global = week.toGlobal
    val directGlobal = QuantileSketch.build(docs, "doc_id", "n_chars", 64, "wk1")
    assert(global.quantile(90) == directGlobal.quantile(90))

    // 5. the CDF question curation asks ("how many docs per lang are
    //    under 200 chars this week")
    val under200 = perLang.rankOf(200L)
    assert(under200.columns.toSeq == Seq("lang", "le_est"))
    assert(under200.count() == directLang.counts.count())
  }
}
