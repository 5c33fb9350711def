package graft

import graft.ops.{Sketches, SetSimJoin, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 pipeline additions: count-min-sketch frequency layer,
  * exact-recall Jaccard self-join (prefix filtering), intra-document
  * chunk dedup.
  */
class SketchOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- count-min sketch ----

  /** Zipf-ish token stream with a known exact count per key. */
  private def tokenStream: DataFrame = {
    val rows = (1 to 40).flatMap { k =>
      // key k appears 201-5k times: k=1 -> 196, k=40 -> 1
      Seq.fill(math.max(201 - 5 * k, 1))(s"tok$k")
    }
    rows.toDF("k")
  }

  test("CMS estimates are one-sided: est >= exact for every key") {
    val items = tokenStream
    val sk = Sketches.build(items, "k", depth = 3, width = 16, seed = "t1")
    val est = Sketches.estimate(sk, items, "k", depth = 3, width = 16, seed = "t1")
    val exact = items.groupBy("k").agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, "k").collect()
    assert(joined.length == 40)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"under-estimate for ${r.getAs[String]("k")}")
    }
  }

  test("CMS is exact when the width is collision-free") {
    val items = tokenStream
    val sk = Sketches.build(items, "k", depth = 4, width = 1 << 16, seed = "t2")
    val est = Sketches.estimate(sk, items, "k", depth = 4, width = 1 << 16, seed = "t2")
    val exact = items.groupBy("k").agg(count(lit(1)).as("exact"))
    assert(est.join(exact, "k").where(col("est") =!= col("exact")).count() == 0)
  }

  test("heavyHitters has no false negatives and honors weights") {
    val items = tokenStream
    val thr = 100L
    val exactHeavy = items.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") >= thr).select("k").as[String].collect().toSet
    val got = Sketches.heavyHitters(items, "k", depth = 3, width = 16,
      seed = "t3", threshold = thr).select("k").as[String].collect().toSet
    assert(exactHeavy.subsetOf(got), s"missing: ${exactHeavy.diff(got)}")

    // weighted build: one row of weight w == w rows of weight 1
    val weighted = items.groupBy("k").agg(count(lit(1)).as("w"))
    val skW = Sketches.build(weighted, "k", depth = 3, width = 1 << 16,
      seed = "t4", weightCol = Some("w"))
    val skU = Sketches.build(items, "k", depth = 3, width = 1 << 16, seed = "t4")
    assert(skW.count() == skU.count())
    assert(skW.exceptAll(skU).count() == 0)
    assert(skU.exceptAll(skW).count() == 0)
  }

  test("CMS skips null keys and null weights (rule-10 policy)") {
    val items = Seq(("a", java.lang.Long.valueOf(2L)), (null, java.lang.Long.valueOf(5L)),
      ("b", null.asInstanceOf[java.lang.Long])).toDF("k", "w")
    val sk = Sketches.build(items, "k", depth = 2, width = 8, seed = "t5",
      weightCol = Some("w"))
    // only 'a' contributes: total mass per hash row is 2
    val mass = sk.groupBy("r").agg(sum("cnt").as("m")).select("m").as[Long].collect()
    assert(mass.toSeq == Seq(2L, 2L))
    val est = Sketches.estimate(sk, Seq("a", "b").toDF("k"), "k",
      depth = 2, width = 8, seed = "t5")
    val m = est.as[(String, Long)].collect().toMap
    assert(m("a") == 2L && m("b") <= 2L) // b absent; only collision mass
  }

  test("CMS refuses negative weights and reserved key-column names") {
    // a negative weight would let a cell under-count and void the
    // one-sided estimate guarantee — refused per row, not silently summed
    val signed = Seq(("a", 2L), ("b", -1L)).toDF("k", "w")
    val e = intercept[Exception] {
      Sketches.build(signed, "k", 2, 8, "neg", weightCol = Some("w")).collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      Option(e.getCause).exists(_.getMessage.contains("negative weight")))

    val sk = Sketches.build(Seq("a").toDF("k"), "k", 2, 8, "neg")
    val e2 = intercept[IllegalArgumentException] {
      Sketches.estimate(sk, Seq(1L).toDF("cnt"), "cnt", 2, 8, "neg")
    }
    assert(e2.getMessage.contains("collides with a sketch column"))
  }

  test("CMS merge is associative partial combination; streaming build equals batch") {
    val b1 = (1 to 300).map(i => s"tok${i % 7}").toDF("k")
    val b2 = (1 to 200).map(i => s"tok${i % 11}").toDF("k")
    val full = Sketches.build(b1.unionByName(b2), "k", 3, 32, "m1")
    val merged = Sketches.merge(
      Sketches.build(b1, "k", 3, 32, "m1"),
      Sketches.build(b2, "k", 3, 32, "m1"))
    // symmetric equality: one-sided containment would still pass if the
    // merge DROPPED cells (same hardening as HllSpec.assertSameRegisters)
    assert(merged.count() == full.count())
    assert(merged.exceptAll(full).count() == 0)
    assert(full.exceptAll(merged).count() == 0)

    // streaming: the same build() as an incremental stateful aggregation,
    // two micro-batches; Complete mode must equal the batch sketch
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val cells = Sketches.build(stream.toDS().toDF("k"), "k", 3, 32, "m1")
    val query = cells.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      stream.addData((1 to 300).map(i => s"tok${i % 7}"): _*)
      query.processAllAvailable()
      stream.addData((1 to 200).map(i => s"tok${i % 11}"): _*)
      query.processAllAvailable()
      val streamed = spark.table("cms_stream").select("r", "bucket", "cnt")
      assert(streamed.count() == full.count())
      assert(streamed.exceptAll(full).count() == 0)
      assert(full.exceptAll(streamed).count() == 0)
    } finally query.stop()
  }

  // ---- exact-recall Jaccard join ----

  /** Corpus with exact dups, prefix-truncated near-dups, unrelated docs,
    * and the rule-10 edge cases (null / empty / single-token text).
    */
  private def simCorpus: DataFrame = {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa")
    val rnd = new scala.util.Random(19)
    val base = (0L until 40L).map { i =>
      (i, Seq.fill(24)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val dups = base.take(6).map { case (i, t) => (i + 100L, t) }
    val trunc = base.slice(6, 12).map { case (i, t) =>
      (i + 200L, t.split(" ").take(17).mkString(" ")) // ~70% of tokens
    }
    val edge = Seq((300L, null.asInstanceOf[String]), (301L, ""), (302L, "alpha"))
    (base ++ dups ++ trunc ++ edge).toDF("doc_id", "text")
  }

  /** Brute-force ground truth from the same shingle definition. */
  private def bruteJaccard(docs: DataFrame, pct: Int, n: Int): Set[(Long, Long, Double)] = {
    val sets = docs.select(col("doc_id"),
        TextOps.wordShingles(col("text"), n).as("sh"))
      .withColumn("sh", filter(col("sh"), _ =!= ""))
      .where(size(col("sh")) > 0)
    val a = sets.select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = sets.select(col("doc_id").as("ib"), col("sh").as("sb"))
    a.crossJoin(b).where(col("ia") < col("ib"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("uni", size(array_union(col("sa"), col("sb"))).cast("long"))
      .where(col("inter") * 100 >= lit(pct.toLong) * col("uni"))
      .select(col("ia"), col("ib"),
        round(col("inter").cast("double") / col("uni"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
  }

  test("grouped CMS equals per-group scalar sketches exactly; null group " +
    "retained; sketchless groups estimate 0; grouped merge; refusals") {
    val rows = (1 to 400).map { i =>
      (if (i % 3 == 0) null else if (i % 2 == 0) "en" else "de", s"tok-${i % 23}")
    }.toDF("g", "k")
    val (d, wd, seed) = (3, 64, "gcms")
    val grouped = Sketches.buildGrouped(rows, "k", Seq("g"), d, wd, seed)
    for (g <- Seq(Some("en"), Some("de"), None)) {
      val slice = rows.filter(g.map(col("g") === _).getOrElse(col("g").isNull))
      val scalar = Sketches.build(slice, "k", d, wd, seed)
      val got = grouped.filter(g.map(col("g") === _).getOrElse(col("g").isNull))
        .select("r", "bucket", "cnt")
      assert(got.exceptAll(scalar).count() == 0 &&
        scalar.exceptAll(got).count() == 0, s"cells differ for group $g")
      // grouped estimates == per-group scalar estimates (incl. null group)
      val gotEst = Sketches.estimateGrouped(grouped, slice, "k", Seq("g"),
          d, wd, seed)
        .select(col("k"), col("est"))
      val wantEst = Sketches.estimate(scalar, slice, "k", d, wd, seed)
      assert(gotEst.exceptAll(wantEst).count() == 0 &&
        wantEst.exceptAll(gotEst).count() == 0, s"estimates differ for $g")
    }
    // a pair whose group has no sketch estimates 0 (empty-filter analogy)
    val foreign = Seq(("fr", "tok-1")).toDF("g", "k")
    val est0 = Sketches.estimateGrouped(grouped, foreign, "k", Seq("g"),
      d, wd, seed)
    assert(est0.head().getLong(2) == 0L)
    // grouped merge of disjoint halves == one-shot grouped build
    val h1 = rows.filter(length(col("k")) % 2 === 0)
    val h2 = rows.filter(length(col("k")) % 2 === 1)
    val merged = Sketches.mergeGrouped(
      Sketches.buildGrouped(h1, "k", Seq("g"), d, wd, seed),
      Sketches.buildGrouped(h2, "k", Seq("g"), d, wd, seed), Seq("g"))
    assert(merged.exceptAll(grouped).count() == 0 &&
      grouped.exceptAll(merged).count() == 0)
    // refusals: reserved group name, key-as-group, empty groups
    val e1 = intercept[IllegalArgumentException](
      Sketches.buildGrouped(rows.withColumn("r", lit(1)), "k", Seq("r"), d, wd, seed))
    assert(e1.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException](
      Sketches.estimateGrouped(grouped, rows, "g", Seq("g"), d, wd, seed))
    assert(e2.getMessage.contains("stratify"))
    val e3 = intercept[IllegalArgumentException](
      Sketches.buildGrouped(rows, "k", Seq.empty, d, wd, seed))
    assert(e3.getMessage.contains("ungrouped"))
  }

  test("GroupedCmsSketch handle: roundtrip with a double group column, " +
    "estimates == functional grouped path, geometry/strata/corruption refusals") {
    import graft.ops.GroupedCmsSketch
    val rows = (1 to 300).map { i =>
      ((i % 3).toDouble / 2.0, s"tok-${i % 17}")
    }.toDF("g", "k")
    val (d, wd, seed) = (3, 64, "gcmsh")
    val sk = GroupedCmsSketch.build(rows, "k", Seq("g"), d, wd, seed)
    val dir = java.nio.file.Files.createTempDirectory("gcms").toString
    GroupedCmsSketch.write(sk, s"$dir/f")
    val back = GroupedCmsSketch.read(spark, s"$dir/f")
    assert(back.groupCols == Seq("g") && back.depth == d && back.width == wd)
    val got = back.estimates(rows, "k")
    val want = Sketches.estimateGrouped(sk.cells, rows, "k", Seq("g"), d, wd, seed)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // merged halves == one-shot (handle-level)
    val h1 = rows.filter(col("k").endsWith("1"))
    val h2 = rows.filter(!col("k").endsWith("1"))
    val merged = GroupedCmsSketch.build(h1, "k", Seq("g"), d, wd, seed)
      .merge(GroupedCmsSketch.build(h2, "k", Seq("g"), d, wd, seed))
    assert(merged.cells.exceptAll(sk.cells).count() == 0 &&
      sk.cells.exceptAll(merged.cells).count() == 0)
    val e1 = intercept[IllegalArgumentException](
      sk.merge(GroupedCmsSketch.build(rows, "k", Seq("g"), d, 128, seed)))
    assert(e1.getMessage.contains("geometry mismatch"))
    // corruption: flip a count
    spark.read.parquet(s"$dir/f/cells").withColumn("cnt", col("cnt") + 1L)
      .write.mode("overwrite").parquet(s"$dir/g/cells")
    val fs = new org.apache.hadoop.fs.Path(s"$dir/f/gcms.json")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/f/gcms.json"),
      new org.apache.hadoop.fs.Path(s"$dir/g/gcms.json"))
    val e2 = intercept[IllegalArgumentException](
      GroupedCmsSketch.read(spark, s"$dir/g"))
    assert(e2.getMessage.contains("digest mismatch"))
  }

  test("windowed streaming CMS cells: NTZ stream == batch == per-window " +
    "direct builds; duplicate emissions collapse, conflicting cells refuse; " +
    "rollups exact (sum associativity)") {
    import graft.streaming.StreamSketches
    import graft.ops.GroupedCmsSketch
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.LocalDateTime.of(2026, 4, 1, 0, 0)
    val rows = Seq.tabulate(90)(i => (base.plusMinutes(i % 18), s"tok-${i % 11}"))
    val (d, wd, seed) = (3, 64, "wcms")
    val batchDf = rows.toDF("ts", "k")
    val batch = StreamSketches.cmsWindowedCells(batchDf, "ts", "k",
      "10 minutes", "5 minutes", d, wd, seed)
    val starts = batch.select("windowStartMs").distinct().as[Long].collect().sorted
    assert(starts.length == 2)
    for (ws <- starts) {
      val winKeys = rows.filter { case (t, _) =>
        val ms = t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        ms >= ws && ms < ws + 600000L
      }.map(_._2)
      val want = Sketches.build(winKeys.toDF("k"), "k", d, wd, seed)
      val got = batch.filter(col("windowStartMs") === ws)
        .select("r", "bucket", "cnt")
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0, s"cells differ for window $ws")
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.time.LocalDateTime, String)]
    val out = StreamSketches.cmsWindowedCells(mem.toDS().toDF("ts", "k"),
      "ts", "k", "10 minutes", "5 minutes", d, wd, seed)
    val q = out.writeStream.format("memory").queryName("cms_windowed")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((base.plusMinutes(600), "sweep"))
      q.processAllAvailable()
      val emitted = spark.table("cms_windowed")
        .filter(col("windowStartMs").isin(starts.map(Long.box): _*))
      assert(emitted.exceptAll(batch).count() == 0 &&
        batch.exceptAll(emitted).count() == 0)
      // duplicate whole-row re-emissions collapse; toGlobal == direct
      val rebuilt = StreamSketches.cmsFromWindowCells(
        emitted.union(emitted.limit(4)), d, wd, seed)
      val global = rebuilt.toGlobal
      val direct = Sketches.build(rows.map(_._2).toDF("k"), "k", d, wd, seed)
      assert(global.cells.exceptAll(direct).count() == 0 &&
        direct.exceptAll(global.cells).count() == 0)
      // a CONFLICTING count for an existing cell refuses (partial sink)
      val conflicted = emitted.union(
        emitted.limit(1).withColumn("cnt", col("cnt") + 7L))
      val e = intercept[IllegalArgumentException](
        StreamSketches.cmsFromWindowCells(conflicted, d, wd, seed))
      assert(e.getMessage.contains("CONFLICTING"))
      // regroup: both windows into one computed stratum == direct build
      val hourly = rebuilt.regroup(Seq("hour" ->
        expr("CAST(windowStartMs - pmod(windowStartMs, 3600000) AS BIGINT)")))
      assert(hourly.cells.select("hour").distinct().count() == 1)
      assert(hourly.cells.select("r", "bucket", "cnt")
        .exceptAll(direct).count() == 0)
    } finally q.stop()
  }

  test("(window x group) windowed HLL and CMS: stream == batch == direct " +
    "grouped builds; sink rebuilds carry the full strata") {
    import graft.streaming.StreamSketches
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.LocalDateTime.of(2026, 5, 1, 0, 0)
    val rows = Seq.tabulate(120)(i =>
      (base.plusMinutes(i % 18), if (i % 2 == 0) "en" else "de", s"tok-${i % 13}"))
    val df = rows.toDF("ts", "g", "k")
    val hllBatch = StreamSketches.hllWindowedRegisters(df, "ts", "k",
      "10 minutes", "5 minutes", 8, "wg", groupCols = Seq("g"))
    val cmsBatch = StreamSketches.cmsWindowedCells(df, "ts", "k",
      "10 minutes", "5 minutes", 3, 64, "wgc", groupCols = Seq("g"))
    // batch == direct grouped builds per (window, g) stratum
    val strata = hllBatch.select("windowStartMs", "g").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(strata.length == 4) // 2 windows x 2 groups
    for ((ws, g) <- strata) {
      val keys = rows.filter { case (t, gg, _) =>
        val ms = t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        ms >= ws && ms < ws + 600000L && gg == g
      }.map(_._3).toDF("k")
      val hGot = hllBatch.filter(col("windowStartMs") === ws && col("g") === g)
        .select("bucket", "maxrank")
      val hWant = graft.ops.Hll.build(keys, "k", 8, "wg")
      assert(hGot.exceptAll(hWant).count() == 0 &&
        hWant.exceptAll(hGot).count() == 0, s"hll differs at ($ws, $g)")
      val cGot = cmsBatch.filter(col("windowStartMs") === ws && col("g") === g)
        .select("r", "bucket", "cnt")
      val cWant = Sketches.build(keys, "k", 3, 64, "wgc")
      assert(cGot.exceptAll(cWant).count() == 0 &&
        cWant.exceptAll(cGot).count() == 0, s"cms differs at ($ws, $g)")
    }
    // stream parity for one leg (the window+group aggregation shape is
    // shared; cms chosen because its counts are the non-idempotent case)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.time.LocalDateTime, String, String)]
    val out = StreamSketches.cmsWindowedCells(mem.toDS().toDF("ts", "g", "k"),
      "ts", "k", "10 minutes", "5 minutes", 3, 64, "wgc", groupCols = Seq("g"))
    val q = out.writeStream.format("memory").queryName("cms_wg")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((base.plusMinutes(600), "en", "sweep"))
      q.processAllAvailable()
      val emitted = spark.table("cms_wg")
        .filter(col("windowStartMs").isin(strata.map(s => Long.box(s._1)).distinct: _*))
      assert(emitted.exceptAll(cmsBatch).count() == 0 &&
        cmsBatch.exceptAll(emitted).count() == 0)
      // rebuild carries (window x g) strata; regroup to g == direct
      val rebuilt = StreamSketches.cmsFromWindowCells(emitted, 3, 64, "wgc",
        groupCols = Seq("g"))
      assert(rebuilt.groupCols == Seq("windowStartMs", "windowEndMs", "g"))
      val byG = rebuilt.regroup(Seq("g" -> col("g")))
      val directByG = Sketches.buildGrouped(df, "k", Seq("g"), 3, 64, "wgc")
      assert(byG.cells.exceptAll(directByG).count() == 0 &&
        directByG.exceptAll(byG.cells).count() == 0)
    } finally q.stop()
  }

  test("jaccardJoin equals brute force exactly (no missed pair, no extra)") {
    for (pct <- Seq(40, 60, 85)) {
      val got = SetSimJoin.jaccardJoin(simCorpus, "doc_id", "text",
        thresholdPct = pct, shingleSize = 3)
      val gotSet = got.as[(Long, Long, Double)].collect().toSet
      got.unpersist()
      assert(gotSet == bruteJaccard(simCorpus, pct, 3), s"pct=$pct")
    }
  }

  test("jaccardJoin: null/empty/short docs never join; exact dups J=1") {
    val got = SetSimJoin.jaccardJoin(simCorpus, "doc_id", "text", 50, 3)
    val pairs = got.as[(Long, Long, Double)].collect()
    got.unpersist()
    assert(!pairs.exists(p => p._1 >= 300L || p._2 >= 300L))
    val dupPairs = pairs.filter(p => p._2 == p._1 + 100L)
    assert(dupPairs.length == 6 && dupPairs.forall(_._3 == 1.0))
  }

  test("jaccardJoin refuses oversized prefix buckets with remediation") {
    val clones = (0L until 50L).map(i => (i, "x y z w v u t s r q")).toDF("doc_id", "text")
    spark.conf.set("graft.setjoin.maxPrefixBucket", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        SetSimJoin.jaccardJoin(clones, "doc_id", "text", 80, 3)
      }
      assert(e.getMessage.contains("graft.setjoin.maxPrefixBucket"))
      assert(e.getMessage.contains("minhashCandidates"))
    } finally spark.conf.unset("graft.setjoin.maxPrefixBucket")
    // default cap: same corpus joins fine (49*50/2 identical-doc pairs)
    val got = SetSimJoin.jaccardJoin(clones, "doc_id", "text", 80, 3)
    assert(got.count() == 50L * 49L / 2)
    got.unpersist()
  }

  // ---- intra-document chunk dedup ----

  test("dedupChunksWithin keeps first occurrences, in order") {
    val docs = Seq(
      (1L, "a b a b c d a b"), // chunks [a b][a b][c d][a b] -> a b c d
      (2L, "a b c"), // trailing short chunk [a b][c]
      (3L, "x x x x x"), // [x x][x x][x] -> x x x
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
    val out = TextOps.dedupChunksWithin(docs, "doc_id", "text", 2)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "a b c d", 4L, 2L, 2L)))
    assert(out(1) == ((2L, "a b c", 2L, 2L, 0L)))
    assert(out(2) == ((3L, "x x x", 3L, 2L, 1L)))
    assert(out(3) == ((4L, null, 0L, 0L, 0L)))
    assert(out(4) == ((5L, "", 1L, 1L, 0L)))
  }

  // ---- corpus drift (G² frequency profiling) ----

  test("corpusDrift: known G², symmetry, direction, support filter") {
    val a = Seq((1L, "x x x x x y"), (2L, "x x z")).toDF("doc_id", "text")
    val b = Seq((3L, "y y y y x z"), (4L, "y y z")).toDF("doc_id", "text")
    val got = TextOps.corpusDrift(a, b, "text", minCount = 2L)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // hand-computed: tot_a = 9, tot_b = 9
    def g2(na: Long, nb: Long): Double = {
      val (ta, tb) = (9.0, 9.0)
      def term(n: Long, tot: Double) =
        if (n == 0) 0.0 else n * math.log(n / (tot * (na + nb) / (ta + tb)))
      BigDecimal(2.0 * (term(na, ta) + term(nb, tb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("x") == (("x", 7L, 1L, 1L, g2(7L, 1L))))
    assert(got("y") == (("y", 1L, 6L, -1L, g2(1L, 6L))))
    assert(got("z") == (("z", 1L, 2L, -1L, g2(1L, 2L))))

    // symmetry: swapping the corpora preserves llr, flips dir
    val swapped = TextOps.corpusDrift(b, a, "text", minCount = 2L)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    got.keySet.foreach { k =>
      assert(swapped(k)._5 == got(k)._5 && swapped(k)._4 == -got(k)._4, k)
    }

    // identical corpora: llr 0, dir 0 everywhere
    val same = TextOps.corpusDrift(a, a, "text", minCount = 2L)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(same.nonEmpty && same.forall(r => r._4 == 0L && r._5 == 0.0))

    // support filter prunes rows but must NOT change surviving llr
    // (totals come from the full vocabulary, not the filtered rows)
    val loose = TextOps.corpusDrift(a, b, "text", minCount = 1L)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    got.keySet.foreach(k => assert(loose(k) == got(k), k))
    assert(loose.keySet.size >= got.keySet.size)
  }

  test("corpusDrift null policy: null text contributes nothing") {
    val a = Seq((1L, "x x y"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val b = Seq((3L, "x y y")).toDF("doc_id", "text")
    val got = TextOps.corpusDrift(a, b, "text", minCount = 1L)
      .agg(sum("cnt_a"), sum("cnt_b")).as[(Long, Long)].head()
    assert(got == ((3L, 3L)))
  }

  // ---- plan-shape pins (the scale postures, asserted not narrated) ----

  test("plan shapes: chunk dedup never shuffles; CMS and drift combine map-side") {
    val docs = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")

    // intra-doc removal is a pure narrow map: zero Exchange in the plan
    val cd = TextOps.dedupChunksWithin(docs, "doc_id", "text", 2)
    cd.write.format("noop").mode("overwrite").save()
    assert(!cd.queryExecution.executedPlan.toString.contains("Exchange"),
      "dedupChunksWithin must plan without a shuffle")

    // CMS build: the one shuffle carries (r, bucket) cells AFTER a
    // map-side partial sum — the property that bounds shuffle volume by
    // depth*width regardless of corpus size
    val items = docs.select(explode(split(col("text"), " ")).as("k"))
      .where(col("k") =!= "")
    val sk = Sketches.build(items, "k", 3, 32, "plan")
    sk.write.format("noop").mode("overwrite").save()
    val skPlan = sk.queryExecution.executedPlan.toString
    assert(skPlan.contains("partial_sum"),
      "CMS build must partial-aggregate map-side before its exchange")

    // corpusDrift: the one-row totals ride a broadcast, never a shuffle
    // of the vocabulary against itself
    val dr = TextOps.corpusDrift(
      docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 =!= 0),
      "text", 1L)
    dr.write.format("noop").mode("overwrite").save()
    val drPlan = dr.queryExecution.executedPlan.toString
    assert(drPlan.contains("BroadcastNestedLoopJoin") || drPlan.contains("BroadcastExchange"),
      "corpusDrift totals must broadcast")
  }

  // ---- cross-corpus exact Jaccard join ----

  /** Brute-force cross-corpus ground truth with the same shingle def. */
  private def bruteJaccardAB(
      left: DataFrame, right: DataFrame, pct: Int, n: Int): Set[(Long, Long, Double)] = {
    def sets(df: DataFrame) = df.select(col("doc_id"),
        TextOps.wordShingles(col("text"), n).as("sh"))
      .withColumn("sh", filter(col("sh"), _ =!= ""))
      .where(size(col("sh")) > 0)
    val a = sets(left).select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = sets(right).select(col("doc_id").as("ib"), col("sh").as("sb"))
    a.crossJoin(b)
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("uni", size(array_union(col("sa"), col("sb"))).cast("long"))
      .where(col("inter") * 100 >= lit(pct.toLong) * col("uni"))
      .select(col("ia"), col("ib"),
        round(col("inter").cast("double") / col("uni"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
  }

  test("jaccardJoinAB equals cross-corpus brute force (no missed pair, no extra)") {
    val left = simCorpus.where(col("doc_id") % 2 === 0)
    val right = simCorpus.where(col("doc_id") % 2 =!= 0)
      // plus a colliding-id doc: ids may repeat across corpora; sides
      // must keep them apart instead of merging their shingle sets
      .unionByName(simCorpus.where(col("doc_id") === 0L))
    for (pct <- Seq(40, 60, 85)) {
      val got = SetSimJoin.jaccardJoinAB(left, right, "doc_id", "text",
        thresholdPct = pct, shingleSize = 3)
      val gotSet = got.as[(Long, Long, Double)].collect().toSet
      got.unpersist()
      assert(gotSet == bruteJaccardAB(left, right, pct, 3), s"pct=$pct")
    }
  }

  test("jaccardJoinAB on a mirrored corpus equals the self-join plus the diagonal") {
    val ab = SetSimJoin.jaccardJoinAB(simCorpus, simCorpus, "doc_id", "text", 50, 3)
    val abPairs = ab.as[(Long, Long, Double)].collect()
    ab.unpersist()
    val self = SetSimJoin.jaccardJoin(simCorpus, "doc_id", "text", 50, 3)
    val selfPairs = self.as[(Long, Long, Double)].collect().toSet
    self.unpersist()
    // lower triangle == self-join; upper triangle is its mirror; the
    // diagonal is every shingled doc at jaccard 1.0
    assert(abPairs.filter(p => p._1 < p._2).toSet == selfPairs)
    assert(abPairs.filter(p => p._1 > p._2).map(p => (p._2, p._1, p._3)).toSet == selfPairs)
    val diag = abPairs.filter(p => p._1 == p._2)
    val shingled = simCorpus.select(col("doc_id"),
        TextOps.wordShingles(col("text"), 3).as("sh"))
      .withColumn("sh", filter(col("sh"), _ =!= ""))
      .where(size(col("sh")) > 0).count()
    assert(diag.length == shingled && diag.forall(_._3 == 1.0))
  }

  test("jaccardJoinAB: null/empty docs on either side never pair") {
    val left = Seq((1L, "a b c d e f"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val right = Seq((10L, "a b c d e f"), (11L, null.asInstanceOf[String]),
      (12L, "")).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoinAB(left, right, "doc_id", "text", 50, 3)
    val pairs = got.as[(Long, Long, Double)].collect().toSet
    got.unpersist()
    assert(pairs == Set((1L, 10L, 1.0)))
  }

  // ---- exact heavy hitters (Misra-Gries + CMS + exact confirm) ----

  test("localTopCandidates: MG guarantee — every key above N/(m+1) survives") {
    val items = tokenStream.repartition(8) // force multi-partition MG
    val n = items.count()
    val m = 64 // N ~ 3940 -> N/(m+1) ~ 60: the top ~28 keys MUST survive
    val cand = Sketches.localTopCandidates(items, "k", m)
      .as[String].collect().toSet
    val mustSurvive = items.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") > n / (m + 1)).as[(String, Long)].collect()
    assert(mustSurvive.length >= 20, "test stream must make the bound bite")
    mustSurvive.foreach { case (k, c) =>
      assert(cand.contains(k), s"key $k (count $c > ${n / (m + 1)}) evicted")
    }
    // output is bounded: at most m keys per partition
    assert(cand.size <= m * 8)
  }

  test("localTopCandidates: long-typed keys survive the MG bound (boxed " +
    "key path of the open-addressed counter table)") {
    // r20: the counter table moved to open addressing keyed on the raw
    // internal values; string keys are UTF8String (content hash), but
    // numeric keys arrive as boxed java.lang.Long — pin that family too.
    val items = (1 to 40).flatMap(k => Seq.fill(k * k)(k.toLong))
      .toDF("k").repartition(4)
    val n = items.count()
    val m = 32
    val cand = Sketches.localTopCandidates(items, "k", m)
      .as[Long].collect().toSet
    val mustSurvive = items.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") > n / (m + 1)).as[(Long, Long)].collect()
    assert(mustSurvive.length >= 5, "fixture must make the bound bite")
    mustSurvive.foreach { case (k, c) =>
      assert(cand.contains(k), s"key $k (count $c > ${n / (m + 1)}) evicted")
    }
    assert(cand.size <= m * 4)
  }

  test("localTopCandidates refuses a map-typed key (no content equality)") {
    // r19 advice: MapData has identity equals/hashCode, so a map key
    // would silently corrupt the counters — refuse like groupBy would
    val items = Seq(1, 2).toDF("i")
      .select(map(lit("a"), col("i")).as("k"))
    val e = intercept[IllegalArgumentException] {
      Sketches.localTopCandidates(items, "k", 4).collect()
    }
    assert(e.getMessage.contains("map"))
  }

  test("heavyHittersExact returns exactly the true-heavy keys with exact counts") {
    val items = tokenStream.repartition(8)
    val thr = 60L
    val exact = items.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") >= thr).as[(String, Long)].collect().toMap
    // narrow width (16) => a real collision tail in the CMS filter; the
    // exact confirm must remove it entirely, auto-MG must miss nothing
    val got = Sketches.heavyHittersExact(items, "k", depth = 3, width = 16,
      seed = "hhx", threshold = thr).as[(String, Long)].collect()
    assert(got.toMap == exact)
    // ordered heaviest first, key-ordered on ties
    assert(got.sortBy(r => (-r._2, r._1)).toSeq == got.toSeq)
    // partitioning independence: same answer from a different layout
    val got1 = Sketches.heavyHittersExact(items.repartition(3), "k", 3, 16,
      "hhx", thr).as[(String, Long)].collect().toMap
    assert(got1 == exact)
  }

  test("heavyHittersExact re-runs the fused MG scan when the initial-counter " +
    "guess undershoots the bound (r17 fusion: exactness survives a bad guess)") {
    val items = tokenStream.repartition(8)
    // threshold 3 over N ~ 4k: needed = N/3 + 1 > 1024, so a conf'd-down
    // guess (clamped to the 1024 floor) undershoots the MG bound and the
    // re-run path must fire — a guess this small WOULD evict borderline
    // keys if the re-scan were skipped
    val thr = 3L
    val exact = items.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") >= thr).as[(String, Long)].collect().toMap
    spark.conf.set("graft.cms.mgInitialCounters", "1")
    try {
      val got = Sketches.heavyHittersExact(items, "k", 3, 16, "hhg", thr)
        .as[(String, Long)].collect().toMap
      assert(got == exact, "undershot guess lost a true-heavy key")
    } finally spark.conf.unset("graft.cms.mgInitialCounters")
  }

  test("heavyHittersExact thins an over-cap candidate set with the CMS " +
    "prefilter before the forced broadcast (r17 review guard)") {
    val items = tokenStream.repartition(8)
    val thr = 60L
    val exact = items.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") >= thr).as[(String, Long)].collect().toMap
    // cap 1 forces EVERY auto call through the prefilter path; the CMS
    // is one-sided, so exactness must survive the detour
    spark.conf.set("graft.cms.maxBroadcastCandidates", "1")
    try {
      val got = Sketches.heavyHittersExact(items, "k", 3, 2048, "hbc", thr)
        .as[(String, Long)].collect().toMap
      assert(got == exact, "prefiltered path lost or added keys")
    } finally spark.conf.unset("graft.cms.maxBroadcastCandidates")
  }

  test("heavyHittersExact refuses an unbounded auto candidate space with remediation") {
    val items = tokenStream
    spark.conf.set("graft.cms.maxCandidateCounters", "100")
    try {
      val e = intercept[IllegalArgumentException] {
        // N ~ 4k, threshold 2 -> m ~ 2k > 100
        Sketches.heavyHittersExact(items, "k", 3, 64, "hhr", threshold = 2L)
      }
      assert(e.getMessage.contains("graft.cms.maxCandidateCounters"))
      assert(e.getMessage.contains("candidates"))
      // explicit candidates bypass the auto generator and its cap
      val cand = items.distinct()
      val got = Sketches.heavyHittersExact(items, "k", 3, 64, "hhr", 2L,
        candidates = Some(cand))
      val exact = items.groupBy("k").agg(count(lit(1)).as("c"))
        .where(col("c") >= 2L).as[(String, Long)].collect().toMap
      assert(got.as[(String, Long)].collect().toMap == exact)
    } finally spark.conf.unset("graft.cms.maxCandidateCounters")
  }

  test("topKExact returns the exact deterministic top-k, refuses when unverifiable") {
    val items = tokenStream.repartition(8)
    val want = items.groupBy("k").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().sortBy(r => (-r._2, r._1)).take(10)
      .zipWithIndex.map { case ((k, c), i) => (k, c, i + 1) }.toSeq
    val got = Sketches.topKExact(items, "k", k = 10)
      .as[(String, Long, Int)].collect().sortBy(_._3).toSeq
    assert(got == want)
    // partitioning independence
    val got3 = Sketches.topKExact(items.repartition(3), "k", 10)
    assert(got3.as[(String, Long, Int)].collect().sortBy(_._3).toSeq == want)
    got3.unpersist()

    // k larger than the distinct key space: returns everything, verified
    // via full-accounting (sum of candidate counts == N)
    val all = Sketches.topKExact(items, "k", k = 1000)
    assert(all.count() == 40)
    all.unpersist()

    // m too small to verify -> typed refusal with the m that would close
    // the gap (top-10 of 40 zipf keys cannot clear N/(m+1) at m=11)
    val e = intercept[IllegalArgumentException] {
      Sketches.topKExact(items, "k", k = 10, m = 11)
    }
    assert(e.getMessage.contains("Re-call with m >="))
  }

  test("CMS fast-hash mode (xxhash64) keeps every sketch property except oracle replay") {
    val items = tokenStream
    val sk = Sketches.build(items, "k", depth = 3, width = 16, seed = "fx",
      portableHash = false)
    // cells stay inside geometry
    assert(sk.where(col("bucket") < 0 || col("bucket") >= 16).count() == 0)
    assert(sk.select("r").distinct().count() <= 3)
    // one-sided estimates hold identically
    val est = Sketches.estimate(sk, items, "k", 3, 16, "fx", portableHash = false)
    val exact = items.groupBy("k").agg(count(lit(1)).as("exact"))
    assert(est.join(exact, "k").where(col("est") < col("exact")).count() == 0)
    // heavyHittersExact through the fast path equals the plain exact answer
    val thr = 60L
    val want = items.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") >= thr).as[(String, Long)].collect().toMap
    val got = Sketches.heavyHittersExact(items, "k", 3, 16, "fx", thr,
      portableHash = false).as[(String, Long)].collect().toMap
    assert(got == want)
    // the two modes must actually produce DIFFERENT cell layouts — a
    // regression that made cmsBucket ignore the portable flag would
    // silently retire the fast path; except() is the strict check
    val skMd5 = Sketches.build(items, "k", 3, 16, "fx")
    assert(skMd5.exceptAll(sk).count() > 0,
      "md5 and xx64 sketches must differ (portable flag ignored?)")
  }

  test("CmsSketch: geometry-safe handle — roundtrip, merge refusal, corruption refusal") {
    import graft.ops.CmsSketch
    val items = tokenStream
    val sk = CmsSketch.build(items, "k", depth = 3, width = 32, seed = "h1")
    val dir = java.nio.file.Files.createTempDirectory("cms_sketch").toString

    // write/read roundtrip: identical estimates for every key
    CmsSketch.write(sk, dir)
    val loaded = CmsSketch.read(spark, dir)
    assert((loaded.depth, loaded.width, loaded.seed, loaded.portableHash) ==
      ((3, 32, "h1", true)))
    val before = sk.estimate(items, "k").as[(String, Long)].collect().toMap
    val after = loaded.estimate(items, "k").as[(String, Long)].collect().toMap
    assert(before == after)

    // handle merge == functional merge; geometry mismatch refuses
    val sk2 = CmsSketch.build(items, "k", 3, 32, "h1")
    val merged = sk.merge(sk2)
    val mergedFn = Sketches.merge(sk.cells, sk2.cells)
    assert(merged.cells.count() == mergedFn.count())
    assert(merged.cells.exceptAll(mergedFn).count() == 0)
    assert(mergedFn.exceptAll(merged.cells).count() == 0)
    val other = CmsSketch.build(items, "k", 3, 32, "DIFFERENT-SEED")
    val e = intercept[IllegalArgumentException] { sk.merge(other) }
    assert(e.getMessage.contains("geometry mismatch"))
    val otherHash = CmsSketch.build(items, "k", 3, 32, "h1", portableHash = false)
    assert(intercept[IllegalArgumentException] { sk.merge(otherHash) }
      .getMessage.contains("geometry mismatch"))

    // corrupted cell payload: replace cells with a different frame ->
    // digest mismatch refuses instead of serving under-estimates
    CmsSketch.build(items.limit(100), "k", 3, 32, "h1").cells
      .write.mode("overwrite").parquet(s"$dir/cells")
    val e2 = intercept[IllegalArgumentException] { CmsSketch.read(spark, dir) }
    assert(e2.getMessage.contains("digest mismatch"))

    // missing metadata: not a sketch directory
    val empty = java.nio.file.Files.createTempDirectory("cms_none").toString
    assert(intercept[IllegalArgumentException] { CmsSketch.read(spark, empty) }
      .getMessage.contains("not a sketch directory"))
  }

  test("CMS refuses a non-broadcastable cell geometry (graft.cms.maxCells)") {
    spark.conf.set("graft.cms.maxCells", "1000")
    try {
      val e = intercept[IllegalArgumentException] {
        Sketches.build(Seq("a").toDF("k"), "k", depth = 4, width = 512, seed = "cap")
      }
      assert(e.getMessage.contains("graft.cms.maxCells"))
      val sk = Sketches.build(Seq("a").toDF("k"), "k", depth = 2, width = 500, seed = "cap")
      val e2 = intercept[IllegalArgumentException] {
        Sketches.estimate(sk, Seq("a").toDF("k"), "k", depth = 4, width = 512, seed = "cap")
      }
      assert(e2.getMessage.contains("graft.cms.maxCells"))
    } finally spark.conf.unset("graft.cms.maxCells")
  }

  test("dedupChunksWithin is idempotent and is a no-op for distinct chunks") {
    val docs = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val once = TextOps.dedupChunksWithin(docs, "doc_id", "text", 2)
    val twice = TextOps.dedupChunksWithin(
      once.select(col("doc_id"), col("clean_text").as("text")),
      "doc_id", "text", 2)
    assert(twice.where(col("n_removed") > 0).count() == 0)
    val kept = once.agg(sum("n_kept")).head().getLong(0)
    val keptTwice = twice.agg(sum("n_kept")).head().getLong(0)
    assert(kept == keptTwice)
  }
}
