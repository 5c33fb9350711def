package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling / mixing operators: reproducibility, partition
  * invariance, rate fidelity, weighted inclusion, plan math, budgets.
  */
class SamplingSpec extends SparkSpec {

  private def keys(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("hashSample: deterministic, partition-invariant, rate-faithful") {
    val df = keys(2000)
    val a = Sampling.hashSample(df, "id", 0.5, "s1").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "id", 0.5, "s1").collect().map(_.getLong(0)).toSet
    val c = Sampling.hashSample(df.repartition(13), "id", 0.5, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a == c)
    assert(math.abs(a.size - 1000) < 70) // ~4 sigma
    // a different seed draws a genuinely different sample
    val d = Sampling.hashSample(df, "id", 0.5, "s2").collect().map(_.getLong(0)).toSet
    assert(a != d)
    // nested property: a smaller fraction at the same seed is a subset
    val e = Sampling.hashSample(df, "id", 0.2, "s1").collect().map(_.getLong(0)).toSet
    assert(e.subsetOf(a))
  }

  test("sampleByStrata: per-stratum rates, default fallback") {
    import spark.implicits._
    val df = (0L until 900L).map(i => (i, s"dom${i % 3}")).toDF("id", "dom")
    val out = Sampling.sampleByStrata(df, "dom", "id",
      Map("dom0" -> 1.0, "dom1" -> 0.0), defaultRate = 0.5, seed = "st")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom("dom0") == 300)
    assert(!byDom.contains("dom1"))
    assert(math.abs(byDom("dom2") - 150) < 50)
  }

  test("weightedSampleN: size, weight bias, exclusions, determinism") {
    import spark.implicits._
    // 500 light rows (w=1) + 20 heavy rows (w=200) + invalid weights
    val df = ((0L until 500L).map(i => (i, 1.0)) ++
      (1000L until 1020L).map(i => (i, 200.0)) ++
      Seq((2000L, 0.0), (2001L, -3.0))).toDF("id", "w")
    val sel = Sampling.weightedSampleN(df, "id", "w", 40, "ws")
    val ids = sel.collect().map(_.getLong(0))
    assert(ids.length == 40)
    assert(ids.toSet.intersect(Set(2000L, 2001L)).isEmpty)
    // heavy rows are 200x likelier per draw: essentially all 20 make top-40
    assert(ids.count(_ >= 1000L) >= 18)
    val again = Sampling.weightedSampleN(df.repartition(9), "id", "w", 40, "ws")
      .collect().map(_.getLong(0))
    assert(ids.sorted.sameElements(again.sorted))
  }

  test("mixturePlan: max-retention rates for the target mixture") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (s"r$i", "a", 100L)) ++
      (1 to 3).map(i => (s"s$i", "b", 100L)) ++
      Seq(("t1", "c", 999L))).toDF("key", "dom", "tok")
    // targets 1:1 (given unnormalized as 2,2); domain c untargeted
    val plan = Sampling.mixturePlan(df, "dom", col("tok"), Map("a" -> 2.0, "b" -> 2.0))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(plan.keySet == Set("a", "b"))
    val (availA, twA, rateA, plannedA) = plan("a")
    val (availB, twB, rateB, plannedB) = plan("b")
    assert(availA == 1000.0 && availB == 300.0)
    assert(twA == 0.5 && twB == 0.5)
    // binding domain b caps the corpus at 600 tokens: 300 from each
    assert(math.abs(plannedA - 300.0) < 1e-9 && math.abs(plannedB - 300.0) < 1e-9)
    assert(math.abs(rateA - 0.3) < 1e-9 && math.abs(rateB - 1.0) < 1e-9)
  }

  test("mixturePlan surfaces a target domain the corpus cannot supply") {
    import spark.implicits._
    // target includes 'c' which the corpus lacks entirely: the old inner
    // join silently dropped it and re-normalized over {a, b}, producing
    // rates that no longer realize the target proportions. Now the row
    // appears with available=0, which forces scale=0: EVERY rate/planned
    // collapses to 0, making the unsatisfiable mixture visible.
    val df = Seq(("r1", "a", 100L), ("s1", "b", 100L)).toDF("key", "dom", "tok")
    val plan = Sampling.mixturePlan(df, "dom", col("tok"), Map("a" -> 1.0, "b" -> 1.0, "c" -> 2.0))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(plan.keySet == Set("a", "b", "c"), s"every target domain must emit a row: ${plan.keySet}")
    assert(plan("c")._1 == 0.0)
    assert(plan.values.forall { case (_, rate, planned) => rate == 0.0 && planned == 0.0 },
      s"unsatisfiable mixture must zero the whole plan: $plan")
  }

  test("budgetSelect: greedy quality-first prefix per domain") {
    import spark.implicits._
    val df = Seq(
      // domain x: qualities 0.9 (300 tok), 0.8 (300), 0.7 (300), 0.5 (10)
      ("x", 1L, 0.9, 300L), ("x", 2L, 0.8, 300L), ("x", 3L, 0.7, 300L), ("x", 4L, 0.5, 10L),
      // domain y: single huge doc exceeds the budget but is still taken
      ("y", 9L, 0.4, 5000L), ("y", 8L, 0.3, 100L)
    ).toDF("dom", "id", "q", "tok")
    val out = Sampling.budgetSelect(df, "dom", "id", col("q"), col("tok"), 700L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val x = out.filter(_._1 == "x").map(_._2).sorted
    val y = out.filter(_._1 == "y").map(_._2).sorted
    // x: 0.9 (cum 300 before=0), 0.8 (before=300), 0.7 (before=600 < 700); 0.5 excluded (before=900)
    assert(x.toSeq == Seq(1L, 2L, 3L))
    // y: the best doc always enters even though it alone blows the budget
    assert(y.toSeq == Seq(9L))
    val cums = out.filter(_._1 == "x").map(t => t._2 -> t._4).toMap
    assert(cums(3L) == 900L)
  }

  test("DSIR: target-like docs score higher; selection is deterministic") {
    import spark.implicits._
    // raw corpus: 20 docs of domain A vocabulary, 20 of domain B
    val raw = ((0L until 20L).map(i => (i, s"alpha beta gamma delta a$i")) ++
      (20L until 40L).map(i => (i, s"omega sigma tau rho b$i"))).toDF("doc_id", "text")
    // target: domain-A-flavored docs only
    val target = (100L until 110L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val w = Sampling.importanceWeights(raw, target, "doc_id", "text")
    val scores = w.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 40)
    // every A doc outscores every B doc
    val aMin = (0L until 20L).map(scores).min
    val bMax = (20L until 40L).map(scores).max
    assert(aMin > bMax)
    // Gumbel top-k: deterministic, partition-invariant, favors A docs
    val sel1 = Sampling.dsirSelect(w, "doc_id", n = 15, seed = "g1")
      .collect().map(_.getLong(0)).toSet
    val sel2 = Sampling.dsirSelect(w.repartition(7), "doc_id", n = 15, seed = "g1")
      .collect().map(_.getLong(0)).toSet
    assert(sel1 == sel2 && sel1.size == 15)
    assert(sel1.count(_ < 20L) > 10) // mostly target-domain docs
  }

  test("hashSample and sampleByStrata are stream-safe (ingest-time sampling)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    // stateless deterministic filter: works unchanged on a stream, and
    // emits EXACTLY the batch-mode sample of the same keys
    val sampled = Sampling.hashSample(stream.toDF().withColumnRenamed("value", "id"),
      "id", 0.5, "s1")
    val query = sampled.writeStream.format("memory").queryName("samp_out")
      .outputMode("append").start()
    try {
      stream.addData(0L until 1000L)
      query.processAllAvailable()
      stream.addData(1000L until 2000L)
      query.processAllAvailable()
      val streamed = spark.table("samp_out").as[Long].collect().toSet
      val batch = Sampling.hashSample(keys(2000), "id", 0.5, "s1")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("deterministicShuffle: stable permutation of the full input") {
    val df = keys(500)
    val a = Sampling.deterministicShuffle(df, "id", "sh").collect().map(_.getLong(0))
    val b = Sampling.deterministicShuffle(df.repartition(11), "id", "sh")
      .collect().map(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.sorted.toSeq == (0L until 500L).toSeq)
    assert(a.toSeq != (0L until 500L).toSeq) // actually scrambled
  }

  test("selectTopByScore equals the single-window selection (heavy ties included)") {
    import spark.implicits._
    // scores with heavy ties: score = id % 7 — the boundary score must
    // fill by lowest id, exactly like the window form
    val df = (0L until 300L).map(i => (i, i % 7)).toDF("id", "score")
    for (f <- Seq(0.1, 0.3, 0.5, 1.0)) {
      val got = Sampling.selectTopByScore(df, "id", "score", f)
      try {
        val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val k = math.ceil(f * 300).toLong
        val expected = (0L until 300L).map(i => (i, i % 7))
          .sortBy { case (id, s) => (-s, id) }.take(k.toInt).toSet
        assert(gotSet == expected, s"fraction $f: ${gotSet.size} vs ${expected.size}")
      } finally got.unpersist()
    }
  }

  test("selectTopByScore on the corpus quality score is partition-invariant") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val scored = docs.select(col("doc_id"),
      graft.ops.TextOps.qualityScoreMicro(col("text")).as("q"))
    val a = Sampling.selectTopByScore(scored, "doc_id", "q", 0.3)
    val b = Sampling.selectTopByScore(scored.repartition(13), "doc_id", "q", 0.3)
    try {
      assert(a.collect().map(_.getLong(0)).toSet == b.collect().map(_.getLong(0)).toSet)
      assert(a.count() == math.ceil(0.3 * docs.count()).toLong)
    } finally { a.unpersist(); b.unpersist() }
  }

  test("capPerDomain: cap enforced per domain, deterministic, seed-rotatable") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val a = Sampling.capPerDomain(docs, "source", "doc_id", 5L, "s1")
    val sizes = a.groupBy(col("source")).count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 5L) && sizes.nonEmpty)
    // deterministic across partitionings
    val b = Sampling.capPerDomain(docs.repartition(13), "source", "doc_id", 5L, "s1")
    assert(a.select("doc_id").collect().map(_.getLong(0)).toSet ==
      b.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a different seed rotates the kept subsample
    val c = Sampling.capPerDomain(docs, "source", "doc_id", 5L, "s2")
    assert(a.select("doc_id").collect().map(_.getLong(0)).toSet !=
      c.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a cap above the domain size keeps everything
    val all = Sampling.capPerDomain(docs, "source", "doc_id", 1000000L, "s1")
    assert(all.count() == docs.count())
  }

  test("bucketByScore equals the single-window rank bucketing (heavy ties included)") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, i % 7)).toDF("id", "score")
    val got = Sampling.bucketByScore(df, "id", "score", Seq(1, 1, 1),
      Seq("head", "middle", "tail"))
    try {
      val gotMap = got.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val n = 300L
      val k1 = (n * 1 + 2) / 3
      val k2 = (n * 2 + 2) / 3
      val ranked = (0L until n).map(i => (i, i % 7))
        .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      val expected = ranked.map { case ((id, _), r0) =>
        val rk = r0 + 1
        id -> (if (rk <= k1) "head" else if (rk <= k2) "middle" else "tail")
      }.toMap
      assert(gotMap == expected)
      // exact thirds by construction
      assert(gotMap.values.groupBy(identity).view.mapValues(_.size).toMap ==
        Map("head" -> 100, "middle" -> 100, "tail" -> 100))
    } finally got.unpersist()
  }

  test("bucketByScore is partition-invariant and covers every row exactly once") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val scored = docs.select(col("doc_id"),
      graft.ops.TextOps.qualityScoreMicro(col("text")).as("q"))
    val a = Sampling.bucketByScore(scored, "doc_id", "q", Seq(2, 3, 5),
      Seq("a", "b", "c"))
    val b = Sampling.bucketByScore(scored.repartition(13), "doc_id", "q",
      Seq(2, 3, 5), Seq("a", "b", "c"))
    try {
      assert(a.collect().map(r => (r.getLong(0), r.getString(2))).toSet ==
        b.collect().map(r => (r.getLong(0), r.getString(2))).toSet)
      assert(a.count() == docs.count())
      // weighted boundaries: ceil splits, monotone in score
      val n = docs.count()
      val sizes = a.groupBy(col("bucket")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sizes("a") == (n * 2 + 9) / 10)
      assert(sizes("a") + sizes("b") == (n * 5 + 9) / 10)
    } finally { a.unpersist(); b.unpersist() }
  }

  test("perplexityBuckets: fluent text heads, scrambled text tails") {
    import spark.implicits._
    // 6 fluent docs share the same high-probability bigram chain; 3
    // scrambled docs use the same words in improbable orders
    val fluent = (0L until 6L).map(i => (i, "the cat sat on the mat"))
    val scrambled = Seq(
      (10L, "mat the on sat cat the"),
      (11L, "on mat cat the the sat"),
      (12L, "sat the mat the cat on"))
    val df = (fluent ++ scrambled).toDF("doc_id", "text")
    val out = graft.ops.Curate.perplexityBuckets(df, "doc_id", "text")
    try {
      val byBucket = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      // 9 docs -> head = 3; every head doc is a fluent one
      val heads = byBucket.filter(_._2 == "head").keySet
      assert(heads.size == 3 && heads.forall(_ < 6L))
      // scrambled docs never reach the head
      assert(Seq(10L, 11L, 12L).forall(byBucket(_) != "head"))
    } finally out.unpersist()
  }

  test("bucketByScore property: arbitrary scores/weights always equal the single-window reference") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // heavy-tie score domain (0..5) exercises every boundary-fill path
    val genScores = Gen.chooseNum(1, 120).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 5L)))
    val genWeights = Gen.chooseNum(1, 4).flatMap(m => Gen.listOfN(m, Gen.chooseNum(1, 9)))
    val prop = Prop.forAll(genScores, genWeights) { (scores: List[Long], ws: List[Int]) =>
      val labels = ws.indices.map(i => s"b$i")
      val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
      val got = Sampling.bucketByScore(df, "id", "score", ws, labels)
      try {
        val gotMap = got.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
        val n = scores.length.toLong
        val totalW = ws.map(_.toLong).sum
        val bounds = ws.map(_.toLong).scanLeft(0L)(_ + _).tail.dropRight(1)
          .map(pw => (n * pw + totalW - 1) / totalW) :+ n
        val expected = scores.zipWithIndex
          .sortBy { case (s, i) => (-s, i) }.zipWithIndex.map { case ((_, id), r0) =>
            val rk = r0 + 1
            id.toLong -> labels(bounds.indexWhere(rk <= _))
          }.toMap
        gotMap == expected
      } finally { got.unpersist(); () }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("temperaturePlan: tau=1 keeps natural shares; large tau flattens toward uniform") {
    import spark.implicits._
    val df = (Seq.fill(80)("big") ++ Seq.fill(20)("small")).zipWithIndex
      .map { case (d, i) => (d, i.toLong) }.toDF("dom", "id")
    def shares(tau: Double): Map[String, Double] = {
      val rows = Sampling.temperaturePlan(df, "dom", lit(1L), tau).collect()
      val tot = rows.map(r => r.getAs[Double]("planned")).sum
      rows.map(r => r.getString(0) -> r.getAs[Double]("planned") / tot).toMap
    }
    val natural = shares(1.0)
    assert(math.abs(natural("big") - 0.8) < 1e-9 && math.abs(natural("small") - 0.2) < 1e-9)
    val flat = shares(100.0)
    assert(flat("big") < 0.52 && flat("small") > 0.48,
      s"tau=100 should be near-uniform, got $flat")
    // flattening monotone: small-domain share grows with tau
    assert(shares(2.0)("small") > natural("small"))
    // the binding domain keeps rate 1.0 (no upsampling anywhere)
    val plan2 = Sampling.temperaturePlan(df, "dom", lit(1L), 2.0).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("rate")).toMap
    assert(math.abs(plan2("small") - 1.0) < 1e-9 && plan2("big") < 1.0)
  }

  test("temperaturePlan domain cap fires with remediation text") {
    import spark.implicits._
    val df = (0 until 50).map(i => ("d" + i, i.toLong)).toDF("dom", "id")
    spark.conf.set("graft.mixture.maxDomains", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        Sampling.temperaturePlan(df, "dom", lit(1L), 2.0)
      }
      assert(e.getMessage.contains("maxDomains"))
    } finally spark.conf.unset("graft.mixture.maxDomains")
  }

  test("selectTopByScore boundary cap fires with remediation text") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, 1L)).toDF("id", "score") // all tied
    spark.conf.set("graft.select.maxBoundaryRows", "3")
    try {
      val e = intercept[IllegalArgumentException] {
        Sampling.selectTopByScore(df, "id", "score", 0.5)
      }
      assert(e.getMessage.contains("maxBoundaryRows"))
    } finally spark.conf.unset("graft.select.maxBoundaryRows")
  }
}
