package graft

import graft.ops.Curate

/** End-to-end corpus curation semantics on a handcrafted corpus: each
  * stage (language filter, quality filter, exact dedup, near-dup
  * grouping, best-quality representative) must act on exactly the rows
  * built to trigger it.
  */
class CurateSpec extends SparkSpec {

  import spark.implicits._

  // long, clean English fillers that pass the quality score; the two
  // fillers share no 3-word shingles, so docs built on different fillers
  // are NOT near-dups of each other
  private def en(extra: String): String =
    ("the quick brown fox jumps over the lazy dog and then the dog is " +
      "very happy to see it again in the morning of a bright day ") * 6 + extra
  private def en2(extra: String): String =
    ("a small boat drifts along the calm river while birds sing songs " +
      "in tall green trees near the old wooden bridge every evening ") * 6 + extra

  test("curate filters, dedups, groups, and keeps the best representative") {
    val nearA = en("shared tail one two three")
    val nearB = en("shared tail one two three four") // near-dup of nearA, slightly longer (higher quality cap)
    val docs = Seq(
      (1L, en2("alpha unique body")),
      (2L, en2("alpha unique body")), // exact dup of 1 -> min id survives
      (3L, nearA),
      (4L, nearB), // near-dup pair {3,4}: same quality or higher; one survivor
      (5L, "el la de que el la de que el la de que"), // spanish -> filtered
      (6L, "zzz !!!")) // low quality -> filtered
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text",
      lang = "en", minQuality = 0.4, jaccardThreshold = 0.6)
    val ids = out.select("doc_id").as[Long].collect().toSet
    out.unpersist()
    assert(!ids.contains(5L) && !ids.contains(6L), "language/quality filters")
    assert(ids.contains(1L) && !ids.contains(2L), "exact dedup keeps min id")
    // exactly one of the near-dup pair survives (equal capped quality ->
    // tie broken to the smaller id)
    assert(Seq(3L, 4L).count(ids.contains) == 1, s"near-dup pair collapsed: $ids")
    assert(ids == Set(1L, 3L))
  }

  test("curate representative selection is collision-free for negative doc ids") {
    // the old arithmetic singleton key (-id - 1) maps id -4 to 3, which
    // collides with the component labeled by member id 3 — one aggregation
    // group instead of two, silently dropping a survivor. The struct key
    // (is-singleton, id) cannot collide for any id domain.
    val nearA = en("shared tail one two three")
    val nearB = en("shared tail one two three four")
    val docs = Seq(
      (3L, nearA), (4L, nearB),          // near-dup component labeled 3
      (-4L, en2("negative id singleton"))) // old key: -(-4) - 1 = 3 -> collision
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text",
      lang = "en", minQuality = 0.4, jaccardThreshold = 0.6)
    val ids = out.select("doc_id").as[Long].collect().toSet
    out.unpersist()
    assert(ids.contains(-4L), s"negative-id singleton must survive: $ids")
    assert(Seq(3L, 4L).count(ids.contains) == 1, s"one near-dup survivor: $ids")
    assert(ids.size == 2)
  }

  test("fuzzyDecontaminate caps the eval-side broadcast with remediation text") {
    val train = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    val ev = Seq((100L, "one two three four five six seven")).toDF("doc_id", "text")
    spark.conf.set("graft.decontaminate.maxEvalShingles", "2")
    try {
      val e = intercept[IllegalArgumentException] {
        Curate.fuzzyDecontaminate(train, "doc_id", "text", ev, "doc_id", "text", n = 3)
      }
      assert(e.getMessage.contains("maxEvalShingles"), e.getMessage)
      // malformed conf fails with the key in the message, not a bare
      // NumberFormatException from deep inside the operator
      spark.conf.set("graft.decontaminate.maxEvalShingles", "lots")
      val e2 = intercept[IllegalArgumentException] {
        Curate.fuzzyDecontaminate(train, "doc_id", "text", ev, "doc_id", "text", n = 3)
      }
      assert(e2.getMessage.contains("graft.decontaminate.maxEvalShingles"), e2.getMessage)
    } finally spark.conf.unset("graft.decontaminate.maxEvalShingles")
  }

  test("decontaminate flags n-gram overlap with the eval set, broadcast-joined") {
    val train = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "completely different words with no overlap at all whatsoever here"),
      (3L, "alpha beta one two three four five gamma delta")) // shares 5-gram "one two three four five"
      .toDF("doc_id", "text")
    val ev = Seq((100L, "zz one two three four five yy")).toDF("doc_id", "text")
    val out = Curate.decontaminate(train, "doc_id", "text", ev, "text", n = 5)
    val m = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(m(1L)._2 && m(3L)._2 && !m(2L)._2)
    assert(m(2L)._1 == 0L)
    // the eval shingle side must broadcast: the training corpus is the
    // big side and must not shuffle for this join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan.take(500))
  }

  test("hashed decontamination equals the string path and broadcasts longs") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val train = docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
    val ev = docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
    val hashed = Curate.decontaminate(train, "doc_id", "text", ev, "text", n = 5)
    val strings = Curate.decontaminate(train, "doc_id", "text", ev, "text", n = 5,
      hashShingles = false)
    val hm = hashed.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val sm = strings.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(hm == sm, "xxhash64-keyed join must reproduce the string join row-for-row")
    // the broadcast side must carry 8-byte longs, not shingle strings:
    // after execution the (AQE-wrapped) final plan prints the broadcast
    // hash mode with its key type
    val planStr = hashed.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastExchange") || planStr.contains("BroadcastQueryStage"),
      "eval side must broadcast\n" + planStr.take(800))
    assert(planStr.contains("HashedRelationBroadcastMode(List(input[0, bigint"),
      "broadcast join key must be bigint (xxhash64), not string\n" + planStr.take(800))
    val stringPlan = strings.queryExecution.executedPlan.toString
    assert(stringPlan.contains("HashedRelationBroadcastMode(List(input[0, string"),
      "string path must still join on the raw shingle\n" + stringPlan.take(800))
  }

  test("qualityScoreMicro: bounded integer, within 2 micro-units of the double form") {
    import org.apache.spark.sql.functions.col
    // real corpus PLUS adversarial inputs: empty, whitespace runs,
    // no-alpha, unicode, single token — the shapes that break ratio
    // denominators or length assumptions
    val adversarial = Seq("", " ", "   ", "a", "!!!", "???  !!!",
      "é中文 テスト", "the " * 1000, "\t\n", "a b  c   d").toDF("text")
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("text")).union(adversarial)
    val rows = docs.select(
      graft.ops.TextOps.qualityScoreMicro(col("text")).as("micro"),
      graft.ops.TextOps.qualityScoreRaw(col("text")).as("raw"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val micro = r.getLong(0); val raw = r.getDouble(1)
      assert(micro >= 0L && micro <= 1000000L, s"micro $micro out of [0, 1e6]")
      // each floored sub-term loses < 1 micro-unit vs the double form
      assert(math.abs(micro - raw * 1e6) <= 2.0,
        s"integer form drifted: micro=$micro raw*1e6=${raw * 1e6}")
    }
  }

  test("decontaminateBloom: superset of exact flags, zero false negatives, tracked broadcast") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val train = docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
    val ev = docs.where(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
    val exact = Curate.decontaminate(train, "doc_id", "text", ev, "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (bloomDf, bc) = Curate.decontaminateBloomTracked(
      train, "doc_id", "text", ev, "text", n = 5)
    val bloom = bloomDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom.keySet == exact.keySet, "one row per train doc in both variants")
    // zero false negatives: every exact hit is a bloom hit, per doc
    exact.foreach { case (id, nExact) =>
      assert(bloom(id) >= nExact,
        s"doc $id: bloom n_hits ${bloom(id)} < exact $nExact (false negative)")
    }
    // at 10 bits/shingle + 7 hashes the PER-SHINGLE FP rate is ~0.8%:
    // total extra hits over total probed shingles must sit near it
    // (doc-level flag counts amplify with shingles-per-doc, so they are
    // NOT the design point — see the scaladoc's minHits guidance)
    val totalShingles = train.select(
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.size(
        graft.ops.TextOps.wordShingles(org.apache.spark.sql.functions.col("text"), 5))))
      .collect()(0).getLong(0)
    val extraHits = exact.keysIterator.map(id => bloom(id) - exact(id)).sum
    val fpRate = extraHits.toDouble / totalShingles
    assert(fpRate < 0.025, s"per-shingle FP rate $fpRate far above the ~0.8% design point")
    // the probe is a pure projection over the train scan — no join, no
    // aggregation, nothing that could shuffle corpus rows by key (the
    // only Exchange is fanOut's round-robin spread)
    val plan = bloomDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      "bloom probe must not join or aggregate the corpus side\n" + plan.take(600))
    // tracked broadcast: caller can destroy after materialization
    bc.destroy()
  }

  test("decontaminateBloom caps the filter size with remediation text") {
    val train = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    val ev = Seq((100L, "one two three four five six seven")).toDF("doc_id", "text")
    spark.conf.set("graft.decontaminate.maxBloomBits", "128")
    try {
      val e = intercept[IllegalArgumentException] {
        Curate.decontaminateBloom(train, "doc_id", "text", ev, "text",
          n = 1, bitsPerShingle = 64)
      }
      assert(e.getMessage.contains("maxBloomBits"), e.getMessage)
    } finally spark.conf.unset("graft.decontaminate.maxBloomBits")
  }

  test("fuzzyDecontaminate: paraphrase caught, unrelated doc clean, self-match 1.0") {
    import org.apache.spark.sql.functions._
    // eval doc; train 1 = lightly edited copy (high 3-gram overlap);
    // train 2 = unrelated; train 3 = exact copy
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, evalText)
    ).toDF("doc_id", "text")
    val ev = Seq((100L, evalText)).toDF("eval_id", "text")
    val out = Curate.fuzzyDecontaminate(train, "doc_id", "text",
      ev, "eval_id", "text", n = 3, threshold = 0.5)
    val rows = out.collect().map(r => r.getLong(0) ->
      ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    assert(rows(3L) == ((100L, 1.0, 1.0, true)))
    // 8 shingles each, 7 shared -> jaccard 7/9, containment 7/8
    assert(rows(1L)._1 == 100L && rows(1L)._4 &&
      math.abs(rows(1L)._2 - 7.0 / 9.0) < 1e-6 &&
      math.abs(rows(1L)._3 - 7.0 / 8.0) < 1e-6)
    assert(rows(2L) == ((-1L, 0.0, 0.0, false)))
    // containment metric: a LONG doc quoting the eval whole is missed by
    // jaccard at 0.5 but caught by containment
    val long = Seq((9L, ("pad" + (1 to 40).map(i => s" w$i").mkString) +
      " " + evalText)).toDF("doc_id", "text")
    val jac = Curate.fuzzyDecontaminate(long, "doc_id", "text",
      ev, "eval_id", "text", n = 3, threshold = 0.5).head
    val con = Curate.fuzzyDecontaminate(long, "doc_id", "text",
      ev, "eval_id", "text", n = 3, threshold = 0.8, metric = "containment").head
    assert(!jac.getBoolean(4) && con.getBoolean(4) && con.getDouble(3) == 1.0)
  }

  test("fuzzyDecontaminate hashed path equals the string path on real docs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val ev = docs.where(col("doc_id") % 97 === 0)
    val hashed = Curate.fuzzyDecontaminate(docs, "doc_id", "text",
      ev, "doc_id", "text", n = 3, threshold = 0.5)
    val strings = Curate.fuzzyDecontaminate(docs, "doc_id", "text",
      ev, "doc_id", "text", n = 3, threshold = 0.5, hashShingles = false)
    assert(hashed.exceptAll(strings).isEmpty && strings.exceptAll(hashed).isEmpty)
    // the eval slice must self-report jaccard 1.0
    val self = hashed.where(col("doc_id") % 97 === 0)
      .select(min(col("jaccard"))).head.getDouble(0)
    assert(self == 1.0)
    // plan shape: the eval shingle side broadcasts (the train side never
    // shuffles its raw shingles for the join), keyed by bigint hashes —
    // execute first so AQE materializes the final stages
    hashed.count()
    val planStr = hashed.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastExchange") || planStr.contains("BroadcastQueryStage"),
      "eval shingles must broadcast\n" + planStr.take(600))
    assert("HashedRelationBroadcastMode\\(List\\(input\\[\\d+, bigint".r
      .findFirstIn(planStr).isDefined,
      "fuzzy join key must be bigint on the hashed path\n" + planStr.take(600))
  }

  test("curateAndCut: doc-level dedup first, then duplicate spans cut from survivors") {
    import org.apache.spark.sql.functions._
    // docs 1 and 2 are exact copies (doc-level dedup keeps 1); docs 3 and
    // 4 are distinct but share a long boilerplate tail (substring stage
    // must cut it from BOTH); doc 5 is clean
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, en("same body")),
      (2L, en("same body")),
      (3L, en2("three unique lead") + " " + boiler),
      (4L, en2("four other lead words") + " " + boiler),
      (5L, en("five clean"))
    ).toDF("doc_id", "text")
    val out = Curate.curateAndCut(docs, "doc_id", "text", minQuality = 0.0,
      jaccardThreshold = 0.95, spanMinLen = 50, spanMinCount = 2)
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(3), r.getString(5)))).toMap
    out.unpersist()
    // doc 2 deduped away; 1, 3, 4, 5 survive
    assert(rows.keySet == Set(1L, 3L, 4L, 5L))
    // the shared 60-token boilerplate (plus any shared en2 windows) is cut
    // from both 3 and 4; their unique leads survive
    assert(rows(3L)._1 >= 60L && !rows(3L)._2.contains("b30") &&
      rows(3L)._2.contains("three unique lead"))
    assert(rows(4L)._1 >= 60L && !rows(4L)._2.contains("b30") &&
      rows(4L)._2.contains("four other lead words"))
    // docs 1 and 5 share the en() filler -> their repeated-filler windows
    // are cross-doc duplicates too; their unique tails must survive
    assert(rows(1L)._2.contains("same body") && rows(5L)._2.contains("five clean"))
  }

  test("langQuality fused scan is bit-identical to langId + qualityScore + tokenCount") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val both = docs.select(
        col("doc_id"),
        graft.ops.TextOps.langQuality(col("text")).as("lq"),
        graft.ops.TextOps.langId(col("text")).as("lang"),
        graft.ops.TextOps.qualityScore(col("text")).as("quality"),
        graft.ops.TextOps.tokenCount(col("text")).as("n_tokens"))
      .where(col("lq._1") =!= col("lang") || col("lq._2") =!= col("quality") ||
        col("lq._3") =!= col("n_tokens"))
    assert(both.count() == 0, "fused profile diverged from the unfused operators")
    // edge cases: empty text, double spaces, null
    val edge = Seq((1L, ""), (2L, "a  b"), (3L, "the the the")).toDF("doc_id", "text")
    val e = edge.select(
        graft.ops.TextOps.langQuality(col("text")).as("lq"),
        graft.ops.TextOps.qualityScore(col("text")).as("quality"),
        graft.ops.TextOps.tokenCount(col("text")).as("n_tokens")).collect()
    e.foreach { r =>
      val lq = r.getStruct(0)
      assert(lq.getDouble(1) == r.getDouble(1) && lq.getInt(2) == r.getInt(2))
    }
  }

  test("fanOut covers scan-shaped plans including unions; skips shuffled frames") {
    import org.apache.spark.sql.functions._
    val target = spark.sparkContext.defaultParallelism
    val scan = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    assert(graft.ops.Dedup.fanOut(scan).rdd.getNumPartitions >= target / 2,
      "single-file scan must fan out")
    // union of single-row-group scans has the same 1-task-per-file exposure
    val u = scan.union(scan)
    assert(graft.ops.Dedup.fanOut(u).rdd.getNumPartitions >= target / 2,
      "union of scans must fan out")
    // a frame downstream of a shuffle is untouched (already parallel, and
    // probing it must not materialize AQE stages)
    val agged = scan.groupBy("doc_id").count()
    assert(graft.ops.Dedup.fanOut(agged) eq agged, "shuffled frame must pass through")
  }

  test("decontaminateStream flags contaminated docs across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq((100L, "zz one two three four five yy")).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, String)]
    val flagged = Curate.decontaminateStream(
      stream.toDS().toDF("doc_id", "text"), "doc_id", "text", ev, "text", n = 5)
    val query = flagged.writeStream.format("memory").queryName("decon_out")
      .outputMode("update").start()
    try {
      stream.addData(
        (1L, "one two three four five six seven eight nine ten"),
        (2L, "completely different words with no overlap at all whatsoever here"))
      query.processAllAvailable()
      stream.addData((3L, "alpha beta one two three four five gamma delta"))
      query.processAllAvailable()
      val out = spark.table("decon_out").select("doc_id").as[Long].collect().toSet
      assert(out == Set(1L, 3L), s"got $out")
    } finally query.stop()
  }

  test("curate output carries quality and token counts for survivors") {
    val docs = Seq((1L, en("body one")), (2L, en("totally different body two here")))
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, "doc_id", "text", minQuality = 0.0, jaccardThreshold = 0.9)
    val rows = out.collect()
    out.unpersist()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0 && r.getInt(2) > 50)
    }
  }
}
