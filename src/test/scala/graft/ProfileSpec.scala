package graft

import graft.ops.{Curate, Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Round-11 pipeline-audit operators: bigram LM quality, corpus
  * profiling (exact + sketch), dedup group statistics, LSH parameter
  * planning, and semantic (embedding-space) decontamination.
  */
class ProfileSpec extends SparkSpec {

  test("bigramNll: hand-computed transition likelihoods; sub-2-token docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b b"),
      (3L, "x")).toDF("doc_id", "text")
    val got = TextOps.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // corpus model: c("a b")=2, c("b c")=1, c("b b")=1; c1(a)=2, c1(b)=2
    // doc1 = -(ln(2/2) + ln(1/2))/2 = ln(2)/2, same for doc2
    val expected = math.round(math.log(2.0) / 2.0 * 1e6) / 1e6
    assert(got(1L) == ((expected, 2L)))
    assert(got(2L) == ((expected, 2L)))
    assert(!got.contains(3L), "a one-token doc has no bigrams")
  }

  test("bigramNll: scrambled text scores worse than fluent text under the corpus model") {
    import spark.implicits._
    // many fluent copies fix the transition stats; one scrambled doc
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val scrambled = Seq((99L, "mat the on sat cat the"))
    val docs = (fluent ++ scrambled).toDF("doc_id", "text")
    val nll = TextOps.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(nll(99L) > nll(1L),
      s"scrambled ${nll(99L)} must exceed fluent ${nll(1L)} (unigram profile is identical)")
  }

  test("profileCorpus: pinned rank-ceil(q*n) percentiles match a driver-side replay") {
    import spark.implicits._
    val rnd = new java.util.Random(7)
    val docs = (0 until 90).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      val n = 1 + rnd.nextInt(40)
      (i.toLong, lang, (0 until n).map(j => "tok" + (j % 7)).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val prof = TextOps.profileCorpus(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    // independent replay: collect per-doc integers, sort, pick rank (n*q+9)/10
    val perDoc = docs.select(col("lang"), col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long"),
        TextOps.qualityScoreMicro(col("text")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for (lang <- Seq("en", "de", "fr")) {
      val rows = perDoc.filter(_._1 == lang)
      val n = rows.length
      def pick(vals: Array[Long], q: Int): Long = {
        val sorted = vals.sorted
        sorted(((n.toLong * q + 9) / 10).toInt - 1)
      }
      val toks = rows.map(_._3)
      val qs = rows.map(_._4)
      val r = prof(lang)
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == toks.sum)
      assert(r.getLong(3) == toks.min && r.getLong(4) == toks.max)
      assert(r.getLong(5) == pick(toks, 1), s"$lang p10_tokens")
      assert(r.getLong(6) == pick(toks, 5), s"$lang p50_tokens")
      assert(r.getLong(7) == pick(toks, 9), s"$lang p90_tokens")
      assert(r.getLong(8) == pick(qs, 1), s"$lang p10_q_micro")
      assert(r.getLong(9) == pick(qs, 5), s"$lang p50_q_micro")
      assert(r.getLong(10) == pick(qs, 9), s"$lang p90_q_micro")
    }
  }

  test("approxProfileCorpus: counts exact, sketch percentiles near the exact profile") {
    import spark.implicits._
    // includes NULL-text docs: both profiles must count them as 0-token
    // docs (shared null policy), or ranks desynchronize
    val docs = (0 until 1000).map { i =>
      val text = if (i % 97 == 13) null
        else (0 until (1 + i % 100)).map(_ => "w").mkString(" ")
      (i.toLong, "en", text)
    }.toDF("doc_id", "lang", "text")
    val exact = TextOps.profileCorpus(docs, "doc_id", "text", "lang").collect().head
    val approx = TextOps.approxProfileCorpus(docs, "doc_id", "text", "lang").collect().head
    assert(approx.getLong(1) == exact.getLong(1)) // n_docs
    assert(approx.getLong(2) == exact.getLong(2)) // total_tokens
    for (i <- 5 to 7) { // token percentiles within 2 values of the exact rank
      assert(math.abs(approx.getLong(i) - exact.getLong(i)) <= 2,
        s"col $i: approx ${approx.getLong(i)} vs exact ${exact.getLong(i)}")
    }
  }

  test("dupGroupStats: histogram over exact-dup groups, pure integers") {
    import spark.implicits._
    val docs = Seq("A", "A", "A", "B", "B", "C", "D").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.dupGroupStats(docs.select(md5(col("text")).as("h")), "h")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(3L) == ((1L, 3L, 2L)))
    assert(got(2L) == ((1L, 2L, 1L)))
    assert(got(1L) == ((2L, 2L, 0L)))
    assert(got.size == 3)
  }

  test("lshPlan: S-curve midpoint lands on the known MMDS factorizations") {
    assert(Dedup.lshPlan(0.5, 128) == ((25, 5)))
    assert(Dedup.lshPlan(0.8, 128) == ((11, 11)))
    // higher thresholds want more rows per band (sharper curves)
    val (_, rLow) = Dedup.lshPlan(0.3, 128)
    val (_, rHigh) = Dedup.lshPlan(0.9, 128)
    assert(rHigh > rLow)
    // plan is always realizable
    for (t <- Seq(0.2, 0.5, 0.7, 0.95); h <- Seq(16, 64, 256)) {
      val (b, r) = Dedup.lshPlan(t, h)
      assert(b >= 1 && r >= 1 && b * r <= h)
      assert(math.abs(math.pow(1.0 / b, 1.0 / r) - t) < 0.15,
        s"midpoint for t=$t h=$h lands near the threshold")
    }
  }

  test("semanticDecontaminate: cosine hits flag, misses pass, every train doc emitted") {
    import spark.implicits._
    val train = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0))).toDF("id", "vec")
    val eval = Seq(
      (10L, Seq(2.0, 0.0, 0.0)), // same direction as train 1
      (11L, Seq(0.6, 0.8, 0.0))  // cos 0.6 with t1, 0.8 with t2 — below tau
    ).toDF("id", "vec")
    val got = Curate.semanticDecontaminate(train, "id", "vec", eval, "id", "vec", tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((1L, 1.0, 10L, true)))
    assert(got(2L) == ((0L, 0.0, -1L, false)))
    assert(got(3L) == ((0L, 0.0, -1L, false)))
    assert(got.size == 3)
  }

  test("semanticDecontaminate: eval cap fires with remediation text") {
    import spark.implicits._
    val train = Seq((1L, Seq(1.0, 0.0))).toDF("id", "vec")
    val eval = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(0.0, 1.0))).toDF("id", "vec")
    spark.conf.set("graft.decontaminate.maxEvalVectors", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        Curate.semanticDecontaminate(train, "id", "vec", eval, "id", "vec", tau = 0.9)
      }
      assert(e.getMessage.contains("maxEvalVectors"))
    } finally spark.conf.unset("graft.decontaminate.maxEvalVectors")
  }

  test("gopherRules: each rule fires on a targeted violation, keep is the conjunction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cats sat upon the mats and it is fine today in all ways here now"), // all ok
      (2L, "the of"), // too few words
      (3L, "the of " + Seq.fill(14)("extraordinarily").mkString(" ")), // mean len > 10
      (4L, "the of a b c d e f g h i j k l m n"), // mean len < 3
      (5L, "the of ### x ### y ### z ### w ### v ### u ### t"), // symbol mass
      (6L, "the of 1 2 3 4 5 6 7 8 9 10 11 12 13 14"), // non-alpha words
      (7L, "cat sat mat dog ran far big red sun sky day way out now end")) // no stopwords
      .toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs, "doc_id", "text",
        minWords = 10L, maxWords = 100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(got(1L) == ((true, true, true, true, true, true)))
    assert(got(2L)._1 == false && got(2L)._6 == false)
    assert(got(3L)._2 == false, "long words must fail mean_len")
    assert(got(4L)._2 == false, "short words must fail mean_len")
    assert(got(5L)._3 == false, "symbol mass must fail symbol_ok")
    assert(got(6L)._4 == false, "digit words must fail alpha_ok")
    assert(got(7L)._5 == false, "no stopwords must fail stopword_ok")
    // every violation doc is rejected
    (2L to 7L).foreach(d => assert(!got(d)._6, s"doc $d must not keep"))
  }

  test("gopherRules: integer cross-multiplication matches the ratio form on the corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val out = TextOps.gopherRules(docs, "doc_id", "text", minWords = 45L)
    // SAME tokenization as gopherRules (empty tokens dropped): split()
    // alone would count empties from doubled spaces and compare the
    // integer rules against a different word count
    val toksR = filter(split(col("text"), " "), t => t =!= "")
    val viaRatio = docs.select(col("doc_id"),
        size(toksR).cast("double").as("nw"),
        (aggregate(toksR, lit(0), (a, t) => a + length(t)).cast("double") /
          size(toksR)).as("ml"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    out.collect().foreach { r =>
      val (nw, ml) = viaRatio(r.getLong(0))
      assert(r.getBoolean(2) == (nw >= 45 && nw <= 100000), s"word_count doc ${r.getLong(0)}")
      // boundary-free corpus: the double mean and the integer
      // cross-multiplication agree away from exact thresholds
      if (math.abs(ml - 3.0) > 1e-9 && math.abs(ml - 10.0) > 1e-9)
        assert(r.getBoolean(3) == (ml >= 3.0 && ml <= 10.0), s"mean_len doc ${r.getLong(0)}")
    }
  }
}
