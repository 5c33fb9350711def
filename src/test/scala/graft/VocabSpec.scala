package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Vocabulary statistics: exact two-level agg vs driver math, HLL approx
  * within tolerance, and the plan properties that matter at scale.
  */
class VocabSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha gamma gamma delta"),
      (3L, "beta beta beta"),
      (4L, "alpha")).toDF("doc_id", "text")
  }

  test("vocabStats: exact doc_freq and term_freq") {
    val got = TextOps.vocabStats(corpus(), "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("alpha") == ((3L, 3L)))
    assert(got("beta") == ((2L, 5L)))
    assert(got("gamma") == ((2L, 3L)))
    assert(got("delta") == ((1L, 1L)))
    assert(got.size == 4)
  }

  test("approxVocabStats: doc_freq within HLL tolerance of exact, term_freq exact") {
    import spark.implicits._
    val rnd = new java.util.Random(5)
    val docs = (0 until 2000).map { i =>
      (i.toLong, (0 until 20).map(_ => "tok" + rnd.nextInt(50)).mkString(" "))
    }.toDF("doc_id", "text")
    val exact = TextOps.vocabStats(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val approx = TextOps.approxVocabStats(docs, "doc_id", "text", rsd = 0.02)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (tok, (adf, atf)) =>
      val (edf, etf) = exact(tok)
      assert(atf == etf, s"term_freq must be exact for $tok")
      assert(math.abs(adf - edf) <= math.max(2.0, 0.1 * edf),
        s"doc_freq for $tok: approx $adf vs exact $edf")
    }
  }

  test("tfidf: rare tokens outweigh common ones; tf scales linearly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common"),
      (3L, "common"),
      (4L, "common")).toDF("doc_id", "text")
    val w = TextOps.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // doc 1: 'rare' df=1 beats one 'common' df=4; two 'common' = 2x one
    assert(w((1L, "rare")) > w((2L, "common")))
    val idfCommon = math.log(5.0 / 5.0) + 1.0
    assert(math.abs(w((1L, "common")) - 2.0 * idfCommon) < 1e-6)
    assert(math.abs(w((2L, "common")) - idfCommon) < 1e-6)
    val idfRare = math.log(5.0 / 2.0) + 1.0
    assert(math.abs(w((1L, "rare")) - idfRare) < 1e-6)
  }

  test("splitByHash: deterministic, order-independent, proportions within tolerance") {
    import spark.implicits._
    val docs = (0 until 5000).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val s1 = TextOps.splitByHash(docs, "doc_id", Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // same assignment when the input arrives in a different order
    val s2 = TextOps.splitByHash(docs.orderBy(rand(7)), "doc_id",
        Seq("train", "val", "test"), Seq(0.8, 0.1, 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2, "split must not depend on row order")
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 4000) < 200, s"train ${counts("train")}")
    assert(math.abs(counts("val") - 500) < 120, s"val ${counts("val")}")
    assert(math.abs(counts("test") - 500) < 120, s"test ${counts("test")}")
  }

  test("packDocuments: contiguous tape per group, chunk/offset arithmetic exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, Seq.fill(300)("w").mkString(" ")),   // grp 0: 300 tokens
      (2L, Seq.fill(300)("w").mkString(" ")),   // grp 0: spans chunk 0 -> 1
      (4L, Seq.fill(100)("w").mkString(" ")),   // grp 0
      (1L, Seq.fill(600)("w").mkString(" ")))   // grp 1: longer than capacity
      .toDF("doc_id", "text")
    val got = TextOps.packDocuments(docs, "doc_id", "text", capacity = 512, nGroups = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((0, 0L, 0L)))     // starts at 0
    assert(got(2L) == ((0, 0L, 300L)))   // starts at 300, spans into chunk 1
    assert(got(4L) == ((0, 1L, 88L)))    // 600 % 512 = 88
    assert(got(1L) == ((1, 0L, 0L)))     // own group tape
  }

  test("chunkPassages: coverage, overlap, short docs, guards") {
    import spark.implicits._
    val toks = (0 until 130).map(i => s"t$i")
    val docs = Seq(
      (1L, toks.mkString(" ")),           // 130 tokens -> 3 windows at 64/48
      (2L, "a b c"),                      // shorter than one window
      (3L, ""),                           // empty -> no passages
      (4L, (0 until 64).map(i => s"u$i").mkString(" "))) // exactly one window
      .toDF("doc_id", "text")
    val got = TextOps.chunkPassages(docs, "doc_id", "text", 64, 48).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 1: windows at 0, 48, 96; last is 34 tokens
    assert(got((1L, 0L)) == ((0L, 64L, toks.slice(0, 64).mkString(" "))))
    assert(got((1L, 1L)) == ((48L, 64L, toks.slice(48, 112).mkString(" "))))
    assert(got((1L, 2L)) == ((96L, 34L, toks.slice(96, 130).mkString(" "))))
    assert(!got.contains((1L, 3L)))
    // every token covered; consecutive windows overlap by window - stride
    val covered = (0 until 3).flatMap(i => i * 48 until math.min(i * 48 + 64, 130)).toSet
    assert(covered == (0 until 130).toSet)
    assert(got((2L, 0L)) == ((0L, 3L, "a b c")))
    assert(!got.keys.exists(_._1 == 3L), "empty doc must emit nothing")
    assert(got((4L, 0L))._2 == 64L && !got.contains((4L, 1L)))
    // parameter + runaway guards
    intercept[IllegalArgumentException](
      TextOps.chunkPassages(docs, "doc_id", "text", 64, 65))
    spark.conf.set("graft.chunk.maxWindowsPerDoc", "2")
    try {
      val ex = intercept[Exception](
        TextOps.chunkPassages(docs, "doc_id", "text", 64, 48).collect())
      assert(ex.getMessage.contains("maxWindowsPerDoc")
        || ex.getCause != null && ex.getCause.getMessage.contains("maxWindowsPerDoc"))
    } finally spark.conf.unset("graft.chunk.maxWindowsPerDoc")
  }

  test("chunkPassages: layout law over an (n, window, stride) grid") {
    import spark.implicits._
    // one Spark job for the whole grid: every doc length under every
    // parameter pair, expected layout recomputed independently in Scala
    val lengths = Seq(0, 1, 5, 63, 64, 65, 100, 128, 129, 200)
    val params = Seq((64, 48), (64, 64), (8, 3), (1, 1), (10, 10))
    val docs = lengths.map(n => (n.toLong, (0 until n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text").cache()
    for ((win, str) <- params) {
      val got = TextOps.chunkPassages(docs, "doc_id", "text", win, str).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(1)).map(r =>
          (r.getLong(2), r.getLong(3), r.getString(4))).toSeq).toMap
      for (n <- lengths) {
        val toks = (0 until n).map(i => s"w$i")
        val expWins =
          if (n == 0) 0 else if (n <= win) 1 else 1 + ((n - win + str - 1) / str)
        val exp = (0 until expWins).map { i =>
          val s = i * str
          val slice = toks.slice(s, math.min(s + win, n))
          (s.toLong, slice.length.toLong, slice.mkString(" "))
        }
        assert(got.getOrElse(n.toLong, Seq.empty) == exp,
          s"layout mismatch at n=$n window=$win stride=$str")
        // coverage law: every token index falls inside some window
        val covered = (0 until expWins)
          .flatMap(i => i * str until math.min(i * str + win, n)).toSet
        assert(covered == (0 until n).toSet, s"coverage hole at n=$n $win/$str")
        // stride == window partitions the doc exactly (reconstruction)
        if (str == win && n > 0)
          assert(exp.map(_._3).mkString(" ") == toks.mkString(" "))
      }
    }
    docs.unpersist()
  }

  test("unigramNll: rare-token docs score higher than common-token docs; hand-checked value") {
    import spark.implicits._
    // corpus: "a" appears 6x, "b" 2x, "z" 1x -> p(a)=6/9, p(b)=2/9, p(z)=1/9
    val docs = Seq(
      (1L, "a a a"), (2L, "a a a"), (3L, "b b z")).toDF("doc_id", "text")
    val out = graft.ops.TextOps.unigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val pA = 6.0 / 9; val pB = 2.0 / 9; val pZ = 1.0 / 9
    assert(math.abs(out(1L)._1 - (-math.log(pA))) < 1e-6, s"doc1 ${out(1L)}")
    val expected3 = (-math.log(pB) * 2 - math.log(pZ)) / 3
    assert(math.abs(out(3L)._1 - expected3) < 1e-6, s"doc3 ${out(3L)}")
    assert(out(3L)._1 > out(1L)._1, "rare-token doc must score higher NLL")
    assert(out(1L)._2 == 3 && out(3L)._2 == 3)
    // empty corpus: empty result, no construction-time job or NPE
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.TextOps.unigramNll(empty, "doc_id", "text").count() == 0)
  }

  test("plans: exact form has no Expand; approx shuffles HLL partials (one agg level)") {
    val docs = corpus()
    val exactPlan = TextOps.vocabStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"), s"count_distinct Expand leaked:\n$exactPlan")
    val approxPlan = TextOps.approxVocabStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(approxPlan.contains("approx_count_distinct")
      || approxPlan.contains("HyperLogLog"), s"approx plan:\n$approxPlan")
  }

  test("repetition stats: duplicate lines and n-grams on handcrafted fixtures") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b\na b\nc d"),          // 3 lines, 1 dup -> 1/3
      (2L, "x y\nz w"),                // no dup lines
      (3L, "a b c a b c a b c"),       // 9 tokens: 7 3-grams, distinct {abc,bca,cab} -> 4/7
      (4L, "p q r s t u v w x y"))     // all distinct
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextOps.dupLineFraction(col("text")).as("dl"),
        TextOps.dupNgramFraction(col("text"), 3).as("d3"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(out(1L)._1 - 1.0 / 3) < 1e-6)
    assert(out(2L)._1 == 0.0)
    assert(math.abs(out(3L)._2 - 4.0 / 7) < 1e-6, s"got ${out(3L)._2}")
    assert(out(4L)._2 == 0.0)
    // degenerate inputs
    val edge = Seq((9L, "")).toDF("doc_id", "text")
      .select(TextOps.dupLineFraction(col("text")).as("dl"),
        TextOps.dupNgramFraction(col("text"), 3).as("d3")).head()
    assert(edge.getDouble(0) == 0.0 && edge.getDouble(1) == 0.0)
    // the fused single-pass UDF is bit-identical to the expression form
    // on real corpus text, for every n the harness uses
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val fused = TextOps.dupNgramFractions(Seq(3, 10))(col("text"))
    val diff = real.select(
        fused.getItem(0).as("f3"), fused.getItem(1).as("f10"),
        TextOps.dupNgramFraction(col("text"), 3).as("e3"),
        TextOps.dupNgramFraction(col("text"), 10).as("e10"))
      .where(col("f3") =!= col("e3") || col("f10") =!= col("e10"))
    assert(diff.count() == 0, "fused n-gram fractions diverged from the expression form")
  }

  test("crossDocNgramStats: shared n-grams counted across docs, hash path equals string path") {
    import spark.implicits._
    // docs 1 and 2 share the 4-token prefix (two distinct 3-grams);
    // doc 3 shares nothing; doc 4 is a verbatim copy of doc 3
    val docs = Seq(
      (1L, "alpha beta gamma delta one two"),
      (2L, "alpha beta gamma delta nine ten"),
      (3L, "unique words entirely different here"),
      (4L, "unique words entirely different here")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.crossDocNgramStats(docs, "doc_id", "text", n = 3,
        hashNgrams = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: 4 distinct 3-grams, 2 shared with doc 2 ("alpha beta gamma",
    // "beta gamma delta")
    assert(out(1L) == ((4L, 2L, 0.5)))
    assert(out(2L) == ((4L, 2L, 0.5)))
    // verbatim copies: every gram duplicated
    assert(out(3L) == ((3L, 3L, 1.0)))
    assert(out(4L) == ((3L, 3L, 1.0)))
    // the hashed production path computes the identical statistics
    val hashed = graft.ops.TextOps.crossDocNgramStats(docs, "doc_id", "text", n = 3,
        hashNgrams = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(hashed == out)
  }

  test("PII redaction: emails, IPs, phones found, counted, and replaced in fixed order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to jane.doe+x@corp.example.org today"),
      (2L, "server 192.168.100.200 is down, call +1 (555) 010-9999 now"),
      (3L, "no pii here at all"),
      (4L, "two mails a@b.co and c@d.org plus 10.0.0.1"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextOps.piiCounts(col("text")).as("c"),
        TextOps.redactPii(col("text")).as("r"))
      .collect().map { r =>
        val c = r.getStruct(1)
        r.getLong(0) -> (c.getInt(0), c.getInt(1), c.getInt(2), r.getString(2))
      }.toMap
    assert(out(1L)._1 == 1 && out(1L)._4 == "write to <EMAIL> today")
    assert(out(2L)._2 == 1 && out(2L)._3 == 1)
    assert(out(2L)._4 == "server <IP> is down, call <PHONE> now")
    assert(out(3L) == ((0, 0, 0, "no pii here at all")))
    assert(out(4L)._1 == 2 && out(4L)._2 == 1)
    assert(out(4L)._4 == "two mails <EMAIL> and <EMAIL> plus <IP>")
    // the order contract: an IP must never be half-eaten by the phone rule
    assert(!out(2L)._4.contains("<PHONE>."), out(2L)._4)
  }

  test("frequentNgrams counts OCCURRENCES (within-doc repeats included), deterministic order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),   // "a b" x3, "b a" x2 (bigrams)
      (2L, "a b c"),         // "a b", "b c"
      (3L, "z z")            // "z z"
    ).toDF("doc_id", "text")
    val top = graft.ops.TextOps.frequentNgrams(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // occurrence counts: "a b"=4 (3 in doc1 + 1 in doc2), "b a"=2,
    // then ties at 1 resolve lexicographically ("b c" < "z z")
    assert(top == Seq(("a b", 4L), ("b a", 2L), ("b c", 1L)), top.toString)
  }

  test("normalizeText: case/punctuation/whitespace variants collapse to one canonical form") {
    import spark.implicits._
    val df = Seq(
      (1L, "The quick, brown fox!"),
      (2L, "the QUICK   brown--fox"),
      (3L, "  THE QUICK BROWN FOX?? "),
      (4L, "a different document")
    ).toDF("doc_id", "text")
    val canon = df.select(col("doc_id"),
      graft.ops.TextOps.normalizeText(col("text")).as("c")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(1L) == "the quick brown fox")
    assert(canon(1L) == canon(2L) && canon(2L) == canon(3L))
    assert(canon(4L) == "a different document")
    // composed with exactKeepers: min-id survivor per canonical form
    val keepers = graft.ops.Dedup.exactKeepers(
      df.withColumn("c", graft.ops.TextOps.normalizeText(col("text"))), "doc_id", "c")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(keepers.toSeq == Seq(1L, 4L))
  }
}
