package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** The native codegen shingle expressions (graft.functions.TextShingles)
  * replace the interpreted HOF formulations behind
  * TextOps.wordShingleOccurrences / wordShingles / charShingles — the
  * substitution is only legal if it is BIT-IDENTICAL, because ~30 gate
  * queries hash these arrays (directly or through md5 buckets) against
  * the DuckDB oracle. This spec pins equality against the ORIGINAL HOF
  * trees on the full edge-case lattice plus random fuzz (multi-byte
  * UTF-8, consecutive/leading/trailing spaces, fewer tokens than n).
  */
class ShingleExprSpec extends SparkSpec {

  /** The pre-optimization formulations, verbatim. */
  private def hofWordOccurrences(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    val sh = transform(
      sequence(lit(0), greatest(size(toks) - lit(n), lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    when(text.isNull, array().cast("array<string>")).otherwise(sh)
  }
  private def hofWordShingles(text: Column, n: Int): Column =
    array_distinct(hofWordOccurrences(text, n))
  private def hofCharShingles(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
        i => text.substr(i, lit(n))))

  private val edgeCases: Seq[String] = Seq(
    null, "", " ", "  ", "a", "a b", "a b c", "a  b", " a", "a ", "  a  b  ",
    "one two three four five", "solo",
    "é中 文b é", "中文 漢字 かな", "a\tb", "a\nb c", "tab\there space",
    "dup dup dup dup", "x y x y x y", "ragged   runs  of   spaces ")

  private def df(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def assertSame(texts: Seq[String], mk: (Column, Int) => Column,
      hof: (Column, Int) => Column, ns: Seq[Int]): Unit = {
    for (n <- ns) {
      val got = df(texts).select(mk(col("text"), n)).collect().map(_.get(0))
      val want = df(texts).select(hof(col("text"), n)).collect().map(_.get(0))
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"n=$n text=${texts(i)}: got $g want $w")
      }
    }
  }

  test("wordShingleOccurrences equals the HOF formulation on edge cases") {
    assertSame(edgeCases, TextOps.wordShingleOccurrences, hofWordOccurrences, Seq(1, 2, 3, 5, 9))
  }

  test("wordShingles (distinct) equals the HOF formulation on edge cases") {
    assertSame(edgeCases, TextOps.wordShingles, hofWordShingles, Seq(1, 2, 3, 5, 9))
  }

  test("charShingles equals the HOF formulation on edge cases (incl. null -> null)") {
    assertSame(edgeCases, TextOps.charShingles, hofCharShingles, Seq(1, 2, 4, 7))
    // the word form's null policy is EMPTY ARRAY; the char form's is the
    // single-null-element array [null] (greatest ignores the null length,
    // so the HOF form evaluated substr(null,1,n) once) — both pinned
    // explicitly so a future "harmonization" fails here first
    val row = df(Seq(null)).select(
      TextOps.wordShingleOccurrences(col("text"), 3).as("w"),
      TextOps.charShingles(col("text"), 3).as("c")).collect()(0)
    assert(row.getSeq[String](0) == Seq.empty)
    assert(row.getSeq[String](1) == Seq(null))
  }

  test("fuzz: random texts over a spacey alphabet match on all three forms") {
    val rnd = new scala.util.Random(20260817L)
    val alphabet = "ab é中  x  "
    val texts = (0 until 300).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertSame(texts, TextOps.wordShingleOccurrences, hofWordOccurrences, Seq(2, 5))
    assertSame(texts, TextOps.wordShingles, hofWordShingles, Seq(2, 5))
    assertSame(texts, TextOps.charShingles, hofCharShingles, Seq(3))
  }

  test("real corpus: sf0.001 documents produce identical shingle arrays") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("text"))
    for (n <- Seq(2, 5)) {
      val mismatch = docs.select(
          TextOps.wordShingleOccurrences(col("text"), n).as("a"),
          hofWordOccurrences(col("text"), n).as("b"),
          TextOps.wordShingles(col("text"), n).as("c"),
          hofWordShingles(col("text"), n).as("d"))
        .where(!(col("a") <=> col("b")) || !(col("c") <=> col("d")))
        .count()
      assert(mismatch == 0L, s"n=$n: $mismatch docs differ from the HOF formulation")
    }
    val mismatchChar = docs.select(
        TextOps.charShingles(col("text"), 4).as("a"),
        hofCharShingles(col("text"), 4).as("b"))
      .where(!(col("a") <=> col("b"))).count()
    assert(mismatchChar == 0L)
  }

  test("codegen path: the expression evaluates inside WholeStageCodegen (no fallback)") {
    val plan = df(Seq("a b c")).select(
      explode(TextOps.wordShingleOccurrences(col("text"), 2)).as("k"))
      .queryExecution.executedPlan
    // the operator hosting the expression must be codegen'd: the `*(n)`
    // prefix marks membership in WholeStageCodegen span n (compact
    // plan-string form; small plans print the prefix, not the node name)
    val s = plan.toString
    assert(s.contains("*(1) Generate explode(graft_word_shingle_occurrences"), s)
  }
}
