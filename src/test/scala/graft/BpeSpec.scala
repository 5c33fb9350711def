package graft

import graft.ops.Bpe
import graft.ops.Bpe.BpeMerge
import org.apache.spark.sql.functions._

/** BPE tokenizer training/encoding: hand-computed merge sequences, the
  * greedy-run semantics that make the string form exact, driver-tier ==
  * distributed-tier parity, and the pure-dataflow encoder.
  */
class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("train: hand-computed merges on the classic example") {
    // words: ab x2, abc x1 -> pairs (a,b)=3, (b,c)=1
    val m = Bpe.train(docs("ab ab", "abc"), "text", numMerges = 2, minPairFreq = 1)
    assert(m == Seq(BpeMerge(1, "a", "b", 3), BpeMerge(2, "ab", "c", 1)))
  }

  test("train: runs merge greedily left-to-right (aaaa -> aa aa, aaaaa -> aa aa a)") {
    // 'aaaa' x2: (a,a) appears 3 times per word = 6
    val m = Bpe.train(docs("aaaa aaaa"), "text", numMerges = 2, minPairFreq = 2)
    assert(m.head == BpeMerge(1, "a", "a", 6))
    // after merge 1 both words are [aa, aa] -> (aa,aa)=2
    assert(m(1) == BpeMerge(2, "aa", "aa", 2))
    val seg = Bpe.segmentWords(docs("x").sparkSession.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row("aaaa"), org.apache.spark.sql.Row("aaaaa")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word", org.apache.spark.sql.types.StringType)))),
      "word", m.map(x => (x.lhs, x.rhs)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seg("aaaa") == 1L, "aaaa -> [aa][aa] -> [aaaa]")
    assert(seg("aaaaa") == 2L, "aaaaa -> [aa][aa][a]")
  }

  test("train: tie-break is (count desc, lhs asc, rhs asc)") {
    // 'xy' and 'ab' both give their pair count 2; (a,b) < (x,y) lexically
    val m = Bpe.train(docs("xy xy ab ab"), "text", numMerges = 1, minPairFreq = 2)
    assert(m == Seq(BpeMerge(1, "a", "b", 2)))
  }

  test("train: stops early when no pair reaches minPairFreq") {
    val m = Bpe.train(docs("ab cd"), "text", numMerges = 5, minPairFreq = 2)
    assert(m.isEmpty)
  }

  test("driver tier and distributed tier produce identical merges") {
    val d = docs(
      "the cat sat on the mat",
      "the cats sat on the mats",
      "aaaa banana bandana",
      "low lower lowest low low",
      "ab abc abcd ab ab abc")
    val wf = Bpe.wordFreq(d, "text")
    val local = Bpe.trainLocal(
      wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 12, 2L)
    val dist = Bpe.trainDistributed(wf, 12, 2L)
    assert(local == dist, s"local $local vs distributed $dist")
    assert(local.nonEmpty)
  }

  test("encode: n_tokens matches the trained segmentation, all dataflow") {
    val d = docs("banana banana band", "ban dana")
    val merges = Bpe.train(d, "text", numMerges = 3, minPairFreq = 2)
    // merges on this corpus: (a,n)=5 -> an; then (b,an)=4 -> ban; (an,an)? after an: banana=[b,an,an,a]... recompute below
    val got = Bpe.encode(d, "doc_id", "text", merges.map(m => (m.lhs, m.rhs)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent check: per-word symbol counts via trainLocal's replay
    val wordToks = Bpe.segmentWords(
      d.select(explode(split(col("text"), " ")).as("word")).distinct(),
      "word", merges.map(m => (m.lhs, m.rhs)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect0 = 2 * wordToks("banana") + wordToks("band")
    val expect1 = wordToks("ban") + wordToks("dana")
    assert(got(0L) == ((3L, expect0)))
    assert(got(1L) == ((2L, expect1)))
  }

  test("encode: subword compression on real text — fewer tokens than chars, more than words") {
    val d = docs(
      "the quick brown fox jumps over the lazy dog",
      "the quicker brown foxes jumped over the lazier dogs")
    val merges = Bpe.train(d, "text", numMerges = 20, minPairFreq = 2)
    val enc = Bpe.encode(d, "doc_id", "text", merges.map(m => (m.lhs, m.rhs))).collect()
    enc.foreach { r =>
      val (nWords, nTokens) = (r.getLong(1), r.getLong(2))
      assert(nTokens >= nWords, "a word is at least one token")
      // 20 merges on 2 similar sentences must compress below chars
      val chars = d.where(col("doc_id") === r.getLong(0))
        .select(sum(length(regexp_replace(col("text"), " ", "")))).collect()(0).getLong(0)
      assert(nTokens < chars, s"doc ${r.getLong(0)}: $nTokens tokens vs $chars chars")
    }
  }
}
