package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer TRAINING and ENCODING as Spark dataflow —
  * the vocabulary-construction step of an LLM data pipeline (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"), run against the corpus the engine is already curating. The
  * reference engine has no tokenizer component; this is pipeline surface
  * beyond it, same as the rest of `graft.ops`.
  *
  * DESIGN — everything runs over the WORD-FREQUENCY table, never the
  * corpus: BPE statistics are a function of (distinct word, count), so
  * the corpus contributes one hash aggregation (map-side combined) and
  * all merge iterations touch a vocabulary-sized frame. Two training
  * tiers with IDENTICAL results (spec-asserted):
  *
  *  - DRIVER tier (distinct words ≤ `graft.bpe.maxDriverWords`, default
  *    20M ≈ low-GB heap): the classic incremental algorithm — pair
  *    counts plus a pair→words inverted index, so each merge touches
  *    only the words containing the pair. This is the production path:
  *    even a 100-TB corpus has a vocabulary that fits a driver (the
  *    same driver-local-tier + cap discipline as KMedoids/spectral).
  *  - DISTRIBUTED tier (above the cap): one pair-count aggregation +
  *    one collect(1) + one projected merge per round,
  *    lineage-truncated; linear in vocabulary per round, for corpora
  *    whose vocabulary genuinely cannot land on a driver. Use modest
  *    `numMerges` here — each round is a Spark job.
  *
  * SYMBOL REPRESENTATION (the subtle bit): a word in training is the
  * string of its symbols, each wrapped as U+0001 sym U+0002. Merging
  * pair (l, r) is then the LITERAL string replace of the wrapped "l r"
  * with the wrapped "lr" -- and because adjacent pair occurrences share
  * NO characters (unlike a space-separated form, where back-to-back
  * matches share the separator and a run "a a a a" mis-merges to
  * "aa a a" instead of "aa aa"), left-to-right non-overlapping replace
  * is EXACTLY greedy symbol-level merging, runs included. Every
  * engine's `replace` scans left-to-right non-overlapping, so the whole
  * training run replays bit-identically in SQL (q_bpe_train /
  * q_bpe_encode). Precondition: the corpus contains no U+0001/U+0002
  * characters.
  *
  * Merge determinism: best pair = max count, ties broken by (lhs, rhs)
  * ascending; training stops early when no pair reaches `minPairFreq`.
  */
object Bpe {

  /** One trained merge: `lhs`+`rhs` become one symbol at `rank`. */
  final case class BpeMerge(rank: Long, lhs: String, rhs: String, cnt: Long)

  private val SOH = "\u0001"
  private val STX = "\u0002"

  /** (word, freq) over whitespace tokens: ONE map-side-combined hash
    * aggregation of the corpus — the only corpus-sized step in training.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    Dedup.fanOut(docs.select(col(textCol).as("__t")))
      .select(explode(split(col("__t"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Word → wrapped initial symbol string (one symbol per character). */
  private def wrapChars(word: Column): Column =
    concat_ws("", transform(filter(split(word, ""), c => c =!= ""),
      c => concat(lit(SOH), c, lit(STX))))

  /** Wrapped symbol string → symbol array (both engines replay this as
    * strip-STX then split-SOH).
    */
  private def symbols(w: Column): Column =
    filter(split(translate(w, STX, ""), SOH), s => s =!= "")

  /** Number of symbols in a wrapped string = count of SOH markers. */
  private[graft] def symbolCount(w: Column): Column =
    length(w) - length(translate(w, SOH, ""))

  /** The literal-replace merge of (l, r), shared by the distributed
    * trainer and [[segmentWords]].
    */
  private def mergeExpr(w: Column, l: String, r: String): Column =
    call_function("replace", w, lit(SOH + l + STX + SOH + r + STX), lit(SOH + l + r + STX))

  /** Train `numMerges` BPE merges on the corpus. Tier selection per the
    * object doc; both tiers yield identical merges.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairFreq: Long = 2L): Seq[BpeMerge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairFreq >= 1, s"minPairFreq must be >= 1, got $minPairFreq")
    val spark = docs.sparkSession
    val wf = wordFreq(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cap = graft.util.Conf.long(spark, "graft.bpe.maxDriverWords", 20000000L)
      val nWords = wf.count() // doubles as the cache materialization
      if (nWords <= cap) {
        trainLocal(wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
          numMerges, minPairFreq)
      } else {
        trainDistributed(wf, numMerges, minPairFreq)
      }
    } finally {
      wf.unpersist()
    }
  }

  /** Distributed trainer tier: per round, one pair-count aggregation
    * (explode symbol pairs weighted by freq, map-side combined), one
    * 1-row TakeOrdered collect, one merge projection; the vocabulary
    * frame is localCheckpoint-materialized each round so lineage stays
    * flat (the connectedComponents discipline).
    */
  private[graft] def trainDistributed(
      wordFreqs: DataFrame,
      numMerges: Int,
      minPairFreq: Long): Seq[BpeMerge] = {
    var words = wordFreqs.select(wrapChars(col("word")).as("w"), col("freq"))
      .localCheckpoint()
    val out = mutable.ArrayBuffer.empty[BpeMerge]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = words
        .select(symbols(col("w")).as("s"), col("freq"))
        .select(explode(transform(slice(col("s"), lit(1), size(col("s")) - 1),
          (x, i) => struct(x.as("lhs"), get(col("s"), i + 1).as("rhs")))).as("p"),
          col("freq"))
        .groupBy(col("p.lhs"), col("p.rhs")).agg(sum(col("freq")).as("cnt"))
        .where(col("cnt") >= minPairFreq)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += BpeMerge(rank, l, r, c)
        val prev = words
        words = words.select(mergeExpr(col("w"), l, r).as("w"), col("freq"))
          .localCheckpoint()
        prev.unpersist()
        rank += 1
      }
    }
    out.toSeq
  }

  /** Driver trainer tier: incremental pair counts + a pair→words
    * inverted index (lazily cleaned), so each merge costs one scan of
    * the distinct-pair map for the argmax plus symbol surgery on ONLY
    * the words containing the pair — the classic fast BPE trainer.
    * Greedy left-to-right within a word, identical to the string form.
    */
  private[graft] def trainLocal(
      wordFreqs: Seq[(String, Long)],
      numMerges: Int,
      minPairFreq: Long): Seq[BpeMerge] = {
    val syms = wordFreqs.map { case (w, _) =>
      mutable.ArrayBuffer.from(w.split("").filter(_.nonEmpty))
    }.toArray
    val freqs = wordFreqs.map(_._2).toArray
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def inc(p: (String, String), f: Long, i: Int): Unit = {
      pairCount.updateWith(p)(c => Some(c.getOrElse(0L) + f))
      pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += i
    }
    def dec(p: (String, String), f: Long): Unit =
      pairCount.updateWith(p)(c => c.map(_ - f).filter(_ > 0L)) // index cleaned lazily
    for (i <- syms.indices; s = syms(i); j <- 0 until s.length - 1)
      inc((s(j), s(j + 1)), freqs(i), i)
    val out = mutable.ArrayBuffer.empty[BpeMerge]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      var best: (String, String) = null
      var bc = 0L
      for ((p, c) <- pairCount if c >= minPairFreq) {
        if (best == null || c > bc || (c == bc &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
          { best = p; bc = c }
      }
      if (best == null) exhausted = true
      else {
        out += BpeMerge(rank, best._1, best._2, bc)
        val merged = best._1 + best._2
        for (i <- pairWords.getOrElse(best, mutable.BitSet.empty)) {
          val s = syms(i)
          val f = freqs(i)
          var j = 0
          while (j < s.length - 1) {
            if (s(j) == best._1 && s(j + 1) == best._2) {
              if (j > 0) dec((s(j - 1), s(j)), f)
              if (j + 2 < s.length) dec((s(j + 1), s(j + 2)), f)
              dec(best, f)
              s.remove(j + 1)
              s(j) = merged
              if (j > 0) inc((s(j - 1), merged), f, i)
              if (j + 1 < s.length) inc((merged, s(j + 1)), f, i)
            }
            j += 1
          }
        }
        pairCount.remove(best)
        pairWords.remove(best)
        rank += 1
      }
    }
    out.toSeq
  }

  /** Merges as a DataFrame (rank, lhs, rhs, cnt) for emission. */
  def mergesDf(spark: SparkSession, merges: Seq[BpeMerge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Apply a merge list (rank order) to a frame of distinct words:
    * returns (word, n_sym). Each merge is ONE literal-replace
    * projection; lineage is truncated every 64 merges, and the whole
    * chain is a per-row map — no shuffle. Right for merge lists that fit
    * an expression chain (≲ a few thousand); the driver-tier trainer is
    * where 32k-merge production vocabularies come from, and applying
    * those is a per-partition loop over the same replace sequence.
    */
  def segmentWords(words: DataFrame, wordCol: String, merges: Seq[(String, String)]): DataFrame = {
    var w = words.select(col(wordCol).as("word"), wrapChars(col(wordCol)).as("__w"))
    var applied = 0
    for ((l, r) <- merges) {
      w = w.withColumn("__w", mergeExpr(col("__w"), l, r))
      applied += 1
      if (applied % 64 == 0) w = w.localCheckpoint()
    }
    w.select(col("word"), symbolCount(col("__w")).cast("long").as("n_sym"))
  }

  /** ENCODE a corpus with trained merges — pure dataflow, no UDF: the
    * distinct words of the corpus are segmented ONCE each
    * ([[segmentWords]] — the distributed analogue of an encoder's
    * word cache), then joined back to the exploded corpus (AQE
    * broadcasts the vocabulary side when it is small) and rolled up per
    * document. Returns (doc_id, n_words, n_tokens) where n_tokens is
    * the post-BPE subword count — the budget number a token-count
    * planner actually needs.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val wordsPerDoc = Dedup.fanOut(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t")))
      .select(col("doc_id"), explode(split(col("__t"), " ")).as("word"))
      .where(col("word") =!= "")
    val seg = segmentWords(wordsPerDoc.select(col("word")).distinct(), "word", merges)
    wordsPerDoc.join(seg, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_tokens"))
  }
}
