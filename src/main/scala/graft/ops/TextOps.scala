package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All of these are pure Catalyst column expressions (codegen'd, no UDFs,
  * no shuffle beyond what the caller adds) so they survive 100 TB inputs:
  * per-row projections scale linearly and push no data to the driver.
  *
  * Functions that back oracle-checked queries deliberately use only
  * ANSI-portable building blocks (split/replace/regexp_replace/length)
  * so DuckDB computes bit-identical results.
  */
object TextOps {

  /** Whitespace token count (single-space delimited corpora). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword token estimate: words + punctuation clusters weighted
    * by length (a deterministic proxy for a real tokenizer; ~4 chars/token).
    */
  def tokenEstimate(text: Column): Column =
    greatest(lit(1), (length(text) / lit(4)).cast("int"))

  /** Characters after stripping [a-z ]: proxy for punctuation+digit mass. */
  def nonAlphaCount(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z ]", ""))

  /** Quality score components: length, mean word length, stopword ratio,
    * non-alpha ratio. Composable; each is a plain expression.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column = {
    val toks = split(text, " ")
    size(filter(toks, t => t.isin(Stopwords: _*)))
  }

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text)

  def meanWordLen(text: Column): Column = {
    val toks = split(text, " ")
    aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / size(toks)
  }

  /** Composite quality score in [0,1], UNROUNDED: favors mid-length docs
    * with some stopwords and low symbol noise. Deterministic, portable.
    * Use [[qualityScore]] for the 6-dp presentation form, or
    * [[qualityScoreMicro]] for an all-integer hash-stable form.
    */
  def qualityScoreRaw(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val noisePenalty = least(nonAlphaCount(text).cast("double") / greatest(length(text), lit(1)), lit(1.0))
    lenScore * lit(0.4) + stopScore * lit(0.4) + (lit(1.0) - noisePenalty) * lit(0.2)
  }

  /** [[qualityScoreRaw]] rounded to 6dp for human-facing output. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Quality score in integer micro-units, computed in PURE 64-bit
    * integer arithmetic — multiply, floor-division, least/greatest over
    * the four integer counts (chars, tokens, stopwords, non-alpha
    * chars). A BIGINT in [0, 1000000] agreeing with
    * floor([[qualityScoreRaw]]*1e6) up to sub-term floor order.
    *
    * Why not floor(raw*1e6 + 0.5): composed double expressions are only
    * reproducible across ENGINES if both evaluate the identical IEEE op
    * sequence; a different engine version may fold or reorder the
    * arithmetic and land 1 ulp away, flipping the integer at a .5
    * boundary (observed: the round-10 driver gate's DuckDB disagreed
    * with DuckDB 1.0.0 on exactly this contract while both matched the
    * 6-dp rounded form). Integer mul/div/min have ONE possible result,
    * so the value that enters the window ordering and the canon hash
    * cannot drift.
    */
  def qualityScoreMicro(text: Column): Column = {
    val len = length(text).cast("long")
    val nTok = tokenCount(text).cast("long")
    val nStop = stopwordCount(text).cast("long")
    val nNoise = nonAlphaCount(text).cast("long")
    // `div` = IntegralDivide: true long floor-division, NOT the double
    // division `/` lowers to for long operands.
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    // 400000*min(len/500,1) = 800*min(len,500); exact.
    val lenScore = lit(800L) * least(len, lit(500L))
    // 400000*min(5*stop/ntok,1) = min((2000000*stop) div ntok, 400000)
    val stopScore = least(idiv(lit(2000000L) * nStop, nTok), lit(400000L))
    // 200000*(1 - min(noise/len,1)) = 200000 - min((200000*noise) div max(len,1), 200000)
    val noise = least(idiv(lit(200000L) * nNoise, greatest(len, lit(1L))), lit(200000L))
    lenScore + stopScore + (lit(200000L) - noise)
  }

  /** Gopher-style heuristic quality rule set (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A.1.1), as per-doc boolean
    * flags plus their conjunction — the rule-TABLE companion to the
    * scalar [[qualityScoreMicro]]: production pipelines filter on named
    * rules and audit per-rule rejection rates, not one opaque score.
    *
    * Every comparison is an integer cross-multiplication (10*alpha >=
    * minAlphaPer10*words, never a ratio), so no double exists on either
    * side of the oracle contract (house rule 1) and the whole table
    * replays bit-exactly in any SQL engine (q_gopher_rules).
    *
    * Rules (document-level; the synthetic corpus has no line structure,
    * so Gopher's line-level bullet/ellipsis rules appear in their
    * document-level symbol-mass form):
    *  - `word_count_ok`: word count within [minWords, maxWords]
    *  - `mean_len_ok`: mean word length within [minMeanLen, maxMeanLen]
    *  - `symbol_ok`: '#'/'...' symbol mass at most maxSymbolsPer10 per
    *    10 words
    *  - `alpha_ok`: at least minAlphaPer10 of every 10 words contain a
    *    letter
    *  - `stopword_ok`: at least minStopHits DISTINCT [[Stopwords]]
    *    present
    *  - `keep`: conjunction of all five
    *
    * Scale: one projection over the scan — no shuffle, no UDF, no join;
    * a per-rule rejection-rate audit over the output is one
    * map-side-combined aggregation.
    */
  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanLen: Long = 3L,
      maxMeanLen: Long = 10L,
      maxSymbolsPer10: Long = 1L,
      minAlphaPer10: Long = 8L,
      minStopHits: Long = 2L): DataFrame = {
    val text = col(textCol)
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    def rep(t: Column, term: String): Column =
      call_function("replace", t, lit(term), lit(""))
    val toks = filter(split(text, " "), t => t =!= "")
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nAlpha = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long")
    val nSym = (length(text) - length(rep(text, "#"))).cast("long") +
      idiv((length(text) - length(rep(text, "..."))).cast("long"), lit(3L))
    val nStop = size(array_intersect(array_distinct(toks),
      array(Stopwords.map(lit): _*))).cast("long")
    df.select(
        col(idCol), nWords.as("n_words"), sumLen.as("__sl"), nAlpha.as("__na"),
        nSym.as("__ns"), nStop.as("__nh"))
      .select(
        col(idCol), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("word_count_ok"),
        (col("__sl") >= lit(minMeanLen) * col("n_words") &&
          col("__sl") <= lit(maxMeanLen) * col("n_words")).as("mean_len_ok"),
        (lit(10L) * col("__ns") <= lit(maxSymbolsPer10) * col("n_words")).as("symbol_ok"),
        (lit(10L) * col("__na") >= lit(minAlphaPer10) * col("n_words")).as("alpha_ok"),
        (col("__nh") >= minStopHits).as("stopword_ok"))
      .withColumn("keep",
        col("word_count_ok") && col("mean_len_ok") && col("symbol_ok") &&
          col("alpha_ok") && col("stopword_ok"))
  }

  /** Occurrences of `term` as substring — replace-based so the identical
    * SQL works in any engine: (len(s) - len(replace(s, term, ''))) / len(term).
    */
  def substrCount(text: Column, term: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(term), ""))) / lit(term.length)

  /** N-gram-heuristic language ID. The scoring rule is deterministic and
    * SQL-portable: per-language stopword hit counts on space tokens, argmax
    * with a fixed tie order, 'und' when nothing matches.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(text), " ")
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
  }

  /** One-pass language ID: a single UDF scores ALL languages in one token
    * traversal (the previous pure-expression form ran 4 interpreted
    * higher-order `filter` passes plus a re-split per row — 4.7x slower at
    * sf0.1; r2 verdict #6). Semantics are unchanged and remain replicated
    * by the ANSI-SQL oracle: space tokens of lower(text), per-language
    * marker hit counts, argmax with first-language-wins ties, 'und' when
    * nothing matches.
    */
  def langId(text: Column): Column = langIdUdf(text)

  private val langIdUdf = {
    val markerSets: Array[Set[String]] = LangMarkers.map(_._2.toSet).toArray
    val langs: Array[String] = LangMarkers.map(_._1).toArray
    udf { (s: String) =>
      if (s == null) "und"
      else {
        val scores = new Array[Int](markerSets.length)
        val lower = s.toLowerCase
        var start = 0
        val n = lower.length
        while (start <= n) {
          val sp = lower.indexOf(' ', start)
          val end = if (sp < 0) n else sp
          val tok = lower.substring(start, end)
          var l = 0
          while (l < markerSets.length) {
            if (markerSets(l).contains(tok)) scores(l) += 1
            l += 1
          }
          start = end + 1
        }
        var best = 0
        var l = 1
        while (l < scores.length) {
          if (scores(l) > scores(best)) best = l
          l += 1
        }
        if (scores(best) > 0) langs(best) else "und"
      }
    }
  }

  /** Fused one-pass text profile for the curation scan: language ID,
    * quality score, and token count from a SINGLE traversal of the text
    * (one tokenization + one character scan), where the unfused pipeline
    * ran ~5 passes per row (langId UDF, 2 splits, an interpreted
    * higher-order stopword filter, a regexp_replace). Bit-identical to
    * langId / qualityScore / tokenCount by construction: same Spark
    * split(" ", -1) tokenization, same arithmetic in the same IEEE order,
    * same HALF_UP rounding via BigDecimal.valueOf (Catalyst's round), so
    * the existing ANSI-SQL oracles replay it unchanged. Character counts
    * use UTF-16 units, which equal Catalyst's code-point length() for all
    * BMP text — supplementary-plane characters (emoji etc.) would count
    * as 2 here vs 1 there; the equality test pins parity on the real
    * corpus.
    */
  def langQuality(text: Column): Column = langQualityUdf(text)

  private val langQualityUdf = {
    val markerSets: Array[Set[String]] = LangMarkers.map(_._2.toSet).toArray
    val langs: Array[String] = LangMarkers.map(_._1).toArray
    val stopSet: Set[String] = Stopwords.toSet
    udf { (s: String) =>
      if (s == null) null
      else {
        val lower = s.toLowerCase
        val n = lower.length
        // one pass over tokens of the LOWERED text for language markers;
        // stopwords/token-count must see the ORIGINAL case (qualityScore
        // tokenizes `text`, not lower(text)) — second tokenization below
        val langScores = new Array[Int](markerSets.length)
        var start = 0
        while (start <= n) {
          val sp = lower.indexOf(' ', start)
          val end = if (sp < 0) n else sp
          val tok = lower.substring(start, end)
          var l = 0
          while (l < markerSets.length) {
            if (markerSets(l).contains(tok)) langScores(l) += 1
            l += 1
          }
          start = end + 1
        }
        var best = 0
        var l = 1
        while (l < langScores.length) {
          if (langScores(l) > langScores(best)) best = l
          l += 1
        }
        val lang = if (langScores(best) > 0) langs(best) else "und"
        // original-case token pass: count + stopword hits (split(" ", -1))
        var nTok = 0
        var nStop = 0
        start = 0
        val sn = s.length
        while (start <= sn) {
          val sp = s.indexOf(' ', start)
          val end = if (sp < 0) sn else sp
          nTok += 1
          if (stopSet.contains(s.substring(start, end))) nStop += 1
          start = end + 1
        }
        // character pass on the lowered string: non-[a-z ] mass
        var nonAlpha = 0
        var i = 0
        while (i < n) {
          val c = lower.charAt(i)
          if (!((c >= 'a' && c <= 'z') || c == ' ')) nonAlpha += 1
          i += 1
        }
        // EXACT qualityScore arithmetic (TextOps.qualityScore):
        // round(min(len/500,1)*0.4 + min(stopRatio*5,1)*0.4
        //       + (1 - min(nonAlpha/max(len,1),1))*0.2, 6)
        val lenScore = math.min(s.length.toDouble / 500.0, 1.0)
        val stopScore = math.min(nStop.toDouble / nTok * 5.0, 1.0)
        val noisePenalty = math.min(nonAlpha.toDouble / math.max(s.length, 1), 1.0)
        val raw = lenScore * 0.4 + stopScore * 0.4 + (1.0 - noisePenalty) * 0.2
        val quality = java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (lang, quality, nTok)
      }
    }
  }

  /** Repetition statistics — the Gopher-style quality rules (Rae et al.
    * 2021, table A1) that catch boilerplate and crawler loops: the
    * fraction of a document's lines that are duplicates of an earlier
    * line, and the fraction of its word n-grams that are repeats. Pure
    * expressions (split / size / array_distinct), so ANSI-SQL-replayable
    * and codegen'd. Lines are '\n'-separated; n-grams share
    * [[wordShingles]]'s tokenization (the empty document counts 0).
    */
  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    val n = size(lines)
    when(n <= 0, lit(0.0)).otherwise(
      round((n - size(array_distinct(lines))).cast("double") / n, 6))
  }

  def dupNgramFraction(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // total n-gram count INCLUDING repeats vs the distinct set
    val total = greatest(size(toks) - lit(n - 1), lit(0))
    val distinctN = size(wordShingles(text, n))
    when(total <= 0, lit(0.0)).otherwise(
      round((total - distinctN).cast("double") / total, 6))
  }

  /** Intra-document chunk dedup — the REMOVAL counterpart of the
    * [[dupLineFraction]]/[[dupNgramFraction]] detectors: split the token
    * stream into consecutive NON-overlapping `chunkTokens`-token chunks
    * (the last chunk may be short), keep each chunk only at its FIRST
    * occurrence within the document, and reassemble the survivors in
    * their original order. This is the cheap in-document tier of
    * repetition cleaning (crawler loops, boilerplate echoes) that runs
    * before any cross-document pass ([[graft.ops.Dedup.substringDedup]]
    * covers cross-doc spans; reference has no in-doc removal at all).
    *
    * A single tight per-row UDF pass (the [[dupNgramFractions]]
    * precedent): tokenize once, hash each chunk into a per-row HashSet,
    * rebuild — O(len) per document. NOT an array-expression pipeline: a
    * HOF formulation (`filter` + `array_position` over a transform) is
    * quadratic per row AND gets its whole tree inlined into downstream
    * predicates by CollapseProject/filter-pushdown, where interpreted
    * higher-order eval re-splits the text once per element — measured as
    * a multi-minute hang when two passes compose (each reference to the
    * inner pass's output re-evaluates it, O(n⁴) string work per row).
    * Still a pure narrow projection: zero shuffles, embarrassingly
    * parallel at any corpus size.
    *
    * Null policy (rule 10): null text → null clean_text, zero counts.
    * Output: (idCol, clean_text, n_chunks, n_kept, n_removed), counts
    * BIGINT.
    */
  def dedupChunksWithin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    val n = chunkTokens
    val f = udf { (s: String) =>
      if (s == null) (null.asInstanceOf[String], 0L, 0L, 0L)
      else {
        val toks = s.split(" ", -1)
        val nChunks = (toks.length + n - 1) / n
        val seen = new java.util.HashSet[String]()
        val sb = new java.lang.StringBuilder
        var kept = 0L
        var i = 0
        while (i < nChunks) {
          val hi = math.min((i + 1) * n, toks.length)
          val chunk = {
            val cb = new java.lang.StringBuilder
            var j = i * n
            while (j < hi) {
              if (j > i * n) cb.append(' ')
              cb.append(toks(j))
              j += 1
            }
            cb.toString
          }
          if (seen.add(chunk)) {
            if (kept > 0L) sb.append(' ')
            sb.append(chunk)
            kept += 1L
          }
          i += 1
        }
        (sb.toString, nChunks.toLong, kept, nChunks.toLong - kept)
      }
    }
    docs
      .withColumn("__cd", f(col(textCol)))
      .select(
        col(idCol),
        col("__cd._1").as("clean_text"),
        col("__cd._2").as("n_chunks"),
        col("__cd._3").as("n_kept"),
        col("__cd._4").as("n_removed"))
  }

  /** All requested n-gram duplicate fractions from ONE tokenization pass
    * (a scala UDF; the pure-expression [[dupNgramFraction]] runs an
    * interpreted higher-order transform + distinct per n). Bit-identical
    * to the expression form: same split(" ", -1) tokenization, same
    * integer distinct counts, same division and HALF_UP rounding — the
    * SQL oracles replay either. Returns one fraction per n, in order.
    */
  def dupNgramFractions(ns: Seq[Int]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val nsArr = ns.toArray
    udf { (s: String) =>
      if (s == null) nsArr.toSeq.map(_ => 0.0)
      else {
        val toks = s.split(" ", -1)
        nsArr.toSeq.map { n =>
          val total = math.max(toks.length - (n - 1), 0)
          if (total <= 0) 0.0
          else {
            val seen = new java.util.HashSet[String]()
            var i = 0
            val sb = new java.lang.StringBuilder
            while (i <= toks.length - n) {
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j))
                j += 1
              }
              seen.add(sb.toString)
              i += 1
            }
            java.math.BigDecimal.valueOf((total - seen.size).toDouble / total)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          }
        }
      }
    }
  }

  /** PII patterns every public-corpus pipeline scrubs (C4/RefinedWeb
    * style): email addresses, international-ish phone numbers, and IPv4
    * addresses. Deliberately conservative ANSI-portable regexes — the
    * SAME pattern strings drive Spark's regexp_replace/regexp_count and
    * the SQL oracle, so redaction is deterministic and engine-portable.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact PII in place: each match category is replaced by its tag
    * (`<EMAIL>`, `<PHONE>`, `<IP>`). Order matters and is fixed — emails
    * first (their local parts can contain digits that the phone pattern
    * would otherwise eat), then IPs, then phones.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  /** Per-category PII match counts (pre-redaction) — the audit signal a
    * curation run reports beside the redacted text.
    */
  def piiCounts(text: Column): Column = {
    // phones are counted on the email+IP-redacted text, mirroring
    // redactPii's replacement order (an IPv4 is digits-and-dots long
    // enough to satisfy the phone pattern, and email local parts can
    // carry digit runs)
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    struct(
      regexp_count(text, lit(EmailRe)).as("emails"),
      regexp_count(afterEmail, lit(Ipv4Re)).as("ips"),
      regexp_count(afterIp, lit(PhoneRe)).as("phones"))
  }

  /** 64-bit FNV-1a document fingerprint over the raw text — deterministic
    * content hash for exact-dup detection and sharding. Catalyst xxhash64
    * is used for speed; portability is not needed here (hash-based queries
    * are checked rows-only).
    */
  def fingerprint(text: Column): Column = xxhash64(text)

  /** Character n-gram shingles (distinct) as an array column — the input to
    * MinHash/Jaccard. Native codegen expression
    * ([[graft.functions.CharShingleArray]]); bit-identical to the former
    * `array_distinct(transform(sequence(1, greatest(length-n+1, 1)),
    * i -> substr(text, i, n)))` HOF form (pinned in ShingleExprSpec),
    * which evaluated interpreted per element.
    */
  def charShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.CharShingleArray(
        org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  /** Word n-gram shingle OCCURRENCES — every position's n-gram, WITH
    * repeats ([[wordShingles]] minus the distinct): the multiset view
    * frequency consumers need (count-min sketches, n-gram counting),
    * where collapsing repeats would under-count. Null text → NO shingles
    * (a phantom '' shingle would co-bucket every null-text doc — the
    * policy lives inside the expression, rule 11). Native codegen
    * expression ([[graft.functions.WordShingleArray]]); bit-identical to
    * the former `transform(sequence(0, greatest(size(toks)-n, 0)),
    * i -> concat_ws(" ", slice(toks, i+1, n)))` over `split(text, " ")`
    * (pinned in ShingleExprSpec), which evaluated interpreted per
    * element. SQL mirror: `shingleOccurrencesSql` in the oracle harness.
    */
  def wordShingleOccurrences(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.WordShingleArray(
        org.apache.spark.sql.GraftSqlBridge.expression(text), n, distinct = false))

  /** Word n-gram shingles (distinct, first-occurrence order — exactly
    * `array_distinct` over [[wordShingleOccurrences]], fused into the
    * same single-scan expression).
    */
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.WordShingleArray(
        org.apache.spark.sql.GraftSqlBridge.expression(text), n, distinct = true))

  /** EXACT vocabulary statistics: per token, document frequency and total
    * term frequency. Two-level aggregation — partial (token, doc) counts
    * combine map-side, then the token-level rollup — so the wide shuffle
    * carries (token, doc) partials, never raw token instances, and no
    * count_distinct Expand is planned. ANSI-portable (split + two group
    * bys): DuckDB replicates it bit-for-bit.
    */
  /** Shared tokenize-and-explode step: one definition of "token" for
    * every corpus-statistics operator (space split, empties dropped) —
    * a tokenization change must not silently desynchronize them. The
    * projection fans out first (Dedup.fanOut) so the tokenize/explode
    * map stage never serializes on a single-row-group input file.
    */
  private def explodeTokens(docs: DataFrame, idExpr: Column, textCol: String): DataFrame = {
    val projected = Dedup.fanOut(docs.select(idExpr, col(textCol).as("__text")))
    val idName = projected.columns(0)
    projected.select(col(idName), explode(split(col("__text"), " ")).as("token"))
      .where(col("token") =!= "")
  }

  def vocabStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = explodeTokens(docs, col(idCol).as("__doc"), textCol)
    ex.groupBy(col("token"), col("__doc")).agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("term_freq"))
  }

  /** Deterministic train/val/test split by stable content hash of the id
    * column: reproducible across runs, machines, and table re-orderings
    * (the property `randomSplit` lacks), and a pure projection — no
    * shuffle, no state. `weights` need not sum to 1 (normalized).
    * The uniform is the PORTABLE md5 house hash ([[Sampling.uniform]]),
    * so the assignment replays bit-identically in any SQL engine —
    * q_split_sizes hash-checks the split counts end to end.
    * Returns the input plus a `split` column with the given labels.
    */
  def splitByHash(
      df: DataFrame,
      idCol: String,
      labels: Seq[String],
      weights: Seq[Double],
      salt: String = "graft"): DataFrame = {
    require(labels.length == weights.length && labels.nonEmpty,
      "labels and weights must align")
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    // uniform in [0,1) from the keyed portable hash: md5("salt:id")
    val u = Sampling.uniform(col(idCol), salt)
    val expr = cum.zip(labels).reverse.foldLeft(lit(labels.last): Column) {
      case (acc, (bound, label)) => when(u < bound, label).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Concat-and-chunk document packing (LLM pretraining layout): within
    * each of `nGroups` deterministic groups, documents are laid out in id
    * order on a contiguous token tape and cut into `capacity`-token
    * chunks; a document starts at `offset` inside `chunk` and may span
    * into the next chunk. Window cumsum PARTITIONED BY GROUP — parallel
    * across groups, never a single global sort (a global window is a
    * 1-partition bottleneck at scale; per-group fragmentation is zero
    * because chunks are cut, not packed). ANSI-portable for the oracle.
    *
    * Returns (id, grp, chunk, offset, n_tokens).
    */
  def packDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Int,
      nGroups: Int = 32): DataFrame = {
    require(capacity > 0 && nGroups > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("grp", pmod(col(idCol), lit(nGroups)).cast("int"))
      .withColumn("start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("grp"),
        floor(col("start") / capacity).cast("long").as("chunk"),
        pmod(col("start"), lit(capacity)).cast("long").as("offset"),
        col("n_tokens"))
  }

  /** Sliding-window passage chunking (RAG indexing / long-document
    * training prep): each document splits into token windows of
    * `windowTokens` advancing by `strideTokens` (overlap =
    * window − stride). The last window may be shorter; a document of
    * ≤ window tokens yields exactly one passage; empty documents yield
    * none. Pure integer layout arithmetic — window count
    * 1 + ⌈(n − window)/stride⌉ — so the whole op replays in ANSI SQL.
    *
    * Scale posture: one projection + one explode, zero shuffles; output
    * rows ≈ corpus tokens / stride. Runaway documents are refused on
    * the data path (`graft.chunk.maxWindowsPerDoc`, raise_error inside
    * the window expression so projection pruning cannot elide the
    * guard — the fillForward tick-guard pattern).
    *
    * Returns (idCol, passage_id, start_tok, n_tok, passage).
    */
  def chunkPassages(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      strideTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      s"strideTokens must be in [1, windowTokens], got $strideTokens")
    val maxWin = graft.util.Conf.long(
      docs.sparkSession, "graft.chunk.maxWindowsPerDoc", 1000000L)
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val n = size(col("__toks")).cast("long")
    val nWin = when(n <= windowTokens, lit(1L))
      .otherwise(lit(1L) +
        call_function("div", n - windowTokens + strideTokens - 1, lit(strideTokens.toLong)))
    val wins =
      when(n === 0, array().cast("array<long>"))
        .when(nWin > maxWin,
          raise_error(concat(
            lit(s"chunkPassages: a document needs more than $maxWin windows at " +
              s"window=$windowTokens stride=$strideTokens (n_tokens "),
            n.cast("string"),
            lit("); raise stride or graft.chunk.maxWindowsPerDoc")))
            .cast("array<long>"))
        .otherwise(sequence(lit(0L), nWin - 1))
    docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"), explode(wins).as("passage_id"))
      .select(col(idCol), col("passage_id"),
        (col("passage_id") * strideTokens).as("start_tok"),
        slice(col("__toks"), (col("passage_id") * strideTokens + 1).cast("int"),
          lit(windowTokens)).as("__w"))
      .select(col(idCol), col("passage_id"), col("start_tok"),
        size(col("__w")).cast("long").as("n_tok"),
        array_join(col("__w"), " ").as("passage"))
  }

  /** TF-IDF weights per (doc, token): tf · (ln((N+1)/(df+1)) + 1)
    * (smoothed idf, sklearn convention — never zero, no div-by-zero).
    * Three aggregations total: per-(doc,token) tf, per-token df, then an
    * equi-join on token (AQE broadcasts the df side when the vocabulary
    * is small). Pass `numDocs` when N is already known to skip the count
    * job. ANSI-portable — DuckDB replicates it bit-for-bit.
    */
  def tfidf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numDocs: Option[Long] = None): DataFrame = {
    val n = numDocs.getOrElse(docs.count())
    val ex = explodeTokens(docs, col(idCol).as("doc_id"), textCol)
    val tf = ex.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .withColumn("tfidf",
        round(col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Unigram language-model quality signal: each document's mean negative
    * log-likelihood under the CORPUS's own unigram distribution — the
    * cheap proxy for perplexity-based quality filtering (documents of
    * rare-token soup score high; fluent common-token text scores low).
    *
    * Two aggregations, both shuffle-shaped for scale: token counts
    * (map-side partial combine), then a token-keyed equi-join of the
    * exploded corpus against the count table and one groupBy(doc). The
    * count table is corpus-wide vocabulary — joined, not broadcast, so
    * the operator holds when the vocabulary itself is large.
    */
  def unigramNll(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = explodeTokens(docs, col(idCol).cast("long").as("doc_id"), textCol)
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    // total token count: a LAZY one-row aggregate cross-joined in (its
    // exchange dedupes with the counts aggregation via ReuseExchange) —
    // no job runs at construction time, and an empty corpus yields an
    // empty result instead of a driver-side null
    val tot = counts.agg(sum(col("cnt")).cast("double").as("__tot"))
    toks.join(counts, "token")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg((round(avg(-log(col("cnt").cast("double") / col("__tot"))), 6) + lit(0.0)).as("nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** APPROXIMATE vocabulary statistics for the 100-TB path: document
    * frequency via HyperLogLog++ (`approx_count_distinct`), ONE aggregation
    * — the shuffle carries fixed-size HLL sketches per token instead of
    * (token, doc) pairs, collapsing the heavy first-level shuffle of the
    * exact form. `rsd` is the HLL relative standard deviation (default 5%).
    */
  def approxVocabStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rsd: Double = 0.05): DataFrame = {
    val ex = explodeTokens(docs, col(idCol).as("__doc"), textCol)
    ex.groupBy(col("token"))
      .agg(approx_count_distinct(col("__doc"), rsd).as("doc_freq"),
        count(lit(1)).as("term_freq"))
  }

  /** Cross-document duplicate n-gram coverage — the substring-level dedup
    * signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    * Language Models Better"), in its distributed n-gram approximation:
    * for each document, the fraction of its distinct word `n`-grams that
    * also appear in at least `minDf - 1` OTHER documents. High coverage
    * flags boilerplate and templated near-copy that document-level dedup
    * misses (the paper's suffix-array construction finds the exact spans;
    * the n-gram statistic finds the same documents at corpus scale with
    * two hash shuffles and no global suffix sort).
    *
    * Shape: explode to (doc, n-gram) — distinct per doc, so the frame is
    * ~one row per token; aggregate n-gram document frequencies (map-side
    * partial combine); hash-join the per-doc grams back to the frequency
    * table (both sides keyed by the gram, AQE-planned); roll up per doc.
    * With `hashNgrams` (default — the 100 TB shape) both frames carry
    * 8-byte xxhash64 keys instead of ~n-word strings, an order of
    * magnitude less shuffle IO; exact up to 64-bit collisions. The string
    * path remains for engine-portable oracle replay (q_crossdoc_ngrams).
    */
  def crossDocNgramStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 10,
      minDf: Int = 2,
      hashNgrams: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 2, s"minDf must be >= 2 (a gram always appears in its own doc), got $minDf")
    def key(c: Column): Column = if (hashNgrams) xxhash64(c) else c
    val grams = Dedup.fanOut(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t")))
      .select(col("doc_id"), explode(wordShingles(col("__t"), n)).as("__g"))
      .select(col("doc_id"), key(col("__g")).as("g"))
    val dfreq = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(dfreq, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_dup_ngrams"))
      .select(col("doc_id"), col("n_ngrams"), col("n_dup_ngrams"),
        round(col("n_dup_ngrams").cast("double") / col("n_ngrams"), 6).as("dup_frac"))
  }

  /** Corpus-wide most-frequent word n-grams by OCCURRENCE count (not
    * distinct-per-doc document frequency — a passage pasted 40 times
    * into one doc counts 40) — the "what boilerplate dominates this
    * corpus" audit table that decides substring-dedup/boilerplate
    * thresholds. Two-phase map-side-combined count, then TakeOrdered of
    * k rows; the shuffle carries (gram, partial count), never documents.
    * Deterministic order: (cnt desc, ngram asc).
    */
  def frequentNgrams(
      docs: DataFrame,
      textCol: String,
      n: Int = 5,
      k: Int = 100): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = split(col("__t"), " ")
    // occurrence multiset: every window position, NO array_distinct.
    // Null text contributes no windows (concat_ws would otherwise emit a
    // phantom '' gram per null doc — same hazard as wordShingles).
    val grams = when(col("__t").isNull, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), greatest(size(toks) - lit(n), lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    Dedup.fanOut(docs.select(col(textCol).as("__t")))
      .select(explode(grams).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** Bigram language-model quality signal — the next step up from
    * [[unigramNll]]: each document's mean negative log-likelihood of its
    * token BIGRAMS under the corpus's own MLE bigram model,
    * P(w2 | w1) = c(w1 w2) / c(w1 ·). Captures the local-fluency signal
    * the unigram form cannot (scrambled text shares a unigram profile
    * with fluent text but has improbable transitions) — the cheap
    * in-engine proxy for KenLM-perplexity filtering (CCNet; Wenzek et
    * al. 2020) with no external LM artifact.
    *
    * Shape: bigrams are built INSIDE each row as an array transform
    * (adjacency is a per-row fact — no window function ever touches the
    * corpus), then exploded; two hash aggregations (pair counts and
    * prefix counts, both map-side combined) and two keyed equi-joins,
    * the identical scale shape as [[tfidf]]/[[unigramNll]]. The pair key
    * is the two tokens joined by one space — unambiguous because tokens
    * are space-split — and every step is ANSI-portable (q_bigram_nll
    * hash-checks vs DuckDB).
    */
  def bigramNll(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    bigramJoined(docs, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(
        (round(avg(-log(col("c2").cast("double") / col("c1").cast("double"))), 6)
          + lit(0.0)).as("nll2"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Integer-only fluency score for bucketing: each document's MEAN
    * BIGRAM PROBABILITY under the corpus's own MLE bigram model, in
    * micro-units and PURE 64-bit integer arithmetic — per bigram
    * p_micro = (c(w1 w2)·1e6) div c(w1 ·), per doc score_micro =
    * sum(p_micro) div n_bigrams. The monotone-in-spirit inverse of
    * [[bigramNll]]'s perplexity signal with no float anywhere, so it
    * can DRIVE an ordering (rule-1: floats never order a contract) —
    * the score behind [[Curate.perplexityBuckets]]'s CCNet-style
    * head/middle/tail split. Same two-hash-aggregation shape as
    * [[bigramNll]]; documents with fewer than two tokens emit no row.
    *
    * Returns (doc_id, n_bigrams, score_micro).
    */
  def bigramScoreMicro(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    bigramJoined(docs, idCol, textCol)
      .select(col("doc_id"), idiv(col("c2") * lit(1000000L), col("c1")).as("p_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        idiv(col("__s"), col("n_bigrams")).as("score_micro"))
  }

  /** Corpus drift by log-likelihood frequency profiling (Rayson &
    * Garside 2000, "Comparing corpora using frequency profiling"): for
    * every token, the G² log-likelihood-ratio of its rate differing
    * between corpus `a` and corpus `b` — THE standard two-corpus
    * comparison statistic, and the distribution-shift audit a training
    * pipeline runs between crawl snapshots, between a candidate mix and
    * its predecessor, or between a selected subset and its source.
    * High-llr tokens are what changed; `dir` says which way (+1
    * over-represented in `a`, −1 in `b`, 0 at exactly equal rates,
    * decided by exact integer cross-multiplication — overflow-safe below
    * ~3·10⁹ tokens per side; beyond that split the audit by domain,
    * which is how it is read anyway).
    *
    * G² = 2·(na·ln(na/Ea) + nb·ln(nb/Eb)), Ea = tot_a·(na+nb)/(tot_a+
    * tot_b); zero-count terms contribute 0 (x·ln x → 0). The float llr
    * is OUTPUT-ONLY (round 6): the returned row SET is decided purely by
    * the integer `minCount` support filter, never by a float compare
    * (rule 1). Null text contributes no tokens; a token present in only
    * one corpus gets cnt 0 on the other side explicitly (rule 10).
    *
    * Plan shape: two map-side-combined token hash-aggregations, one
    * full-outer equi-join of token COUNTS (never occurrences), one-row
    * totals broadcast — shuffles carry the vocabulary, not the corpus.
    * Returns (token, cnt_a, cnt_b, dir, llr).
    */
  def corpusDrift(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    def counts(df: DataFrame, name: String): DataFrame =
      Dedup.fanOut(df.select(col(textCol).as("__text")))
        .select(explode(split(col("__text"), " ")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as(name))
    val joined = counts(a, "cnt_a")
      .join(counts(b, "cnt_b"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    // totals over the FULL vocabulary — the support filter prunes which
    // rows are reported, not the corpus sizes the expectations divide by
    val tots = joined.agg(
      coalesce(sum("cnt_a"), lit(0L)).as("tot_a"),
      coalesce(sum("cnt_b"), lit(0L)).as("tot_b"))
    val withTots = joined.where(col("cnt_a") + col("cnt_b") >= minCount)
      .crossJoin(broadcast(tots))
    val sumAb = (col("cnt_a") + col("cnt_b")).cast("double")
    val ea = col("tot_a").cast("double") * sumAb /
      (col("tot_a") + col("tot_b")).cast("double")
    val eb = col("tot_b").cast("double") * sumAb /
      (col("tot_a") + col("tot_b")).cast("double")
    val termA = when(col("cnt_a") > 0,
      col("cnt_a").cast("double") * log(col("cnt_a").cast("double") / ea))
      .otherwise(lit(0.0))
    val termB = when(col("cnt_b") > 0,
      col("cnt_b").cast("double") * log(col("cnt_b").cast("double") / eb))
      .otherwise(lit(0.0))
    val dir = when(col("cnt_a") * col("tot_b") > col("cnt_b") * col("tot_a"), lit(1L))
      .when(col("cnt_a") * col("tot_b") < col("cnt_b") * col("tot_a"), lit(-1L))
      .otherwise(lit(0L))
    withTots.select(col("token"), col("cnt_a"), col("cnt_b"), dir.as("dir"),
      (round(lit(2.0) * (termA + termB), 6) + lit(0.0)).as("llr"))
  }

  /** Collocation extraction by pointwise mutual information (Church &
    * Hanks 1990; the phrase-mining pass of word2vec-style pipelines):
    * the top-`k` adjacent word pairs by corpus occurrence count with
    * PMI = ln(c2·N / (cL·cR)) over the bigram event space, where c2 =
    * pair occurrences, cL/cR = occurrences of the word in the
    * first/second slot, N = total bigram occurrences. High-PMI,
    * high-count pairs are multiword units ("new york"); low-PMI pairs
    * are syntax glue — the signal behind tokenizer-vocabulary seeding
    * and boilerplate phrase audits.
    *
    * Plan shape: pair/left/right counts are three map-side-combined
    * hash aggregations over the SAME exploded pair projection (one
    * corpus scan materialized once); N rides a broadcast one-row
    * aggregate; the rank is a TakeOrdered over the (already aggregated)
    * pair table, never a global sort of occurrences. RULE-1: the
    * ordering is (c2 DESC, w1, w2) — pure integer + string; PMI is a
    * 6-dp presentation column computed by the identical IEEE op
    * sequence in both engines (multiply, multiply, divide, ln —
    * q_collocations hash-checks it, same accepted float class as
    * q_logreg's sigmoid).
    */
  def collocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      k: Int = 100): DataFrame = {
    require(minCount >= 1, s"collocations: minCount must be >= 1, got $minCount")
    require(k >= 1, s"collocations: k must be >= 1, got $k")
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    // The size() pre-filter LOOKS like the bandedFromShingles pushdown
    // trap (round 18) but is not: replacing it with a greatest()-guarded
    // slice measured ~10% SLOWER on q_collocations/q_ccnet_buckets/
    // q_bigram_nll (medians of 3, same host) — the predicate is cheap
    // relative to the explode and drops rows before the shuffle. Keep.
    val pairs = Dedup.fanOut(docs.select(toks.as("__t")))
      .where(size(col("__t")) >= 2)
      .select(explode(transform(slice(col("__t"), lit(1), size(col("__t")) - 1),
        (w, i) => struct(w.as("w1"), get(col("__t"), i + 1).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val cL = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c_left"))
      val cR = pairs.groupBy(col("w2")).agg(count(lit(1)).as("c_right"))
      val n = broadcast(pairs.agg(count(lit(1)).as("n_pairs")))
      val out = c2.where(col("c2") >= minCount)
        .join(cL, "w1").join(cR, "w2").crossJoin(n)
        .select(col("w1"), col("w2"), col("c2"), col("c_left"), col("c_right"),
          col("n_pairs"),
          (round(log(col("c2").cast("double") * col("n_pairs") /
            (col("c_left").cast("double") * col("c_right"))), 6) + lit(0.0)).as("pmi"))
        .orderBy(col("c2").desc, col("w1").asc, col("w2").asc)
        .limit(k)
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      out
    } finally { pairs.unpersist(); () }
  }

  /** Shared core of [[bigramNll]] and [[bigramScoreMicro]]: one row per
    * document bigram occurrence, joined to the corpus pair count `c2`
    * and prefix count `c1`. Bigrams are built INSIDE each row as an
    * array transform (adjacency is a per-row fact — no window function
    * touches the corpus); two map-side-combined hash aggregations and
    * two keyed equi-joins.
    */
  private def bigramJoined(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    // size() pre-filter kept deliberately — see the collocations note
    // (the greatest()-guarded alternative measured slower, round 18)
    val pairs = Dedup.fanOut(
      docs.select(col(idCol).cast("long").as("doc_id"), toks.as("__t")))
      .where(size(col("__t")) >= 2)
      .select(col("doc_id"),
        explode(transform(slice(col("__t"), lit(1), size(col("__t")) - 1),
          (w, i) => concat_ws(" ", w, get(col("__t"), i + 1)))).as("pair"))
      .withColumn("w1", substring_index(col("pair"), " ", 1))
    val c2 = pairs.groupBy(col("pair")).agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    pairs.join(c2, "pair").join(c1, "w1")
  }

  /** Canonical text normalization for fuzzy-exact dedup (the
    * "lowercase, strip punctuation, squeeze whitespace" canonicalization
    * Lee et al. 2022 §4.1 and most production pipelines apply BEFORE
    * exact hashing, so trivially-reformatted copies collapse): lowercase,
    * non-alphanumerics (keeping spaces) to spaces, runs of spaces
    * squeezed, ends trimmed. Pure codegen projection (lower /
    * regexp_replace / trim — one pass, no shuffle); the regex classes
    * are ASCII-explicit so the identical expression evaluates in any
    * engine (q_dedup_canonical replays normalize + dedup end to end).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** One-pass corpus profile per language — the audit table a curation
    * run starts from: document counts, token mass, and EXACT discrete
    * percentiles (p10/p50/p90) of per-document token count and of the
    * integer micro-unit quality score ([[qualityScoreMicro]]). The
    * percentile definition is pinned and engine-portable: the value at
    * 1-based rank ceil(q·n) of the ascending (value, doc_id) order,
    * with the rank computed in pure integer arithmetic
    * ((n·q + 9) div 10) — no float ever drives an ordering, so the
    * whole profile hash-checks across engines (q_corpus_profile).
    *
    * Shape: one projection computes the two per-doc integers, two
    * window ranks inside the same per-language hash partitioning (one
    * Exchange, two sorts), one final hash aggregation. The sort is
    * per-LANGUAGE — right for audit-scale profiles; for 100-TB corpora
    * with a dominant language use [[approxProfileCorpus]], which
    * replaces the sorts with fixed-size quantile sketches.
    */
  def profileCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    def rk(q: Int, cnt: Column): Column = idiv(cnt * lit(q.toLong) + lit(9L), lit(10L))
    // null text counts 0 tokens HERE (not in tokenCount itself): the
    // rank windows ORDER BY n_tokens, and a NULL there is engine-
    // dependent ordering (Spark NULLS FIRST vs SQL NULLS LAST) — the
    // same class of hazard as rule-1's float ORDER BY
    val base = docs.select(col(langCol).as("lang"), col(idCol).cast("long").as("__id"),
      coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)).as("n_tokens"),
      qualityScoreMicro(col(textCol)).as("q_micro"))
    val wc = Window.partitionBy(col("lang"))
    val wt = wc.orderBy(col("n_tokens"), col("__id"))
    val wq = wc.orderBy(col("q_micro"), col("__id"))
    base
      .withColumn("__cnt", count(lit(1)).over(wc))
      .withColumn("__rt", row_number().over(wt))
      .withColumn("__rq", row_number().over(wq))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        max(when(col("__rt") === rk(1, col("__cnt")), col("n_tokens"))).as("p10_tokens"),
        max(when(col("__rt") === rk(5, col("__cnt")), col("n_tokens"))).as("p50_tokens"),
        max(when(col("__rt") === rk(9, col("__cnt")), col("n_tokens"))).as("p90_tokens"),
        max(when(col("__rq") === rk(1, col("__cnt")), col("q_micro"))).as("p10_q_micro"),
        max(when(col("__rq") === rk(5, col("__cnt")), col("q_micro"))).as("p50_q_micro"),
        max(when(col("__rq") === rk(9, col("__cnt")), col("q_micro"))).as("p90_q_micro"))
  }

  /** APPROXIMATE [[profileCorpus]] for the 100-TB path: the same columns
    * via `percentile_approx` (Greenwald–Khanna sketches) — ONE hash
    * aggregation, no per-language sort, shuffle carries fixed-size
    * sketches per language regardless of corpus size. `accuracy` is the
    * GK accuracy parameter (10000 ≈ 0.01% rank error). Sketch
    * percentiles are rank-approximate, so this variant is sbt-tested
    * against the exact profile rather than oracle-hashed.
    */
  def approxProfileCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      accuracy: Int = 10000): DataFrame = {
    // same null policy as [[profileCorpus]]: null text = 0 tokens
    // (percentile_approx would otherwise SKIP null rows, shifting ranks
    // against the exact profile's coalesced ordering)
    val base = docs.select(col(langCol).as("lang"),
      coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)).as("n_tokens"),
      qualityScoreMicro(col(textCol)).as("q_micro"))
    val ps = array(lit(0.1), lit(0.5), lit(0.9))
    base.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        percentile_approx(col("n_tokens"), ps, lit(accuracy)).as("p_tokens"),
        percentile_approx(col("q_micro"), ps, lit(accuracy)).as("p_q_micro"))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("min_tokens"), col("max_tokens"),
        col("p_tokens").getItem(0).as("p10_tokens"),
        col("p_tokens").getItem(1).as("p50_tokens"),
        col("p_tokens").getItem(2).as("p90_tokens"),
        col("p_q_micro").getItem(0).as("p10_q_micro"),
        col("p_q_micro").getItem(1).as("p50_q_micro"),
        col("p_q_micro").getItem(2).as("p90_q_micro"))
  }
}
