package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT distributed quantiles / order statistics over an integral
  * column — k-th-smallest selection by iterative histogram refinement
  * (the classic distributed selection scheme — Blum et al.'s selection
  * problem meets a radix histogram; same family as Munro & Paterson
  * 1980's multi-pass selection), never a global sort:
  *
  *  - Pass 0: one aggregation for (count, min, max).
  *  - Each refinement pass: ONE scan computing a `B`-bucket histogram
  *    per still-active value interval (buckets are `v >> s` radix
  *    slices, so the math is overflow-free for the full 64-bit range
  *    and monotone — arithmetic shift is floor division by 2^s). The
  *    shuffle carries at most `B × #intervals` count rows; the driver
  *    walks each histogram to locate the bucket containing the target
  *    rank and narrows the interval by a factor of B.
  *  - Terminates when every interval is a single value: at most
  *    ceil(64 / log2(B)) = 5 passes for a full 64-bit value range
  *    (real columns resolve in 2-3), each a column-pruned scan.
  *
  * This is how you take the exact p99 of a column at 100 TB: a global
  * `ORDER BY` shuffles the corpus; `approxQuantile` gives an
  * ε-approximation; this gives the EXACT order statistic for a handful
  * of full-column scans and a B·#targets-row shuffle per pass. Results
  * are deterministic (a pure function of the value multiset). The
  * intervals of distinct targets are always identical or disjoint
  * (they start as one shared [min, max] and only ever split along
  * bucket boundaries), so each row lands in at most ONE interval and
  * the pass expression is a codegen'd when-chain — no row fan-out.
  *
  * NULL policy (rule 10, explicit on both sides of the gate): NULL
  * values carry no rank and are EXCLUDED; ranks are relative to the
  * non-null count. Quantile definition: k = ceil(pct·n / 100) in pure
  * integer arithmetic ((pct·n + 99) div 100) — the "type 1" /
  * `quantile_disc` convention: the k-th smallest VALUE, duplicates
  * counted, so the answer is always an element of the column.
  *
  * Per-GROUP quantiles are a different shape with a built-in answer —
  * rank windows partitioned by the group (the exact weighted-median
  * machinery in the K-Medians update, `clustering/Lloyds.scala`)
  * shuffle each group once and never collect; this operator exists for
  * the GLOBAL case where a rank window would be a single-partition
  * total order over the corpus.
  *
  * The reference engine has no quantile operator; `graft.ops` pipeline
  * surface (length/score percentile cutoffs for curation thresholds,
  * e.g. "drop docs below the exact 5th length percentile").
  */
object Quantiles {

  /** Radix histogram width: 2^13 buckets. ceil(64/13) = 5 passes worst
    * case; driver-side per pass is ≤ B × #intervals count rows (≤ 0.5M
    * at the 64-target cap — the same bounded-collect budget as the
    * k×d center collects in the Lloyd loop).
    */
  private val BucketBits = 13
  private val B = 1 << BucketBits

  /** One selection target: the `need`-th smallest value within
    * [lo, hi] (bounds inclusive, both known to contain it).
    */
  private final case class Target(id: Int, need: Long, lo: Long, hi: Long) {
    def resolved: Boolean = lo == hi
  }

  /** The ONE pcts-contract guard behind every percentile entry point
    * (rule 5 applied to Scala guards): non-empty, each in [1,100], no
    * duplicates.
    */
  private[graft] def requirePcts(pcts: Seq[Int], site: String): Unit = {
    require(pcts.nonEmpty, s"$site: pcts must be non-empty")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"$site: percentiles must be in [1,100], got ${pcts.mkString(",")}")
    require(pcts.distinct.length == pcts.length,
      s"$site: duplicate percentiles")
  }

  /** The INTEGRAL entry points refuse fractional input instead of
    * silently `cast("long")`-truncating it (quantiles of the truncated
    * multiset are plausible and wrong — the failure class this codebase
    * refuses everywhere else: [[Hll.estimate]] refuses grouped frames,
    * [[CmsSketch]] refuses geometry mismatches). `redirect` names the
    * lossless sibling in API terms. Shared with [[QuantileSketch]]'s
    * builders (the same two-typed surface).
    */
  private[graft] def requireIntegral(df: DataFrame, c: String, site: String,
      redirect: String): Unit =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"$site: column $c is ${dt.catalogString} - the integral " +
          "entry points would silently truncate fractional values " +
          s"(cast to long). $redirect")
    }

  /** The DOUBLE entry points refuse integral input symmetrically: a
    * 64-bit integer column cast to double silently loses precision past
    * 2^53, which is the same plausible-but-wrong class in the other
    * direction.
    */
  private[graft] def requireFloating(df: DataFrame, c: String, site: String,
      redirect: String): Unit =
    df.schema(c).dataType match {
      case FloatType | DoubleType => ()
      case dt => throw new IllegalArgumentException(
        s"$site: column $c is ${dt.catalogString} - the double " +
          "entry points would silently lose integer precision past 2^53 " +
          s"(cast to double). $redirect")
    }

  /** Exact percentile values: one row per requested integer percentile,
    * (pct BIGINT, k BIGINT, value BIGINT) where k = ceil(pct·n/100) and
    * value is the k-th smallest non-null `valueCol`. Empty input (after
    * the null filter) returns an empty frame.
    */
  def exactPct(df: DataFrame, valueCol: String, pcts: Seq[Int]): DataFrame = {
    requirePcts(pcts, "Quantiles.exactPct")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = values(df, valueCol, "Quantiles.exactPct")
    // ONE pass-0 aggregation for (n, min, max) — the scaladoc's contract
    val b = vals.agg(count(lit(1)), min("__v"), max("__v")).head()
    val n = b.getLong(0)
    if (n == 0L) {
      return Seq.empty[(Long, Long, Long)].toDF("pct", "k", "value")
    }
    val ks = pcts.map(p => (p.toLong * n + 99L) / 100L)
    val byK = selectKthBatched(vals, ks.distinct, b.getLong(1), b.getLong(2))
    pcts.zip(ks).map { case (p, k) => (p.toLong, k, byK(k)) }
      .toDF("pct", "k", "value")
  }

  /** Exact order statistics at explicit 1-based ranks: (k BIGINT,
    * value BIGINT), value = k-th smallest non-null `valueCol`. Each k
    * must be in [1, count(non-null)] — out-of-range ranks refuse with
    * the measured n rather than clamping silently.
    */
  def exactAtRanks(df: DataFrame, valueCol: String, ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty, "Quantiles.exactAtRanks: ks must be non-empty")
    require(ks.distinct.length == ks.length, "Quantiles.exactAtRanks: duplicate ranks")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = values(df, valueCol, "Quantiles.exactAtRanks")
    val b = vals.agg(count(lit(1)), min("__v"), max("__v")).head()
    val n = b.getLong(0)
    require(ks.forall(k => k >= 1 && k <= n),
      s"Quantiles.exactAtRanks: ranks must be in [1, $n] (non-null rows), " +
        s"got ${ks.mkString(",")}")
    val byK = selectKthBatched(vals, ks, b.getLong(1), b.getLong(2))
    ks.map(k => (k, byK(k))).toDF("k", "value")
  }

  /** Exact percentiles of a DOUBLE column: the IEEE-754 sortable-bits
    * transform ([[graft.functions.SortableBits]], codegen'd in the scan
    * projection) maps double ordering onto signed-long ordering, the
    * integer refinement runs unchanged, and the resolved key inverts
    * back driver-side — so "the exact p99 of a float score column"
    * costs the same few pruned scans as the integral form, never a
    * sort, with NO value approximation (the answer is an element of
    * the column, bit-exact). Policy (rule 10, explicit): NULL and NaN
    * values carry no rank and are EXCLUDED; −0.0 is normalized to
    * +0.0 before ranking (SQL ordering treats them equal while the bit
    * transform does not — normalizing keeps the selected element's
    * identity engine-portable).
    */
  def exactPctDouble(df: DataFrame, valueCol: String, pcts: Seq[Int]): DataFrame = {
    requirePcts(pcts, "Quantiles.exactPctDouble")
    requireFloating(df, valueCol, "Quantiles.exactPctDouble",
      "For integral values use exactPct (exact at the full 64-bit range).")
    val spark = df.sparkSession
    import spark.implicits._
    val d = col(valueCol).cast("double")
    val vals = df.select(d.as("__d"))
      .where(col("__d").isNotNull && !isnan(col("__d")))
      .select(graft.functions.SortableBits.sortable(col("__d") + lit(0.0)).as("__v"),
        lit(1L).as("__w"))
    val b = vals.agg(count(lit(1)), min("__v"), max("__v")).head()
    val n = b.getLong(0)
    if (n == 0L) {
      return Seq.empty[(Long, Long, Double)].toDF("pct", "k", "value")
    }
    val ks = pcts.map(p => (p.toLong * n + 99L) / 100L)
    val byK = selectKthBatched(vals, ks.distinct, b.getLong(1), b.getLong(2))
    pcts.zip(ks).map { case (p, k) =>
      (p.toLong, k, graft.functions.SortableBits.fromSortable(byK(k)))
    }.toDF("pct", "k", "value")
  }

  /** WEIGHTED exact percentiles: each row carries `weightCol` units of
    * rank mass (integral, ≥ 0 — a negative weight refuses; a NULL value
    * or NULL weight carries no mass and is excluded, rule 10). Returns
    * (pct BIGINT, k BIGINT, value BIGINT) with k = ceil(pct·W/100) over
    * the total weight W, and value = the smallest v whose cumulative
    * weight reaches k — identical to [[exactPct]] over the multiset
    * with every row repeated `weight` times, computed in the same
    * histogram-refinement passes (histograms sum weight instead of
    * counting rows; shuffle/collect bounds unchanged). The natural form
    * for token-mass questions: "the document length at which half the
    * CHARACTERS/TOKENS live" vs the unweighted "half the documents".
    */
  def exactPctWeighted(df: DataFrame, valueCol: String, weightCol: String,
      pcts: Seq[Int]): DataFrame = {
    requirePcts(pcts, "Quantiles.exactPctWeighted")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = values(df, valueCol, "Quantiles.exactPctWeighted", Some(weightCol))
    // one fused pass-0: total mass, weight-sign guard, value bounds
    val agg = vals.agg(coalesce(sum("__w"), lit(0L)),
      coalesce(min("__w"), lit(0L)), min("__v"), max("__v")).head()
    val (w, minW) = (agg.getLong(0), agg.getLong(1))
    require(minW >= 0L,
      s"Quantiles.exactPctWeighted: negative weight $minW in $weightCol - " +
        "rank mass must be non-negative")
    if (w == 0L) {
      return Seq.empty[(Long, Long, Long)].toDF("pct", "k", "value")
    }
    val ks = pcts.map(p => (p.toLong * w + 99L) / 100L)
    val byK = selectKthBatched(vals, ks.distinct, agg.getLong(2), agg.getLong(3))
    pcts.zip(ks).map { case (p, k) => (p.toLong, k, byK(k)) }
      .toDF("pct", "k", "value")
  }

  /** Exact PER-GROUP percentiles — the window-shaped sibling of
    * [[exactPct]]: rank windows partitioned by the group shuffle each
    * group exactly once and never collect, which is the right machinery
    * when the total order is per-group (the global operator exists
    * because a global rank window would be a one-partition total order
    * over the corpus). Returns (groupCols..., pct, k, value) with
    * k = ceil(pct·n_g/100) over each group's non-null count — same
    * type-1 definition, same explicit null policy (NULL values carry no
    * rank; NULL GROUP values are legitimate groups and are retained).
    * The pct-match predicate is pure integer algebra
    * (k == rn ⟺ 100·rn − 99 ≤ pct·n ≤ 100·rn), so the whole output
    * replays in SQL (q_quantiles_by_group). Skewed groups shuffle as
    * one partition each — for a single giant group use [[exactPct]] on
    * that slice instead.
    */
  def exactPctByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    requireByGroupArgs(df, groupCols, pcts, "exactPctByGroup")
    requireIntegral(df, valueCol, "Quantiles.exactPctByGroup",
      "For fractional values use exactPctByGroupDouble (bit-exact, no " +
        "truncation).")
    pctByGroupWindow(
      df.select(groupCols.map(col) :+ col(valueCol).cast("long").as("__v"): _*)
        .where(col("__v").isNotNull),
      groupCols, pcts)
  }

  /** [[exactPctByGroup]] for FLOAT/DOUBLE columns. The window ORDER BY
    * ranks STORED doubles — no composed float expression enters the
    * contract (the q_quantiles_double precedent: identical bit patterns
    * order identically in every IEEE-754 engine), which is why this
    * stays inside rule 1's float-ordering ban rather than violating it.
    * Policy matches [[exactPctDouble]]: NULL and NaN values carry no
    * rank and are EXCLUDED; −0.0 is normalized to +0.0 (`+ 0.0` is the
    * exact identity everywhere else); NULL GROUP values are legitimate
    * groups and are retained. Output value is DOUBLE (an element of the
    * column, bit-exact).
    */
  def exactPctByGroupDouble(df: DataFrame, groupCols: Seq[String],
      valueCol: String, pcts: Seq[Int]): DataFrame = {
    requireByGroupArgs(df, groupCols, pcts, "exactPctByGroupDouble")
    requireFloating(df, valueCol, "Quantiles.exactPctByGroupDouble",
      "For integral values use exactPctByGroup (exact at the full 64-bit " +
        "range).")
    pctByGroupWindow(
      df.select(groupCols.map(col) :+
          (col(valueCol).cast("double") + lit(0.0)).as("__v"): _*)
        .where(col("__v").isNotNull && !isnan(col("__v"))),
      groupCols, pcts)
  }

  private def requireByGroupArgs(df: DataFrame, groupCols: Seq[String],
      pcts: Seq[Int], site: String): Unit = {
    require(groupCols.nonEmpty, s"Quantiles.$site: groupCols must be non-empty")
    requirePcts(pcts, s"Quantiles.$site")
    // withColumn on a reserved name would CLOBBER a same-named group
    // column and silently emit wrong groups - refuse loudly instead
    val reserved = Set("pct", "k", "value", "__v", "__rn", "__n")
    val clash = groupCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"Quantiles.$site: group column name(s) ${clash.mkString(",")} " +
        s"collide with the output/internal columns (${reserved.mkString(",")}) - " +
        "alias the group column first")
  }

  /** The ONE per-group rank-window body behind [[exactPctByGroup]] and
    * [[exactPctByGroupDouble]] (rule 5): `src` carries the group columns
    * plus a non-null `__v` whose type decides the output value type.
    */
  private def pctByGroupWindow(src: DataFrame, groupCols: Seq[String],
      pcts: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*)
    val pctsArr = array(pcts.map(p => lit(p.toLong)): _*)
    src
      .withColumn("__rn", row_number().over(w.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(w))
      // a row is the pct-quantile iff its rank equals ceil(pct·n/100);
      // rewritten multiplicatively so the Column API stays in exact
      // integer arithmetic (no `/`-returns-double trap)
      .withColumn("pct", explode(filter(pctsArr, p =>
        p * col("__n") >= lit(100L) * col("__rn") - lit(99L) &&
          p * col("__n") <= lit(100L) * col("__rn"))))
      .select(groupCols.map(col) ++ Seq(col("pct"),
        col("__rn").cast("long").as("k"), col("__v").as("value")): _*)
  }

  /** Percentile-cut curation filter: keep rows whose `valueCol` lies
    * between the EXACT loPct-th and hiPct-th percentile values
    * (inclusive; cutoffs from [[exactPct]], so the thresholds are real
    * elements of the column, not interpolations). Rows with NULL
    * `valueCol` are dropped (they carry no rank — rule-10 policy,
    * consistent with the cutoff computation). This is the one-call form
    * of the standard curation move "drop the shortest 5% and longest 1%
    * of documents by exact length percentile": 3-4 pruned scans to find
    * the two cutoffs, then one ordinary pushed-down filter — no sort,
    * no sampling error at any scale.
    */
  def percentileFilter(df: DataFrame, valueCol: String,
      loPct: Int, hiPct: Int): DataFrame = {
    require(loPct >= 1 && hiPct <= 100 && loPct <= hiPct,
      s"Quantiles.percentileFilter: need 1 <= loPct <= hiPct <= 100, " +
        s"got ($loPct, $hiPct)")
    requireIntegral(df, valueCol, "Quantiles.percentileFilter",
      "For fractional values use percentileFilterDouble (bit-exact " +
        "cutoffs, no truncation).")
    val cuts = exactPct(df, valueCol, Seq(loPct, hiPct).distinct)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    if (cuts.isEmpty) return df.where(lit(false)) // no non-null values
    val (lo, hi) = (cuts(loPct.toLong), cuts(hiPct.toLong))
    df.where(col(valueCol).isNotNull &&
      col(valueCol).cast("long") >= lo && col(valueCol).cast("long") <= hi)
  }

  /** [[percentileFilter]] for FLOAT/DOUBLE columns — "drop the bottom 5%
    * by float quality score", the single most common curation cut. The
    * cutoffs come from [[exactPctDouble]] (bit-exact elements of the
    * column, selected in sortable-bits space and inverted driver-side),
    * and the band predicate itself stays a PLAIN double comparison
    * against those literals — so it reaches the parquet scan as a
    * pushed filter (PushedFilters on the executed plan, pinned in
    * PlanShapeSpec), no expression re-evaluation, no sort. Policy: NULL
    * and NaN rows are dropped (they carry no rank — consistent with the
    * cutoff computation; NaN must be explicit because SQL comparison
    * semantics would otherwise let `NaN >= lo` pass in engines that
    * order NaN high).
    */
  def percentileFilterDouble(df: DataFrame, valueCol: String,
      loPct: Int, hiPct: Int): DataFrame = {
    require(loPct >= 1 && hiPct <= 100 && loPct <= hiPct,
      s"Quantiles.percentileFilterDouble: need 1 <= loPct <= hiPct <= 100, " +
        s"got ($loPct, $hiPct)")
    val cuts = exactPctDouble(df, valueCol, Seq(loPct, hiPct).distinct)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    if (cuts.isEmpty) return df.where(lit(false)) // no non-null/non-NaN values
    val (lo, hi) = (cuts(loPct.toLong), cuts(hiPct.toLong))
    df.where(col(valueCol).isNotNull && !isnan(col(valueCol)) &&
      col(valueCol) >= lit(lo) && col(valueCol) <= lit(hi))
  }

  /** py4j-friendly [[exactAtRanks]]: a boxed Seq[Long] does not survive
    * py4j (house rule: JVM Longs auto-unbox to Python ints and come
    * back as Integers), so the Python binding passes ranks as doubles —
    * exact for every rank below 2^53, far past any row count — and this
    * shim converts. Scala callers should use [[exactAtRanks]].
    */
  def exactAtRanksPy(df: DataFrame, valueCol: String, ks: Seq[Double]): DataFrame = {
    require(ks.forall(k => k == math.rint(k)),
      s"Quantiles.exactAtRanksPy: ranks must be integral, got ${ks.mkString(",")}")
    require(ks.forall(k => math.abs(k) < (1L << 53).toDouble),
      "Quantiles.exactAtRanksPy: ranks must stay below 2^53 (the range a " +
        s"double carries exactly across py4j), got ${ks.mkString(",")}")
    exactAtRanks(df, valueCol, ks.map(_.toLong))
  }

  /** The pruned projection every pass scans: nulls out (explicit
    * policy), values as long, weight (unit for the unweighted forms) as
    * rank mass. Recomputed per pass rather than persisted — at 100 TB,
    * re-reading one or two pruned parquet columns 2-5 times is
    * deliberate (the same recompute-over-materialize call as the
    * substring-dedup window pass, PLANS.md round 9).
    */
  private def values(df: DataFrame, valueCol: String, site: String,
      weightCol: Option[String] = None): DataFrame = {
    requireIntegral(df, valueCol, site,
      "For fractional values use exactPctDouble (bit-exact, no truncation).")
    weightCol.foreach(c => requireIntegral(df, c, site,
      "Rank mass must be integral - pre-scale fractional weights to " +
        "integer units (e.g. micro-units) explicitly."))
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.select(col(valueCol).cast("long").as("__v"), w.as("__w"))
      .where(col("__v").isNotNull && col("__w").isNotNull)
  }

  /** [[selectKth]] over arbitrarily many ranks: batches of ≤ 64 keep
    * each batch's histogram collect at B × #intervals rows and the
    * per-pass when-chain expression bounded; batches run sequentially
    * (cost is linear in ceil(#ranks/64) refinement rounds over the same
    * pruned scan).
    */
  private def selectKthBatched(vals: DataFrame, ks: Seq[Long],
      mn: Long, mx: Long): Map[Long, Long] =
    ks.grouped(64).foldLeft(Map.empty[Long, Long]) { (acc, batch) =>
      acc ++ selectKth(vals, batch, mn, mx)
    }

  /** Core selection loop. Returns the value at each requested rank.
    * ≤ 64 targets: each pass's histogram collect is B × #intervals
    * rows and the when-chain expression grows with #intervals.
    */
  private def selectKth(vals: DataFrame, ks: Seq[Long],
      mn: Long, mx: Long): Map[Long, Long] = {
    require(ks.length <= 64,
      s"Quantiles: at most 64 ranks per call, got ${ks.length} - batch them")
    var active = ks.zipWithIndex.map { case (k, i) => Target(i, k, mn, mx) }.toList
    val resolvedVals = scala.collection.mutable.Map.empty[Int, Long]
    var passes = 0
    while (active.exists(!_.resolved)) {
      passes += 1
      require(passes <= 8, // 5 covers the full 64-bit range; 8 = paranoia
        s"Quantiles: refinement did not converge after $passes passes - " +
          "the input changed between passes (non-deterministic source?)")
      active.filter(_.resolved).foreach(t => resolvedVals(t.id) = t.lo)
      active = active.filter(!_.resolved)
      // identical-or-disjoint invariant: group targets sharing an interval
      val groups = active.groupBy(t => (t.lo, t.hi)).toSeq.zipWithIndex
        .map { case (((lo, hi), ts), gid) => (gid, lo, hi, shiftFor(lo, hi), ts) }
      // one scan: gid + radix bucket via a codegen'd when-chain (each row
      // is in at most one interval), histogram per (gid, bucket)
      val gidCol = groups.foldLeft(lit(null).cast("int")) {
        case (acc, (gid, lo, hi, _, _)) =>
          when(col("__v") >= lo && col("__v") <= hi, lit(gid)).otherwise(acc)
      }
      val bucketCol = groups.foldLeft(lit(null).cast("long")) {
        case (acc, (gid, lo, _, s, _)) =>
          when(col("__gid") === gid,
            shiftright(col("__v"), s) - lit(lo >> s)).otherwise(acc)
      }
      val hist = vals.select(col("__v"), col("__w"), gidCol.as("__gid"))
        .where(col("__gid").isNotNull)
        .select(col("__gid"), bucketCol.as("__b"), col("__w"))
        .groupBy("__gid", "__b").agg(sum("__w").as("__c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (gid, rows) =>
          gid -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        }
      active = groups.flatMap { case (gid, lo, hi, s, ts) =>
        val buckets = hist.getOrElse(gid,
          throw new IllegalStateException(
            s"Quantiles: interval [$lo,$hi] matched no rows mid-refinement - " +
              "the input changed between passes"))
        ts.map { t =>
          // walk the histogram to the bucket holding the need-th value
          var need = t.need
          var j = -1L
          val it = buckets.iterator
          while (j < 0 && it.hasNext) {
            val (b, c) = it.next()
            if (need <= c) j = b else need -= c
          }
          require(j >= 0,
            s"Quantiles: rank ${t.need} exceeds the rows in [$lo,$hi] - " +
              "the input changed between passes")
          // bucket j spans [(base+j) << s, ((base+j+1) << s) - 1] clamped
          // to [lo, hi]; BigInt for the boundary products only (the
          // unclamped corners can exceed Long range near the extremes)
          val base = BigInt(lo >> s)
          val loB = ((base + j) << s).max(BigInt(lo)).toLong
          val hiB = (((base + j + 1) << s) - 1).min(BigInt(hi)).toLong
          Target(t.id, need, loB, hiB)
        }
      }.toList
    }
    active.foreach(t => resolvedVals(t.id) = t.lo)
    ks.zipWithIndex.map { case (k, i) => k -> resolvedVals(i) }.toMap
  }

  /** Smallest shift s such that the interval spans < B radix-2^s
    * buckets. BigInt only for the s = 0 span check (hi - lo overflows
    * Long when the first interval is the full 64-bit range).
    */
  private def shiftFor(lo: Long, hi: Long): Int = {
    var s = 0
    while ((BigInt(hi) >> s) - (BigInt(lo) >> s) >= B) s += 1
    s
  }
}
