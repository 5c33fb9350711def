package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal enrichment operators — the event-time JOIN surface of the
  * pipeline (training-data assembly regularly needs "each event/sample
  * enriched with the latest prior state row": feature snapshots, model
  * versions, account state, crawl metadata). The reference engine has no
  * temporal join at all; Spark itself lacks a native as-of join, and the
  * naive formulation (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + a
  * max-per-row filter) plans a per-key CARTESIAN of left rows x right
  * rows — quadratic in rows-per-key and a non-starter at scale.
  *
  * These operators instead use the UNION-WINDOW form: tag both sides,
  * union them, and carry the latest right row forward with one running
  * `last(ignoreNulls)` window — ONE shuffle on the key, one ordered scan
  * per key group, never a pair blow-up. This is the same single-exchange
  * posture as [[graft.streaming.EventOps.sessionize]]: per-key state is
  * one row, cost is O(|l| + |r|) after the sort, and the shuffle carries
  * data rows exactly once. Window partitions spill via Spark's unsafe
  * row array, so a hot key degrades to disk, not OOM; AQE handles skewed
  * key groups like any other exchange.
  */
object AsofJoin {

  /** Stream-safe as-of LOOKUP against a STATIC snapshot table: the
    * snapshot history is collected to the driver (capped —
    * `graft.asof.maxBroadcastRows`, default 10M ≈ a few hundred MB),
    * organized as per-key timestamp-sorted arrays, broadcast once, and
    * probed per row with a binary search — ZERO shuffle, ZERO state,
    * so it runs identically on a batch frame or inside a streaming
    * query (stateless projection; spec-asserted batch parity on a
    * memory stream). This is the serving-shaped sibling of
    * [[asofJoin]]: use it when the snapshot side is dimension-sized
    * (feature snapshots, model versions, config history) and the event
    * side is a stream or a 100-TB scan; use [[asofJoin]] when both
    * sides are data-sized.
    *
    * Same contract as [[asofJoin]] (inclusive `<=`, highest
    * `rightIdCol` wins at equal ts, `tolerance` nulls stale matches)
    * for ONE right value column, returned as `{prefix}ts` +
    * `{prefix}{valueCol}` (double). Keys must be long-castable (the
    * broadcast index is primitive-keyed). Null contract, IDENTICAL to
    * asofJoin (spec-asserted): a matched snapshot whose value is NULL
    * carries ts + NULL value (the observation exists); snapshot rows
    * with a null key, ts, or id are dropped (not addressable);
    * null-key/ts left rows look up to null.
    */
  def asofLookup(
      left: DataFrame,
      snapshots: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      rightIdCol: String,
      tolerance: Option[Long] = None,
      prefix: String = "asof_"): DataFrame = {
    require(tolerance.forall(_ > 0), s"asofLookup: tolerance must be positive, got $tolerance")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("__asof")),
      "asofLookup: left columns may not start with the reserved prefix __asof")
    val outNames = Seq(s"${prefix}ts", s"$prefix$valueCol")
    require(outNames.intersect(leftCols).isEmpty,
      s"asofLookup: output columns ${outNames.intersect(leftCols).mkString(", ")} " +
        "collide with left columns — pick a different prefix")
    val spark = left.sparkSession
    val cap = graft.util.Conf.long(spark, "graft.asof.maxBroadcastRows", 10000000L)
    val snapRows = snapshots
      .select(col(keyCol).cast("long").as("__k"), col(tsCol).cast("long").as("__ts"),
        col(valueCol).cast("double").as("__v"), col(rightIdCol).cast("long").as("__rid"))
      .where(col("__k").isNotNull && col("__ts").isNotNull && col("__rid").isNotNull)
      .limit(math.min(cap + 1, Int.MaxValue.toLong - 1).toInt)
      .collect()
    require(snapRows.length <= cap,
      s"asofLookup: snapshot side exceeds graft.asof.maxBroadcastRows=$cap — " +
        "use asofJoin (the distributed union-window form) for data-sized snapshot tables")
    // per key: parallel arrays sorted by (ts, id); at equal ts the LAST
    // entry (highest id) is the winner, matching asofJoin's tie-break.
    // Values are BOXED so a null-valued snapshot rides the index and is
    // carried as NULL on match — identical to asofJoin's struct carry
    // (rehearsed live: the primitive-array index silently dropped
    // null-value snapshots, desyncing the two as-of forms).
    val byKey: Map[Long, (Array[Long], Array[java.lang.Double], Array[Long])] =
      snapRows.groupBy(_.getLong(0)).map { case (k, rows) =>
        val sorted = rows.map(r => (r.getLong(1), r.getLong(3),
            if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))))
          .sortBy(t => (t._1, t._2))
        (k, (sorted.map(_._1), sorted.map(_._3), sorted.map(_._2)))
      }
    val bc = spark.sparkContext.broadcast(byKey)
    val tol = tolerance.getOrElse(Long.MaxValue)
    val look = udf { (key: java.lang.Long, ts: java.lang.Long) =>
      (if (key == null || ts == null) None
       else bc.value.get(key.longValue()).flatMap { case (tss, vals, _) =>
         // rightmost index with tss(i) <= ts; ties pre-resolved by the
         // (ts, id) sort — the last equal-ts entry has the highest id
         var lo = 0; var hi = tss.length - 1; var ans = -1
         while (lo <= hi) {
           val mid = (lo + hi) >>> 1
           if (tss(mid) <= ts.longValue()) { ans = mid; lo = mid + 1 } else hi = mid - 1
         }
         if (ans < 0 || ts.longValue() - tss(ans) > tol) None
         else Some((tss(ans), Option(vals(ans)).map(_.doubleValue())))
       }): Option[(Long, Option[Double])]
    }
    left
      .withColumn("__asof_m", look(col(keyCol).cast("long"), col(tsCol).cast("long")))
      .withColumn(s"${prefix}ts", col("__asof_m._1"))
      .withColumn(s"$prefix$valueCol", col("__asof_m._2"))
      .drop("__asof_m")
  }

  /** py4j-friendly variant of [[asofLookup]]: `toleranceMs <= 0` means
    * no tolerance (same Integer-boxing rationale as [[asofJoinMs]]).
    */
  def asofLookupMs(
      left: DataFrame,
      snapshots: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      rightIdCol: String,
      toleranceMs: Long,
      prefix: String): DataFrame =
    asofLookup(left, snapshots, keyCol, tsCol, valueCol, rightIdCol,
      if (toleranceMs > 0) Some(toleranceMs) else None, prefix)

  /** Aligned per-key tick grid shared by [[fillForward]] and
    * [[fillInterpolate]]: ceil-align the low bound, floor-align the
    * high (pmod keeps both correct for negative timestamps); the
    * runaway-grid guard lives INSIDE the exploded expression (the data
    * path), so projection pruning cannot optimize the raise_error
    * away. `rows` must carry (keyName, tsName as long); returns
    * (keyName, tsName = tick).
    */
  private def alignedGrid(
      rows: DataFrame,
      keyName: String,
      tsName: String,
      stepMs: Long,
      opName: String): DataFrame = {
    require(stepMs > 0, s"$opName: stepMs must be positive, got $stepMs")
    val maxTicks =
      graft.util.Conf.long(rows.sparkSession, "graft.fillforward.maxTicksPerKey", 1000000L)
    val bounds = rows.groupBy(col(keyName))
      .agg(min(col(tsName)).as("__lo"), max(col(tsName)).as("__hi"))
      .withColumn("__lo", col("__lo") + pmod(-col("__lo"), lit(stepMs)))
      .withColumn("__hi", col("__hi") - pmod(col("__hi"), lit(stepMs)))
    val ticks =
      when((col("__hi") - col("__lo")) / lit(stepMs.toDouble) + 1 > maxTicks,
        raise_error(concat(
          lit(s"$opName: a key needs more than $maxTicks ticks at stepMs=$stepMs " +
            s"(span "), (col("__hi") - col("__lo")).cast("string"),
          lit("); raise stepMs or graft.fillforward.maxTicksPerKey"))).cast("array<long>"))
      .when(col("__lo") <= col("__hi"), sequence(col("__lo"), col("__hi"), lit(stepMs)))
      .otherwise(array().cast("array<long>"))
    bounds.select(col(keyName), explode(ticks).as(tsName))
  }

  /** Regular time-grid resampling with last-observation-carried-forward
    * (the "fill-forward" of feature-store / telemetry pipelines): one
    * row per (key, aligned grid tick) between each key's first and last
    * observation, carrying the latest observation at or before the tick
    * (within `tolerance`, like [[asofJoin]]). Ticks align to multiples
    * of `stepMs` (pmod-based, so pre-epoch timestamps align correctly
    * too); a key whose span contains no aligned tick emits nothing.
    *
    * Built directly on [[asofJoin]]: the grid (one bounds aggregation +
    * a sequence explode) is the left side, so the whole operator stays
    * the one-shuffle union-window shape. Tick count per key is bounded
    * by `graft.fillforward.maxTicksPerKey` (default 1,000,000) with
    * remediation — a mis-set step cannot silently explode the grid.
    *
    * Output: (keyCol, tsCol = the tick, `{prefix}ts`, `{prefix}c` per
    * value column).
    */
  def fillForward(
      obs: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      idCol: String,
      stepMs: Long,
      tolerance: Option[Long] = None,
      prefix: String = "asof_"): DataFrame = {
    val grid = alignedGrid(
      obs.select(col(keyCol), col(tsCol).cast("long").as(tsCol)),
      keyCol, tsCol, stepMs, "fillForward")
    asofJoin(grid, obs.select((keyCol +: tsCol +: idCol +: valueCols).distinct.map(col): _*),
      keyCol, tsCol, valueCols, idCol, tolerance, strict = false, prefix = prefix)
  }

  /** [[fillForward]]'s interpolating sibling: one row per aligned grid
    * tick carrying the LINEAR INTERPOLATION between the nearest
    * observations on each side — telemetry/feature resampling where a
    * step function is too coarse. Same union machinery and the SAME
    * single exchange: the previous observation rides the running
    * `last(ignoreNulls)` window and the next one a `first(ignoreNulls)`
    * over the FOLLOWING frame of the identical (partition, ordering) —
    * Catalyst plans both frames over one sort. A tick at an exact
    * observation (or at the span's last aligned point) returns that
    * observation's value. Value column is double; output
    * (keyCol, tsCol, prev_ts, next_ts, value).
    */
  def fillInterpolate(
      obs: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      idCol: String,
      stepMs: Long): DataFrame = {
    val reserved = Set("prev_ts", "next_ts", "value")
    Seq(keyCol, tsCol).foreach(c => require(!reserved(c),
      s"fillInterpolate: '$c' collides with a fixed output column " +
        "(prev_ts/next_ts/value); rename it before resampling"))
    val o = obs.select(col(keyCol).as("__k"), col(tsCol).cast("long").as("__ts"),
      lit(0).as("__side"), col(idCol).cast("long").as("__rid"),
      col(valueCol).cast("double").as("__v"))
    val grid = alignedGrid(o.select(col("__k"), col("__ts")),
        "__k", "__ts", stepMs, "fillInterpolate")
      .select(col("__k"), col("__ts"),
        lit(1).as("__side"), lit(0L).as("__rid"), lit(null).cast("double").as("__v"))
    val u = o.unionByName(grid)
    val ord = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"), col("__rid"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val snap = struct(col("__ts").as("ts"), col("__v").as("v"))
    val carried = u
      .withColumn("__p", last(when(col("__side") === 0, snap), ignoreNulls = true).over(wPrev))
      .withColumn("__n", first(when(col("__side") === 0, snap), ignoreNulls = true).over(wNext))
      .where(col("__side") === 1)
    carried.select(
      col("__k").as(keyCol), col("__ts").as(tsCol),
      col("__p.ts").as("prev_ts"), col("__n.ts").as("next_ts"),
      when(col("__n.ts").isNull || col("__n.ts") === col("__p.ts"), col("__p.v"))
        .otherwise(col("__p.v") + (col("__n.v") - col("__p.v")) *
          (col("__ts") - col("__p.ts")) / (col("__n.ts") - col("__p.ts")))
        .as("value"))
  }

  /** py4j-friendly variant of [[fillForward]]: `toleranceMs <= 0` means
    * no tolerance (same Integer-boxing rationale as [[asofJoinMs]]).
    */
  def fillForwardMs(
      obs: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      idCol: String,
      stepMs: Long,
      toleranceMs: Long,
      prefix: String): DataFrame =
    fillForward(obs, keyCol, tsCol, valueCols, idCol, stepMs,
      if (toleranceMs > 0) Some(toleranceMs) else None, prefix)

  /** py4j-friendly variant of [[asofJoin]]: `toleranceMs <= 0` means no
    * tolerance. py4j boxes python ints as Integer, which an
    * `Option[Long]` cannot unbox (CLAUDE.md rule 7); a plain long
    * parameter widens fine.
    */
  def asofJoinMs(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      rightIdCol: String,
      toleranceMs: Long,
      strict: Boolean,
      prefix: String): DataFrame =
    asofJoin(left, right, keyCol, tsCol, rightCols, rightIdCol,
      if (toleranceMs > 0) Some(toleranceMs) else None, strict, prefix)

  /** Backward as-of join: each left row picks the LATEST right row for
    * the same key with `right.ts <= left.ts` (or `<` when
    * `strict = true`), within an optional staleness `tolerance`.
    *
    * Contract details (all deterministic, engine-replayable — the whole
    * join is hash-checked against a SQL replay in q_asof_join):
    *  - `tsCol` must be integer-comparable on both sides (epoch millis as
    *    LONG is the house form — rule-1 discipline: no float ever drives
    *    the ordering). It is cast to long internally.
    *  - Right rows tie-broken by `rightIdCol` ASCENDING — at equal
    *    (key, ts) the HIGHEST id wins (it sorts last in the running
    *    window). Duplicate (key, ts, id) right rows make the winner
    *    non-deterministic; keep (key, ts, id) unique.
    *  - `tolerance`: a match older than `tolerance` ts units yields the
    *    no-match (null) output, same as no prior row at all.
    *  - Output: every left column unchanged, then for each right value
    *    column `c` a `{prefix}c`, plus `{prefix}ts` = the matched right
    *    row's timestamp (null when unmatched/stale).
    *
    * @param left       big side (scanned once, shuffled once by key)
    * @param right      state/snapshot side (same shuffle; typically much
    *                   smaller, but nothing requires it — both sides
    *                   stream through the one exchange)
    * @param keyCol     equi-key present on both sides
    * @param tsCol      event-time column name on both sides (long-castable)
    * @param rightCols  right value columns to carry onto matches
    * @param rightIdCol right tie-break id column (long-castable)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      rightIdCol: String,
      tolerance: Option[Long] = None,
      strict: Boolean = false,
      prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin: rightCols must name at least one column")
    require(tolerance.forall(_ > 0), s"asofJoin: tolerance must be positive, got $tolerance")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith("__asof")),
      "asofJoin: left columns may not start with the reserved prefix __asof")
    require(!rightCols.contains("__ts"),
      "asofJoin: right column '__ts' collides with the carried struct's " +
        "internal timestamp field; rename it before joining")
    val outNames = (s"${prefix}ts" +: rightCols.map(prefix + _))
    require(outNames.intersect(leftCols).isEmpty,
      s"asofJoin: output columns ${outNames.intersect(leftCols).mkString(", ")} " +
        s"collide with left columns — pick a different prefix")

    // Tag and union. Right rows sort BEFORE left rows at equal ts for the
    // inclusive join (a snapshot AT t is visible to an event AT t) and
    // AFTER them for the strict one; among right rows the id breaks ties.
    val rSide = if (strict) 2 else 0
    val l = left.select(
      col(keyCol).as("__asof_k"),
      col(tsCol).cast("long").as("__asof_ts"),
      lit(1).as("__asof_side"),
      lit(0L).as("__asof_rid"),
      struct(leftCols.map(col): _*).as("__asof_l"))
    val r = right.select(
      col(keyCol).as("__asof_k"),
      col(tsCol).cast("long").as("__asof_ts"),
      lit(rSide).as("__asof_side"),
      col(rightIdCol).cast("long").as("__asof_rid"),
      struct(col(tsCol).cast("long").as("__ts") +: rightCols.map(col): _*).as("__asof_r"))
    val u = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_ts"), col("__asof_side"), col("__asof_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__asof_m", last(col("__asof_r"), ignoreNulls = true).over(w))

    val fresh = tolerance match {
      case Some(tol) =>
        when(col("__asof_ts") - col("__asof_m.__ts") <= tol, col("__asof_m"))
      case None => col("__asof_m")
    }
    carried
      .where(col("__asof_side") === 1)
      .withColumn("__asof_f", fresh)
      .select(leftCols.map(c => col(s"__asof_l.$c").as(c)) ++
        (col(s"__asof_f.__ts").as(s"${prefix}ts") +:
          rightCols.map(c => col(s"__asof_f.$c").as(s"$prefix$c"))): _*)
  }
}
