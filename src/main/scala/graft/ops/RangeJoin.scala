package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: match each point row to the
  * interval rows of the same key that contain it — event-to-session
  * attribution, crawl-window filtering, experiment-exposure joins.
  * Spark has no native range join: the naive formulation
  * (`p JOIN i ON p.k = i.k AND p.ts BETWEEN i.lo AND i.hi`) plans the
  * inequality as a per-key pair filter — a BroadcastNestedLoop or a
  * sort-merge whose per-key group degenerates to points × intervals.
  *
  * This operator uses the BUCKETED form instead: pick a bucket width,
  * tag each point with its bucket (one expression), explode each
  * interval to the buckets it overlaps, and equi-join on (key, bucket)
  * with the exact containment as a cheap post-filter. The join is a
  * plain hash/sort-merge equi-join — the shape that scales — and the
  * fan-out is bounded: an interval adds ceil(span / width) + 1 rows, so
  * with `width` at the typical interval length the interval side grows
  * by ~2x. A degenerate interval (span >> width) is refused with
  * remediation (`graft.rangejoin.maxBucketsPerInterval`, default 4096)
  * rather than silently exploding.
  *
  * The whole chain is deterministic, engine-portable integer math, and
  * the ORACLE is the naive inequality join itself — an INDEPENDENT
  * formulation, not a replay (q_range_join).
  */
object RangeJoin {

  /** Inner range join. Points carry (`keyCol`, `tsCol`); intervals carry
    * (`keyCol`, `loCol`, `hiCol`) with lo <= ts <= hi containment, all
    * long-castable (epoch millis is the house form). Every point column
    * passes through; interval columns ride prefixed with `prefix`.
    * Points matching k intervals emit k rows; unmatched points emit
    * none (use [[AsofJoin.asofJoin]] for enrich-with-latest semantics).
    *
    * @param widthMs bucket width in ts units — set it near the TYPICAL
    *                interval span: too small fans intervals out, too
    *                large packs unrelated rows into one bucket and the
    *                post-filter does the work.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      tsCol: String,
      loCol: String,
      hiCol: String,
      widthMs: Long,
      prefix: String = "ivl_"): DataFrame = {
    require(widthMs > 0, s"rangeJoin: widthMs must be positive, got $widthMs")
    val ivlCols = intervals.columns.toSeq
    val ptCols = points.columns.toSeq
    val outIvl = ivlCols.filterNot(_ == keyCol)
    require(outIvl.map(prefix + _).intersect(ptCols).isEmpty,
      s"rangeJoin: prefixed interval columns collide with point columns — change prefix")
    require(!ptCols.exists(_.startsWith("__rj")),
      "rangeJoin: point columns may not start with the reserved prefix __rj")

    val spark = points.sparkSession
    val maxBuckets = graft.util.Conf.long(spark, "graft.rangejoin.maxBucketsPerInterval", 4096L)
    // Rename the whole interval side up front so the equi-join is by
    // plain (distinct) column names — no attribute-id tricks that break
    // when intervals derive from the points frame (session attribution).
    val iv0 = intervals.select(
      col(keyCol).as("__rj_ik") +: outIvl.map(c => col(c).as(prefix + c)): _*)
      .withColumn("__rj_lo", col(prefix + loCol).cast("long"))
      .withColumn("__rj_hi", col(prefix + hiCol).cast("long"))
      .withColumn("__rj_nb", expr(s"(__rj_hi div ${widthMs}L) - (__rj_lo div ${widthMs}L) + 1L"))
    // ceil(span/width)+1 buckets per interval; an INVERTED interval
    // (hi < lo, nb < 1) contains no point — emit zero buckets, matching
    // BETWEEN semantics, instead of letting sequence() infer a negative
    // step and materialize a huge descending array; an over-wide span is
    // refused (the raise_error rides the data path, so projection
    // pruning cannot elide the guard)
    val buckets =
      when(col("__rj_nb") > maxBuckets,
        raise_error(concat(
          lit(s"rangeJoin: an interval spans more than $maxBuckets buckets at width " +
            s"$widthMs (span "), (col("__rj_hi") - col("__rj_lo")).cast("string"),
          lit(s"); raise widthMs or graft.rangejoin.maxBucketsPerInterval")))
          .cast("array<long>"))
      .when(col("__rj_nb") >= 1,
        sequence(expr(s"__rj_lo div ${widthMs}L"),
          expr(s"__rj_lo div ${widthMs}L") + col("__rj_nb") - 1))
      .otherwise(array().cast("array<long>"))
    val ivlExploded = iv0
      .withColumn("__rj_ib", explode(buckets))
      .drop("__rj_nb")
    val pts = points.withColumn("__rj_pb", expr(s"cast($tsCol as long) div ${widthMs}L"))

    pts.join(ivlExploded, col(keyCol) === col("__rj_ik") && col("__rj_pb") === col("__rj_ib"))
      .where(col(tsCol).cast("long").between(col("__rj_lo"), col("__rj_hi")))
      .select(ptCols.map(col) ++ outIvl.map(c => col(prefix + c)): _*)
  }
}
