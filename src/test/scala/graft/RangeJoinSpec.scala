package graft

import graft.ops.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._

/** [[graft.ops.RangeJoin]] and [[graft.ops.AsofJoin.fillForward]]:
  * bucketed containment join vs the naive inequality join, the span
  * guard, and grid resampling semantics.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (100L, 1L, 5L), (101L, 1L, 12L), (102L, 1L, 30L), (103L, 1L, 31L),
    (104L, 2L, 7L), (105L, 3L, 7L)
  ).toDF("event_id", "k", "ts")

  private val intervals = Seq(
    (10L, 1L, 0L, 10L),   // catches 5
    (11L, 1L, 10L, 30L),  // catches 12, 30
    (12L, 1L, 28L, 40L),  // catches 30, 31 (overlaps interval 11)
    (13L, 2L, 8L, 9L)     // catches nothing (104 at 7 is before it)
  ).toDF("ivl_id", "k", "lo", "hi")

  private def naive = points.as("p").join(intervals.as("i"),
      col("p.k") === col("i.k") && col("p.ts").between(col("i.lo"), col("i.hi")))
    .select(col("event_id"), col("ivl_id"))
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed range join equals the naive inequality join across widths") {
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.rangeJoin(points, intervals, "k", "ts", "lo", "hi", widthMs = w)
        .select(col("event_id"), col("ivl_ivl_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w diverged from the naive join")
    }
  }

  test("plan is an equi-join, not a nested loop") {
    val out = RangeJoin.rangeJoin(points, intervals, "k", "ts", "lo", "hi", widthMs = 10L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("an interval spanning too many buckets is refused with remediation") {
    val wide = Seq((1L, 1L, 0L, 10000000L)).toDF("ivl_id", "k", "lo", "hi")
    spark.conf.set("graft.rangejoin.maxBucketsPerInterval", "16")
    try {
      val e = intercept[Exception] {
        RangeJoin.rangeJoin(points, wide, "k", "ts", "lo", "hi", widthMs = 10L).collect()
      }
      assert(e.getMessage.contains("maxBucketsPerInterval") ||
        e.getCause != null && e.getCause.getMessage.contains("maxBucketsPerInterval"))
    } finally spark.conf.unset("graft.rangejoin.maxBucketsPerInterval")
  }

  test("an inverted interval (hi < lo) matches nothing — like BETWEEN — instead of exploding") {
    // pre-fix, sequence() inferred step -1 on the inverted bounds and
    // tried to materialize a huge descending bucket array
    val iv = Seq((1L, 1L, 1000000000000L, 0L), (2L, 1L, 10L, 12L))
      .toDF("ivl_id", "k", "lo", "hi")
    val got = RangeJoin.rangeJoin(points, iv, "k", "ts", "lo", "hi", widthMs = 10L)
      .select("event_id", "ivl_ivl_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((101L, 2L))) // only the valid interval matches (ts=12)
  }

  test("negative timestamps join consistently") {
    val p = Seq((1L, 1L, -25L), (2L, 1L, -5L)).toDF("event_id", "k", "ts")
    val iv = Seq((1L, 1L, -30L, -20L)).toDF("ivl_id", "k", "lo", "hi")
    val got = RangeJoin.rangeJoin(p, iv, "k", "ts", "lo", "hi", widthMs = 7L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("fillForward emits aligned ticks carrying the latest prior observation") {
    val obs = Seq(
      (1L, 1L, 3L, 10.0), (2L, 1L, 14L, 20.0), (3L, 1L, 27L, 30.0),
      (4L, 2L, 5L, 1.0)
    ).toDF("obs_id", "k", "ts", "v")
    val got = AsofJoin.fillForward(obs, "k", "ts", Seq("v"), "obs_id", stepMs = 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (Option(r.get(r.fieldIndex("asof_ts"))).map(_.asInstanceOf[Long]),
         Option(r.get(r.fieldIndex("asof_v"))).map(_.asInstanceOf[Double]))))
      .toMap
    // key 1: span [3, 27] -> ticks 10, 20; key 2: span [5, 5] -> no aligned tick
    assert(got.keySet == Set((1L, 10L), (1L, 20L)))
    assert(got((1L, 10L)) == ((Some(3L), Some(10.0))))
    assert(got((1L, 20L)) == ((Some(14L), Some(20.0))))
    // tolerance: a tick staler than 6 goes null (tick 10 <- obs 3 is 7
    // stale; tick 20 <- obs 14 is exactly 6, kept)
    val tol = AsofJoin.fillForward(obs, "k", "ts", Seq("v"), "obs_id", stepMs = 10L,
        tolerance = Some(6L))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        Option(r.get(r.fieldIndex("asof_v"))).map(_.asInstanceOf[Double]))).toMap
    assert(tol((1L, 10L)).isEmpty)
    assert(tol((1L, 20L)) == Some(20.0))
  }

  test("fillForward refuses a runaway grid with remediation") {
    val obs = Seq((1L, 1L, 0L, 1.0), (2L, 1L, 100000000L, 2.0)).toDF("obs_id", "k", "ts", "v")
    spark.conf.set("graft.fillforward.maxTicksPerKey", "100")
    try {
      val e = intercept[Exception] {
        AsofJoin.fillForward(obs, "k", "ts", Seq("v"), "obs_id", stepMs = 10L).collect()
      }
      assert(e.getMessage.contains("maxTicksPerKey") ||
        e.getCause != null && e.getCause.getMessage.contains("maxTicksPerKey"))
    } finally spark.conf.unset("graft.fillforward.maxTicksPerKey")
  }
}
