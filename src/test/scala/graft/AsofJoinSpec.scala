package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.ops.AsofJoin]]: the union-window as-of join against a
  * brute-force per-row reference, tie semantics, tolerance, and the
  * single-exchange plan shape.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left: DataFrame = Seq(
    // (event_id, key, ts)
    (100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 10L), (103L, 1L, 25L),
    (104L, 2L, 3L), // key with no snapshot before it
    (105L, 3L, 50L), // key absent from the right side entirely
    (106L, 1L, 2L) // before every snapshot
  ).toDF("event_id", "k", "ts")

  private def right: DataFrame = Seq(
    // (snap_id, key, ts, state)
    (1L, 1L, 4L, "a"),
    (2L, 1L, 10L, "b"),
    (3L, 1L, 10L, "c"), // same (key, ts) as snap 2 — higher id must win
    (4L, 1L, 20L, "d"),
    (5L, 2L, 7L, "e") // after key 2's only event
  ).toDF("snap_id", "k", "ts", "state")

  /** Brute force: for each left row, filter-and-argmax over all right rows. */
  private def expected(strict: Boolean, tol: Option[Long]): Map[Long, Option[(Long, String)]] = {
    val ls = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rs = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ls.map { case (eid, k, ts) =>
      val cand = rs.filter { case (_, rk, rts, _) =>
        rk == k && (if (strict) rts < ts else rts <= ts) &&
          tol.forall(t => ts - rts <= t)
      }
      // latest ts, then highest id
      val best = cand.sortBy { case (rid, _, rts, _) => (rts, rid) }.lastOption
      eid -> best.map { case (_, _, rts, st) => (rts, st) }
    }.toMap
  }

  private def run(strict: Boolean = false, tol: Option[Long] = None): Map[Long, Option[(Long, String)]] =
    AsofJoin.asofJoin(left, right, "k", "ts", Seq("state"), "snap_id",
        tolerance = tol, strict = strict)
      .collect().map { r =>
        val m = if (r.isNullAt(r.fieldIndex("asof_ts"))) None
        else Some((r.getLong(r.fieldIndex("asof_ts")), r.getString(r.fieldIndex("asof_state"))))
        r.getLong(r.fieldIndex("event_id")) -> m
      }.toMap

  test("inclusive as-of matches the brute-force reference (ties: snapshot at t visible at t, highest id wins)") {
    val got = run()
    assert(got == expected(strict = false, tol = None))
    // spot-check the interesting rows
    assert(got(101L) == Some((10L, "c"))) // equal-ts snapshot visible, id 3 beats id 2
    assert(got(102L) == Some((10L, "c"))) // duplicate left rows match identically
    assert(got(106L) == None) // before every snapshot
    assert(got(104L) == None) // snapshot exists but only after the event
    assert(got(105L) == None) // key absent from right side
  }

  test("strict mode hides the equal-ts snapshot") {
    val got = run(strict = true)
    assert(got == expected(strict = true, tol = None))
    assert(got(101L) == Some((4L, "a"))) // 10L snapshots no longer visible at ts=10
  }

  test("tolerance turns stale matches into no-match") {
    val got = run(tol = Some(5L))
    assert(got == expected(strict = false, tol = Some(5L)))
    assert(got(103L) == Some((20L, "d"))) // 25 - 20 = 5 <= tol
    val gotTight = run(tol = Some(4L))
    assert(gotTight(103L) == None) // 25 - 20 = 5 > 4
  }

  test("left columns pass through unchanged and row count is preserved") {
    val out = AsofJoin.asofJoin(left, right, "k", "ts", Seq("state"), "snap_id")
    assert(out.columns.toSeq == Seq("event_id", "k", "ts", "asof_ts", "asof_state"))
    assert(out.count() == left.count())
  }

  test("plan has exactly one exchange (union-window, not a pair join)") {
    val out = AsofJoin.asofJoin(left, right, "k", "ts", Seq("state"), "snap_id")
    val plan = out.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1, s"expected 1 key exchange, got $nExchanges in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of join must not plan a pair blow-up:\n$plan")
  }

  test("null-valued snapshots: lookup and join carry ts + NULL identically") {
    // the null contract both forms document: a snapshot that EXISTS but
    // has a NULL value is still the latest observation — matched, value
    // carried as NULL (r13 rehearsal: the lookup's primitive index used
    // to silently drop these, desyncing the two as-of forms)
    val lefts = Seq((1L, 100L, 10L), (2L, 100L, 2L)).toDF("id", "k", "ts")
    val snaps = Seq((7L, 100L, 5L, Option.empty[Double]), (6L, 100L, 3L, Some(4.5)))
      .toDF("snap_id", "k", "ts", "pv")
    def rowsOf(df: DataFrame) = df.select("id", "asof_ts", "asof_pv")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    val viaLookup = rowsOf(
      AsofJoin.asofLookup(lefts, snaps, "k", "ts", "pv", "snap_id"))
    val viaJoin = rowsOf(
      AsofJoin.asofJoin(lefts, snaps, "k", "ts", Seq("pv"), "snap_id"))
    assert(viaLookup == viaJoin, s"lookup $viaLookup != join $viaJoin")
    // event at ts=10 matches the null-valued snapshot at ts=5: ts set, pv NULL
    assert(viaLookup.head == ((1L, Some(5L), None)))
    // event at ts=2 predates every snapshot: both NULL
    assert(viaLookup(1) == ((2L, None, None)))
  }

  test("output-name collision and empty rightCols are rejected with remediation") {
    val lBad = left.withColumnRenamed("event_id", "asof_state")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(lBad, right, "k", "ts", Seq("state"), "snap_id")
    }
    assert(e.getMessage.contains("prefix"))
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, "k", "ts", Nil, "snap_id")
    }
  }
}
