package graft

import graft.ops.{AsofJoin, Sampling}
import graft.streaming.EventOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-14 wave 2: broadcast as-of lookup (incl. stream parity), the
  * native session_window sibling, and the temporal embargo split.
  */
class TemporalWave2Spec extends SparkSpec {
  import spark.implicits._

  private def events = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")

  private def evMs: DataFrame = events.select(col("event_id"), col("user_id"),
    unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
    col("event_type"), col("value"))

  test("asofLookup equals asofJoin on real events") {
    val snaps = evMs.where(col("event_type") === "purchase")
      .select(col("event_id").as("snap_id"), col("user_id"), col("ts_ms"),
        col("value").as("pv"))
    val lefts = evMs.where(col("event_type") =!= "purchase")
    def key(r: org.apache.spark.sql.Row) = r.getLong(r.fieldIndex("event_id"))
    def m(r: org.apache.spark.sql.Row) =
      (Option(r.get(r.fieldIndex("asof_ts"))), Option(r.get(r.fieldIndex("asof_pv"))))
    val viaJoin = AsofJoin.asofJoin(lefts, snaps, "user_id", "ts_ms", Seq("pv"),
        "snap_id", tolerance = Some(86400000L))
      .collect().map(r => key(r) -> m(r)).toMap
    val viaLookup = AsofJoin.asofLookup(lefts, snaps, "user_id", "ts_ms", "pv",
        "snap_id", tolerance = Some(86400000L))
      .collect().map(r => key(r) -> m(r)).toMap
    assert(viaJoin == viaLookup)
    assert(viaLookup.values.exists(_._1.nonEmpty) && viaLookup.values.exists(_._1.isEmpty),
      "fixture must exercise both matched and unmatched rows")
  }

  test("asofLookup duplicate-(key,ts) snapshots resolve to the highest id") {
    val lefts = Seq((1L, 1L, 10L)).toDF("event_id", "k", "ts")
    val snaps = Seq((1L, 1L, 10L, 5.0), (2L, 1L, 10L, 9.0)).toDF("snap_id", "k", "ts", "pv")
    val got = AsofJoin.asofLookup(lefts, snaps, "k", "ts", "pv", "snap_id").collect().head
    assert(got.getDouble(got.fieldIndex("asof_pv")) == 9.0)
  }

  test("asofLookup is stream-safe with exact batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val snaps = evMs.where(col("event_type") === "purchase")
      .select(col("event_id").as("snap_id"), col("user_id"), col("ts_ms"),
        col("value").as("pv"))
    val leftRows = evMs.where(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts_ms").limit(200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val stream = MemoryStream[(Long, Long, Long)]
    stream.addData(leftRows.toIndexedSeq: _*)
    val streamDf = stream.toDF().toDF("event_id", "user_id", "ts_ms")
    val out = AsofJoin.asofLookup(streamDf, snaps, "user_id", "ts_ms", "pv", "snap_id")
    val q = out.writeStream.format("memory").queryName("asof_lookup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("asof_lookup_stream")
      .collect().map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("asof_ts"))), Option(r.get(r.fieldIndex("asof_pv"))))).toSet
    val batch = AsofJoin.asofLookup(
        leftRows.toSeq.toDF("event_id", "user_id", "ts_ms"),
        snaps, "user_id", "ts_ms", "pv", "snap_id")
      .collect().map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("asof_ts"))), Option(r.get(r.fieldIndex("asof_pv"))))).toSet
    assert(streamed == batch)
  }

  test("asofLookup refuses an over-cap snapshot side with remediation") {
    spark.conf.set("graft.asof.maxBroadcastRows", "3")
    try {
      val snaps = Seq((1L, 1L, 1L, 1.0), (2L, 1L, 2L, 1.0), (3L, 1L, 3L, 1.0),
        (4L, 1L, 4L, 1.0)).toDF("snap_id", "k", "ts", "pv")
      val e = intercept[IllegalArgumentException] {
        AsofJoin.asofLookup(Seq((1L, 1L, 5L)).toDF("event_id", "k", "ts"),
          snaps, "k", "ts", "pv", "snap_id")
      }
      assert(e.getMessage.contains("maxBroadcastRows") && e.getMessage.contains("asofJoin"))
    } finally spark.conf.unset("graft.asof.maxBroadcastRows")
  }

  test("sessionizeNative equals the custom-state sessionize on real events") {
    val ev = events.select(col("user_id"), col("ts"), col("value"))
    val custom = EventOps.sessionize(ev, "user_id", "ts", "value", gapMs = 30 * 60000L)
      .toDF().select(col("key"), col("startMs"), col("endMs"), col("numEvents"),
        round(col("totalValue"), 6).as("tv"))
      .collect().map(_.toSeq).toSet
    val native = EventOps.sessionizeNative(ev, "user_id", "ts", "value", gap = "30 minutes")
      .select(col("key"), col("startMs"), col("endMs"), col("numEvents"),
        round(col("totalValue"), 6).as("tv"))
      .collect().map(_.toSeq).toSet
    assert(native == custom)
    assert(native.nonEmpty)
  }

  test("fillInterpolate linearly interpolates between neighbors, exact at observations") {
    val obs = Seq(
      (1L, 1L, 0L, 0.0), (2L, 1L, 10L, 100.0), (3L, 1L, 25L, 40.0),
      (4L, 2L, 0L, 5.0), (5L, 2L, 30L, 35.0)
    ).toDF("obs_id", "k", "ts", "v")
    val got = AsofJoin.fillInterpolate(obs, "k", "ts", "v", "obs_id", stepMs = 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(r.fieldIndex("prev_ts")),
         Option(r.get(r.fieldIndex("next_ts"))).map(_.asInstanceOf[Long]),
         r.getDouble(r.fieldIndex("value"))))).toMap
    // key 1 ticks 0,10,20: 0 exact; 10 exact (prev = the obs itself);
    // 20 interpolates 100 + (40-100)*(20-10)/(25-10) = 60
    assert(got((1L, 0L))._3 == 0.0)
    assert(got((1L, 10L))._3 == 100.0)
    assert(math.abs(got((1L, 20L))._3 - 60.0) < 1e-12)
    assert(got((1L, 20L))._1 == 10L && got((1L, 20L))._2 == Some(25L))
    // key 2 ticks 0..30: linear ramp 5 -> 35; tick 30 = last obs (next
    // is null there, prev value returned)
    assert(math.abs(got((2L, 10L))._3 - 15.0) < 1e-12)
    assert(math.abs(got((2L, 20L))._3 - 25.0) < 1e-12)
    assert(got((2L, 30L))._3 == 35.0 && got((2L, 30L))._2.isEmpty)
  }

  test("fillInterpolate plans one exchange for both window directions") {
    val obs = Seq((1L, 1L, 0L, 0.0), (2L, 1L, 30L, 3.0)).toDF("obs_id", "k", "ts", "v")
    val plan = AsofJoin.fillInterpolate(obs, "k", "ts", "v", "obs_id", stepMs = 10L)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    // the grid bounds aggregation shuffles once on the key; the union
    // window reuses that partitioning for BOTH frames
    assert(n <= 2 && !plan.contains("BroadcastNestedLoop"), s"plan:\n$plan")
  }

  test("timeSplit classifies train/embargo/test on integer boundaries") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 21L), (4L, 25L), (5L, 26L), (6L, 100L))
      .toDF("id", "ts")
    val got = Sampling.timeSplit(df, "ts", cutoff = 20L, embargo = 5L)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test", 6L -> "test"))
    intercept[IllegalArgumentException] { Sampling.timeSplit(df, "ts", 0L, -1L) }
  }
}
