package graft

import graft.streaming.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time streaming operators: watermarked windowed aggregation and
  * gap sessionization (flatMapGroupsWithState) over a REAL memory stream,
  * plus the batch degenerations.
  */
class EventOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int) = new java.sql.Timestamp(minute * 60000L)

  test("watermarked windowed aggregation over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventOps.windowedAgg(events, "ts", "event_type", "value",
      window = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      // two windows of events, then advance far enough that the first
      // window is past the watermark and emits
      mem.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(3), "view", 5.0))
      q.processAllAvailable()
      mem.addData((ts(12), "click", 4.0))
      q.processAllAvailable()
      mem.addData((ts(40), "view", 1.0)) // watermark sweeps earlier windows
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("window_start", "event_type", "n", "total_value").collect()
      val clicks0 = rows.find(r =>
        r.getTimestamp(0).getTime == 0L && r.getString(1) == "click")
      assert(clicks0.isDefined, s"first-window clicks missing: ${rows.mkString(";")}")
      assert(clicks0.get.getLong(2) == 2 && clicks0.get.getDouble(3) == 3.0)
    } finally q.stop()
  }

  test("windowedAgg degenerates to a plain groupBy on batch frames") {
    val df = Seq((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(11), "a", 4.0))
      .toDF("ts", "event_type", "value")
    val rows = EventOps.windowedAgg(df, "ts", "event_type", "value", "10 minutes")
      .orderBy("window_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(2) == 2 && rows(1).getLong(2) == 1)
  }

  test("batch sessionization: gap splits sessions, stats accumulate") {
    val df = Seq(
      (7L, ts(0), 1.0), (7L, ts(2), 2.0), (7L, ts(3), 3.0), // session 1
      (7L, ts(30), 5.0), (7L, ts(31), 5.0), // session 2 (27-min gap)
      (9L, ts(1), 10.0)) // other key
      .toDF("user_id", "ts", "value")
    val sessions = EventOps.sessionize(df, "user_id", "ts", "value",
      gapMs = 10 * 60000L).collect().sortBy(s => (s.key, s.startMs))
    assert(sessions.length == 3, s"got ${sessions.toSeq}")
    val s1 = sessions(0)
    assert(s1.key == 7L && s1.numEvents == 3 && s1.totalValue == 6.0)
    assert(s1.startMs == 0L && s1.endMs == 3 * 60000L)
    val s2 = sessions(1)
    assert(s2.numEvents == 2 && s2.totalValue == 10.0)
    assert(sessions(2).key == 9L && sessions(2).numEvents == 1)
  }

  test("streaming sessionization closes sessions via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val sessions = EventOps.sessionize(events, "user_id", "ts", "value",
      gapMs = 5 * 60000L, watermark = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // start at minute 10: an event AT the initial watermark (epoch 0)
      // is dropped as late by the stateful operator's filter
      mem.addData((1L, ts(10), 1.0), (1L, ts(12), 2.0))
      q.processAllAvailable()
      // push the watermark far past the gap: the open session must close
      mem.addData((2L, ts(60), 1.0))
      q.processAllAvailable()
      mem.addData((2L, ts(120), 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
      val s1 = closed.find(_.getLong(0) == 1L)
      assert(s1.isDefined, s"user 1 session must have closed: ${closed.mkString(";")}")
      assert(s1.get.getLong(3) == 2 && s1.get.getDouble(4) == 3.0,
        s"all sessions: ${closed.mkString(";")}")
      assert(s1.get.getLong(1) == 10 * 60000L && s1.get.getLong(2) == 12 * 60000L)
    } finally q.stop()
  }
}
