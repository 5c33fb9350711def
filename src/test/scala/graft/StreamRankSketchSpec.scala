package graft

import graft.ops.GroupedQuantileSketch
import graft.streaming.StreamRankSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-20 wave 2: the streaming windowed rank sketch. The load-bearing
  * pin is stream == batch == grouped-build parity (emitted per-window
  * summaries are a pure function of the window's row multiset,
  * independent of batch boundaries), plus bounded-state behavior at
  * group sizes far above s, watermark close-out semantics, and the
  * shared null/type policies.
  */
class StreamRankSketchSpec extends SparkSpec {

  import spark.implicits._

  private val t0 = 1700000000000L
  private def ts(minOff: Int) = new java.sql.Timestamp(t0 + minOff * 60000L)

  /** The batch reference: GroupedQuantileSketch over the same rows with
    * the window start as the group (the operator doc's composition).
    */
  private def batchSummaries(rows: Seq[(java.sql.Timestamp, Long, Long)],
      s: Int, seed: String): Set[(Long, Long, Long)] = {
    val df = rows.toDF("ts", "id", "v")
      .withColumn("w", window(col("ts"), "10 minutes"))
      .select(unix_millis(col("w.start")).as("ws"), col("id"), col("v"))
    GroupedQuantileSketch.buildGrouped(df, Seq("ws"), "id", "v", s, seed)
      .summary.select("ws", "rk", "value")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("streamed per-window summaries equal the grouped batch build; " +
    "windows emit exactly once on watermark close-out") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(71)
    // two 10-minute windows split across two batches so window 0's
    // bottom-k is cut across batch boundaries. batch1 stays inside
    // window 0 (watermark after it: minute 4, both windows open);
    // batch2's earliest event (minute 5) is past that watermark, so
    // nothing is late-dropped and the stream sees every row the batch
    // reference sees.
    val batch1 = Seq.tabulate(300)(i =>
      (ts(rnd.nextInt(10)), i.toLong, rnd.nextInt(5000).toLong))
    val batch2 = Seq.tabulate(200)(i =>
      (ts(5 + rnd.nextInt(15)), 1000L + i, rnd.nextInt(5000).toLong))
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = StreamRankSketch.windowedBottomK(
      mem.toDS().toDF("ts", "id", "v"), "ts", "id", "v",
      windowDuration = "10 minutes", watermark = "5 minutes",
      s = 16, seed = "srs")
    val q = out.writeStream.format("memory").queryName("rank_sketch_stream")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // sweep the watermark far past both windows: both close and emit
      mem.addData((ts(120), 999999L, 1L))
      q.processAllAvailable()
      mem.addData((ts(130), 999998L, 1L)) // extra trigger fires the timeouts
      q.processAllAvailable()
      val emitted = spark.table("rank_sketch_stream")
        .select("windowStartMs", "rk", "value")
        .as[(Long, Long, Long)].collect()
      val got = emitted.toSet
      assert(emitted.length == got.size, "a window emitted more than once")
      val want = batchSummaries(batch1 ++ batch2, 16, "srs")
        .filter(_._1 < t0 + 20 * 60000L) // the sweep rows' window is still open
      assert(got == want)
      // n rides on every row: the window's TOTAL folded count, not the
      // sample size (scaled ranks need it downstream)
      val ns = spark.table("rank_sketch_stream")
        .select("windowStartMs", "n").distinct()
        .as[(Long, Long)].collect().toMap
      // tumbling windows align to the EPOCH, not to the data's start
      val trueCounts = (batch1 ++ batch2).groupBy(r =>
        r._1.getTime / 600000L * 600000L).view.mapValues(_.size.toLong)
      ns.foreach { case (ws, n) => assert(n == trueCounts(ws), s"window $ws n") }
      // stream-to-batch composition: rebuild the grouped sketch from the
      // emitted rows; scaled ranks equal the direct grouped build's
      val rebuilt = GroupedQuantileSketch.fromWindowSummaries(
        spark.table("rank_sketch_stream"), 16, "srs")
      val df = (batch1 ++ batch2).toDF("ts", "id", "v")
        .withColumn("w", window(col("ts"), "10 minutes"))
        .select(unix_millis(col("w.start")).as("windowStartMs"),
          col("id"), col("v"))
        .where(col("windowStartMs") < t0 + 20 * 60000L)
      val direct = GroupedQuantileSketch.buildGrouped(
        df, Seq("windowStartMs"), "id", "v", 16, "srs")
      val thr = 2500L
      assert(rebuilt.rankOf(thr).as[(Long, Long)].collect().toMap ==
        direct.rankOf(thr).as[(Long, Long)].collect().toMap)
      assert(rebuilt.quantiles(Seq(50)).select("windowStartMs", "value")
        .as[(Long, Long)].collect().toMap ==
        direct.quantiles(Seq(50)).select("windowStartMs", "value")
          .as[(Long, Long)].collect().toMap)
      // windowEndMs rides along correctly (tumbling 10 minutes)
      val ends = spark.table("rank_sketch_stream")
        .select("windowStartMs", "windowEndMs")
        .as[(Long, Long)].collect().toSet
      assert(ends.forall { case (s0, e) => e == s0 + 10 * 60000L })
    } finally q.stop()
  }

  test("batch mode (declarative map-side cut) equals the grouped build at " +
    "group sizes >> s") {
    val rnd = new scala.util.Random(72)
    // windows with hundreds of rows vs s=16: the batch path must cut
    // exactly what the grouped-sketch window cut produces
    val rows = Seq.tabulate(5000)(i =>
      (ts(rnd.nextInt(28)), i.toLong, rnd.nextLong() % 100000L))
    val got = StreamRankSketch.windowedBottomK(
      rows.toDF("ts", "id", "v"), "ts", "id", "v",
      "10 minutes", "5 minutes", s = 16, seed = "srb")
      .select("windowStartMs", "rk", "value")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == batchSummaries(rows, 16, "srb"))
    assert(got.groupBy(_._1).forall(_._2.size == 16))
  }

  test("double variant: streamed summaries equal the grouped DOUBLE build " +
    "(sortable-bits ride inverts bit-exactly); NaN/-0.0 policy holds") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(73)
    val batch1 = Seq.tabulate(200)(i =>
      (ts(rnd.nextInt(10)), i.toLong, rnd.nextDouble() * 100 - 50))
    val batch2 = Seq.tabulate(150)(i =>
      (ts(5 + rnd.nextInt(15)), 1000L + i, rnd.nextDouble() * 100 - 50))
    val special = Seq((ts(3), 5000L, -0.0), (ts(3), 5001L, Double.NaN))
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val out = StreamRankSketch.windowedBottomKDouble(
      mem.toDS().toDF("ts", "id", "v"), "ts", "id", "v",
      "10 minutes", "5 minutes", s = 16, seed = "srd")
    val q = out.writeStream.format("memory").queryName("rank_sketch_dstream")
      .outputMode("append").start()
    try {
      mem.addData(batch1 ++ special: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      mem.addData((ts(120), 999999L, 1.0))
      q.processAllAvailable()
      mem.addData((ts(130), 999998L, 1.0))
      q.processAllAvailable()
      val got = spark.table("rank_sketch_dstream")
        .select("windowStartMs", "rk", "value")
        .as[(Long, Long, Double)].collect().toSet
      // batch reference: the grouped DOUBLE build over the same rows
      // with the window start as the group (NaN excluded by the build)
      val df = (batch1 ++ special ++ batch2).toDF("ts", "id", "v")
        .withColumn("w", window(col("ts"), "10 minutes"))
        .select(unix_millis(col("w.start")).as("ws"), col("id"), col("v"))
      val want = GroupedQuantileSketch.buildGroupedDouble(
          df, Seq("ws"), "id", "v", 16, "srd")
        .summary.select("ws", "rk", "value")
        .as[(Long, Long, Double)].collect().toSet
        .filter(_._1 < t0 + 20 * 60000L)
      assert(got == want)
      // the NaN row never entered; any emitted zero is +0.0
      assert(got.forall(r => !r._3.isNaN))
      got.filter(_._3 == 0.0).foreach(r => assert(1.0 / r._3 > 0))
    } finally q.stop()
  }

  test("double variant batch mode == grouped double build; integral column " +
    "refuses with the typed redirect") {
    val rnd = new scala.util.Random(74)
    val rows = Seq.tabulate(3000)(i =>
      (ts(rnd.nextInt(28)), i.toLong, rnd.nextDouble() * 1000))
    val got = StreamRankSketch.windowedBottomKDouble(
      rows.toDF("ts", "id", "v"), "ts", "id", "v",
      "10 minutes", "5 minutes", s = 16, seed = "srb2")
      .select("windowStartMs", "rk", "value")
      .as[(Long, Long, Double)].collect().toSet
    val df = rows.toDF("ts", "id", "v")
      .withColumn("w", window(col("ts"), "10 minutes"))
      .select(unix_millis(col("w.start")).as("ws"), col("id"), col("v"))
    val want = GroupedQuantileSketch.buildGroupedDouble(
        df, Seq("ws"), "id", "v", 16, "srb2")
      .summary.select("ws", "rk", "value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(intercept[IllegalArgumentException] {
      StreamRankSketch.windowedBottomKDouble(
        Seq((ts(1), 1L, 2L)).toDF("ts", "id", "v"),
        "ts", "id", "v", "10 minutes", "5 minutes", 16, "x")
    }.getMessage.contains("long entry point"))
  }

  test("by-group variant: streamed (window x group) summaries equal the " +
    "grouped build on (ws, group); null group retained; n per stratum; " +
    "fromWindowGroupSummaries rebuilds scaled ranks") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(75)
    val langs = Array("en", "de", null)
    def mk(off: Int, idBase: Long, cnt: Int) = Seq.tabulate(cnt)(i =>
      (ts(off + rnd.nextInt(10)), idBase + i, langs(rnd.nextInt(3)),
        rnd.nextInt(5000).toLong))
    val batch1 = mk(0, 0L, 300)
    val batch2 = mk(5, 1000L, 200)
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val out = StreamRankSketch.windowedBottomKByGroup(
      mem.toDS().toDF("ts", "id", "g", "v"), "ts", "g", "id", "v",
      "10 minutes", "5 minutes", s = 16, seed = "srg")
    val q = out.writeStream.format("memory").queryName("rank_sketch_gstream")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      mem.addData((ts(120), 999999L, "en", 1L))
      q.processAllAvailable()
      mem.addData((ts(130), 999998L, "en", 1L))
      q.processAllAvailable()
      val horizon = t0 + 20 * 60000L
      val emitted = spark.table("rank_sketch_gstream")
        .where(col("windowStartMs") < horizon)
      val got = emitted.select("windowStartMs", "group", "rk", "value")
        .as[(Long, String, Long, Long)].collect().toSet
      val df = (batch1 ++ batch2).toDF("ts", "id", "g", "v")
        .withColumn("w", window(col("ts"), "10 minutes"))
        .select(unix_millis(col("w.start")).as("ws"), col("g"),
          col("id"), col("v"))
      val direct = GroupedQuantileSketch.buildGrouped(
        df, Seq("ws", "g"), "id", "v", 16, "srg")
      val want = direct.summary.select("ws", "g", "rk", "value")
        .as[(Long, String, Long, Long)].collect().toSet
        .filter(_._1 < horizon)
      assert(got == want)
      assert(got.exists(_._2 == null), "null group must be retained")
      // rebuilt scaled ranks == direct grouped build's (null-safe keys)
      val rebuilt = GroupedQuantileSketch.fromWindowGroupSummaries(
        emitted.toDF(), 16, "srg")
      def ranks(sk: GroupedQuantileSketch) = sk.rankOf(2500L)
        .as[(Long, String, Long)].collect()
        .map(r => (r._1, Option(r._2), r._3)).toSet
      val directClosed = GroupedQuantileSketch.buildGrouped(
        df.where(col("ws") < horizon)
          .withColumnRenamed("ws", "windowStartMs")
          .withColumnRenamed("g", "group"),
        Seq("windowStartMs", "group"), "id", "v", 16, "srg")
      assert(ranks(rebuilt) == ranks(directClosed))
    } finally q.stop()
  }

  test("by-group double variant batch mode == grouped double build on " +
    "(ws, group)") {
    val rnd = new scala.util.Random(76)
    val rows = Seq.tabulate(2000)(i =>
      (ts(rnd.nextInt(28)), i.toLong, Seq("a", "b")(rnd.nextInt(2)),
        rnd.nextDouble() * 100))
    val got = StreamRankSketch.windowedBottomKByGroupDouble(
      rows.toDF("ts", "id", "g", "v"), "ts", "g", "id", "v",
      "10 minutes", "5 minutes", s = 16, seed = "srgd")
      .select("windowStartMs", "group", "rk", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    val df = rows.toDF("ts", "id", "g", "v")
      .withColumn("w", window(col("ts"), "10 minutes"))
      .select(unix_millis(col("w.start")).as("ws"), col("g"),
        col("id"), col("v"))
    val want = GroupedQuantileSketch.buildGroupedDouble(
        df, Seq("ws", "g"), "id", "v", 16, "srgd")
      .summary.select("ws", "g", "rk", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("TIMESTAMP_NTZ event time streams (rule-3 drift): the cast-normalized " +
    "watermark path accepts what the batch path accepts") {
    // the real parquet testdata carries ts as TIMESTAMP_NTZ; before the
    // r20 fix the STREAMING path failed the In.ts encoder upcast while
    // batch worked — pin both paths on an NTZ source
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
    val rows = Seq.tabulate(100)(i =>
      (base.plusMinutes(i % 9), i.toLong, (i * 7L) % 500L))
    val mem = MemoryStream[(java.time.LocalDateTime, Long, Long)]
    assert(mem.toDS().toDF("ts", "id", "v").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val out = StreamRankSketch.windowedBottomK(
      mem.toDS().toDF("ts", "id", "v"), "ts", "id", "v",
      "10 minutes", "5 minutes", s = 16, seed = "ntz")
    val q = out.writeStream.format("memory").queryName("rank_sketch_ntz")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((base.plusMinutes(600), 9999L, 1L))
      q.processAllAvailable()
      mem.addData((base.plusMinutes(700), 9998L, 1L))
      q.processAllAvailable()
      // the second sweep closes the first sweep row's own window too —
      // compare only the data windows (first 9 minutes)
      val horizon = java.sql.Timestamp.valueOf(base.plusMinutes(20)).getTime
      val got = spark.table("rank_sketch_ntz")
        .select("windowStartMs", "rk", "value")
        .as[(Long, Long, Long)].collect().toSet
        .filter(_._1 < horizon)
      val batch = StreamRankSketch.windowedBottomK(
        rows.toDF("ts", "id", "v"), "ts", "id", "v",
        "10 minutes", "5 minutes", 16, "ntz")
        .select("windowStartMs", "rk", "value")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("null ts/id/value rows are excluded; fractional value column refuses " +
    "with the sortable-bits redirect; s bounds refuse") {
    val rows = Seq[(java.sql.Timestamp, java.lang.Long, java.lang.Long)](
      (ts(1), 1L, 10L), (null, 2L, 20L), (ts(2), null, 30L),
      (ts(3), 4L, null), (ts(4), 5L, 50L)).toDF("ts", "id", "v")
    val got = StreamRankSketch.windowedBottomK(
      rows, "ts", "id", "v", "10 minutes", "5 minutes", 16, "srn")
      .select("value").as[Long].collect().sorted
    assert(got.toSeq == Seq(10L, 50L))
    assert(intercept[IllegalArgumentException] {
      StreamRankSketch.windowedBottomK(
        Seq((ts(1), 1L, 2.5)).toDF("ts", "id", "v"),
        "ts", "id", "v", "10 minutes", "5 minutes", 16, "x")
    }.getMessage.contains("windowedBottomKDouble"))
    assert(intercept[IllegalArgumentException] {
      StreamRankSketch.windowedBottomK(
        rows, "ts", "id", "v", "10 minutes", "5 minutes", 8, "x")
    }.getMessage.contains("s must be in [16, 65536]"))
  }
}
