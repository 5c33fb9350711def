package graft

import graft.ops.{Hll, HllSketch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-19 additions: HyperLogLog register layer — portable register
  * arithmetic (pinned against an independent JVM re-computation and two
  * DuckDB-derived constants), merge/duplicate/null semantics, estimate
  * accuracy vs exact distinct counts, streaming parity, and the
  * geometry-safe persisted handle.
  */
class HllSpec extends SparkSpec {

  import spark.implicits._

  /** Symmetric frame equality: one-sided containment (the old
    * union-distinct-count pattern) would still pass if a merge DROPPED
    * registers — assert both directions plus the cardinality.
    */
  private def assertSameRegisters(got: DataFrame, want: DataFrame): Unit = {
    assert(got.count() == want.count(), "register counts differ")
    assert(got.exceptAll(want).count() == 0, "extra registers in result")
    assert(want.exceptAll(got).count() == 0, "missing registers in result")
  }

  /** Independent re-computation of the register coordinates: raw
    * MessageDigest md5, hex, parse — no Spark expressions, no
    * graft.util.Hashing. Any drift in the expression tree (substring
    * bounds, conv base, bin length identity) fails here.
    */
  private def expectedCoords(key: String, p: Int, seed: String): (Long, Long) = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val bucket = java.lang.Long.parseLong(md5hex(s"$seed:b:$key").take(8), 16) % (1L << p)
    val w = java.lang.Long.parseLong(md5hex(s"$seed:r:$key").take(13), 16)
    val rank = if (w == 0L) 53L else 53L - (64L - java.lang.Long.numberOfLeadingZeros(w))
    (bucket, rank)
  }

  test("register coordinates match an independent md5 re-computation (100 keys) " +
    "and the DuckDB-derived pinned constants") {
    val keys = (1 to 100).map(i => s"key $i with spaces-$i")
    val regs = Hll.build(keys.toDF("k"), "k", p = 11, seed = "pin7")
      .as[(Long, Long)].collect().toMap
    // rebuild the expected register frame (max rank per bucket) locally
    val exp = keys.map(expectedCoords(_, 11, "pin7"))
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(regs == exp)
    // constants computed in DuckDB (round 19):
    //   ('0x'||substr(md5('hll19:b:x'),1,8))::UBIGINT % 512 = 132
    //   w = ('0x'||substr(md5('hll19:r:x'),1,13))::UBIGINT = 1166764123612433
    //   rank = 53 - length(bin(w)) = 2
    assert(expectedCoords("x", 9, "hll19") == ((132L, 2L)))
    val one = Hll.build(Seq("x").toDF("k"), "k", p = 9, seed = "hll19")
      .as[(Long, Long)].collect()
    assert(one.toSeq == Seq((132L, 2L)))
  }

  test("duplicates are free: build over occurrences == build over distinct keys; " +
    "null keys are skipped") {
    val occ = (1 to 5000).map(i => s"tok${i % 37}").toDF("k")
    val dis = (0 until 37).map(i => s"tok$i").toDF("k")
    val a = Hll.build(occ, "k", 10, "d1").as[(Long, Long)].collect().toSet
    val b = Hll.build(dis, "k", 10, "d1").as[(Long, Long)].collect().toSet
    assert(a == b)
    val withNull = occ.unionByName(Seq(null.asInstanceOf[String]).toDF("k"))
    val c = Hll.build(withNull, "k", 10, "d1").as[(Long, Long)].collect().toSet
    assert(c == a)
  }

  test("merge: disjoint halves == one-shot build; merge is idempotent; " +
    "works for both hash modes") {
    for (portable <- Seq(true, false)) {
      val all = (1 to 4000).map(i => s"w$i").toDF("k")
      val h1 = (1 to 2000).map(i => s"w$i").toDF("k")
      val h2 = (2001 to 4000).map(i => s"w$i").toDF("k")
      val full = Hll.build(all, "k", 9, "m3", portable)
      val merged = Hll.merge(
        Hll.build(h1, "k", 9, "m3", portable),
        Hll.build(h2, "k", 9, "m3", portable))
      assertSameRegisters(merged, full)
      val idem = Hll.merge(full, full)
      assertSameRegisters(idem, full)
    }
  }

  test("estimate accuracy: within 5x the theoretical RSE across three decades, " +
    "both hash modes; exact-ish in the linear-counting range") {
    for (portable <- Seq(true, false); n <- Seq(60, 1500, 40000)) {
      val keys = (1 to n).map(i => s"item-$i-$portable").toDF("k")
      val est = Hll.estimate(Hll.build(keys, "k", 12, "acc", portable), 12)
      val rse = 1.04 / math.sqrt(4096.0)
      assert(math.abs(est - n).toDouble / n <= 5 * rse,
        s"portable=$portable n=$n est=$est")
    }
    // tiny cardinality: linear counting is near-exact
    val est5 = Hll.estimate(Hll.build((1 to 5).map(i => s"t$i").toDF("k"),
      "k", 12, "acc"), 12)
    assert(est5 == 5L)
  }

  test("estimateGrouped == per-group estimate; null group is retained") {
    val rows = (1 to 3000).map { i =>
      val g = i % 3 match { case 0 => "en"; case 1 => "de"; case _ => null }
      (g, s"tok${i % (100 * (i % 3 + 1))}")
    }
    val df = rows.toDF("lang", "k")
    val regs = Hll.buildGrouped(df, Seq("lang"), "k", 10, "g1")
    val grouped = Hll.estimateGrouped(regs, Seq("lang"), 10)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(grouped.keySet == Set(Some("en"), Some("de"), None))
    for ((g, est) <- grouped) {
      val slice = g match {
        case Some(l) => df.where(col("lang") === l)
        case None    => df.where(col("lang").isNull)
      }
      val solo = Hll.estimate(Hll.build(slice, "k", 10, "g1"), 10)
      assert(est == solo, s"group $g: grouped $est != solo $solo")
    }
  }

  test("grouped overlap: unionEstimateGrouped / intersectEstimateGrouped == " +
    "the per-group scalar estimates exactly; one-sided groups clamp to 0; " +
    "null group retained") {
    // per group g: A = tokens 1..600+hash spread, B overlaps the top third
    val mk = (lo: Int, hi: Int) => (lo to hi).map(i => i)
    val langs = Seq(Some("en"), Some("de"), None)
    val aRows = langs.flatMap(g => mk(1, 600).map(i => (g.orNull, s"t$i")))
      .toDF("lang", "k")
    val bRows = (langs.flatMap(g => mk(401, 900).map(i => (g.orNull, s"t$i"))) ++
      mk(1, 300).map(i => ("only-b", s"t$i"))).toDF("lang", "k")
    val (p, seed) = (10, "ov")
    val ra = Hll.buildGrouped(aRows, Seq("lang"), "k", p, seed)
    val rb = Hll.buildGrouped(bRows, Seq("lang"), "k", p, seed)
    val uni = Hll.unionEstimateGrouped(ra, rb, Seq("lang"), p)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val inter = Hll.intersectEstimateGrouped(ra, rb, Seq("lang"), p)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(uni.keySet == Set(Some("en"), Some("de"), None, Some("only-b")))
    assert(inter.keySet == uni.keySet)
    for (g <- langs) {
      val sliceA = g match {
        case Some(l) => aRows.where(col("lang") === l)
        case None    => aRows.where(col("lang").isNull)
      }
      val sliceB = g match {
        case Some(l) => bRows.where(col("lang") === l)
        case None    => bRows.where(col("lang").isNull)
      }
      val sa = Hll.build(sliceA, "k", p, seed)
      val sb = Hll.build(sliceB, "k", p, seed)
      assert(uni(g) == Hll.unionEstimate(sa, sb, p), s"union group $g")
      assert(inter(g) == Hll.intersectEstimate(sa, sb, p), s"intersect group $g")
    }
    // group present only in B: union = |B_g| estimate, intersect clamps to 0
    val onlyB = Hll.estimate(
      Hll.build(bRows.where(col("lang") === "only-b"), "k", p, seed), p)
    assert(uni(Some("only-b")) == onlyB)
    assert(inter(Some("only-b")) == 0L)
  }

  test("estimateGroupedStats: integer sufficient statistics match an " +
    "independent register recount; rint(est) == estimateGrouped; " +
    "overlap stats reproduce intersectEstimateGrouped per component") {
    val rows = (1 to 3000).map { i =>
      val g = i % 3 match { case 0 => "en"; case 1 => "de"; case _ => null }
      (g, s"tok${i % (100 * (i % 3 + 1))}")
    }
    val df = rows.toDF("lang", "k")
    val (p, seed) = (10, "g1")
    val regs = Hll.buildGrouped(df, Seq("lang"), "k", p, seed)
    val stats = Hll.estimateGroupedStats(regs, Seq("lang"), p).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getDecimal(2).toBigInteger, r.getDouble(3))).toMap
    val rounded = Hll.estimateGrouped(regs, Seq("lang"), p)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(stats.keySet == rounded.keySet)
    // independent recount of the sufficient statistics from the raw
    // register frame (no Hll estimator code involved)
    val raw = regs.collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    for ((g, (touched, sumscaled, est)) <- stats) {
      val mine = raw.filter(_._1 == g)
      assert(touched == mine.length, s"group $g touched")
      val expSum = mine.map(t => BigInt(1) << (53 - t._3.toInt)).sum
      assert(BigInt(sumscaled) == expSum, s"group $g sumscaled")
      // the long estimator IS rint of the raw double
      assert(math.rint(est).toLong == rounded(g),
        s"group $g: rint(${est}) != ${rounded(g)}")
    }
    // overlap stats: six components match the single-frame stats of the
    // slices, and the continuous estimate is within 1.5 of the
    // per-component-rounded long form (three rints, each ±0.5)
    val even = Hll.buildGrouped(df.where(length(col("k")) % 2 === 0),
      Seq("lang"), "k", p, seed)
    val odd = Hll.buildGrouped(df.where(length(col("k")) % 2 === 1),
      Seq("lang"), "k", p, seed)
    val ov = Hll.intersectEstimateGroupedStats(even, odd, Seq("lang"), p)
      .collect().map(r => Option(r.getString(0)) -> r).toMap
    val ovLong = Hll.intersectEstimateGrouped(even, odd, Seq("lang"), p)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val aStats = Hll.estimateGroupedStats(even, Seq("lang"), p).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDecimal(2))).toMap
    val uStats = Hll.estimateGroupedStats(Hll.merge(even, odd), Seq("lang"), p)
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDecimal(2))).toMap
    for ((g, r) <- ov) {
      assert(r.getLong(1) == aStats(g)._1, s"group $g t_a")
      assert(r.getDecimal(4) == aStats(g)._2, s"group $g s_a")
      assert(r.getLong(3) == uStats(g)._1, s"group $g t_u")
      assert(r.getDecimal(6) == uStats(g)._2, s"group $g s_u")
      assert(math.abs(r.getDouble(7) - ovLong(g)) <= 1.5,
        s"group $g: continuous ${r.getDouble(7)} vs long ${ovLong(g)}")
    }
  }

  test("union estimate is lossless-sketch accurate; intersect estimate tracks " +
    "the true overlap within compounded error; handle forms geometry-check") {
    // |A| = 3000, |B| = 3000, |A ∩ B| = 1000 (keys 2001..3000 shared)
    val a = (1 to 3000).map(i => s"k$i").toDF("k")
    val b = (2001 to 5000).map(i => s"k$i").toDF("k")
    val (p, seed) = (12, "setops")
    val ra = Hll.build(a, "k", p, seed)
    val rb = Hll.build(b, "k", p, seed)
    val rse = 1.04 / math.sqrt((1 << p).toDouble)
    val u = Hll.unionEstimate(ra, rb, p)
    assert(math.abs(u - 5000).toDouble / 5000 <= 5 * rse, s"union est $u")
    val i = Hll.intersectEstimate(ra, rb, p)
    // inclusion-exclusion compounds: tolerance ~ RSE * (|A| + |B| + |A∪B|)
    assert(math.abs(i - 1000).toDouble <= 5 * rse * 11000, s"intersect est $i")
    val sa = HllSketch(ra, p, seed, portableHash = true)
    val sb = HllSketch(rb, p, seed, portableHash = true)
    assert(sa.unionEstimate(sb) == u)
    assert(sa.intersectEstimate(sb) == i)
    assert(intercept[IllegalArgumentException] {
      sa.unionEstimate(HllSketch(rb, p, "other", portableHash = true))
    }.getMessage.contains("geometry mismatch"))
  }

  test("estimate refuses a grouped register frame and an out-of-range p") {
    val df = (1 to 200).map(i => (s"g${i % 9}", s"k$i")).toDF("g", "k")
    val regs = Hll.buildGrouped(df, Seq("g"), "k", 4, "r1")
    val e = intercept[IllegalArgumentException] {
      Hll.estimate(regs.select("bucket", "maxrank"), 4)
    }
    assert(e.getMessage.contains("not a single sketch"))
    // a grouped frame small enough to pass the row-count check still
    // refuses on duplicate buckets (the same keys in both groups make
    // the cross-group bucket collision certain, rows << m at p=10)
    val small = Hll.buildGrouped(
      (1 to 6).map(i => (s"g${i % 2}", s"k${i % 3}")).toDF("g", "k"),
      Seq("g"), "k", 10, "r2")
    assert(intercept[IllegalArgumentException] {
      Hll.estimate(small.select("bucket", "maxrank"), 10)
    }.getMessage.contains("duplicate bucket"))
    // p smaller than the build's: buckets land >= m and refuse. Few
    // enough keys (100) that the row-count check passes and the bucket
    // RANGE check is what fires (all-100-buckets-below-512 has
    // probability 2^-100 over the md5 hash).
    val wide = Hll.build((1 to 100).map(i => s"k$i").toDF("k"), "k", 10, "r3")
    assert(intercept[IllegalArgumentException] {
      Hll.estimate(wide, 9)
    }.getMessage.contains("built with a larger p"))
    val wideG = Hll.buildGrouped(
      (1 to 100).map(i => ("g", s"k$i")).toDF("g", "k"), Seq("g"), "k", 10, "r3")
    val eG = intercept[Exception] {
      Hll.estimateGrouped(wideG, Seq("g"), 9).collect()
    }
    assert(eG.getMessage.contains("inconsistent with p=9"), eG.getMessage)
    assert(intercept[IllegalArgumentException] {
      Hll.build(df, "k", 3, "r1")
    }.getMessage.contains("p must be in [4,16]"))
    assert(intercept[IllegalArgumentException] {
      Hll.build(df, "k", 17, "r1")
    }.getMessage.contains("p must be in [4,16]"))
  }

  test("r20 guards: estimateGrouped refuses duplicate buckets within a " +
    "group; NULL registers refuse self-describingly; reserved group names " +
    "refuse; intersect rewrite refuses concatenated sides") {
    val df = (1 to 200).map(i => (s"g${i % 3}", s"k$i")).toDF("g", "k")
    val regs = Hll.buildGrouped(df, Seq("g"), "k", 6, "dup")
    // concatenating two grouped frames (instead of Hll.merge) duplicates
    // (group, bucket) rows but can stay under m rows per group — the
    // countDistinct guard must fire, not a plausible under-estimate
    val concatenated = regs.unionByName(regs)
    assert(intercept[Exception] {
      Hll.estimateGrouped(concatenated, Seq("g"), 6).collect()
    }.getMessage.contains("duplicate bucket ids within a group"))
    assert(intercept[Exception] {
      Hll.intersectEstimateGrouped(concatenated, regs, Seq("g"), 6).collect()
    }.getMessage.contains("duplicate (group, bucket)"))
    // NULL register coordinates refuse with the structural message, not
    // an NPE at unboxing
    val withNull = regs.select(col("bucket"), col("maxrank"))
      .limit(3).unionByName(
        Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
          .toDF("bucket", "maxrank"))
    assert(intercept[IllegalArgumentException] {
      Hll.estimate(withNull, 6)
    }.getMessage.contains("NULL register coordinates"))
    // reserved group names refuse at every grouped entry point
    Seq("bucket", "maxrank", "est").foreach { bad =>
      assert(intercept[IllegalArgumentException] {
        Hll.buildGrouped(df.withColumnRenamed("g", bad), Seq(bad), "k", 6, "x")
      }.getMessage.contains("collide"), bad)
    }
    assert(intercept[IllegalArgumentException] {
      Hll.estimateGrouped(regs.withColumnRenamed("g", "est")
        .select(col("est"), col("bucket"), col("maxrank")), Seq("est"), 6)
    }.getMessage.contains("collide"))
  }

  test("GroupedHllSketch handle: roundtrip, estimates == functional grouped " +
    "path, per-group overlap, geometry/strata/range refusals") {
    import graft.ops.GroupedHllSketch
    val rows = (1 to 600).map(i =>
      (if (i % 2 == 0) "en" else "de", s"tok-${i % 97}")).toDF("g", "k")
    val sk = GroupedHllSketch.build(rows, "k", Seq("g"), p = 9, seed = "ghll")
    val dir = java.nio.file.Files.createTempDirectory("ghll").toString
    GroupedHllSketch.write(sk, s"$dir/f")
    val back = GroupedHllSketch.read(spark, s"$dir/f")
    assert(back.p == 9 && back.groupCols == Seq("g"))
    val got = back.estimates()
    val want = Hll.estimateGrouped(sk.registers, Seq("g"), 9)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // per-group overlap: self-union == self-estimate per group
    val selfUnion = back.unionEstimates(sk).orderBy("g").collect().toSeq
    val selfEst = want.orderBy("g").collect().toSeq
    assert(selfUnion == selfEst)
    // merge refusals: strata then geometry
    val otherStrata = GroupedHllSketch.build(
      rows.withColumnRenamed("g", "h"), "k", Seq("h"), 9, "ghll")
    val e1 = intercept[IllegalArgumentException](sk.merge(otherStrata))
    assert(e1.getMessage.contains("geometry mismatch"))
    val e2 = intercept[IllegalArgumentException](
      sk.merge(GroupedHllSketch.build(rows, "k", Seq("g"), 10, "ghll")))
    assert(e2.getMessage.contains("geometry mismatch"))
    // foreign bucket range refuses at read
    spark.read.parquet(s"$dir/f/registers")
      .withColumn("bucket", col("bucket") + 512L)
      .write.mode("overwrite").parquet(s"$dir/g/registers")
    val fs = new org.apache.hadoop.fs.Path(s"$dir/f/ghll.json")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/f/ghll.json"),
      new org.apache.hadoop.fs.Path(s"$dir/g/ghll.json"))
    val e3 = intercept[IllegalArgumentException](
      GroupedHllSketch.read(spark, s"$dir/g"))
    assert(e3.getMessage.contains("digest mismatch") ||
      e3.getMessage.contains("outside"))
  }

  test("windowed streaming registers: NTZ stream == batch == per-window " +
    "direct builds; sink rebuild and rollups are exact (max idempotence)") {
    import graft.streaming.StreamSketches
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.LocalDateTime.of(2026, 3, 1, 0, 0)
    val rows = Seq.tabulate(80)(i => (base.plusMinutes(i % 18), s"tok-${i % 29}"))
    val batchDf = rows.toDF("ts", "k")
    assert(batchDf.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val batch = StreamSketches.hllWindowedRegisters(batchDf, "ts", "k",
      "10 minutes", "5 minutes", p = 8, seed = "whll")
    val starts = batch.select("windowStartMs").distinct().as[Long].collect().sorted
    assert(starts.length == 2)
    for (ws <- starts) {
      val winKeys = rows.filter { case (t, _) =>
        val ms = t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        ms >= ws && ms < ws + 600000L
      }.map(_._2)
      assertSameRegisters(
        batch.filter(col("windowStartMs") === ws).select("bucket", "maxrank"),
        Hll.build(winKeys.toDF("k"), "k", 8, "whll"))
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.time.LocalDateTime, String)]
    val out = StreamSketches.hllWindowedRegisters(mem.toDS().toDF("ts", "k"),
      "ts", "k", "10 minutes", "5 minutes", 8, "whll")
    val q = out.writeStream.format("memory").queryName("hll_windowed")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((base.plusMinutes(600), "sweep"))
      q.processAllAvailable()
      val emitted = spark.table("hll_windowed")
        .filter(col("windowStartMs").isin(starts.map(Long.box): _*))
      assert(emitted.exceptAll(batch).count() == 0 &&
        batch.exceptAll(emitted).count() == 0)
      // sink rebuild with duplicated emissions; toGlobal == direct build
      val rebuilt = StreamSketches.hllFromWindowRegisters(
        emitted.union(emitted.limit(5)), 8, "whll")
      assertSameRegisters(rebuilt.toGlobal.registers,
        Hll.build(rows.map(_._2).toDF("k"), "k", 8, "whll"))
      // regroup to one computed stratum == direct grouped build over it
      val hourly = rebuilt.regroup(Seq("hour" ->
        expr("CAST(windowStartMs - pmod(windowStartMs, 3600000) AS BIGINT)")))
      assert(hourly.groupCols == Seq("hour"))
      assert(hourly.estimates().count() == 1) // all windows in one hour
    } finally q.stop()
  }

  test("streaming build: incremental max aggregation equals the batch registers") {
    val all = ((1 to 300).map(i => s"tok${i % 41}") ++
      (1 to 200).map(i => s"tok${i % 83}")).toDF("k")
    val full = Hll.build(all, "k", 8, "s1")
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val regs = Hll.build(stream.toDS().toDF("k"), "k", 8, "s1")
    val query = regs.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      stream.addData((1 to 300).map(i => s"tok${i % 41}"): _*)
      query.processAllAvailable()
      stream.addData((1 to 200).map(i => s"tok${i % 83}"): _*)
      query.processAllAvailable()
      val streamed = spark.table("hll_stream")
      assertSameRegisters(streamed.select("bucket", "maxrank"), full)
    } finally query.stop()
  }

  test("windowed streaming build: per-event-time-window registers from a " +
    "watermarked stream equal the batch build on the same data") {
    // the time-sliced cardinality shape ("distinct n-grams per hour of
    // ingest"): buildGrouped over window(ts) is declarative Structured
    // Streaming state — per-(window, bucket) max, bounded by 2^p rows
    // per window regardless of stream volume
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def ev(minOff: Int, k: String) =
      (new java.sql.Timestamp(t0 + minOff * 60000L), k)
    val batch1 = (1 to 200).map(i => ev(i % 8, s"tok${i % 23}"))
    val batch2 = (1 to 150).map(i => ev(10 + i % 8, s"tok${i % 31}"))
    def windowed(df: org.apache.spark.sql.DataFrame) =
      Hll.buildGrouped(
        df.withColumn("win", window(col("ts"), "10 minutes")).drop("ts"),
        Seq("win"), "k", 8, "sw1")
    val all = (batch1 ++ batch2).toDF("ts", "k")
    val expect = windowed(all)
      .select(col("win.start").cast("long"), col("bucket"), col("maxrank"))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val regs = windowed(stream.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes"))
    val query = regs.writeStream.format("memory").queryName("hll_win_stream")
      .outputMode("complete").start()
    try {
      stream.addData(batch1: _*)
      query.processAllAvailable()
      stream.addData(batch2: _*)
      query.processAllAvailable()
      val got = spark.table("hll_win_stream")
        .select(col("win.start").cast("long"), col("bucket"), col("maxrank"))
      assertSameRegisters(got, expect)
    } finally query.stop()
  }

  test("HllSketch: geometry-safe handle — roundtrip, merge refusal, corruption refusal") {
    val items = (1 to 1000).map(i => s"v$i").toDF("k")
    val sk = HllSketch.build(items, "k", p = 9, seed = "h9")
    val dir = java.nio.file.Files.createTempDirectory("hll_sketch").toString

    HllSketch.write(sk, dir)
    val loaded = HllSketch.read(spark, dir)
    assert((loaded.p, loaded.seed, loaded.portableHash) == ((9, "h9", true)))
    assert(loaded.estimate() == sk.estimate())

    // handle merge == functional merge; geometry mismatch refuses
    val sk2 = HllSketch.build(items, "k", 9, "h9")
    val merged = sk.merge(sk2)
    val mergedFn = Hll.merge(sk.registers, sk2.registers)
    assertSameRegisters(merged.registers, mergedFn)
    assert(intercept[IllegalArgumentException] {
      sk.merge(HllSketch.build(items, "k", 9, "OTHER-SEED"))
    }.getMessage.contains("geometry mismatch"))
    assert(intercept[IllegalArgumentException] {
      sk.merge(HllSketch.build(items, "k", 10, "h9"))
    }.getMessage.contains("geometry mismatch"))
    assert(intercept[IllegalArgumentException] {
      sk.merge(HllSketch.build(items, "k", 9, "h9", portableHash = false))
    }.getMessage.contains("geometry mismatch"))

    // corrupted register payload -> digest mismatch refuses
    HllSketch.build(items.limit(50), "k", 9, "h9").registers
      .write.mode("overwrite").parquet(s"$dir/registers")
    assert(intercept[IllegalArgumentException] { HllSketch.read(spark, dir) }
      .getMessage.contains("digest mismatch"))

    val empty = java.nio.file.Files.createTempDirectory("hll_none").toString
    assert(intercept[IllegalArgumentException] { HllSketch.read(spark, empty) }
      .getMessage.contains("not a sketch directory"))
  }
}
