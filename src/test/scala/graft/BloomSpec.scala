package graft

import graft.ops.{Bloom, BloomSketch, Curate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-20 wave-6 additions: Bloom membership filter as a packed-word frame —
  * portable position arithmetic (pinned against an independent JVM
  * re-computation and DuckDB-derived constants), no-false-negative and
  * realized-FPR behavior, merge/union/grouped semantics, the
  * geometry-safe persisted handle, and bit-for-bit interop with the
  * Curate broadcast-image decontamination path.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private def keysDf(ks: Seq[String]): DataFrame = ks.toDF("k")

  /** Independent re-computation of the probe positions: raw
    * MessageDigest md5 + BigInteger unsigned mod — no Spark
    * expressions, no graft.util.Hashing. Any drift in the digest-half
    * extraction or the Kirsch–Mitzenmacher recurrence fails here.
    */
  private def expectedPositions(key: String, m: Long, k: Int): Seq[Long] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    def half(o: Int): Long = new java.math.BigInteger(hex.substring(o, o + 16), 16)
      .mod(java.math.BigInteger.valueOf(m)).longValueExact()
    val (h1, h2) = (half(0), half(16))
    (0 until k).map(i => (h1 + i * h2) % m)
  }

  test("positions match an independent md5 re-computation (100 keys) and " +
    "the DuckDB-derived pinned constants") {
    val keys = (1 to 100).map(i => s"key $i with spaces-$i")
    for (key <- keys; m <- Seq(4096L, 65536L, (1L << 33))) {
      assert(Bloom.positions(key, m, 7).toSeq == expectedPositions(key, m, 7),
        s"positions drifted for $key at m=$m")
    }
    // constants computed in DuckDB (round 20):
    //   ('0x'||substr(md5('x'),1,16))::UBIGINT % 4096 = 52
    //   ('0x'||substr(md5('x'),17,16))::UBIGINT % 4096 = 1958
    assert(Bloom.positions("x", 4096L, 3).toSeq == Seq(52L, 2010L, 3968L))
    //   ('0x'||substr(md5('shingle a b'),1,16))::UBIGINT % 65536 = 26653
    //   ('0x'||substr(md5('shingle a b'),17,16))::UBIGINT % 65536 = 30594
    assert(Bloom.positions("shingle a b", 65536L, 3).toSeq ==
      Seq(26653L, 57247L, 22305L))
  }

  test("no false negatives: every built key is contained, at saturating " +
    "and sparse fills") {
    val keys = (1 to 500).map(i => s"member-$i")
    for (m <- Seq(1024L, 1L << 16)) {
      val words = Bloom.build(keysDf(keys), "k", m, 5)
      val verdicts = Bloom.mightContain(words, keysDf(keys), "k", m, 5)
      assert(verdicts.count() == 500)
      assert(verdicts.filter(!col("contained")).count() == 0,
        s"false negative at m=$m")
    }
  }

  test("realized false-positive rate tracks fillRatio^k") {
    val members = (1 to 2000).map(i => s"member-$i")
    val m = 1L << 14
    val k = 4
    val words = Bloom.build(keysDf(members), "k", m, k)
    val fill = Bloom.fillRatio(words, m)
    // fill ~ 1 - exp(-kn/m) = 1 - exp(-0.488) ~ 0.386
    assert(fill > 0.25 && fill < 0.55, s"unexpected fill $fill")
    val nonMembers = (1 to 20000).map(i => s"outsider-$i")
    val fp = Bloom.mightContain(words, keysDf(nonMembers), "k", m, k)
      .filter(col("contained")).count()
    val expected = math.pow(fill, k) * nonMembers.size
    assert(fp > expected * 0.5 && fp < expected * 2.0,
      s"fp=$fp far from expected ~$expected")
  }

  private def assertSameWords(got: DataFrame, want: DataFrame): Unit = {
    assert(got.count() == want.count(), "word counts differ")
    assert(got.exceptAll(want).count() == 0, "extra words in result")
    assert(want.exceptAll(got).count() == 0, "missing words in result")
  }

  test("merge of disjoint slices equals the one-shot build, and a raw " +
    "UNION probes identically (OR idempotence normalization)") {
    val a = (1 to 300).map(i => s"a-$i")
    val b = (1 to 300).map(i => s"b-$i")
    val m = 8192L
    val wa = Bloom.build(keysDf(a), "k", m, 5)
    val wb = Bloom.build(keysDf(b), "k", m, 5)
    val oneShot = Bloom.build(keysDf(a ++ b), "k", m, 5)
    assertSameWords(Bloom.merge(wa, wb), oneShot)
    // a hand-concatenated frame is not a corruption here: every
    // consumer normalizes by bit_or, so union == merge
    val unioned = wa.union(wb)
    val probeKeys = keysDf(a ++ b ++ (1 to 300).map(i => s"c-$i"))
    val vUnion = Bloom.mightContain(unioned, probeKeys, "k", m, 5)
    val vMerge = Bloom.mightContain(oneShot, probeKeys, "k", m, 5)
    assert(vUnion.exceptAll(vMerge).count() == 0 &&
      vMerge.exceptAll(vUnion).count() == 0)
  }

  test("buildGrouped equals per-group scalar builds; null group retained; " +
    "mergeGrouped composes per group") {
    val df = Seq(
      ("en", "one"), ("en", "two"), ("de", "eins"), ("de", "zwei"),
      (null.asInstanceOf[String], "nix")).toDF("g", "k")
    val m = 1024L
    val grouped = Bloom.buildGrouped(df, "k", Seq("g"), m, 3)
    for (g <- Seq("en", "de")) {
      val scalar = Bloom.build(df.filter(col("g") === g), "k", m, 3)
      assertSameWords(
        grouped.filter(col("g") === g).select("w", "bits"), scalar)
    }
    val nullGroup = grouped.filter(col("g").isNull).select("w", "bits")
    assertSameWords(nullGroup, Bloom.build(df.filter(col("g").isNull), "k", m, 3))
    // grouped merge: (en ∪ de slices split two ways) == one-shot grouped
    val odd = df.filter(length(col("k")) % 2 === 1)
    val even = df.filter(length(col("k")) % 2 === 0)
    val merged = Bloom.mergeGrouped(
      Bloom.buildGrouped(odd, "k", Seq("g"), m, 3),
      Bloom.buildGrouped(even, "k", Seq("g"), m, 3), Seq("g"))
    assert(merged.exceptAll(grouped).count() == 0 &&
      grouped.exceptAll(merged).count() == 0)
  }

  test("streaming build: incremental bit_or aggregation equals the batch " +
    "words (per-stream filter state is the word frame itself)") {
    val all = ((1 to 300).map(i => s"tok${i % 41}") ++
      (1 to 200).map(i => s"tok${i % 83}")).toDF("k")
    val m = 2048L
    val full = Bloom.build(all, "k", m, 5)
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val words = Bloom.build(stream.toDS().toDF("k"), "k", m, 5)
    val query = words.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete").start()
    try {
      stream.addData((1 to 300).map(i => s"tok${i % 41}"): _*)
      query.processAllAvailable()
      stream.addData((1 to 200).map(i => s"tok${i % 83}"): _*)
      query.processAllAvailable()
      val streamed = spark.table("bloom_stream")
      assertSameWords(streamed.select("w", "bits"), full)
    } finally query.stop()
  }

  test("mightContainGrouped equals per-group scalar probes exactly, " +
    "null groups probe the null group's filter, filterless groups are false") {
    val build = Seq(
      ("en", "one"), ("en", "two"), ("de", "eins"),
      (null.asInstanceOf[String], "nul-a")).toDF("g", "k")
    val m = 1024L
    val grouped = Bloom.buildGrouped(build, "k", Seq("g"), m, 3)
    val probeKeys = Seq(
      ("en", "one"), ("en", "eins"), ("de", "eins"), ("de", "two"),
      (null.asInstanceOf[String], "nul-a"), (null.asInstanceOf[String], "one"),
      ("fr", "one") // no fr filter exists
    ).toDF("g", "k")
    val got = Bloom.mightContainGrouped(grouped, probeKeys, "k", Seq("g"), m, 3)
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getBoolean(2)))
      .toSet
    // expected: per-group scalar probes (null-safe group semantics)
    val expected = Seq(Option("en"), Option("de"), None, Option("fr")).flatMap { g =>
      val gWords = grouped.filter(g.map(col("g") === _).getOrElse(col("g").isNull))
        .select("w", "bits")
      val gKeys = probeKeys.filter(g.map(col("g") === _).getOrElse(col("g").isNull))
      if (gKeys.isEmpty) Seq.empty
      else Bloom.mightContain(gWords, gKeys, "k", m, 3)
        .collect().map(r => (g, r.getString(0), r.getBoolean(1)))
    }.toSet
    assert(got == expected)
    // spot semantics: members true, cross-group misses and filterless
    // groups false (m is large enough here that no FP lands on these)
    assert(got.contains((Option("en"), "one", true)))
    assert(got.contains((None, "nul-a", true)))
    assert(got.contains((Option("fr"), "one", false)))
    assert(got.contains((Option("de"), "two", false)))
  }

  test("windowed streaming words: NTZ stream == batch == per-window direct " +
    "builds; late rows dropped; sink rebuild + rollup exact") {
    import graft.streaming.StreamBloom
    implicit val sqlCtx = spark.sqlContext
    val base = java.time.LocalDateTime.of(2026, 2, 1, 0, 0)
    // two 10-minute windows of keys, epoch-aligned (base is on the hour)
    val rows = Seq.tabulate(60)(i => (base.plusMinutes(i % 18), s"key-$i"))
    val m = 2048L
    val batchDf = rows.toDF("ts", "k")
    assert(batchDf.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val batch = StreamBloom.windowedWords(batchDf, "ts", "k",
      "10 minutes", "5 minutes", m, 3)
    // batch == per-window direct builds
    val starts = batch.select("windowStartMs").distinct().as[Long].collect().sorted
    assert(starts.length == 2)
    for (ws <- starts) {
      val winKeys = rows.filter { case (t, _) =>
        val ms = t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        ms >= ws && ms < ws + 600000L
      }.map(_._2)
      assertSameWords(
        batch.filter(col("windowStartMs") === ws).select("w", "bits"),
        Bloom.build(winKeys.toDF("k"), "k", m, 3))
    }
    // streaming (NTZ source): emitted windows equal the batch ones
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.time.LocalDateTime, String)]
    val out = StreamBloom.windowedWords(mem.toDS().toDF("ts", "k"),
      "ts", "k", "10 minutes", "5 minutes", m, 3)
    val q = out.writeStream.format("memory").queryName("bloom_windowed")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // sweep the watermark far past both windows, then try a LATE row
      // into the first window - it must not re-emit or alter anything
      mem.addData((base.plusMinutes(600), "sweep-1"))
      q.processAllAvailable()
      mem.addData((base.plusMinutes(1), "late-straggler"))
      mem.addData((base.plusMinutes(700), "sweep-2"))
      q.processAllAvailable()
      val emitted = spark.table("bloom_windowed")
        .filter(col("windowStartMs").isin(starts.map(Long.box): _*))
      assert(emitted.exceptAll(batch).count() == 0 &&
        batch.exceptAll(emitted).count() == 0,
        "streamed windows differ from batch (or the late row leaked in)")
      // sink rebuild: duplicates collapse; rollup to global is exact
      val rebuilt = StreamBloom.fromWindowWords(
        emitted.union(emitted.limit(3)), m, 3) // duplicate emission rows
      assert(rebuilt.groupCols == Seq("windowStartMs", "windowEndMs"))
      assertSameWords(rebuilt.toGlobal.words,
        Bloom.build(rows.map(_._2).toDF("k"), "k", m, 3))
    } finally q.stop()
  }

  test("(window x group) windowed words equal direct grouped builds; the " +
    "rebuild probes per (window, group) stratum") {
    import graft.streaming.StreamBloom
    val base = java.time.LocalDateTime.of(2026, 6, 1, 0, 0)
    val rows = Seq.tabulate(100)(i =>
      (base.plusMinutes(i % 18), if (i % 2 == 0) "en" else "de", s"key-$i"))
    val df = rows.toDF("ts", "g", "k")
    val m = 2048L
    val ww = StreamBloom.windowedWords(df, "ts", "k", "10 minutes",
      "5 minutes", m, 3, groupCols = Seq("g"))
    val strata = ww.select("windowStartMs", "g").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(strata.length == 4)
    for ((ws, g) <- strata) {
      val keys = rows.filter { case (t, gg, _) =>
        val ms = t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        ms >= ws && ms < ws + 600000L && gg == g
      }.map(_._3).toDF("k")
      assertSameWords(
        ww.filter(col("windowStartMs") === ws && col("g") === g)
          .select("w", "bits"),
        Bloom.build(keys, "k", m, 3))
    }
    val rebuilt = StreamBloom.fromWindowWords(ww, m, 3, groupCols = Seq("g"))
    assert(rebuilt.groupCols == Seq("windowStartMs", "windowEndMs", "g"))
    // every key is contained in its own (window, g) stratum's filter
    val probePairs = rows.map { case (t, g, k) =>
      val ms = t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      (ms - (ms % 600000L), ms - (ms % 600000L) + 600000L, g, k)
    }.toDF("windowStartMs", "windowEndMs", "g", "k")
    val verdicts = rebuilt.mightContain(probePairs, "k")
    assert(verdicts.filter(!col("contained")).count() == 0)
    // regroup windows away: per-g filters == direct grouped build
    val byG = rebuilt.regroup(Seq("g" -> col("g")))
    val direct = Bloom.buildGrouped(df, "k", Seq("g"), m, 3)
    assert(byG.words.exceptAll(direct).count() == 0 &&
      direct.exceptAll(byG.words).count() == 0)
  }

  test("null keys carry no membership bit: dropped at build, no verdict " +
    "row at probe") {
    val withNulls = Seq(Some("a"), None, Some("b"), None).toDF("k")
    val m = 1024L
    val words = Bloom.build(withNulls, "k", m, 3)
    assertSameWords(words, Bloom.build(Seq("a", "b").toDF("k"), "k", m, 3))
    val verdicts = Bloom.mightContain(words, withNulls, "k", m, 3)
    assert(verdicts.count() == 2)
    assert(verdicts.filter(col("k").isNull).count() == 0)
  }

  test("wordHalves is involutive: lo | (hi << 32) rebuilds bits, both " +
    "halves nonnegative 32-bit") {
    val words = Bloom.build(keysDf((1 to 400).map(i => s"k-$i")), "k", 1024L, 7)
    val halves = Bloom.wordHalves(words)
    assert(halves.filter(col("lo") < 0 || col("lo") > 0xffffffffL ||
      col("hi") < 0 || col("hi") > 0xffffffffL).count() == 0)
    val rebuilt = halves.select(col("w"),
      col("lo").bitwiseOR(expr("shiftleft(hi, 32)")).as("bits"))
    assertSameWords(rebuilt, words)
  }

  test("geometry and argument refusals are typed and descriptive") {
    val df = keysDf(Seq("a"))
    val e1 = intercept[IllegalArgumentException](Bloom.build(df, "k", 32L, 3))
    assert(e1.getMessage.contains("numBits"))
    val e2 = intercept[IllegalArgumentException](Bloom.build(df, "k", 1024L, 0))
    assert(e2.getMessage.contains("numHashes"))
    val e3 = intercept[IllegalArgumentException](
      Bloom.buildGrouped(df.withColumn("w", lit(1)), "k", Seq("w"), 1024L, 3))
    assert(e3.getMessage.contains("collide"))
    val e4 = intercept[IllegalArgumentException](
      Bloom.buildGrouped(df, "k", Seq.empty, 1024L, 3))
    assert(e4.getMessage.contains("groupCols"))
    val e5 = intercept[IllegalArgumentException](
      Bloom.build(df, "k", (1L << 36) + 64L, 3))
    assert(e5.getMessage.contains("2^36"))
  }

  test("BloomSketch handle: write/read roundtrip preserves geometry and " +
    "verdicts; corruption and foreign payloads refuse") {
    val dir = java.nio.file.Files.createTempDirectory("bloomsketch").toString
    val sk = BloomSketch.build(keysDf((1 to 200).map(i => s"m-$i")), "k", 4096L, 5)
    BloomSketch.write(sk, s"$dir/f1")
    val back = BloomSketch.read(spark, s"$dir/f1")
    assert(back.numBits == 4096L && back.numHashes == 5)
    val probe = keysDf((1 to 200).map(i => s"m-$i") ++ Seq("absent-1", "absent-2"))
    val a = sk.mightContain(probe, "k").orderBy("k").collect().toSeq
    val b = back.mightContain(probe, "k").orderBy("k").collect().toSeq
    assert(a == b)
    // corrupt the payload: flip one word's bits
    val words = spark.read.parquet(s"$dir/f1/words")
    words.withColumn("bits", col("bits").bitwiseXOR(lit(1L)))
      .write.mode("overwrite").parquet(s"$dir/f1b/words")
    val fs = new org.apache.hadoop.fs.Path(s"$dir/f1/bloom.json")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/f1/bloom.json"),
      new org.apache.hadoop.fs.Path(s"$dir/f1b/bloom.json"))
    val e = intercept[IllegalArgumentException](BloomSketch.read(spark, s"$dir/f1b"))
    assert(e.getMessage.contains("digest mismatch"))
    // geometry-mismatch merge refusal
    val other = BloomSketch.build(keysDf(Seq("x")), "k", 8192L, 5)
    val e2 = intercept[IllegalArgumentException](sk.merge(other))
    assert(e2.getMessage.contains("geometry mismatch"))
    val e3 = intercept[IllegalArgumentException](
      BloomSketch(keysDf(Seq("x")), 4096L, 0).merge(other))
    assert(e3.getMessage.contains("geometry mismatch"))
  }

  test("denseWords materializes the exact image and refuses out-of-range " +
    "rows and over-cap collects") {
    val keys = (1 to 100).map(i => s"d-$i")
    val m = 1024L
    val dense = Bloom.denseWords(Bloom.build(keysDf(keys), "k", m, 5), m)
    assert(dense.length == 16)
    // every key's positions are set in the dense image
    for (key <- keys; pos <- Bloom.positions(key, m, 5)) {
      assert((dense((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L)
    }
    val foreign = Seq((999L, 1L)).toDF("w", "bits")
    val e = intercept[IllegalArgumentException](Bloom.denseWords(foreign, m))
    assert(e.getMessage.contains("outside"))
    spark.conf.set("graft.bloom.maxCollectBits", "512")
    try {
      val e2 = intercept[IllegalArgumentException](
        Bloom.denseWords(foreign, 1024L))
      assert(e2.getMessage.contains("maxCollectBits"))
    } finally spark.conf.unset("graft.bloom.maxCollectBits")
  }

  test("scalar consumers refuse grouped (or otherwise non-word) frames " +
    "instead of OR-collapsing groups into the union filter") {
    val df = Seq(("en", "one"), ("de", "eins")).toDF("g", "k")
    val grouped = Bloom.buildGrouped(df, "k", Seq("g"), 1024L, 3)
    for ((name, call) <- Seq[(String, DataFrame => Any)](
      ("merge", g => Bloom.merge(g, g)),
      ("mightContain", g => Bloom.mightContain(g, df, "k", 1024L, 3)),
      ("fillRatio", g => Bloom.fillRatio(g, 1024L)),
      ("denseWords", g => Bloom.denseWords(g, 1024L)),
      ("wordHalves", g => Bloom.wordHalves(g)))) {
      val e = intercept[IllegalArgumentException](call(grouped))
      assert(e.getMessage.contains("grouped entry points"), s"$name: $e")
    }
    // the keyCol/verdict collision refuses instead of emitting two
    // 'contained' columns
    val words = Bloom.build(df, "k", 1024L, 3)
    val e2 = intercept[IllegalArgumentException](Bloom.mightContain(
      words, df.withColumnRenamed("k", "contained"), "contained", 1024L, 3))
    assert(e2.getMessage.contains("rename"))
    // groupCols naming a frame column would pass a naive schema-set
    // comparison against a SCALAR frame and then be clobbered by the
    // normalize aggregation - the clash check fires first
    val e3 = intercept[IllegalArgumentException](
      Bloom.fillRatioGrouped(words, Seq("bits"), 1024L))
    assert(e3.getMessage.contains("collide"))
    // streaming keys refuse with the foreachBatch redirect instead of a
    // deep multiple-stateful-operator engine error
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val e4 = intercept[IllegalArgumentException](Bloom.mightContain(
      words, mem.toDS().toDF("k"), "k", 1024L, 3))
    assert(e4.getMessage.contains("foreachBatch"))
  }

  test("GroupedBloomSketch: exact rollups (regroup == direct coarse build, " +
    "toGlobal == direct scalar build), per-group fills, roundtrip with a " +
    "double group column, refusals") {
    import graft.ops.GroupedBloomSketch
    // fine strata: (lang, bucket) with bucket a DOUBLE (exercises the
    // canonicalized digest on the group column)
    val rows = (1 to 200).map { i =>
      (if (i % 2 == 0) "en" else "de", (i % 4).toDouble / 2.0, s"key-$i")
    }.toDF("lang", "bucket", "k")
    val m = 2048L
    val fine = GroupedBloomSketch.build(rows, "k", Seq("lang", "bucket"), m, 5)
    // regroup to lang == direct build grouped by lang, bit for bit
    val coarse = fine.regroup(Seq("lang" -> col("lang")))
    val direct = Bloom.buildGrouped(rows, "k", Seq("lang"), m, 5)
    assert(coarse.words.exceptAll(direct).count() == 0 &&
      direct.exceptAll(coarse.words).count() == 0)
    // toGlobal == direct scalar build, bit for bit
    val global = fine.toGlobal
    assertSameWords(global.words, Bloom.build(rows, "k", m, 5))
    assert(global.numBits == m && global.numHashes == 5)
    // per-group fills match the scalar fillRatio of each group's filter
    val fills = coarse.fillRatios().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (g <- Seq("en", "de")) {
      val scalar = Bloom.fillRatio(
        direct.filter(col("lang") === g).select("w", "bits"), m)
      assert(math.abs(fills(g) - scalar) < 1e-12, s"fill mismatch for $g")
    }
    // roundtrip: geometry + stratification + verdicts survive; the
    // double group column digests environment-independently (shared
    // SketchIo.canonicalDigest)
    val dir = java.nio.file.Files.createTempDirectory("gbloom").toString
    GroupedBloomSketch.write(fine, s"$dir/f")
    val back = GroupedBloomSketch.read(spark, s"$dir/f")
    assert(back.groupCols == Seq("lang", "bucket") && back.numBits == m)
    val vA = fine.mightContain(rows, "k").orderBy("lang", "bucket", "k").collect().toSeq
    val vB = back.mightContain(rows, "k").orderBy("lang", "bucket", "k").collect().toSeq
    assert(vA == vB && vA.forall(_.getBoolean(3)))
    // refusals: stratification mismatch, duplicate/reserved regroup names
    val other = GroupedBloomSketch.build(rows, "k", Seq("lang"), m, 5)
    val e1 = intercept[IllegalArgumentException](fine.merge(other))
    assert(e1.getMessage.contains("geometry mismatch"))
    val e2 = intercept[IllegalArgumentException](
      fine.regroup(Seq("w" -> col("lang"))))
    assert(e2.getMessage.contains("collide"))
    // corruption refusal
    val words = spark.read.parquet(s"$dir/f/words")
    words.withColumn("bits", col("bits").bitwiseXOR(lit(2L)))
      .write.mode("overwrite").parquet(s"$dir/g/words")
    val fs = new org.apache.hadoop.fs.Path(s"$dir/f/gbloom.json")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/f/gbloom.json"),
      new org.apache.hadoop.fs.Path(s"$dir/g/gbloom.json"))
    val e3 = intercept[IllegalArgumentException](
      GroupedBloomSketch.read(spark, s"$dir/g"))
    assert(e3.getMessage.contains("digest mismatch"))
  }

  test("decontaminateBloomPrebuilt == decontaminateBloom row for row when " +
    "the sketch holds the same eval shingles (position math single-sourced)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "unrelated words entirely different from both sets")
    ).toDF("doc_id", "text")
    val evalDocs = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val n = 5
    val rebuilt = Curate.decontaminateBloom(
      docs, "doc_id", "text", evalDocs, "text", n = n,
      bitsPerShingle = 10, numHashes = 7)
    // the rebuilt path sizes m = max(1024, 10 * nd); nd = 4 shingles
    val sketch = BloomSketch.build(
      evalDocs.select(explode(
        graft.ops.TextOps.wordShingles(col("text"), n)).as("sh")),
      "sh", numBits = 1024L, numHashes = 7)
    val (prebuilt, bc) = Curate.decontaminateBloomPrebuilt(
      docs, "doc_id", "text", sketch, n = n)
    try {
      assert(rebuilt.orderBy("doc_id").collect().toSeq ==
        prebuilt.orderBy("doc_id").collect().toSeq)
      assert(prebuilt.filter(col("doc_id") === 1L)
        .head().getBoolean(2), "exact-match doc must be contaminated")
    } finally bc.destroy()
  }

  test("sketch dense image is bit-identical to the Curate broadcast image " +
    "over the same eval shingles") {
    val evalDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "pack my box with five dozen liquor jugs today now"))
      .toDF("doc_id", "text")
    val n = 5
    // Curate sizes m = max(1024, 10 * nd): count shingles first
    val shingles = evalDocs.select(explode(
      graft.ops.TextOps.wordShingles(col("text"), n)).as("sh"))
    val nd = shingles.distinct().count()
    val m = math.max(1024L, 10L * nd)
    val dense = BloomSketch.build(shingles, "sh", m, 7).dense()
    val (_, bc) = Curate.decontaminateBloomTracked(
      evalDocs.limit(0), "doc_id", "text", evalDocs, "text", n = n,
      bitsPerShingle = 10, numHashes = 7)
    try assert(dense.toSeq == bc.value.toSeq)
    finally bc.destroy()
  }
}
