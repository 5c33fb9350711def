package graft

import graft.ops.{Bloom, BloomSketch, GroupedBloomSketch, GroupedQuantileSketch, QuantileSketch}
import graft.util.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17: the fast-hash (`portableHash = false`) mode for the Bloom
  * membership and rank-sketch legs — the r16 verdict's #1 item. Pins:
  * the JVM xxh64 twin against the real Catalyst `xxhash64` expression
  * (the one contract that keeps the dense broadcast-probe path and the
  * codegen'd column path synchronized), fast-mode membership semantics
  * (no false negatives, bounded realized FPR, JVM/column position
  * parity end to end), fast-mode bottom-k purity (merge == one-shot,
  * exactness at n ≤ s), hash-mode travel through every handle's
  * write/read, cross-mode merge refusals on all four handles, and the
  * Bloom.sizeFor geometry helper + persist-time saturation warning.
  * Also the two r16 ADVICE regressions: the TIMESTAMP_NTZ digest
  * timezone roundtrip and the rankOf counts-desync guard.
  */
class FastHashSpec extends SparkSpec {

  import spark.implicits._

  private def keysDf(ks: Seq[String]): DataFrame = ks.toDF("k")

  test("xxh64Tagged matches the Catalyst xxhash64(lit(tag), col) expression " +
    "bit for bit (key sweep, several tags)") {
    val keys = (1 to 200).map(i => s"key $i with spaces-$i") ++
      Seq("", "x", "unicode-é中文", "a:b:c")
    for (tag <- Seq("bloom:h1", "bloom:h2", "qsk20:")) {
      val got = keysDf(keys)
        .select(col("k"), xxhash64(lit(tag), col("k")).as("h"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      keys.foreach { k =>
        assert(got(k) == Hashing.xxh64Tagged(tag, k),
          s"xxh64Tagged drifted from the column expression for tag=$tag key=$k")
      }
    }
  }

  test("fast Bloom positions: JVM twin == codegen column path, and both " +
    "differ from the portable md5 space") {
    val keys = (1 to 100).map(i => s"member-$i")
    for (m <- Seq(1024L, 65536L)) {
      val colPos = keysDf(keys)
        .select(col("k"), Bloom.positionsCol(col("k"), m, 5, portable = false).as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      keys.foreach { k =>
        assert(colPos(k) == Bloom.positions(k, m, 5, portable = false).toSeq,
          s"fast JVM/column position drift for $k at m=$m")
        assert(colPos(k).forall(p => p >= 0L && p < m))
      }
      // different hash space than portable (sanity: the modes are not
      // silently the same function)
      assert(keys.exists(k =>
        Bloom.positions(k, m, 5, portable = false).toSeq !=
          Bloom.positions(k, m, 5, portable = true).toSeq))
    }
  }

  test("fast Bloom end to end: no false negatives, bounded realized FPR, " +
    "dense image probes with the JVM positions") {
    val members = (1 to 250).map(i => s"member-$i")
    val outsiders = (1 to 1000).map(i => s"outsider-$i")
    val m = 8192L
    val words = Bloom.build(keysDf(members), "k", m, 5, portableHash = false)
    val verdicts = Bloom.mightContain(words, keysDf(members ++ outsiders),
      "k", m, 5, portableHash = false)
    assert(verdicts.count() == 1250)
    assert(verdicts.filter(col("k").startsWith("member") && !col("contained"))
      .count() == 0, "fast-mode false negative")
    val fp = verdicts.filter(col("k").startsWith("outsider") && col("contained"))
      .count()
    // fill ~ 1-(1-1/8192)^1250 ~ 0.14; fp ~ fill^5 ~ 6e-5 - allow slack
    assert(fp <= 20, s"fast-mode FP count $fp out of envelope")
    // dense-image probe (the Curate broadcast path's arithmetic) agrees
    // with the column-built words: every member's 5 JVM fast positions
    // are set
    val dense = Bloom.denseWords(words, m)
    members.foreach { k =>
      Bloom.positions(k, m, 5, portable = false).foreach { pos =>
        assert((dense((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L,
          s"dense image missing fast position of $k")
      }
    }
  }

  test("BloomSketch handle: fast mode travels through write/read, probes " +
    "in its own mode, and cross-mode merges refuse (scalar + grouped)") {
    val members = (1 to 100).map(i => s"doc-$i")
    val fast = BloomSketch.build(keysDf(members), "k", 4096L, 3,
      portableHash = false)
    val portable = BloomSketch.build(keysDf(members), "k", 4096L, 3)
    assert(intercept[IllegalArgumentException] { fast.merge(portable) }
      .getMessage.contains("geometry mismatch"))
    val dir = java.nio.file.Files.createTempDirectory("fastbloom").toString
    BloomSketch.write(fast, dir)
    val back = BloomSketch.read(spark, dir)
    assert(!back.portableHash)
    assert(back.mightContain(keysDf(members), "k")
      .filter(!col("contained")).count() == 0,
      "persisted fast filter false-negated - hash mode did not travel")
    // grouped twin
    val gdf = members.map(k => (k.take(5), k)).toDF("g", "k")
    val gfast = GroupedBloomSketch.build(gdf, "k", Seq("g"), 4096L, 3,
      portableHash = false)
    val gportable = GroupedBloomSketch.build(gdf, "k", Seq("g"), 4096L, 3)
    assert(intercept[IllegalArgumentException] { gfast.merge(gportable) }
      .getMessage.contains("geometry mismatch"))
    assert(gfast.toGlobal.portableHash == false)
    val gdir = java.nio.file.Files.createTempDirectory("fastgbloom").toString
    GroupedBloomSketch.write(gfast, gdir)
    val gback = GroupedBloomSketch.read(spark, gdir)
    assert(!gback.portableHash)
    assert(gback.mightContain(gdf, "k").filter(!col("contained")).count() == 0)
  }

  test("fast windowed Bloom build: emissions rebuild a fast-mode handle " +
    "with no false negatives; batch == the direct grouped build") {
    val base = 1755000000000L
    val rows = (0 until 200).map { i =>
      (new java.sql.Timestamp(base + i * 3600L * 1000L), s"user-${i % 37}")
    }.toDF("ts", "k")
    val ww = graft.streaming.StreamBloom.windowedWords(
      rows, "ts", "k", "1 day", "1 hour", 2048L, 3, portableHash = false)
    val handle = graft.streaming.StreamBloom.fromWindowWords(
      ww, 2048L, 3, portableHash = false)
    assert(!handle.portableHash)
    val probe = rows.select(
      (col("ts").cast("long") * 1000 -
        (col("ts").cast("long") * 1000) % 86400000L).as("windowStartMs"),
      col("k"))
      .withColumn("windowEndMs", col("windowStartMs") + 86400000L)
    assert(handle.mightContain(probe, "k").filter(!col("contained")).count() == 0,
      "windowed fast build false-negated its own keys")
  }

  test("hash mode rides IN the windowed emissions (r18 verdict #2): " +
    "rebuilding a fast-mode sink with the default portable flag REFUSES " +
    "for every leg, and a mixed-mode sink refuses too") {
    val base = 1755000000000L
    val rows = (0 until 100).map { i =>
      (new java.sql.Timestamp(base + i * 3600L * 1000L), s"user-${i % 23}")
    }.toDF("ts", "k")
    // Bloom: a fast-mode sink rebuilt with defaults would silently
    // false-negate EVERY key — now it refuses with the recorded mode
    val ww = graft.streaming.StreamBloom.windowedWords(
      rows, "ts", "k", "1 day", "1 hour", 2048L, 3, portableHash = false)
    val eb = intercept[IllegalArgumentException] {
      graft.streaming.StreamBloom.fromWindowWords(ww, 2048L, 3)
    }
    assert(eb.getMessage.contains("portableHash=false") &&
      eb.getMessage.contains("hash space"))
    // HLL registers
    val hr = graft.streaming.StreamSketches.hllWindowedRegisters(
      rows, "ts", "k", "1 day", "1 hour", p = 9, seed = "fhw19",
      portableHash = false)
    val eh = intercept[IllegalArgumentException] {
      graft.streaming.StreamSketches.hllFromWindowRegisters(hr, 9, "fhw19")
    }
    assert(eh.getMessage.contains("portableHash=false"))
    // CMS cells
    val cc = graft.streaming.StreamSketches.cmsWindowedCells(
      rows, "ts", "k", "1 day", "1 hour", depth = 3, width = 64,
      seed = "fhw19", portableHash = false)
    val ec = intercept[IllegalArgumentException] {
      graft.streaming.StreamSketches.cmsFromWindowCells(cc, 3, 64, "fhw19")
    }
    assert(ec.getMessage.contains("portableHash=false"))
    // rank-sketch summaries (rankOf would hash queries into the wrong
    // rank space)
    val ev = (1 to 60).map(i =>
      (new java.sql.Timestamp(base + i * 3600L * 1000L), i.toLong,
        (i * 13 % 61).toLong)).toDF("ts", "id", "v")
    val sums = graft.streaming.StreamRankSketch.windowedBottomK(
      ev, "ts", "id", "v", "1 day", "1 hour", s = 16, seed = "fhw19",
      portableHash = false).toDF()
    val eq = intercept[IllegalArgumentException] {
      graft.ops.GroupedQuantileSketch.fromWindowSummaries(sums, 16, "fhw19")
    }
    assert(eq.getMessage.contains("portableHash=false"))
    // a MIXED sink (two modes concatenated) refuses regardless of flag
    val wwP = graft.streaming.StreamBloom.windowedWords(
      rows, "ts", "k", "1 day", "1 hour", 2048L, 3)
    val em = intercept[IllegalArgumentException] {
      graft.streaming.StreamBloom.fromWindowWords(
        ww.unionByName(wwP), 2048L, 3, portableHash = false)
    }
    assert(em.getMessage.contains("MIXES"))
    // and the matching flag still rebuilds (the happy path of the same
    // validation)
    assert(!graft.streaming.StreamBloom.fromWindowWords(
      ww, 2048L, 3, portableHash = false).portableHash)
    // a sink with NULL modes (a pre-upgrade sink merged with newer
    // emissions) refuses with words, never an NPE at getBoolean
    val withNulls = ww.withColumn("portable",
      when(col("w") % 2 === 0, col("portable")).otherwise(lit(null)))
    val en = intercept[IllegalArgumentException] {
      graft.streaming.StreamBloom.fromWindowWords(withNulls, 2048L, 3,
        portableHash = false)
    }
    assert(en.getMessage.contains("NO recorded hash mode"), en.getMessage)
  }

  test("fast rank sketch: exact at n <= s, merge == one-shot build, " +
    "cross-mode refusals, mode travels through write/read") {
    val rows = (1 to 400).map(i => (i.toLong, (i * 7 % 401).toLong))
      .toDF("id", "v")
    val fast = QuantileSketch.build(rows, "id", "v", 1024, "fh17",
      portableHash = false)
    // n <= s: the sample IS the multiset, so answers are exact however
    // the rank key hashes
    assert(fast.quantile(50) == 200L)
    assert(fast.quantile(100) == 400L)
    assert(fast.rankOf(100L) == 100L)
    // bottom-k purity: merge of disjoint slices == one-shot (at s < n so
    // the cut is exercised)
    val even = QuantileSketch.build(rows.where(col("id") % 2 === 0),
      "id", "v", 64, "fh17", portableHash = false)
    val odd = QuantileSketch.build(rows.where(col("id") % 2 === 1),
      "id", "v", 64, "fh17", portableHash = false)
    val oneShot = QuantileSketch.build(rows, "id", "v", 64, "fh17",
      portableHash = false)
    val merged = even.merge(odd)
    assert(merged.n == oneShot.n)
    assert(merged.summary.orderBy("rk", "value").collect().toSeq ==
      oneShot.summary.orderBy("rk", "value").collect().toSeq,
      "fast-mode merge is not the one-shot bottom-k")
    // cross-mode refusal
    val portable = QuantileSketch.build(rows, "id", "v", 64, "fh17")
    assert(intercept[IllegalArgumentException] { oneShot.merge(portable) }
      .getMessage.contains("geometry mismatch"))
    // persistence carries the mode
    val dir = java.nio.file.Files.createTempDirectory("fastqsk").toString
    QuantileSketch.write(fast, dir)
    assert(!QuantileSketch.read(spark, dir).portableHash)
  }

  test("fast grouped rank sketch: per-group exactness at n_g <= s, toGlobal " +
    "and regroup carry the mode, cross-mode merge refuses") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", i.toLong, i.toLong))
      .toDF("g", "id", "v")
    val fast = GroupedQuantileSketch.buildGrouped(rows, Seq("g"), "id", "v",
      128, "fgq17", portableHash = false)
    assert(!fast.portableHash)
    assert(!fast.toGlobal.portableHash)
    assert(!fast.regroup(Seq(("all", lit("x")))).portableHash)
    // n_g = 100 <= s = 128: per-group medians are exact
    val q50 = fast.quantiles(Seq(50)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // group g0: values 3,6,...,300 (100 values) -> median (rank 50) = 150
    assert(q50("g0") == 150L)
    val portable = GroupedQuantileSketch.buildGrouped(rows, Seq("g"), "id",
      "v", 128, "fgq17")
    assert(intercept[IllegalArgumentException] { fast.merge(portable) }
      .getMessage.contains("geometry mismatch"))
    val dir = java.nio.file.Files.createTempDirectory("fastgqsk").toString
    GroupedQuantileSketch.write(fast, dir)
    assert(!GroupedQuantileSketch.read(spark, dir).portableHash)
  }

  test("StreamRankSketch fast mode: batch windowed cut == the grouped " +
    "build over the same windows (declarative-path parity)") {
    val base = 1755000000000L
    val rows = (0 until 300).map { i =>
      (new java.sql.Timestamp(base + i * 600L * 1000L), i.toLong,
        ((i * 13) % 97).toLong)
    }.toDF("ts", "id", "v")
    val cut = graft.streaming.StreamRankSketch.windowedBottomK(
      rows, "ts", "id", "v", "1 day", "1 hour", 32, "frs17",
      portableHash = false).toDF()
    val rebuilt = GroupedQuantileSketch.fromWindowSummaries(
      cut, 32, "frs17", portableHash = false)
    assert(!rebuilt.portableHash)
    val direct = GroupedQuantileSketch.buildGrouped(
      rows.withColumn("windowStartMs",
        col("ts").cast("long") * 1000 -
          (col("ts").cast("long") * 1000) % 86400000L),
      Seq("windowStartMs"), "id", "v", 32, "frs17", portableHash = false)
    val a = rebuilt.summary.orderBy("windowStartMs", "rk", "value")
      .select("windowStartMs", "rk", "value").collect().toSeq
    val b = direct.summary.orderBy("windowStartMs", "rk", "value")
      .select("windowStartMs", "rk", "value").collect().toSeq
    assert(a == b, "fast windowed cut != direct fast grouped build")
  }

  test("Bloom.sizeFor: textbook optimum, word-aligned, k clamped, and the " +
    "refusal past the implementation ceiling") {
    // 1M keys at 1% -> m ~ 9.585e6 bits (~9.6 bits/key), k ~ 7
    val (m, k) = Bloom.sizeFor(1000000L, 0.01)
    assert(m % 64 == 0 && m >= 9585000L && m <= 9600000L, s"m=$m")
    assert(k == 7, s"k=$k")
    // tiny n: floor at one word, k clamps to the [1,16] range
    val (m2, k2) = Bloom.sizeFor(1L, 0.5)
    assert(m2 == 64L && k2 >= 1 && k2 <= 16)
    // when the optimal k exceeds the 16 clamp, m must GROW so the
    // clamped geometry still MEETS the target (r17 review: returning
    // the optimal-m geometry at k=16 missed 1e-9 by ~7x)
    val (m3, k3) = Bloom.sizeFor(1000000L, 1e-7)
    assert(k3 == 16)
    val realized = math.pow(1.0 - math.exp(-k3 * 1000000.0 / m3), k3.toDouble)
    assert(realized <= 1e-7,
      f"clamped geometry (m=$m3, k=$k3) realizes fpr $realized%.2e > 1e-7")
    assert(intercept[IllegalArgumentException] {
      Bloom.sizeFor(100000000000L, 1e-9)
    }.getMessage.contains("2^36"))
    assert(intercept[IllegalArgumentException] { Bloom.sizeFor(0L, 0.01) }
      .getMessage.contains("expectedDistinct"))
    assert(intercept[IllegalArgumentException] { Bloom.sizeFor(10L, 1.0) }
      .getMessage.contains("targetFpr"))
  }

  test("sizeForCorpus: HLL-estimated sizing lands the realized fill at or " +
    "under the design point") {
    val keys = (1 to 5000).map(i => s"corpus-key-$i")
    val (m, k) = Bloom.sizeFor(5000L, 0.01)
    val (mc, kc) = Bloom.sizeForCorpus(keysDf(keys), "k", 0.01)
    // the 3sigma-inflated estimate sizes AT or ABOVE the exact-count
    // geometry, never below, and within ~10% of it at p=12 accuracy
    assert(mc >= m * 95 / 100 && mc <= m * 115 / 100, s"mc=$mc vs m=$m")
    assert(math.abs(kc - k) <= 1, s"kc=$kc vs k=$k")
    val words = Bloom.build(keysDf(keys), "k", mc, kc)
    val fill = Bloom.fillRatio(words, mc)
    // a CORRECTLY sized filter sits near fill 0.5 by design (k rounding
    // wobbles it to ~0.52) — it must NOT trip the saturation warning
    assert(fill <= Bloom.SaturationWarnFill,
      f"sized-for-corpus filter tripped the saturation line: fill $fill%.3f")
    // and the realized FP rate meets the target (k-rounding slack)
    assert(math.pow(fill, kc.toDouble) <= 0.012,
      f"realized FP ${math.pow(fill, kc.toDouble)}%.4f past target 0.01")
  }

  test("persist-time saturation audit: an undersized filter warns at write, " +
    "a healthy one does not") {
    val keys = (1 to 2000).map(i => s"k-$i")
    val saturated = BloomSketch.build(keysDf(keys), "k", 1024L, 7)
    val healthy = BloomSketch.build(keysDf(keys.take(50)), "k", 4096L, 3)
    def captureErr(body: => Unit): String = {
      val baos = new java.io.ByteArrayOutputStream()
      val old = System.err
      System.setErr(new java.io.PrintStream(baos, true, "UTF-8"))
      try body finally System.setErr(old)
      new String(baos.toByteArray, "UTF-8")
    }
    val dir1 = java.nio.file.Files.createTempDirectory("satbloom").toString
    val warn = captureErr { BloomSketch.write(saturated, dir1) }
    assert(warn.contains("[bloom] warning") && warn.contains("sizeFor"),
      s"expected a saturation warning, got: '$warn'")
    val dir2 = java.nio.file.Files.createTempDirectory("okbloom").toString
    val quiet = captureErr { BloomSketch.write(healthy, dir2) }
    assert(!quiet.contains("[bloom] warning"), s"unexpected warning: '$quiet'")
    // grouped: one oversized stratum among healthy ones still warns
    val gdf = keys.map(k => ("big", k)).toDF("g", "k")
      .union(keys.take(10).map(k => ("small", k)).toDF("g", "k"))
    val gsat = GroupedBloomSketch.build(gdf, "k", Seq("g"), 1024L, 7)
    val dir3 = java.nio.file.Files.createTempDirectory("satgbloom").toString
    val gwarn = captureErr { GroupedBloomSketch.write(gsat, dir3) }
    assert(gwarn.contains("[bloom] warning") && gwarn.contains("stratum"))
  }

  test("r16 ADVICE: TIMESTAMP_NTZ grouped-sketch digest is timezone-" +
    "independent (write under UTC, read under Asia/Tokyo)") {
    val rows = (1 to 60).map { i =>
      (s"2026-01-0${i % 3 + 1} 12:00:00", i.toLong, i.toLong)
    }.toDF("wall", "id", "v")
      .withColumn("wall", col("wall").cast("timestamp_ntz"))
    assert(rows.schema("wall").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val sk = GroupedQuantileSketch.buildGrouped(rows, Seq("wall"), "id", "v",
      32, "ntz17")
    val dir = java.nio.file.Files.createTempDirectory("ntzsk").toString
    GroupedQuantileSketch.write(sk, dir)
    val tzKey = "spark.sql.session.timeZone"
    val old = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Asia/Tokyo")
      // pre-fix this refused with "digest mismatch": the NTZ wall-clock
      // was digested through a session-timezone cast
      val back = GroupedQuantileSketch.read(spark, dir)
      assert(back.counts.count() == 3)
    } finally spark.conf.set(tzKey, old)
  }

  test("fast-mode decontaminateBloom: zero false negatives vs the exact " +
    "path, clean docs stay clean on a sparse filter") {
    import graft.ops.Curate
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq(
      (1L, "prefix words " + evalText + " suffix words"), // contains eval 5-grams
      (2L, "one two three four five six seven eight nine ten"),
      (3L, evalText)
    ).toDF("doc_id", "text")
    val ev = Seq((100L, evalText)).toDF("doc_id", "text")
    val exact = Curate.decontaminate(train, "doc_id", "text", ev, "text",
      n = 5, hashShingles = false)
      .where(col("contaminated")).select("doc_id").as[Long].collect().toSet
    for (portable <- Seq(true, false)) {
      val got = Curate.decontaminateBloom(train, "doc_id", "text", ev,
          "text", n = 5, bitsPerShingle = 20, portableHash = portable)
        .where(col("contaminated")).select("doc_id").as[Long].collect().toSet
      assert(exact.subsetOf(got),
        s"portableHash=$portable lost a contaminated doc: $got vs $exact")
      // 20 bits/shingle over a handful of shingles: FPs vanishing, so
      // the flag sets should be exactly equal here
      assert(got == exact, s"portableHash=$portable over-flagged: $got")
    }
  }

  test("pre-r17 legacy NTZ digests still read via the compat fallback; " +
    "real corruption still refuses") {
    val rows = (1 to 60).map { i =>
      (s"2026-01-0${i % 3 + 1} 12:00:00", i.toLong, i.toLong)
    }.toDF("wall", "id", "v")
      .withColumn("wall", col("wall").cast("timestamp_ntz"))
    val sk = GroupedQuantileSketch.buildGrouped(rows, Seq("wall"), "id", "v",
      32, "lgc17")
    val dir = java.nio.file.Files.createTempDirectory("ntzlegacy").toString
    GroupedQuantileSketch.write(sk, dir)
    // recompute the digests a PRE-r17 release would have stored under
    // this UTC session (NTZ via unix_millis(cast('timestamp'))) and
    // swap them into the json — an old-format file, synthesized exactly
    def legacyDigest(df: org.apache.spark.sql.DataFrame,
        cols: Seq[String]): Long = {
      val exprs = cols.map { c =>
        df.schema(c).dataType match {
          case org.apache.spark.sql.types.TimestampNTZType =>
            unix_millis(col(c).cast("timestamp"))
          case _ => col(c)
        }
      }
      df.select(conv(substring(md5(concat_ws("",
          exprs.map(e => coalesce(e.cast("string"), lit("N"))): _*)),
          1, 15), 16, 10).cast("long").as("__d"))
        .agg(coalesce(expr("bit_xor(__d)"), lit(0L))).head().getLong(0)
    }
    val sd = legacyDigest(spark.read.parquet(s"$dir/summary"),
      Seq("wall", "rk", "value"))
    val cd = legacyDigest(spark.read.parquet(s"$dir/counts"),
      Seq("wall", "n"))
    val jsonPath = java.nio.file.Paths.get(dir, "gqsketch.json")
    val json = new String(java.nio.file.Files.readAllBytes(jsonPath), "UTF-8")
    assert(json.contains("summaryDigest"))
    val rewritten = json
      .replaceAll("\"summaryDigest\":-?\\d+", "\"summaryDigest\":" + sd)
      .replaceAll("\"countsDigest\":-?\\d+", "\"countsDigest\":" + cd)
    java.nio.file.Files.write(jsonPath, rewritten.getBytes("UTF-8"))
    // the raw rewrite invalidates Hadoop LocalFS's checksum sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, ".gqsketch.json.crc"))
    // the fallback accepts the legacy file (same-TZ, its old contract)
    assert(GroupedQuantileSketch.read(spark, dir).counts.count() == 3)
    // but a tampered payload still refuses — the fallback must not
    // swallow real corruption
    val counts = spark.read.parquet(s"$dir/counts")
    counts.withColumn("n", col("n") + 1L).write.mode("overwrite")
      .parquet(s"$dir/counts_bad")
    // swap the corrupted payload in place of the valid one
    val fsDir = new java.io.File(s"$dir/counts")
    org.apache.commons.io.FileUtils.deleteDirectory(fsDir)
    new java.io.File(s"$dir/counts_bad").renameTo(fsDir)
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.read(spark, dir)
    }.getMessage.contains("digest mismatch"))
  }

  test("r16 ADVICE: rankOf refuses a summary group missing from counts " +
    "instead of silently dropping it") {
    val rows = (1 to 60).map(i => (s"g${i % 2}", i.toLong, i.toLong))
      .toDF("g", "id", "v")
    val sk = GroupedQuantileSketch.buildGrouped(rows, Seq("g"), "id", "v",
      16, "rg17")
    val desynced = sk.copy(counts = sk.counts.where(col("g") =!= "g1"))
    val e = intercept[Exception] { desynced.rankOf(30L).collect() }
    assert(e.getMessage.contains("desynchronized"),
      s"expected the desync refusal, got: ${e.getMessage}")
  }
}
