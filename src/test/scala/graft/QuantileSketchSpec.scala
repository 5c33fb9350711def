package graft

import graft.ops.{QuantileSketch, Quantiles}
import org.apache.spark.sql.functions._

/** Round-20 additions: the mergeable rank sketch (deterministic
  * bottom-k order-statistics sample) completing the CMS/HLL/rank
  * triad — summary structure vs an independent local md5 recomputation,
  * merge == one-shot, DKW rank-error envelope at three decades against
  * [[graft.ops.Quantiles]] ground truth, refusal surfaces, persistence.
  */
class QuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  /** Independent local replay of the summary construction: 60-bit rank
    * key = first 15 hex chars of md5("seed:id"), bottom-s by
    * (rk, value) — computed with java MessageDigest, not the operator's
    * Column expression.
    */
  private def localSummary(rows: Seq[(Long, Long)], s: Int,
      seed: String): Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, v) =>
      md.reset()
      val hex = md.digest(s"$seed:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(15), 16), v)
    }.sorted.take(s)
  }

  test("summary == independent local md5 bottom-k; merge of disjoint slices " +
    "== one-shot; merge is associative (pure function of the multiset)") {
    val rnd = new scala.util.Random(61)
    val rows = Seq.tabulate(3000)(i => (i.toLong, rnd.nextLong() % 100000L))
    val df = rows.toDF("id", "v")
    val sk = QuantileSketch.build(df, "id", "v", s = 64, seed = "qs")
    val got = sk.summary.as[(Long, Long)].collect().toSeq.sorted
    assert(got == localSummary(rows, 64, "qs"))
    assert(sk.n == 3000L)

    // disjoint thirds, merged in two different orders
    val parts = Seq(0, 1, 2).map(r =>
      QuantileSketch.build(df.where(col("id") % 3 === r), "id", "v", 64, "qs"))
    val m1 = parts(0).merge(parts(1)).merge(parts(2))
    val m2 = parts(2).merge(parts(0).merge(parts(1)))
    assert(m1.summary.as[(Long, Long)].collect().toSeq.sorted == got)
    assert(m2.summary.as[(Long, Long)].collect().toSeq.sorted == got)
    assert(m1.n == 3000L && m2.n == 3000L)
    assert(m1.quantile(50) == sk.quantile(50))
  }

  test("n <= s: the sample IS the multiset and every quantile/rank answer " +
    "is exact; null id and null value rows are excluded") {
    val rows = Seq.tabulate(500)(i => (i.toLong, (i * 37L) % 1000L))
    val sk = QuantileSketch.build(rows.toDF("id", "v"), "id", "v", 1024, "qx")
    val sorted = rows.map(_._2).sorted
    Seq(1, 5, 25, 50, 75, 95, 100).foreach { p =>
      val k = (p.toLong * 500L + 99L) / 100L
      assert(sk.quantile(p) == sorted((k - 1).toInt), s"pct $p")
    }
    assert(sk.rankOf(sorted(249)) == sorted.count(_ <= sorted(249)).toLong)
    assert(sk.rankOf(Long.MinValue) == 0L && sk.rankOf(Long.MaxValue) == 500L)
    // nulls carry no identity / no rank
    val withNulls = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (null, 20L), (2L, null), (3L, 30L)).toDF("id", "v")
    val sk2 = QuantileSketch.build(withNulls, "id", "v", 16, "qx")
    assert(sk2.n == 2L && sk2.quantile(100) == 30L)
  }

  test("rank error stays inside the DKW envelope at three decades " +
    "(s=1024, deterministic md5 sample)") {
    // values == ranks (distinct 1..n), so the true rank of an estimated
    // quantile value is the value itself
    val s = 1024
    // DKW: eps = sqrt(ln(2/delta)/(2s)); delta=0.01 -> eps ~ 0.0509.
    // The sample is FIXED (md5), so this is a determinism-safe bound.
    val eps = math.sqrt(math.log(2.0 / 0.01) / (2.0 * s))
    Seq(2000, 20000, 200000).foreach { n =>
      val df = spark.range(1, n + 1).select(col("id"), col("id").as("v"))
      val sk = QuantileSketch.build(df.toDF("id", "v"), "id", "v", s, "qd")
      Seq(1, 10, 50, 90, 99).foreach { p =>
        val k = (p.toLong * n + 99L) / 100L
        val est = sk.quantile(p)
        assert(math.abs(est - k) <= eps * n,
          s"n=$n pct=$p: est rank $est vs true $k exceeds eps*n=${eps * n}")
      }
      // rankOf: estimated CDF within the same envelope
      val mid = (n / 2).toLong
      assert(math.abs(sk.rankOf(mid) - mid) <= eps * n)
    }
  }

  test("agrees with Quantiles.exactPct ground truth within the envelope on " +
    "real data (documents n_chars, sf0.001)") {
    val docs = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val sk = QuantileSketch.build(docs, "doc_id", "n_chars", 64, "qr")
    val exact = Quantiles.exactPct(docs, "n_chars", Seq(10, 50, 90))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val vals = docs.where(col("n_chars").isNotNull)
      .select(col("n_chars").cast("long")).as[Long].collect().sorted
    val n = vals.length
    val eps = math.sqrt(math.log(2.0 / 0.01) / (2.0 * 64)) // ~0.203 at s=64
    Seq(10, 50, 90).foreach { p =>
      val est = sk.quantile(p)
      val estRank = vals.count(_ <= est).toLong
      val k = (p.toLong * n + 99L) / 100L
      assert(math.abs(estRank - k) <= eps * n,
        s"pct $p: est $est (rank $estRank) vs exact ${exact(p)} (rank $k)")
    }
  }

  test("double-valued sketch: NaN excluded, -0.0 normalized, typed accessors " +
    "refuse across types") {
    val rows = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.5), (2L, Double.NaN), (3L, -0.0), (4L, 1.25), (5L, null),
      (6L, -3.5)).toDF("id", "v")
    val sk = QuantileSketch.buildDouble(rows, "id", "v", 16, "qf")
    assert(sk.n == 4L) // NaN and null carry no rank
    assert(sk.quantileDouble(100) == 5.5 && sk.quantileDouble(1) == -3.5)
    // -0.0 normalized to +0.0 in the summary
    val stored = sk.summary.select("value").as[Double].collect()
    assert(stored.count(v => v == 0.0) == 1 &&
      stored.find(_ == 0.0).exists(v => 1.0 / v > 0))
    assert(sk.rankOfDouble(0.0) == 2L) // {-3.5, 0.0} of the 4 ranked values
    assert(intercept[IllegalArgumentException] { sk.quantile(50) }
      .getMessage.contains("use quantileDouble"))
    assert(intercept[IllegalArgumentException] { sk.rankOf(1L) }
      .getMessage.contains("use rankOfDouble"))
    assert(intercept[IllegalArgumentException] { sk.rankOfDouble(Double.NaN) }
      .getMessage.contains("NaN has no rank"))
    val lng = QuantileSketch.build(Seq((1L, 2L)).toDF("id", "v"), "id", "v", 16, "qf")
    assert(intercept[IllegalArgumentException] { lng.quantileDouble(50) }
      .getMessage.contains("use quantile"))
    // float columns widen exactly
    val flt = Seq((1L, 1.5f), (2L, 2.5f), (3L, 3.5f)).toDF("id", "v")
    assert(QuantileSketch.buildDouble(flt, "id", "v", 16, "qf")
      .quantileDouble(50) == 2.5)
  }

  test("refusal surfaces: type guards with redirects, s bounds, pct bounds, " +
    "geometry mismatches, empty sketch, structural summary guard") {
    val lng = Seq((1L, 2L)).toDF("id", "v")
    val dbl = Seq((1L, 2.5)).toDF("id", "v")
    assert(intercept[IllegalArgumentException] {
      QuantileSketch.build(dbl, "id", "v", 16, "q")
    }.getMessage.contains("buildDouble"))
    assert(intercept[IllegalArgumentException] {
      QuantileSketch.buildDouble(lng, "id", "v", 16, "q")
    }.getMessage.contains("QuantileSketch.build "))
    assert(intercept[IllegalArgumentException] {
      QuantileSketch.build(lng, "id", "v", 8, "q")
    }.getMessage.contains("s must be in [16, 65536]"))
    assert(intercept[IllegalArgumentException] {
      QuantileSketch.build(lng, "id", "v", 1 << 17, "q")
    }.getMessage.contains("s must be in [16, 65536]"))
    val sk = QuantileSketch.build(lng, "id", "v", 16, "q")
    assert(intercept[IllegalArgumentException] { sk.quantile(0) }
      .getMessage.contains("must be in [1,100]"))
    assert(intercept[IllegalArgumentException] { sk.quantile(101) }
      .getMessage.contains("must be in [1,100]"))
    // geometry mismatches refuse
    Seq(
      QuantileSketch.build(lng, "id", "v", 32, "q"),
      QuantileSketch.build(lng, "id", "v", 16, "OTHER"),
      QuantileSketch.buildDouble(dbl, "id", "v", 16, "q")
    ).foreach { other =>
      assert(intercept[IllegalArgumentException] { sk.merge(other) }
        .getMessage.contains("geometry mismatch"))
    }
    // empty sketch refuses quantiles, ranks are 0
    val empty = QuantileSketch.build(
      Seq.empty[(java.lang.Long, java.lang.Long)].toDF("id", "v"),
      "id", "v", 16, "q")
    assert(empty.n == 0L)
    assert(intercept[IllegalArgumentException] { empty.quantile(50) }
      .getMessage.contains("empty sketch"))
    assert(empty.rankOf(5L) == 0L)
    // a hand-concatenated frame is structurally not a summary
    val big = QuantileSketch.build(
      Seq.tabulate(64)(i => (i.toLong, i.toLong)).toDF("id", "v"),
      "id", "v", 16, "q")
    val forged = big.copy(summary = big.summary.unionByName(
      big.summary.withColumn("rk", col("rk") + 1)))
    assert(intercept[IllegalArgumentException] { forged.quantile(50) }
      .getMessage.contains("not a single bottom-k summary"))
  }

  test("persistence: geometry-safe roundtrip, corruption refusal, missing " +
    "directory refusal") {
    val rows = Seq.tabulate(800)(i => (i.toLong, (i * 13L) % 500L))
    val sk = QuantileSketch.build(rows.toDF("id", "v"), "id", "v", 64, "qp")
    val dir = java.nio.file.Files.createTempDirectory("qsketch").toString

    QuantileSketch.write(sk, dir)
    val loaded = QuantileSketch.read(spark, dir)
    assert((loaded.s, loaded.seed, loaded.n, loaded.doubleValued) ==
      ((64, "qp", 800L, false)))
    assert(loaded.quantile(50) == sk.quantile(50))
    assert(loaded.summary.as[(Long, Long)].collect().toSeq.sorted ==
      sk.summary.as[(Long, Long)].collect().toSeq.sorted)
    // merged-then-persisted == built-over-union (the snapshot story)
    val dir2 = java.nio.file.Files.createTempDirectory("qsketch2").toString
    val half1 = QuantileSketch.build(
      rows.take(400).toDF("id", "v"), "id", "v", 64, "qp")
    val half2 = QuantileSketch.build(
      rows.drop(400).toDF("id", "v"), "id", "v", 64, "qp")
    QuantileSketch.write(half1.merge(half2), dir2)
    assert(QuantileSketch.read(spark, dir2)
      .summary.as[(Long, Long)].collect().toSeq.sorted ==
      sk.summary.as[(Long, Long)].collect().toSeq.sorted)

    // corrupted summary payload -> digest mismatch refuses
    QuantileSketch.build(rows.take(50).toDF("id", "v"), "id", "v", 64, "qp")
      .summary.write.mode("overwrite").parquet(s"$dir/summary")
    assert(intercept[IllegalArgumentException] { QuantileSketch.read(spark, dir) }
      .getMessage.contains("digest mismatch"))

    val none = java.nio.file.Files.createTempDirectory("qsketch_none").toString
    assert(intercept[IllegalArgumentException] { QuantileSketch.read(spark, none) }
      .getMessage.contains("not a sketch directory"))
  }
}
