package graft

import graft.ops.{GroupedQuantileSketch, QuantileSketch}
import org.apache.spark.sql.functions._

/** Round-20 wave 2: the GROUPED mergeable rank sketch. The load-bearing
  * pin is grouped == per-group-scalar (every grouped answer equals the
  * scalar [[QuantileSketch]] run on that group's slice — the
  * estimateGrouped-vs-estimate discipline from HllSpec), plus merge
  * semantics, null policies, refusal surfaces, and persistence with
  * two-frame digest validation.
  */
class GroupedQuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  private def mkDocs(n: Int) = {
    val rnd = new scala.util.Random(91)
    Seq.tabulate(n) { i =>
      val g = Seq("en", "de", "fr")(rnd.nextInt(3))
      (i.toLong, g, rnd.nextInt(100000).toLong)
    }.toDF("id", "g", "v")
  }

  test("grouped summary, quantiles, and rankOf all equal the per-group " +
    "scalar sketch exactly") {
    val df = mkDocs(3000)
    val gsk = GroupedQuantileSketch.buildGrouped(df, Seq("g"), "id", "v", 64, "gq")
    val groups = Seq("en", "de", "fr")
    val scalar = groups.map(g =>
      g -> QuantileSketch.build(df.where(col("g") === g), "id", "v", 64, "gq")).toMap

    // summary rows per group == the scalar bottom-k of that slice
    groups.foreach { g =>
      val got = gsk.summary.where(col("g") === g)
        .select("rk", "value").as[(Long, Long)].collect().toSeq.sorted
      val want = scalar(g).summary.as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"group $g summary")
    }
    // counts == per-group n
    val cnts = gsk.counts.as[(String, Long)].collect().toMap
    groups.foreach(g => assert(cnts(g) == scalar(g).n, s"group $g n"))

    // quantile answers == scalar quantile per group, for every pct row
    val q = gsk.quantiles(Seq(10, 50, 90))
      .select("g", "pct", "value").as[(String, Long, Long)].collect()
    assert(q.length == 9)
    q.foreach { case (g, p, v) =>
      assert(v == scalar(g).quantile(p.toInt), s"group $g pct $p")
    }

    // rankOf == scalar rankOf per group (exact floor arithmetic)
    Seq(0L, 25000L, 50000L, 99999L).foreach { thr =>
      val got = gsk.rankOf(thr).select("g", "le_est")
        .as[(String, Long)].collect().toMap
      groups.foreach(g =>
        assert(got(g) == scalar(g).rankOf(thr), s"group $g thr $thr"))
    }
  }

  test("merge of disjoint slices == one-shot build, merge-order independent; " +
    "counts add; null group and null id/value policies hold") {
    val df = mkDocs(2000)
    val whole = GroupedQuantileSketch.buildGrouped(df, Seq("g"), "id", "v", 32, "gm")
    val parts = Seq(0, 1, 2).map(r => GroupedQuantileSketch.buildGrouped(
      df.where(col("id") % 3 === r), Seq("g"), "id", "v", 32, "gm"))
    def normalized(sk: GroupedQuantileSketch) =
      (sk.summary.select("g", "rk", "value").as[(String, Long, Long)]
         .collect().toSeq.sorted,
       sk.counts.select("g", "n").as[(String, Long)].collect().toSeq.sorted)
    val m1 = parts(0).merge(parts(1)).merge(parts(2))
    val m2 = parts(2).merge(parts(0).merge(parts(1)))
    assert(normalized(m1) == normalized(whole))
    assert(normalized(m2) == normalized(whole))

    // null GROUP is retained as a group; null id / null value excluded
    val withNulls = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, null, 10L), (2L, null, 20L), (3L, "en", 30L),
      (null, "en", 40L), (4L, "en", null)).toDF("id", "g", "v")
    val sk = GroupedQuantileSketch.buildGrouped(
      withNulls, Seq("g"), "id", "v", 16, "gn")
    val cnts = sk.counts.as[(String, Long)].collect().toMap
    assert(cnts(null) == 2L && cnts("en") == 1L)
    val nullQ = sk.quantiles(Seq(50, 100))
      .where(col("g").isNull).select("pct", "value")
      .as[(Long, Long)].collect().toMap
    assert(nullQ(50L) == 10L && nullQ(100L) == 20L)
  }

  test("double-valued grouped sketch: NaN/null excluded, -0.0 normalized, " +
    "typed accessors refuse across types") {
    val rows = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 5.5), (2L, "a", Double.NaN), (3L, "a", -0.0),
      (4L, "a", 1.25), (5L, "b", null), (6L, "b", -3.5)).toDF("id", "g", "v")
    val sk = GroupedQuantileSketch.buildGroupedDouble(
      rows, Seq("g"), "id", "v", 16, "gd")
    val cnts = sk.counts.as[(String, Long)].collect().toMap
    assert(cnts("a") == 3L && cnts("b") == 1L)
    val q = sk.quantiles(Seq(100)).select("g", "value")
      .as[(String, Double)].collect().toMap
    assert(q("a") == 5.5 && q("b") == -3.5)
    val stored = sk.summary.where(col("value") === 0.0)
      .select("value").as[Double].collect()
    assert(stored.length == 1 && 1.0 / stored.head > 0) // -0.0 normalized
    // group a holds {5.5, 0.0, 1.25}: exactly one value <= 0.0
    assert(sk.rankOfDouble(0.0).where(col("g") === "a")
      .select("le_est").as[Long].head() == 1L)
    assert(intercept[IllegalArgumentException] { sk.rankOf(1L) }
      .getMessage.contains("use rankOfDouble"))
    assert(intercept[IllegalArgumentException] { sk.rankOfDouble(Double.NaN) }
      .getMessage.contains("NaN has no rank"))
    val lng = GroupedQuantileSketch.buildGrouped(
      Seq((1L, "a", 2L)).toDF("id", "g", "v"), Seq("g"), "id", "v", 16, "gd")
    assert(intercept[IllegalArgumentException] { lng.rankOfDouble(1.0) }
      .getMessage.contains("use rankOf"))
  }

  test("refusal surfaces: type guards, empty/reserved groupCols, s bounds, " +
    "pct bounds, geometry mismatches (incl. groupCols)") {
    val lng = Seq((1L, "a", 2L)).toDF("id", "g", "v")
    val dbl = Seq((1L, "a", 2.5)).toDF("id", "g", "v")
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.buildGrouped(dbl, Seq("g"), "id", "v", 16, "q")
    }.getMessage.contains("buildGroupedDouble"))
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.buildGroupedDouble(lng, Seq("g"), "id", "v", 16, "q")
    }.getMessage.contains("GroupedQuantileSketch.buildGrouped "))
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.buildGrouped(lng, Seq.empty, "id", "v", 16, "q")
    }.getMessage.contains("groupCols must be non-empty"))
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.buildGrouped(
        lng.withColumnRenamed("g", "value"), Seq("value"), "id", "v", 16, "q")
    }.getMessage.contains("collide"))
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.buildGrouped(lng, Seq("g"), "id", "v", 8, "q")
    }.getMessage.contains("s must be in [16, 65536]"))
    val sk = GroupedQuantileSketch.buildGrouped(lng, Seq("g"), "id", "v", 16, "q")
    assert(intercept[IllegalArgumentException] { sk.quantiles(Seq(0)) }
      .getMessage.contains("must be in [1,100]"))
    assert(intercept[IllegalArgumentException] { sk.quantiles(Seq(50, 50)) }
      .getMessage.contains("duplicate"))
    Seq(
      GroupedQuantileSketch.buildGrouped(lng, Seq("g"), "id", "v", 32, "q"),
      GroupedQuantileSketch.buildGrouped(lng, Seq("g"), "id", "v", 16, "OTHER"),
      GroupedQuantileSketch.buildGrouped(
        lng.withColumnRenamed("g", "h"), Seq("h"), "id", "v", 16, "q"),
      GroupedQuantileSketch.buildGroupedDouble(dbl, Seq("g"), "id", "v", 16, "q")
    ).foreach { other =>
      assert(intercept[IllegalArgumentException] { sk.merge(other) }
        .getMessage.contains("geometry mismatch"))
    }

    // structural guards: a hand-concatenated summary (bypassing merge)
    // is not a per-group bottom-k and must refuse, not mis-rank
    val big = GroupedQuantileSketch.buildGrouped(
      Seq.tabulate(64)(i => (i.toLong, "a", i.toLong)).toDF("id", "g", "v"),
      Seq("g"), "id", "v", 16, "q")
    val forged = big.copy(summary = big.summary.unionByName(
      big.summary.withColumn("rk", col("rk") + 1)))
    assert(intercept[Exception] { forged.quantiles(Seq(50)).collect() }
      .getMessage.contains("differs from min(n_g"))
    assert(intercept[Exception] { forged.rankOf(5L).collect() }
      .getMessage.contains("desynchronized"))
  }

  test("regroup to coarser strata and toGlobal are EXACT rollups: equal the " +
    "direct coarse/global builds (never approximations)") {
    // fine strata: (hour, lang); coarse: lang alone; global: scalar
    val rnd = new scala.util.Random(92)
    val df = Seq.tabulate(4000) { i =>
      (i.toLong, (rnd.nextInt(24) * 3600000L), Seq("en", "de")(rnd.nextInt(2)),
        rnd.nextInt(100000).toLong)
    }.toDF("id", "hour", "g", "v")
    val fine = GroupedQuantileSketch.buildGrouped(
      df, Seq("hour", "g"), "id", "v", 32, "rg")

    // regroup (hour, g) -> g: must equal the direct per-g build exactly
    val coarse = fine.regroup(Seq("g" -> col("g")))
    val direct = GroupedQuantileSketch.buildGrouped(
      df, Seq("g"), "id", "v", 32, "rg")
    def norm(sk: GroupedQuantileSketch) =
      (sk.summary.select("g", "rk", "value").as[(String, Long, Long)]
         .collect().toSeq.sorted,
       sk.counts.select("g", "n").as[(String, Long)].collect().toSeq.sorted)
    assert(norm(coarse) == norm(direct))
    assert(coarse.groupCols == Seq("g"))
    // answers flow through the regrouped sketch unchanged
    assert(coarse.quantiles(Seq(50)).select("g", "value")
      .as[(String, Long)].collect().toMap ==
      direct.quantiles(Seq(50)).select("g", "value")
        .as[(String, Long)].collect().toMap)

    // regroup can also COMPUTE the coarse key (6-hour buckets from hours)
    val sixHourly = fine.regroup(Seq(
      "bucket" -> (col("hour") - col("hour") % (6 * 3600000L)), "g" -> col("g")))
    val directSix = GroupedQuantileSketch.buildGrouped(
      df.withColumn("bucket", col("hour") - col("hour") % (6 * 3600000L)),
      Seq("bucket", "g"), "id", "v", 32, "rg")
    assert(sixHourly.summary.select("bucket", "g", "rk", "value")
      .as[(Long, String, Long, Long)].collect().toSeq.sorted ==
      directSix.summary.select("bucket", "g", "rk", "value")
        .as[(Long, String, Long, Long)].collect().toSeq.sorted)

    // toGlobal: equals the scalar one-shot build
    val global = fine.toGlobal
    val scalarDirect = QuantileSketch.build(df, "id", "v", 32, "rg")
    assert(global.summary.as[(Long, Long)].collect().toSeq.sorted ==
      scalarDirect.summary.as[(Long, Long)].collect().toSeq.sorted)
    assert(global.n == 4000L && global.quantile(50) == scalarDirect.quantile(50))

    // refusals: empty / duplicate / reserved new-group names
    assert(intercept[IllegalArgumentException] { fine.regroup(Seq.empty) }
      .getMessage.contains("toGlobal"))
    assert(intercept[IllegalArgumentException] {
      fine.regroup(Seq("a" -> col("g"), "a" -> col("hour")))
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      fine.regroup(Seq("value" -> col("g")))
    }.getMessage.contains("collide"))
  }

  test("persistence: roundtrip preserves answers; corrupting EITHER frame " +
    "(summary or counts) refuses; missing directory refuses") {
    val df = mkDocs(800)
    val sk = GroupedQuantileSketch.buildGrouped(df, Seq("g"), "id", "v", 32, "gp")
    val dir = java.nio.file.Files.createTempDirectory("gqsketch").toString
    GroupedQuantileSketch.write(sk, dir)
    val loaded = GroupedQuantileSketch.read(spark, dir)
    assert((loaded.s, loaded.seed, loaded.groupCols, loaded.doubleValued) ==
      ((32, "gp", List("g"), false)))
    def q50(s: GroupedQuantileSketch) = s.quantiles(Seq(50))
      .select("g", "value").as[(String, Long)].collect().toMap
    assert(q50(loaded) == q50(sk))

    // corrupt counts only: summary digest passes, counts digest refuses
    sk.counts.withColumn("n", col("n") + 1L)
      .write.mode("overwrite").parquet(s"$dir/counts")
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.read(spark, dir)
    }.getMessage.contains("counts digest mismatch"))

    // corrupt summary
    val dir2 = java.nio.file.Files.createTempDirectory("gqsketch2").toString
    GroupedQuantileSketch.write(sk, dir2)
    sk.summary.limit(3).write.mode("overwrite").parquet(s"$dir2/summary")
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.read(spark, dir2)
    }.getMessage.contains("summary digest mismatch"))

    val none = java.nio.file.Files.createTempDirectory("gqsketch_none").toString
    assert(intercept[IllegalArgumentException] {
      GroupedQuantileSketch.read(spark, none)
    }.getMessage.contains("not a sketch directory"))
  }

  test("works on real data: per-lang doc-length p50 within the DKW envelope " +
    "of the exact per-group percentiles (sf0.001)") {
    val docs = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val sk = GroupedQuantileSketch.buildGrouped(
      docs, Seq("lang"), "doc_id", "n_chars", 64, "gr")
    val est = sk.quantiles(Seq(50)).select("lang", "value")
      .as[(String, Long)].collect().toMap
    val eps = math.sqrt(math.log(2.0 / 0.01) / (2.0 * 64))
    val byLang = docs.where(col("n_chars").isNotNull)
      .select(col("lang"), col("n_chars").cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    est.foreach { case (lang, v) =>
      val vals = byLang(lang).map(_._2).sorted
      val n = vals.length
      val estRank = vals.count(_ <= v)
      val k = (50L * n + 99L) / 100L
      assert(math.abs(estRank - k) <= math.max(1.0, eps * n),
        s"lang $lang: est $v rank $estRank vs k $k (n=$n)")
    }
  }
}
