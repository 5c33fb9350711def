package graft

import graft.ops.Quantiles
import org.apache.spark.sql.functions._

/** Round-19 additions: exact distributed quantiles by iterative radix-
  * histogram refinement — checked against local sorted-array ground
  * truth across adversarial value distributions (full 64-bit range,
  * tie-heavy, negatives, single value), plus the refusal and null
  * policies.
  */
class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  private def groundTruthPct(vals: Seq[Long], pcts: Seq[Int]): Seq[(Long, Long, Long)] = {
    val sorted = vals.sorted
    val n = vals.length.toLong
    pcts.map { p =>
      val k = (p.toLong * n + 99L) / 100L
      (p.toLong, k, sorted((k - 1).toInt))
    }
  }

  private val allPcts = Seq(1, 5, 10, 25, 50, 75, 90, 95, 99, 100)

  test("exactPct matches sorted-array ground truth on random longs with duplicates " +
    "and negatives") {
    val rnd = new scala.util.Random(19)
    val vals = Seq.fill(20000)(rnd.nextLong() % 10000L) ++ // heavy duplication
      Seq.fill(5000)(rnd.nextLong()) // full-range spread
    val got = Quantiles.exactPct(vals.toDF("v"), "v", allPcts)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == groundTruthPct(vals, allPcts))
  }

  test("full 64-bit extremes: Long.MinValue/MaxValue present, exact at every pct") {
    val rnd = new scala.util.Random(7)
    val vals = Seq(Long.MinValue, Long.MaxValue, 0L, -1L, 1L) ++
      Seq.fill(3000)(rnd.nextLong())
    val got = Quantiles.exactPct(vals.toDF("v"), "v", allPcts)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == groundTruthPct(vals, allPcts))
    // pct=1 with n=3005 -> k=31; pct=100 -> the exact max
    assert(got.last._3 == Long.MaxValue)
  }

  test("tie-heavy and degenerate inputs: all-equal, n=1, two values straddling " +
    "a radix boundary") {
    val eq = Seq.fill(500)(42L)
    assert(Quantiles.exactPct(eq.toDF("v"), "v", Seq(1, 50, 100))
      .as[(Long, Long, Long)].collect().forall(_._3 == 42L))
    assert(Quantiles.exactPct(Seq(7L).toDF("v"), "v", Seq(1, 100))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1) ==
      Seq((1L, 1L, 7L), (100L, 1L, 7L)))
    // values straddling the 2^13 radix bucket boundary with heavy ties
    val straddle = Seq.fill(4000)(8191L) ++ Seq.fill(4000)(8192L)
    val got = Quantiles.exactPct(straddle.toDF("v"), "v", allPcts)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == groundTruthPct(straddle, allPcts))
  }

  test("exactAtRanks: k=1 is min, k=n is max; out-of-range and duplicate ranks refuse; " +
    ">64 targets batch transparently") {
    val vals = (1L to 999L).map(i => i * 37L % 1000L)
    val got = Quantiles.exactAtRanks(vals.toDF("v"), "v", Seq(1L, 500L, 999L))
      .as[(Long, Long)].collect().toMap
    val sorted = vals.sorted
    assert(got == Map(1L -> sorted.head, 500L -> sorted(499), 999L -> sorted.last))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactAtRanks(vals.toDF("v"), "v", Seq(0L))
    }.getMessage.contains("ranks must be in [1,"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactAtRanks(vals.toDF("v"), "v", Seq(1000L))
    }.getMessage.contains("ranks must be in [1,"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactAtRanks(vals.toDF("v"), "v", Seq(5L, 5L))
    }.getMessage.contains("duplicate ranks"))
    // r15 ADVICE: >64 ranks used to throw selectKth's INTERNAL "batch
    // them" error from a validation-passing call — the public entry
    // points now batch in chunks of 64 themselves (here: 2 batches,
    // both exact)
    val many = (1L to 130L)
    val gotMany = Quantiles.exactAtRanks(vals.toDF("v"), "v", many)
      .as[(Long, Long)].collect().toMap
    assert(many.forall(k => gotMany(k) == sorted((k - 1).toInt)))
  }

  test("nulls are excluded and ranks are relative to the non-null count; " +
    "empty input returns an empty frame") {
    val vals: Seq[java.lang.Long] = Seq[java.lang.Long](10L, null, 30L, null, 20L)
    val df = vals.toDF("v")
    val got = Quantiles.exactPct(df, "v", Seq(50, 100))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // n = 3 non-null: p50 -> k=2 -> 20; p100 -> k=3 -> 30
    assert(got == Seq((50L, 2L, 20L), (100L, 3L, 30L)))
    val empty = Quantiles.exactPct(
      Seq.empty[java.lang.Long].toDF("v"), "v", Seq(50))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("pct", "k", "value"))
  }

  test("exactPct parameter validation: empty, out-of-range, duplicate percentiles") {
    val df = Seq(1L).toDF("v")
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPct(df, "v", Seq.empty)
    }.getMessage.contains("non-empty"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPct(df, "v", Seq(0))
    }.getMessage.contains("must be in [1,100]"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPct(df, "v", Seq(101))
    }.getMessage.contains("must be in [1,100]"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPct(df, "v", Seq(50, 50))
    }.getMessage.contains("duplicate percentiles"))
  }

  test("exactPctWeighted == exactPct over the weight-expanded multiset; " +
    "zero weights carry no mass; negative weight refuses") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(800)((rnd.nextLong() % 500L, rnd.nextInt(5).toLong))
    val df = rows.toDF("v", "w")
    val pcts = Seq(1, 25, 50, 75, 100)
    val got = graft.ops.Quantiles.exactPctWeighted(df, "v", "w", pcts)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
    assert(got == groundTruthPct(expanded, pcts))
    // all-zero weights: no mass, empty result
    assert(graft.ops.Quantiles.exactPctWeighted(
      Seq((1L, 0L), (2L, 0L)).toDF("v", "w"), "v", "w", Seq(50)).count() == 0)
    // negative weight refuses loudly
    assert(intercept[IllegalArgumentException] {
      graft.ops.Quantiles.exactPctWeighted(
        Seq((1L, -2L)).toDF("v", "w"), "v", "w", Seq(50))
    }.getMessage.contains("negative weight"))
    // null value or null weight carries no mass
    val withNulls = Seq[(java.lang.Long, java.lang.Long)](
      (10L, 1L), (null, 5L), (20L, null), (30L, 2L)).toDF("v", "w")
    val g2 = graft.ops.Quantiles.exactPctWeighted(withNulls, "v", "w", Seq(100))
      .as[(Long, Long, Long)].collect().toSeq
    assert(g2 == Seq((100L, 3L, 30L))) // W = 3: one 10 + two 30s
  }

  test("exactPctDouble matches sorted-double ground truth across the adversarial " +
    "range (negatives, infinities, subnormals, -0.0); NaN and NULL carry no rank") {
    val rnd = new scala.util.Random(47)
    val base: Seq[Double] = Seq(Double.NegativeInfinity, Double.PositiveInfinity,
      -0.0, 0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      1e300, -1e300) ++
      Seq.fill(4000)(rnd.nextGaussian() * 1e3) ++
      Seq.fill(1000)(rnd.nextInt(50).toDouble) // tie stacks
    val pcts = Seq(1, 25, 50, 75, 99, 100)
    val got = graft.ops.Quantiles.exactPctDouble(base.toDF("v"), "v", pcts)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // ground truth over the -0.0-normalized multiset, total double order
    val norm = base.map(v => if (v == 0.0) 0.0 else v)
      .sorted(Ordering.Double.TotalOrdering)
    val n = norm.length.toLong
    val want = pcts.map { p =>
      val k = (p.toLong * n + 99L) / 100L
      (p.toLong, k, norm((k - 1).toInt))
    }
    assert(got == want) // bit-exact, including the infinities
    // NaN and NULL are excluded; ranks are over the remaining rows
    val mixed = Seq[java.lang.Double](1.0, Double.NaN, 3.0, null, 2.0).toDF("v")
    val g2 = graft.ops.Quantiles.exactPctDouble(mixed, "v", Seq(100))
      .as[(Long, Long, Double)].collect().toSeq
    assert(g2 == Seq((100L, 3L, 3.0)))
    // agrees with the integral operator on integer-valued doubles
    val ints = Seq.fill(500)(rnd.nextInt(1000).toLong)
    val viaLong = graft.ops.Quantiles.exactPct(ints.toDF("v"), "v", Seq(50))
      .as[(Long, Long, Long)].head()
    val viaDouble = graft.ops.Quantiles.exactPctDouble(
      ints.map(_.toDouble).toDF("v"), "v", Seq(50))
      .as[(Long, Long, Double)].head()
    assert(viaDouble._3 == viaLong._3.toDouble && viaDouble._2 == viaLong._2)
    // the transform itself: monotone involution on the adversarial set
    import graft.functions.SortableBits
    norm.sliding(2).foreach { case Seq(a, b) =>
      assert(SortableBits.toSortable(a) <= SortableBits.toSortable(b))
    }
    base.foreach(v =>
      assert(SortableBits.fromSortable(SortableBits.toSortable(v)) == v ||
        (v == 0.0 && SortableBits.fromSortable(SortableBits.toSortable(v)) == v)))
  }

  test("percentileFilter keeps exactly the closed percentile band, drops nulls, " +
    "and validates its bounds") {
    val rnd = new scala.util.Random(31)
    val vals = Seq.fill(2000)(rnd.nextLong() % 1000L)
    val df = vals.toDF("v")
    val kept = graft.ops.Quantiles.percentileFilter(df, "v", 10, 90)
      .as[Long].collect().toSeq
    val sorted = vals.sorted
    val n = vals.length.toLong
    val lo = sorted(((10L * n + 99L) / 100L - 1L).toInt)
    val hi = sorted(((90L * n + 99L) / 100L - 1L).toInt)
    assert(kept.sorted == vals.filter(v => v >= lo && v <= hi).sorted)
    // degenerate band (loPct == hiPct) keeps only ties at that value
    val band = graft.ops.Quantiles.percentileFilter(df, "v", 50, 50)
      .as[Long].collect().toSet
    assert(band == Set(sorted(((50L * n + 99L) / 100L - 1L).toInt)))
    // nulls never survive the band
    val withNulls = Seq[java.lang.Long](1L, null, 2L, 3L).toDF("v")
    assert(graft.ops.Quantiles.percentileFilter(withNulls, "v", 1, 100)
      .count() == 3)
    // empty input -> empty output, no exception
    assert(graft.ops.Quantiles.percentileFilter(
      Seq.empty[java.lang.Long].toDF("v"), "v", 1, 100).count() == 0)
    assert(intercept[IllegalArgumentException] {
      graft.ops.Quantiles.percentileFilter(df, "v", 90, 10)
    }.getMessage.contains("loPct <= hiPct"))
  }

  test("exactPctByGroup matches per-group ground truth, retains the null group, " +
    "and agrees with the global operator on a single group") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.tabulate(3000) { i =>
      val g = i % 4 match { case 0 => "a"; case 1 => "b"; case 2 => "c"; case _ => null }
      (g, rnd.nextLong() % 700L)
    }
    val df = rows.toDF("g", "v")
    val pcts = Seq(10, 50, 90)
    val got = graft.ops.Quantiles.exactPctByGroup(df, Seq("g"), "v", pcts)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      groundTruthPct(rs.map(_._2), pcts).map { case (p, k, v) => (Option(g), p, k, v) }
    }.toSet
    assert(got == want)
    assert(got.exists(_._1.isEmpty), "null group must be retained")
    // one group == the global operator
    val one = df.withColumn("g", lit("x"))
    val grouped = graft.ops.Quantiles.exactPctByGroup(one, Seq("g"), "v", pcts)
      .select("pct", "k", "value").as[(Long, Long, Long)].collect().toSet
    val global = graft.ops.Quantiles.exactPct(one, "v", pcts)
      .as[(Long, Long, Long)].collect().toSet
    assert(grouped == global)
  }

  test("type guards (r15 verdict): integral entry points refuse fractional " +
    "columns with a redirect; double entry points refuse integral columns") {
    val dbl = Seq(1.5, 2.5).toDF("v")
    val lng = Seq(1L, 2L).toDF("v")
    val fracW = Seq((1L, 0.5)).toDF("v", "w")
    // silently cast("long")-truncating a double column was the round's
    // one genuine defect - every integral entry point now refuses
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPct(dbl, "v", Seq(50))
    }.getMessage.contains("exactPctDouble"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactAtRanks(dbl, "v", Seq(1L))
    }.getMessage.contains("exactPctDouble"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPctWeighted(fracW.select(col("w").as("v"), lit(1L).as("w")),
        "v", "w", Seq(50))
    }.getMessage.contains("exactPctDouble"))
    // fractional WEIGHT refuses too (it would truncate rank mass)
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPctWeighted(fracW, "v", "w", Seq(50))
    }.getMessage.contains("integral"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPctByGroup(dbl.withColumn("g", lit("x")), Seq("g"), "v", Seq(50))
    }.getMessage.contains("exactPctByGroupDouble"))
    assert(intercept[IllegalArgumentException] {
      Quantiles.percentileFilter(dbl, "v", 1, 100)
    }.getMessage.contains("percentileFilterDouble"))
    // and the symmetric direction: doubles-of-longs lose precision past
    // 2^53, so the double entry points refuse integral columns
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPctDouble(lng, "v", Seq(50))
    }.getMessage.contains("exactPct "))
    assert(intercept[IllegalArgumentException] {
      Quantiles.exactPctByGroupDouble(lng.withColumn("g", lit("x")), Seq("g"), "v", Seq(50))
    }.getMessage.contains("exactPctByGroup "))
    assert(intercept[IllegalArgumentException] {
      Quantiles.percentileFilterDouble(lng, "v", 1, 100)
    }.getMessage.contains("exactPct"))
    // FloatType is accepted by the double entry points (exact widening)
    val flt = Seq(1.5f, 2.5f, 3.5f).toDF("v")
    assert(Quantiles.exactPctDouble(flt, "v", Seq(50))
      .as[(Long, Long, Double)].head()._3 == 2.5)
  }

  test("exactPctByGroupDouble matches per-group double ground truth, retains the " +
    "null group, excludes NaN/NULL values, and agrees with exactPctDouble on one group") {
    val rnd = new scala.util.Random(53)
    val rows = Seq.tabulate(2400) { i =>
      val g = i % 3 match { case 0 => "a"; case 1 => "b"; case _ => null }
      (g, rnd.nextGaussian() * 100.0)
    } ++ Seq(("a", -0.0), ("a", 0.0), ("b", Double.PositiveInfinity))
    val df = rows.toDF("g", "v")
    val pcts = Seq(10, 50, 90)
    val got = graft.ops.Quantiles.exactPctByGroupDouble(df, Seq("g"), "v", pcts)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val norm = rs.map(_._2).map(v => if (v == 0.0) 0.0 else v)
        .sorted(Ordering.Double.TotalOrdering)
      val n = norm.length.toLong
      pcts.map { p =>
        val k = (p.toLong * n + 99L) / 100L
        (Option(g), p.toLong, k, norm((k - 1).toInt))
      }
    }.toSet
    assert(got == want)
    assert(got.exists(_._1.isEmpty), "null group must be retained")
    // NaN and NULL values carry no rank; the group's n shrinks
    val mixed = Seq[(String, java.lang.Double)](("x", 1.0), ("x", Double.NaN),
      ("x", null), ("x", 3.0)).toDF("g", "v")
    val g2 = graft.ops.Quantiles.exactPctByGroupDouble(mixed, Seq("g"), "v", Seq(100))
      .select("pct", "k", "value").as[(Long, Long, Double)].collect().toSeq
    assert(g2 == Seq((100L, 2L, 3.0)))
    // one group == the global double operator
    val one = rows.toDF("g", "v").withColumn("g", lit("x"))
    val grouped = graft.ops.Quantiles.exactPctByGroupDouble(one, Seq("g"), "v", pcts)
      .select("pct", "k", "value").as[(Long, Long, Double)].collect().toSet
    val global = graft.ops.Quantiles.exactPctDouble(one, "v", pcts)
      .as[(Long, Long, Double)].collect().toSet
    assert(grouped == global)
  }

  test("percentileFilterDouble keeps exactly the closed band, drops NaN and nulls, " +
    "and its cutoffs are bit-exact elements of the column") {
    val rnd = new scala.util.Random(59)
    val vals = Seq.fill(3000)(rnd.nextGaussian() * 1e6)
    val df = vals.toDF("v")
    val kept = graft.ops.Quantiles.percentileFilterDouble(df, "v", 5, 95)
      .as[Double].collect().toSeq
    val sorted = vals.sorted(Ordering.Double.TotalOrdering)
    val n = vals.length.toLong
    val lo = sorted(((5L * n + 99L) / 100L - 1L).toInt)
    val hi = sorted(((95L * n + 99L) / 100L - 1L).toInt)
    assert(kept.sorted(Ordering.Double.TotalOrdering) ==
      vals.filter(v => v >= lo && v <= hi).sorted(Ordering.Double.TotalOrdering))
    // NaN and nulls never survive the band (NaN would pass `>= lo` under
    // NaN-high comparison semantics - the explicit isnan drop is load-bearing)
    val withJunk = Seq[java.lang.Double](1.0, Double.NaN, null, 2.0, 3.0).toDF("v")
    assert(graft.ops.Quantiles.percentileFilterDouble(withJunk, "v", 1, 100)
      .as[Double].collect().toSet == Set(1.0, 2.0, 3.0))
    // empty input -> empty output, no exception
    assert(graft.ops.Quantiles.percentileFilterDouble(
      Seq.empty[java.lang.Double].toDF("v"), "v", 1, 100).count() == 0)
  }

  test("matches the rank-window answer on real data (documents n_chars, sf0.001)") {
    val docs = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val pcts = Seq(5, 50, 95)
    val got = Quantiles.exactPct(docs, "n_chars", pcts)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val vals = docs.where(col("n_chars").isNotNull)
      .select(col("n_chars").cast("long")).as[Long].collect().toSeq
    assert(got == groundTruthPct(vals, pcts))
  }
}
