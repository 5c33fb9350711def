package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints a per-query JSON record plus a compact
  * headline line. Results are materialized through the noop sink so the
  * full plan executes (a bare count() would let Catalyst prune the
  * projections we're trying to measure).
  *
  * Robustness against a contended host (r7 postmortem: a driver-side
  * bench run showed 4-14x inflation on a handful of queries that
  * re-measured clean in isolation):
  *   - every query is timed SPARK_GRAFT_REPEAT times (default 3) and the
  *     per-query metric is the MEDIAN of its passes, so one contended
  *     pass cannot poison the number;
  *   - a sentinel re-runs any query whose median is still >3x its
  *     fastest pass (spread that wide means every pass was disturbed)
  *     and recomputes the median over all passes;
  *   - the LAST stdout line is a compact headline (<2000 chars) so a
  *     tail-capturing harness always sees one complete, parseable JSON
  *     line; the full per-query map is printed on its own line right
  *     before it.
  */
object Bench {

  /** Lower median: sorted order statistic at (n-1)/2 — the true median
    * for odd n; for even n the lower of the two middles, which for
    * timings avoids averaging a contended pass into the estimate.
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.length - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // ~111 queries x several codegen units overflow the default 100-entry
      // generated-code cache, forcing recompiles of already-seen plans
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/IO warmup so per-query numbers reflect steady state: one
    // relational query plus one tiny clustering fit (the Lloyd loop's
    // codegen/JIT paths are disjoint from the relational ones, and the
    // alphabetically-first clustering query would otherwise absorb them)
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      new graft.clustering.GeneralizedKMeans()
        .setK(4).setFeaturesCol("embedding").setSeed(1).setMaxIter(3)
        .fit(emb).transform(emb).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // Optional comma-separated subset for local profiling runs; the
    // driver never sets this, so per-round bench always runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // blank env value == unset, not "run nothing"
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    if (selected.isEmpty)
      System.err.println("[bench] warning: SPARK_GRAFT_ONLY matched zero queries")
    // Passes per query; the median is the reported metric. Set to 1 for
    // quick local profiling, higher to tighten the estimate further.
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(3)
    // Steady-state warmup: run every selected query once against the tiny
    // sf0.001 tables before timing. Schemas are identical across SFs, so
    // this compiles exactly the generated code the timed sf0.1 runs will
    // hit (Janino + C2), without touching the timed data scale. Measured
    // effect (repeat-profiling, r7): first execution of a query is 3-10x
    // its steady state purely from compile cost — a per-query CONSTANT
    // that is noise at the 100 TB design point, where a query's cost is
    // its data path. Disable with SPARK_GRAFT_WARM=off to measure
    // cold-start instead.
    if (sys.env.getOrElse("SPARK_GRAFT_WARM", "on") != "off") {
      val warmDir = "/root/testdata/sf0.001"
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }

    /** One timed execution; negative means the query threw. */
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // Trainer queries must never record a memo-cache hit: drop their
      // family's cached training state before EVERY timed run (passes and
      // sentinel re-runs alike) so the median carries the training cost,
      // while consumer queries keep measuring consumption only.
      SparkEntry.memoTrainers.get(name).foreach(_.apply())
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Queries are independent; drop any cache state a query left behind
      // so later queries measure their own plan, not the accumulated
      // storage/GC pressure of everything that ran before them (r4: the
      // same queries ran 2-4x slower late in the full 52-query run than
      // in isolation).
      spark.catalog.clearCache()
      if (ok) elapsed else -1.0
    }

    // Pass-interleaved timing (all queries pass 1, then pass 2, ...): a
    // transient contention window hits each query in at most one pass,
    // and the median discards it.
    val passTimes = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    for (pass <- 1 to repeat; (name, fn) <- selected) {
      val t = timeOnce(name, fn)
      passTimes(name) = passTimes.getOrElse(name, Nil) :+ t
      val _ = pass
    }
    // Contention sentinel: a median still >3x the fastest pass means no
    // clean majority of passes exists — take up to 2 extra measurements
    // and re-median over everything.
    val resampled = scala.collection.mutable.ListBuffer[String]()
    val results = selected.map { case (name, fn) =>
      var times = passTimes(name).filter(_ >= 0)
      val failed = times.isEmpty
      if (!failed && times.length > 1) {
        var extra = 0
        while (extra < 2 && median(times) > 3 * times.min) {
          System.err.println(f"[bench] $name: median ${median(times)}%.2f > 3x min ${times.min}%.2f, re-running")
          val t = timeOnce(name, fn)
          if (t >= 0) times = times :+ t
          extra += 1
        }
        if (extra > 0) resampled += name
      }
      name -> (if (failed) -1.0 else median(times))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Full record first (its own line), compact headline LAST: the
    // harness keeps only the final ~2000 chars of stdout, and the full
    // per-query map alone is ~2.5KB — a truncated JSON head parses as
    // nothing. The headline carries the gate metric plus the slowest
    // queries and always fits.
    val fullLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // Persist the full per-query map: the harness's stdout tail keeps only
    // ~2000 chars, which hid 108 of 175 per-query medians from round 17's
    // round-over-round delta analysis. Committed as bench_full_rN.json
    // next to PLANS.md at round close. Default under target/ (gitignored)
    // so ad-hoc runs never clutter or clobber tracked files; the round-close
    // copy to bench_full_rN.json is an explicit act.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (fullLine + "\n").getBytes("UTF-8"))
    }
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val nFail = results.count(_._2 < 0)
    // "passes" is the BASE count; queries the sentinel re-measured (their
    // medians span more passes) are named so the extra samples are visible
    val resampledJson = resampled.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n_queries":${results.length},"n_failed":$nFail,"passes":$repeat,"resampled":$resampledJson,"slowest":$slowest,"detail":"per-query medians on the full queries line above"}""")
    // Driver-parsable per-query records (r19 verdict #1): the single
    // ~7 KB per-query JSON line above overflows a tail-capturing
    // harness's buffer (BENCH_r18/r19 both stored it truncated mid-map,
    // so two rounds of PERF comparisons got zero per-query data). Emit
    // each median as its OWN short line — every line that survives any
    // tail window parses standalone — then close with one compact total
    // line (same schema as the headline) so the LAST stdout line is
    // still a complete total record. Additions only: every line printed
    // above is byte-identical to previous rounds' output.
    results.foreach { case (name, v) =>
      println(f"""{"q":"$name","sec":$v%.3f}""")
    }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n_queries":${results.length},"n_failed":$nFail}""")
    spark.stop()
  }
}
