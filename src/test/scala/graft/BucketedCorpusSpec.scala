package graft

import graft.sources.BucketedCorpus
import org.apache.spark.sql.functions._

/** Bucketed storage: the written layout must make same-key joins
  * exchange-free — asserted on the EXECUTED PLAN, not just the API.
  */
class BucketedCorpusSpec extends SparkSpec {

  test("join of two tables bucketed on the same key plans with zero Exchange") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val flags = docs.select(col("doc_id"), (length(col("text")) % 7 === 0).as("flag"))
    // disable broadcast joins: the at-scale scenario bucketing exists for
    // is two sides too big to broadcast — force the shuffle-join regime
    // so the plan assertion tests bucketing, not the broadcast fallback
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedCorpus.write(docs, "bc_docs", "doc_id", numBuckets = 8)
      BucketedCorpus.write(flags, "bc_flags", "doc_id", numBuckets = 8)
      assert(BucketedCorpus.colocated(spark, "bc_docs", "bc_flags", "doc_id"))

      val a = BucketedCorpus.load(spark, "bc_docs")
      val b = BucketedCorpus.load(spark, "bc_flags")
      val joined = a.join(b, "doc_id")
      val n = joined.count()
      assert(n == docs.count(), s"join lost rows: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-located join must not shuffle; plan:\n${plan.take(1500)}")

      // same key through an aggregation: bucketing also feeds groupBy
      val aggPlan = a.groupBy(col("doc_id")).agg(count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle; plan:\n${aggPlan.take(1500)}")

      // negative control: the same join over plain parquet DOES shuffle,
      // so the assertion above is meaningful
      val plainPlan = docs.join(flags, "doc_id").queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"), "control: plain join should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bc_docs")
      spark.sql("DROP TABLE IF EXISTS bc_flags")
    }
  }

  test("colocated is a total predicate: temp views, odd names, and missing tables are false, not exceptions") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("lang"))
    docs.createOrReplaceTempView("bc_temp_view")
    try {
      BucketedCorpus.write(docs, "bc_real", "doc_id", numBuckets = 4)
      // temp view passes tableExists but has no external-catalog entry
      assert(!BucketedCorpus.colocated(spark, "bc_temp_view", "bc_real", "doc_id"))
      // 3-part and special-character identifiers must not throw
      assert(!BucketedCorpus.colocated(spark, "spark_catalog.default.nope", "bc_real", "doc_id"))
      assert(!BucketedCorpus.colocated(spark, "no such-table!", "bc_real", "doc_id"))
      assert(!BucketedCorpus.colocated(spark, "bc_real", "missing_table", "doc_id"))
    } finally {
      spark.catalog.dropTempView("bc_temp_view")
      spark.sql("DROP TABLE IF EXISTS bc_real")
    }
  }

  test("mismatched bucket counts are detected as not co-located") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("lang"))
    try {
      BucketedCorpus.write(docs, "bc_a", "doc_id", numBuckets = 4)
      BucketedCorpus.write(docs, "bc_b", "doc_id", numBuckets = 8)
      assert(!BucketedCorpus.colocated(spark, "bc_a", "bc_b", "doc_id"))
      assert(!BucketedCorpus.colocated(spark, "bc_a", "bc_b", "lang"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bc_a")
      spark.sql("DROP TABLE IF EXISTS bc_b")
    }
  }
}
