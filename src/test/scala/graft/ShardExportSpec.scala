package graft

import graft.sources.ShardExport
import org.apache.spark.sql.functions._

/** [[graft.sources.ShardExport]]: deterministic shard assignment, the
  * order-independent manifest, write/read round-trip with partition
  * pruning, and the integrity check.
  */
class ShardExportSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

  test("shard assignment is deterministic, seed-rotatable, and in range") {
    val a = ShardExport.assignShards(docs, "doc_id", 8, "s1")
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = ShardExport.assignShards(docs.repartition(13), "doc_id", 8, "s1")
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert(a.values.forall(s => s >= 0 && s < 8))
    assert(a.values.toSet.size > 1, "more than one shard should be populated")
    val c = ShardExport.assignShards(docs, "doc_id", 8, "s2")
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a != c, "a different seed must rotate the assignment")
  }

  test("manifest is order-independent and counts every row exactly once") {
    val tagged = ShardExport.assignShards(docs, "doc_id", 4, "m1")
    val m1 = ShardExport.manifest(tagged, "doc_id", Seq("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val m2 = ShardExport.manifest(tagged.orderBy(col("doc_id").desc).repartition(9),
        "doc_id", Seq("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m1 == m2, "manifest must not depend on row order or partitioning")
    assert(m1.values.map(_._1).sum == docs.count())
    // a content change flips the digest but not the counts
    val tampered = ShardExport.manifest(
      tagged.withColumn("text", when(col("doc_id") === 0, lit("TAMPERED")).otherwise(col("text"))),
      "doc_id", Seq("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m1.keySet == tampered.keySet)
    assert(m1 != tampered, "digest must change when content changes")
  }

  test("write/read round-trip: pruned shard reads, stored manifest matches, verify passes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val m = ShardExport.writeShards(docs, dir, "doc_id", Seq("text"), col("n_chars"),
      nShards = 4, seed = "w1")
    assert(m.count() == 4)
    // per-shard read returns exactly the assigned rows, via partition pruning
    val expect0 = ShardExport.assignShards(docs, "doc_id", 4, "w1")
      .where(col("shard") === 0).count()
    val shard0 = ShardExport.readShard(spark, dir, 0)
    assert(shard0.count() == expect0)
    val plan = shard0.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"shard read must prune partitions:\n$plan")
    // integrity check is clean on an intact export
    assert(ShardExport.verifyExport(spark, dir, "doc_id", Seq("text"), col("n_chars")).count() == 0)
    // ... and reports a tampered manifest
    val stored = spark.read.parquet(s"$dir/manifest")
    stored.withColumn("n_rows", col("n_rows") + 1)
      .write.mode("overwrite").parquet(s"$dir/manifest2")
    spark.read.parquet(s"$dir/manifest2").write.mode("overwrite").parquet(s"$dir/manifest")
    val bad = ShardExport.verifyExport(spark, dir, "doc_id", Seq("text"), col("n_chars"))
    assert(bad.count() == 4, "every shard's stored row count was inflated")
  }

  test("re-export reproduces identical shards and digests") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-shards-a").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-shards-b").toString
    val m1 = ShardExport.writeShards(docs, d1, "doc_id", Seq("text"), col("n_chars"), 3, "rep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val m2 = ShardExport.writeShards(docs.repartition(5), d2, "doc_id", Seq("text"),
        col("n_chars"), 3, "rep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(m1 == m2)
    // deterministic intra-shard order: the written files replay byte-identically
    val r1 = spark.read.parquet(s"$d1/data").where(col("shard") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val r2 = spark.read.parquet(s"$d2/data").where(col("shard") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(r1 == r2, "intra-shard order must be deterministic across exports")
  }
}
