package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: the terminal sink of the curation pipeline.
  * A trained-on corpus ships as N fixed shards with a manifest (row
  * count, token mass, content digest per shard) so the training side
  * can (a) shard-parallel load without listing files, (b) verify
  * integrity end to end, and (c) reproduce the exact byte stream —
  * the T5/Dolma packaging discipline. The reference engine persists
  * models only; the data side is `graft` pipeline surface.
  *
  * Determinism contract (all engine-portable, hash-checked by
  * q_shard_manifest): shard(id) = first-32-md5-bits("seed:id") mod
  * nShards — reproducible across runs, partitionings, and engines, and
  * rotatable by seed; rows order within a shard by (hash, id) (the
  * [[graft.ops.Sampling.deterministicShuffle]] order, so a shard IS a
  * deterministic shuffle slice); the manifest digest is the bitwise
  * XOR of each row's 60-bit md5 content hash — order-independent, so
  * it can be verified with a map-side-combined aggregation that never
  * sorts.
  *
  * Plan shape: assignment and digests are expressions inside the scan
  * projection; the write is one hash repartition on the shard id; the
  * manifest is one two-phase aggregation whose shuffle carries
  * nShards rows. Nothing driver-sized anywhere; shard count bounds
  * file count, `maxRecordsPerFile` bounds file size within a shard.
  */
object ShardExport {

  /** 60-bit engine-portable content digest: first 15 hex digits of
    * md5(values joined by U+001F) — stays inside a signed 64-bit long
    * in every engine (no HUGEINT widening on the SQL side). In SQL:
    * `('0x' || substr(md5(...), 1, 15))::UBIGINT`.
    */
  private def digest60(cols: Seq[String]) =
    conv(substring(md5(concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic shard id in [0, nShards): first-32-md5-bits of
    * "seed:id" mod nShards (the [[graft.ops.Sampling.uniformBits]]
    * construction). Adds column `shard`.
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int, seed: String): DataFrame = {
    require(nShards >= 1, s"assignShards: nShards must be >= 1, got $nShards")
    df.withColumn("shard",
      pmod(graft.ops.Sampling.uniformBits(col(idCol), seed), lit(nShards.toLong)))
  }

  /** Per-shard manifest over an [[assignShards]]-tagged frame:
    * (shard, n_rows, n_tokens, digest) where digest = XOR of the rows'
    * 60-bit content hashes and n_tokens sums `tokenCol` (pass a
    * constant-0 column if token mass is not tracked). One two-phase
    * aggregation; the shuffle carries one row per shard.
    */
  def manifest(
      sharded: DataFrame,
      idCol: String,
      contentCols: Seq[String],
      tokenCol: org.apache.spark.sql.Column): DataFrame = {
    require(contentCols.nonEmpty, "manifest: contentCols must name at least one column")
    sharded
      .select(col("shard"), tokenCol.cast("long").as("__tok"),
        digest60(idCol +: contentCols).as("__dig"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__tok")).as("n_tokens"),
        expr("bit_xor(__dig)").as("digest"))
  }

  /** Export `df` as `nShards` deterministic shards under `path/data`
    * (parquet, partitioned by `shard`, rows in deterministic-shuffle
    * order within each shard) plus `path/manifest` (parquet, one row
    * per shard). Returns the manifest. Re-running with the same input
    * and seed reproduces identical shards and digests.
    */
  def writeShards(
      df: DataFrame,
      path: String,
      idCol: String,
      contentCols: Seq[String],
      tokenCol: org.apache.spark.sql.Column,
      nShards: Int,
      seed: String): DataFrame = {
    // The sort MUST lead with the partition column: FileFormatWriter
    // requires (shard) ordering and would otherwise insert its own
    // non-order-preserving sort on top, destroying the deterministic
    // intra-shard order (observed: the re-export spec caught it).
    // The hash-order expression stays inline so no dropped column
    // invalidates the plan's output ordering.
    assignShards(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"),
        graft.ops.Sampling.uniformBits(col(idCol), seed + ":ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/data")
    // The manifest digests the BYTES JUST WRITTEN, not a second
    // execution of df's lineage: an expensive upstream pipeline runs
    // once, and the stored manifest is verifyExport-consistent by
    // construction. (The partition column reads back as int — cast.)
    val written = df.sparkSession.read.parquet(s"$path/data")
      .withColumn("shard", col("shard").cast("long"))
    val m = manifest(written, idCol, contentCols, tokenCol)
    m.write.mode("overwrite").parquet(s"$path/manifest")
    df.sparkSession.read.parquet(s"$path/manifest")
  }

  /** Open one shard of an export — prunes to the shard's files via the
    * partition column (PartitionFilters, zero data read elsewhere).
    */
  def readShard(spark: SparkSession, path: String, shard: Long): DataFrame =
    spark.read.parquet(s"$path/data").where(col("shard") === shard)

  /** Re-derive the manifest from an export's data files and diff it
    * against the stored manifest — the integrity check the training
    * side runs before a job. Returns mismatching shards (empty = OK).
    */
  def verifyExport(
      spark: SparkSession,
      path: String,
      idCol: String,
      contentCols: Seq[String],
      tokenCol: org.apache.spark.sql.Column): DataFrame = {
    // the partition column reads back as INT — cast to long so the
    // re-derived manifest's schema matches the stored one exactly
    // (writeShards casts before manifesting)
    val actual = manifest(
        spark.read.parquet(s"$path/data").withColumn("shard", col("shard").cast("long")),
        idCol, contentCols, tokenCol)
      .withColumnRenamed("n_rows", "a_rows").withColumnRenamed("n_tokens", "a_tokens")
      .withColumnRenamed("digest", "a_digest")
    val stored = spark.read.parquet(s"$path/manifest")
    stored.join(actual, Seq("shard"), "full_outer")
      .where(coalesce(col("n_rows"), lit(-1L)) =!= coalesce(col("a_rows"), lit(-1L)) ||
        coalesce(col("n_tokens"), lit(-1L)) =!= coalesce(col("a_tokens"), lit(-1L)) ||
        coalesce(col("digest"), lit(0L)) =!= coalesce(col("a_digest"), lit(0L)))
  }
}
