package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared persistence plumbing for the sketch handles ([[CmsSketch]],
  * [[HllSketch]]): Hadoop-FS single-file metadata write/read and the
  * ORDER-INDEPENDENT 60-bit XOR content digest (the
  * [[graft.sources.ShardExport]] manifest construction — one
  * aggregation, no sort, no driver collect of the payload). Hoisted so
  * a filesystem or digest-scheme fix lands once; the handles own their
  * layouts and geometry semantics.
  */
private[ops] object SketchIo {

  /** XOR of each row's md5 over the unit-separator-joined `cols`
    * values. Row order is irrelevant, so persisted payloads need no
    * coalesce or sort to digest identically.
    */
  def xorDigest(df: DataFrame, cols: Seq[String]): Long =
    xorDigestCols(df, cols.map(col))

  /** [[xorDigest]] over pre-canonicalized column EXPRESSIONS. Two
    * hardening rules (r20 review): NULL values render as a control-char
    * sentinel rather than being DROPPED by concat_ws — without it,
    * (NULL, "x") and ("x", NULL) digest identically and a value-to-NULL
    * corruption slides the neighbor into its slot undetected; and
    * columns whose string form is environment-dependent must be
    * CANONICALIZED by the caller before digesting (timestamps render
    * under the session timezone — pass unix_millis; doubles under the
    * JVM formatter — pass sortable bits). The handles own that
    * canonicalization; see [[GroupedQuantileSketch.write]].
    */
  def xorDigestCols(df: DataFrame,
      cols: Seq[org.apache.spark.sql.Column]): Long = {
    df.select(rowDigestCol(cols).as("__d"))
      .agg(coalesce(expr("bit_xor(__d)"), lit(0L))).head().getLong(0)
  }

  /** Per-GROUP [[xorDigestCols]]: one aggregation returning a
    * (__g, __dig) row per distinct `group` value — the partition-scoped
    * digest primitive ([[SemDedupIndex]]'s per-cluster keeper digests):
    * validating or re-digesting a SUBSET of groups touches only those
    * groups' rows, so an incremental writer never pays an O(store)
    * digest pass. XOR of the per-group digests of a partition-disjoint
    * frame equals [[xorDigestCols]] of the whole frame.
    */
  def xorDigestColsBy(df: DataFrame, group: org.apache.spark.sql.Column,
      cols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.select(group.as("__g"), rowDigestCol(cols).as("__d"))
      .groupBy(col("__g"))
      .agg(coalesce(expr("bit_xor(__d)"), lit(0L)).as("__dig"))

  /** The shared row-digest expression behind [[xorDigestCols]] and
    * [[xorDigestColsBy]] (rule 5): md5 of the unit-separator-joined
    * column strings, truncated to 60 bits.
    */
  private def rowDigestCol(
      cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit("\u0002N\u0003"))): _*)),
      1, 15), 16, 10).cast("long")

  /** Digest column canonicalized to an environment-independent form
    * (r20 review; hoisted from GroupedQuantileSketch for the grouped
    * handles generally): timestamp string forms depend on the session
    * timezone and float/double string forms on the JVM formatter — a
    * sketch written in one session could be refused as corrupted in
    * another. Instanted timestamps digest as unix_millis; TIMESTAMP_NTZ
    * digests as its STRING form, which for a zoneless wall-clock is
    * already environment-independent — casting NTZ to TIMESTAMP first
    * would reintroduce the session timezone (the cast interprets the
    * wall-clock in spark.sql.session.timeZone), so a valid sketch
    * written under TZ A would be refused as corrupted under TZ B
    * (r16 ADVICE defect; write-in-A/read-in-B roundtrip pinned in
    * SketchHandleSpec). Floats digest as their sortable-bits longs;
    * everything else as its string form.
    */
  def canonicalCol(df: DataFrame, c: String): org.apache.spark.sql.Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        unix_millis(col(c))
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(c).cast("string")
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        graft.functions.SortableBits.sortable(col(c))
      case _ => col(c)
    }

  /** [[xorDigestCols]] over [[canonicalCol]]-canonicalized columns. */
  def canonicalDigest(df: DataFrame, cols: Seq[String]): Long =
    xorDigestCols(df, cols.map(canonicalCol(df, _)))

  /** True when `expected` matches the canonical digest of `df` — or,
    * for frames carrying a TIMESTAMP_NTZ column, the pre-r17 LEGACY
    * rule (`unix_millis(cast('timestamp'))`, session-timezone-
    * dependent). r17 fixed the NTZ canonicalization (the r16 ADVICE
    * defect); without this fallback every VALID pre-r17 sketch with an
    * NTZ column would refuse on read as "digest mismatch" — a
    * misleading corruption message for an intact payload (r17 review).
    * The legacy recompute matches only under the timezone the sketch
    * was written in, which is exactly the old behavior — strictly a
    * compat path, taken only after the canonical digest missed AND the
    * frame actually has an NTZ column. Every handle read goes through
    * this, so the rule lands once.
    */
  def digestMatches(df: DataFrame, cols: Seq[String], expected: Long): Boolean =
    canonicalDigest(df, cols) == expected || {
      cols.exists(c => df.schema(c).dataType ==
        org.apache.spark.sql.types.TimestampNTZType) &&
      xorDigestCols(df, cols.map { c =>
        df.schema(c).dataType match {
          case org.apache.spark.sql.types.TimestampNTZType =>
            unix_millis(col(c).cast("timestamp"))
          case _ => canonicalCol(df, c)
        }
      }) == expected
    }

  def writeFile(spark: SparkSession, dir: String, name: String,
      content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** `site` names the caller in the refusal (e.g. "CmsSketch.read"). */
  def readFile(spark: SparkSession, dir: String, name: String,
      site: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$site: $p not found - not a sketch directory")
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
