package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the change-data step of an incremental
  * pipeline: given two snapshots of a keyed table (yesterday's corpus
  * and today's), classify every key as `added` / `removed` / `changed` /
  * `unchanged` by content digest. Downstream incremental operators
  * ([[IncrementalDedup]]'s ingest verdict, [[IvfIndex.append]]) then
  * process only the added/changed slice instead of the whole corpus —
  * at 100 TB the difference between a daily full rebuild and a
  * batch-proportional update.
  *
  * The reference engine has no snapshot surface (models persist, data
  * does not — `InterchangeV1` covers the model side); this is pipeline
  * surface beyond it.
  *
  * Plan shape: each side reduces to (key, md5 digest) inside its scan
  * projection — the shuffle carries 32-byte digests + keys, never
  * content — then ONE full outer hash join on the key. With both
  * snapshots stored bucketed by the key ([[graft.sources.BucketedCorpus]]
  * discipline) the join plans zero Exchange; otherwise it is the one
  * unavoidable shuffle. Status is engine-portable (md5 both sides), so
  * the whole diff hash-checks in SQL (q_snapshot_diff).
  */
object SnapshotDiff {

  /** Row-level diff of two snapshots on `idCol`, comparing the md5 of
    * the `contentCols` values joined by the unit
    * separator U+001F (multi-column digests cannot collide across
    * column boundaries the way a plain concat of ("ab","c") and
    * ("a","bc") would; precondition: contents contain no U+001F).
    * Returns (idCol, status, old_md5, new_md5) with status in
    * {added, removed, changed, unchanged}; `keepUnchanged = false`
    * drops the (typically dominant) unchanged class at the source.
    *
    * Precondition: `idCol` unique within each snapshot (the usual
    * doc_id contract; duplicate ids would cross-join in the outer
    * join). Nulls in content columns digest as the empty string.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      contentCols: Seq[String],
      keepUnchanged: Boolean = true): DataFrame = {
    require(contentCols.nonEmpty, "diff: contentCols must name at least one column")
    def digest(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol),
        md5(concat_ws("\u001f", contentCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
          .as(out))
    val o = digest(oldSnap, "old_md5")
    val n = digest(newSnap, "new_md5")
    val joined = o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_md5"), col("new_md5"))
    if (keepUnchanged) joined else joined.where(col("status") =!= "unchanged")
  }

  /** Per-status counts of [[diff]] — the audit row a scheduled pipeline
    * logs per snapshot pair. One extra map-side-combined aggregation
    * over the diff.
    */
  def diffStats(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, idCol, contentCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
