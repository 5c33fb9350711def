package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed corpus storage: pre-shuffle ONCE at write time so every later
  * join/aggregation on the bucket key runs exchange-free.
  *
  * The pipeline operators that dominate a training-data corpus's life —
  * join dedup verdicts back to documents, join quality/contamination
  * flags, self-join of per-doc derived tables — all key on the document
  * id. Plain parquet pays a full shuffle of the big side on EVERY such
  * join; a corpus bucketed by id pays the shuffle once at ingest, and
  * every subsequent equi-join against another table bucketed the same
  * way (same key, same bucket count) plans as a zero-Exchange
  * SortMergeJoin. At 100 TB a saved shuffle is the dominant term of the
  * whole job.
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`), so
  * tables are addressed by name; `location` pins the data to an explicit
  * path. Bucket pruning additionally turns point lookups on the key into
  * single-bucket scans.
  */
object BucketedCorpus {

  /** Write `df` bucketed (and sorted within buckets) by `keyCol`.
    * `table` is the catalog name; if `location` is given the files land
    * there (external table), otherwise in the session warehouse dir.
    */
  def write(
      df: DataFrame,
      table: String,
      keyCol: String,
      numBuckets: Int,
      location: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val w = df.write.mode(mode)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
    location.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Reopen a bucketed table by name (bucket metadata comes from the
    * catalog — reading the files as plain parquet would lose it, so
    * loads must go through the table).
    */
  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when a join of `a` and `b` on `keyCol` would be co-located:
    * both sides bucketed by that key with the same bucket count.
    */
  def colocated(spark: SparkSession, tableA: String, tableB: String, keyCol: String): Boolean = {
    def spec(t: String): Option[(Seq[String], Int)] = {
      // total predicate: anything that isn't a bucketed catalog table —
      // missing names, temp views, unparseable identifiers — is simply
      // "not co-located", never an exception. Reads bucketSpec from the
      // catalog's structured metadata (parsing DESCRIBE TABLE EXTENDED's
      // human-readable rows was brittle across Spark versions and
      // silently returned false on format drift).
      try {
        if (!spark.catalog.tableExists(t)) return None
        val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
        spark.sessionState.catalog.getTableMetadata(ident).bucketSpec
          .map(bs => (bs.bucketColumnNames.toSeq, bs.numBuckets))
      } catch {
        // temp views pass tableExists but have no external-catalog entry;
        // 3-part or special-character names fail the 2-part parser
        case scala.util.control.NonFatal(_) => None
      }
    }
    (spec(tableA), spec(tableB)) match {
      case (Some((ca, na)), Some((cb, nb))) =>
        ca == Seq(keyCol) && cb == Seq(keyCol) && na == nb
      case _ => false
    }
  }
}
