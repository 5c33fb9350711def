package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain admission quotas — the ingest-time counterpart of
  * [[graft.ops.Sampling.capPerDomain]]: a batch corpus can cap each
  * domain after the fact, but an ingest pipeline must decide admit/drop
  * as documents ARRIVE, against everything that domain has ever sent.
  * (The reference library has no streaming surface; this extends the
  * same §2.5 sink story as [[StreamDedup]].)
  */
object StreamQuota {

  // public: Catalyst's generated deserializer needs accessor visibility
  case class QuotaRow(domain: String, id: Long, ts: java.sql.Timestamp)

  /** Admit at most `maxDocs` documents per domain over the STREAM'S
    * LIFETIME (no watermark expiry — a quota is a permanent budget, so
    * keys never time out; restarts recover the counters from the state
    * store via checkpointing). Within a micro-batch, arrivals are
    * admitted in (event time, id) order, so the admitted set is
    * deterministic for a given batch slicing.
    *
    * State is ONE long per domain — the smallest possible stateful
    * footprint, bounded by the domain universe, not the stream length.
    * The single shuffle is the groupByKey on domain; a pathological
    * one-domain feed serializes through one task, which is inherent to
    * per-domain sequential admission (pre-filter with a hash sample if
    * a domain's feed rate dwarfs its quota).
    *
    * Emits admitted rows: (domain, id, ts, rk) with rk the domain's
    * 1-based lifetime admission rank. Works identically on batch frames
    * (runs as one group pass).
    */
  def domainQuota(
      docs: DataFrame,
      tsCol: String,
      domainCol: String,
      idCol: String,
      maxDocs: Long): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select(
      col(domainCol).cast("string").as("domain"),
      col(idCol).cast("long").as("id"),
      col(tsCol).cast("timestamp").as("ts")).as[QuotaRow]
    val cap = maxDocs
    val admitted = rows.groupByKey(_.domain)
      .flatMapGroupsWithState[Long, (String, Long, java.sql.Timestamp, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, in: Iterator[QuotaRow], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = List.newBuilder[(String, Long, java.sql.Timestamp, Long)]
          in.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
            if (n < cap) {
              n += 1
              out += ((domain, r.id, r.ts, n))
            }
          }
          state.update(n)
          out.result().iterator
      }
    admitted.toDF("domain", "id", "ts", "rk")
  }
}
