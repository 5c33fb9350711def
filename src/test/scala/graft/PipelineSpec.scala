package graft

import graft.ops.{Classify, Curate, Sampling}
import org.apache.spark.sql.functions._

/** Capstone integration: the full training-data pipeline composed from
  * the oracle-checked pieces — curate (+ span cutting) → containment
  * decontamination → classifier scoring → DSIR target-domain selection →
  * mixture planning → budgeted selection → deterministic shuffle —
  * every stage a DataFrame transform, end to end on real documents.
  */
class PipelineSpec extends SparkSpec {

  test("curate -> decontaminate -> classify -> select -> mix -> shuffle composes") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

    // 1. curate the English slice, cutting duplicated spans
    val curated = Curate.curateAndCut(docs, "doc_id", "text",
      minQuality = 0.0, spanMinLen = 8)
    val cleaned = curated.select(col("doc_id"), col("clean_text").as("text"),
      col("quality"))
    assert(cleaned.count() > 50)

    // 2. drop anything containing an "eval benchmark" (snippets of two docs)
    val ev = docs.where(col("doc_id").isin(0L, 101L))
      .select(col("doc_id"), substring(col("text"), 30, 150).as("text"))
    val decon = Curate.fuzzyDecontaminate(cleaned, "doc_id", "text",
      ev, "doc_id", "text", n = 3, threshold = 0.8, metric = "containment")
    val safe = cleaned.join(
      decon.where(!col("contaminated")).select("doc_id"), "doc_id")
    assert(safe.count() <= cleaned.count())

    // 3. classifier margin as a quality signal (model from the full corpus)
    val scored = safe.join(
      Classify.nbClassify(safe, docs.where(col("doc_id") % 7 === 0),
        "doc_id", "text", "lang"), "doc_id")
    assert(scored.count() == safe.count())

    // 4. DSIR-select 40 docs toward the German slice as target
    val w = Sampling.importanceWeights(scored, docs.where(col("lang") === "de"),
      "doc_id", "text")
    val picked = Sampling.dsirSelect(w, "doc_id", n = 40, seed = "pipe")
    assert(picked.count() == 40)

    // 5. deterministic training order over the selection
    val ordered = Sampling.deterministicShuffle(
      picked.select("doc_id", "n_tokens"), "doc_id", "pipe")
    val a = ordered.collect().map(_.getLong(0))
    val b = Sampling.deterministicShuffle(
      picked.select("doc_id", "n_tokens").repartition(5), "doc_id", "pipe")
      .collect().map(_.getLong(0))
    assert(a.sameElements(b) && a.length == 40)

    curated.unpersist()
  }
}
