package graft

import org.apache.spark.sql.types._

/** Canary for driver-side testdata regeneration: round 10 lost two
  * harness queries SILENTLY when `events.ts` changed physical type
  * (TIMESTAMP(NANOS)-as-long → TIMESTAMP(MICROS), surfacing as
  * TIMESTAMP_NTZ) — the queries failed analysis inside Verify's
  * per-query try and simply vanished from the round's correctness
  * file. This spec pins the schema of every table the harness reads,
  * so the NEXT drift fails loudly here, pointing at the
  * schema-adaptive helpers (`SparkEntry.eventTsMs`) instead of
  * surfacing as absent gate rows a round later.
  */
class TestDataSchemaSpec extends SparkSpec {

  private def fields(table: String): Map[String, DataType] =
    spark.read.parquet(s"${TestSpark.sf0001}/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  test("events schema: ts is a timestamp (eventTsMs adapts if this changes)") {
    val f = fields("events")
    assert(f("event_id") == LongType && f("user_id") == LongType &&
      f("value") == DoubleType && f("event_type") == StringType)
    assert(f("ts") == TimestampNTZType || f("ts") == TimestampType || f("ts") == LongType,
      s"events.ts changed to ${f("ts")}: extend SparkEntry.eventTsMs for the new type")
  }

  test("documents/embeddings schemas are what the text/ANN operators assume") {
    val d = fields("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType && d("n_chars") == LongType,
      s"documents drifted: $d")
    val e = fields("embeddings")
    assert(e("vec_id") == LongType && e("label") == IntegerType &&
      e("embedding") == ArrayType(FloatType, containsNull = true),
      s"embeddings drifted: $e")
  }

  test("TPC-H-ish tables keep the key/measure types the SQL contracts use") {
    val li = fields("lineitem")
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType &&
      li("l_returnflag") == StringType && li("l_linenumber") == IntegerType,
      s"lineitem drifted: $li")
    val o = fields("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
      o("o_totalprice") == DoubleType, s"orders drifted: $o")
    val c = fields("customer")
    assert(c("c_custkey") == LongType && c("c_nationkey") == IntegerType,
      s"customer drifted: $c")
    val n = fields("nation")
    assert(n("n_nationkey") == IntegerType && n("n_name") == StringType,
      s"nation drifted: $n")
  }
}
