package graft

import graft.ops.TextOps

/** [[graft.ops.TextOps.collocations]]: PMI values against hand-computed
  * marginals, the minCount filter, rank determinism, and partition
  * invariance.
  */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  // Single-phrase docs so the marginals are easy to hand-compute:
  // "new york" appears 3x, "the cat" 2x, "the dog" 1x, "cat sat" 1x.
  private val docs = Seq(
    (1L, "new york"), (2L, "new york"), (3L, "new york"),
    (4L, "the cat"), (5L, "the cat"), (6L, "the dog"), (7L, "cat sat")
  ).toDF("doc_id", "text")

  test("counts and PMI match hand-computed marginals") {
    val got = TextOps.collocations(docs, "text", minCount = 1L, k = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // N = 7 bigram occurrences total
    val n = 7.0
    def pmi(c2: Long, cl: Long, cr: Long): Double =
      BigDecimal(math.log(c2.toDouble * n / (cl.toDouble * cr)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("new", "york")) == ((3L, 3L, 3L, 7L, pmi(3, 3, 3))))
    assert(got(("the", "cat")) == ((2L, 3L, 2L, 7L, pmi(2, 3, 2))))
    assert(got(("the", "dog")) == ((1L, 3L, 1L, 7L, pmi(1, 3, 1))))
    assert(got(("cat", "sat")) == ((1L, 1L, 1L, 7L, pmi(1, 1, 1))))
    assert(got.size == 4)
  }

  test("minCount filters and k caps in (count desc, pair) order") {
    val got = TextOps.collocations(docs, "text", minCount = 2L, k = 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("new", "york")))
  }

  test("result is partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      TextOps.collocations(df, "text", minCount = 1L, k = 10)
        .collect().map(_.toSeq).toSet
    assert(run(docs.repartition(5)) == run(docs.coalesce(1)))
  }

  test("bad parameters are rejected") {
    intercept[IllegalArgumentException] {
      TextOps.collocations(docs, "text", minCount = 0L)
    }
    intercept[IllegalArgumentException] {
      TextOps.collocations(docs, "text", k = 0)
    }
  }
}
