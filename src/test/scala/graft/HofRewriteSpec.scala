package graft

import graft.functions.{ArrayDot, ArrayL1Dist, ArraySqDist, HofDistanceRewrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HofDistanceRewrite: user-written aggregate(zip_with(..)) distance
  * patterns rewrite to the native expressions; guarded shapes don't.
  */
class HofRewriteSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ HofDistanceRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  private def data(): DataFrame =
    // range-based (NOT a local relation — ConvertToLocalRelation would
    // pre-evaluate the projection and hide the rewrite from the plan)
    spark.range(50).select(
      array((0 until 8).map(i => (col("id") + lit(i)) * lit(0.37 + i)): _*).as("a"),
      array((0 until 8).map(i => (col("id") - lit(2 * i)) * lit(0.11 + i)): _*).as("b"))

  private def optimizedExprs(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.expressions.map(_.toString)

  test("dot, sqdist (both spellings), l1 patterns rewrite to native expressions") {
    withRule {
      val df = data()
      val dot = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (s, v) => s + v).as("r"))
      assert(dot.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArrayDot])), optimizedExprs(dot).mkString("\n"))

      val sq = df.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (s, v) => s + v).as("r"))
      assert(sq.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArraySqDist])), optimizedExprs(sq).mkString("\n"))

      val sqPow = df.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => pow(x - y, 2)),
        lit(0.0), (s, v) => s + v).as("r"))
      assert(sqPow.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArraySqDist])), optimizedExprs(sqPow).mkString("\n"))

      val l1 = df.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
        lit(0.0), (s, v) => s + v).as("r"))
      assert(l1.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArrayL1Dist])), optimizedExprs(l1).mkString("\n"))
    }
  }

  test("rewritten results are identical to the unrewritten HOF results") {
    val df = data().cache()
    def q(d: DataFrame) = d.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (s, v) => s + v).as("sq"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (s, v) => s + v).as("dp"))
    val plain = q(df).collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val rewritten = withRule { q(df).collect().map(r => (r.getDouble(0), r.getDouble(1))) }
    plain.zip(rewritten).foreach { case ((a1, b1), (a2, b2)) =>
      assert(a1 == a2 && b1 == b2, "rewrite changed results")
    }
    df.unpersist()
  }

  test("guarded shapes stay untouched: nonzero seed, non-sum merge, other bodies") {
    withRule {
      val df = data()
      // nonzero zero-element
      val z = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (s, v) => s + v).as("r"))
      assert(!z.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArrayDot])))
      // max-merge, not sum
      val mx = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (s, v) => greatest(s, v)).as("r"))
      assert(!mx.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArrayDot])))
      // body the rule doesn't know
      val other = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x / y),
        lit(0.0), (s, v) => s + v).as("r"))
      assert(!other.queryExecution.optimizedPlan.expressions.exists(_.exists(e =>
        e.isInstanceOf[ArrayDot] || e.isInstanceOf[ArraySqDist] || e.isInstanceOf[ArrayL1Dist])))
      // results of guarded shapes still correct
      assert(z.collect().length == 50)
    }
  }

  test("self-norm aggregate(a, 0D, s+v*v) rewrites to dot(a, a)") {
    withRule {
      val df = data()
      val q = df.select(aggregate(col("a"), lit(0.0), (s, v) => s + v * v).as("n2"))
      assert(q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArrayDot])), optimizedExprs(q).mkString("\n"))
      val got = q.collect().map(_.getDouble(0))
      val want = data().collect().map(_.getSeq[Double](0).map(x => x * x).sum)
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }
  }

  test("SQL text form rewrites too (registered extension path)") {
    withRule {
      spark.range(3).select(
          array(col("id") * 1.0, col("id") + 2.0).as("a"),
          array(lit(3.0), lit(4.0)).as("b"))
        .createOrReplaceTempView("hof_t")
      val q = spark.sql(
        "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v) AS dp FROM hof_t")
      assert(q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[ArrayDot])))
      // id=1: 1*3 + 3*4 = 15
      assert(q.collect().map(_.getDouble(0)).sorted.toSeq == Seq(8.0, 15.0, 22.0))
    }
  }
}
