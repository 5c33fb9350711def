package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._

/** [[graft.ops.Pca]]: the Jacobi eigensolve against hand-solvable
  * matrices, the covariance pass against a brute-force reference, and
  * the projection/whitening contracts on real embeddings.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  test("jacobiEigen solves a hand-solvable symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (v=[1,1]/√2) and 1 (v=[1,-1]/√2)
    val (evals, evecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12 && math.abs(evals(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(evecs(0)(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(evecs(0)(0) - evecs(0)(1)) < 1e-12) // same sign on [1,1]
  }

  test("eigen equation, orthonormality, and descending order hold on a real covariance") {
    val model = Pca.fit(emb, "embedding", inDim = 64, k = 8)
    val covRows = Pca.covarianceFrame(emb, "embedding", 64)
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    def cov(i: Int, j: Int): Double = if (i <= j) covRows((i, j)) else covRows((j, i))
    // descending eigenvalues
    assert(model.eigenvalues.sliding(2).forall(p => p(1) <= p(0) + 1e-12))
    // orthonormal components
    for (a <- model.components; b <- model.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val expect = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"orthonormality violated: $dot")
    }
    // C v = lambda v for the top components
    model.components.zip(model.eigenvalues).foreach { case (v, lam) =>
      val cv = Array.tabulate(64)(i => (0 until 64).map(j => cov(i, j) * v(j)).sum)
      val resid = math.sqrt(cv.zip(v).map { case (a, b) => (a - lam * b) * (a - lam * b) }.sum)
      assert(resid < 1e-8, s"eigen residual $resid for eigenvalue $lam")
    }
    // explained-variance ratios are in (0, 1] and sum below 1
    val evr = model.explainedVarianceRatio
    assert(evr.forall(r => r >= 0 && r <= 1.0) && evr.sum <= 1.0 + 1e-9)
  }

  test("covariance pass equals the brute-force reference on a small fixture") {
    val rows = Seq(
      Seq(1.0, 2.0, 3.0), Seq(2.0, 1.0, 0.0), Seq(0.0, 5.0, 1.0), Seq(4.0, 4.0, 4.0))
    val df = rows.map(Tuple1(_)).toDF("v")
    val got = Pca.covarianceFrame(df, "v", 3)
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    val n = rows.size
    val mean = (0 until 3).map(j => rows.map(_(j)).sum / n)
    for (i <- 0 until 3; j <- i until 3) {
      val expect = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1)
      assert(math.abs(got((i, j)) - expect) < 1e-12, s"cov($i,$j)")
    }
  }

  test("projection reduces reconstruction error as k grows; whitening unit-variances the output") {
    def reconError(k: Int): Double = {
      val model = Pca.fit(emb, "embedding", 64, k)
      val projected = Pca.project(emb, "vec_id", "embedding", model)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      val orig = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      orig.map { case (id, v) =>
        val p = projected(id)
        // reconstruct: mean + sum_j p_j * comp_j
        val rec = Array.tabulate(64)(i =>
          model.mean(i) + model.components.indices.map(j => p(j) * model.components(j)(i)).sum)
        v.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    }
    val e4 = reconError(4); val e16 = reconError(16); val e64 = reconError(64)
    assert(e16 < e4 && e64 < e16, s"errors must shrink: $e4 -> $e16 -> $e64")
    assert(e64 < 1e-6 * 500, s"k = d must reconstruct (near-)exactly, got $e64")

    val model = Pca.fit(emb, "embedding", 64, 4)
    val white = Pca.project(emb, "vec_id", "embedding", model, whiten = true)
      .collect().map(_.getSeq[Double](1))
    val n = white.size
    for (j <- 0 until 4) {
      val mu = white.map(_(j)).sum / n
      val va = white.map(v => (v(j) - mu) * (v(j) - mu)).sum / (n - 1)
      assert(math.abs(va - 1.0) < 0.01, s"whitened component $j variance $va")
    }
  }

  test("dimension cap and bad arguments are refused with remediation") {
    spark.conf.set("graft.pca.maxDim", "16")
    try {
      val e = intercept[IllegalArgumentException] {
        Pca.fit(emb, "embedding", 64, 4)
      }
      assert(e.getMessage.contains("maxDim"))
    } finally spark.conf.unset("graft.pca.maxDim")
    intercept[IllegalArgumentException] { Pca.fit(emb, "embedding", 64, 0) }
    intercept[IllegalArgumentException] { Pca.fit(emb, "embedding", 64, 65) }
  }
}
