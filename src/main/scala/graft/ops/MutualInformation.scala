package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic measures over discrete distributions.
  * (reference: df/MutualInformation.scala:34-331 — same measure set. The
  * distribution math is pure driver arithmetic; the DISTRIBUTED part is
  * the joint-count estimation, which is one groupBy(x, y).count() over any
  * size of data — the resulting support is what must fit on the driver,
  * not the rows.)
  */
object MutualInformation {

  private val Log2 = math.log(2.0)

  /** Shannon entropy H(p) in bits; zero-mass entries are skipped. */
  def entropy(p: Array[Double]): Double = {
    require(p.forall(_ >= 0), "probabilities must be non-negative")
    val s = p.sum
    require(s > 0, "distribution has zero mass")
    var h = 0.0
    p.foreach { v =>
      if (v > 0) { val q = v / s; h -= q * math.log(q) }
    }
    h / Log2
  }

  /** KL(p || q) in bits; requires q > 0 wherever p > 0. */
  def klDivergence(p: Array[Double], q: Array[Double]): Double = {
    require(p.length == q.length, "dimension mismatch")
    val ps = p.sum
    val qs = q.sum
    var d = 0.0
    p.indices.foreach { i =>
      val pi = p(i) / ps
      if (pi > 0) {
        val qi = q(i) / qs
        require(qi > 0, s"KL undefined: q($i)=0 where p($i)>0")
        d += pi * math.log(pi / qi)
      }
    }
    d / Log2
  }

  /** Jensen-Shannon divergence in bits (symmetric, bounded by 1). */
  def jsDivergence(p: Array[Double], q: Array[Double]): Double = {
    require(p.length == q.length, "dimension mismatch")
    val ps = p.sum
    val qs = q.sum
    val pn = p.map(_ / ps)
    val qn = q.map(_ / qs)
    val m = pn.zip(qn).map { case (a, b) => (a + b) / 2 }
    0.5 * klDivergence(pn, m) + 0.5 * klDivergence(qn, m)
  }

  /** Mutual information I(X;Y) in bits from a joint count/probability
    * matrix (rows = x, cols = y).
    */
  def mutualInformation(joint: Array[Array[Double]]): Double = {
    val total = joint.map(_.sum).sum
    require(total > 0, "joint distribution has zero mass")
    val px = joint.map(_.sum / total)
    val ny = joint.head.length
    val py = (0 until ny).map(j => joint.map(_(j)).sum / total).toArray
    var mi = 0.0
    joint.indices.foreach { i =>
      (0 until ny).foreach { j =>
        val pij = joint(i)(j) / total
        if (pij > 0) mi += pij * math.log(pij / (px(i) * py(j)))
      }
    }
    mi / Log2
  }

  /** Conditional entropy H(X|Y) = H(X,Y) - H(Y), in bits. */
  def conditionalEntropy(joint: Array[Array[Double]]): Double = {
    val flat = joint.flatten
    val ny = joint.head.length
    val py = (0 until ny).map(j => joint.map(_(j)).sum).toArray
    entropy(flat) - entropy(py)
  }

  /** Normalized MI in [0,1]: I(X;Y) / sqrt(H(X) H(Y)). */
  def normalizedMutualInformation(joint: Array[Array[Double]]): Double = {
    val total = joint.map(_.sum).sum
    val px = joint.map(_.sum)
    val ny = joint.head.length
    val py = (0 until ny).map(j => joint.map(_(j)).sum).toArray
    val hx = entropy(px)
    val hy = entropy(py)
    if (hx == 0 || hy == 0) 0.0
    else mutualInformation(joint) / math.sqrt(hx * hy)
  }

  /** Estimate the joint distribution of two discrete columns with ONE
    * distributed aggregation; returns (matrix, xValues, yValues) with
    * rows/cols in sorted value order.
    *
    * The contingency table lands on the driver, so its SUPPORT (distinct
    * (x, y) cells, not rows) is capped by `graft.mi.maxSupportCells`
    * (default 10M ≈ a few hundred MB of Row objects): a high-cardinality
    * pair refuses with remediation instead of OOMing the driver — the
    * same cap-everywhere discipline as Sampling/Curate/Bpe collects.
    */
  def estimateJoint(
      df: DataFrame,
      xCol: String,
      yCol: String): (Array[Array[Double]], Seq[Any], Seq[Any]) = {
    val grouped = df.groupBy(col(xCol), col(yCol)).count()
    val cap = graft.util.Conf.long(
      df.sparkSession, "graft.mi.maxSupportCells", 10000000L)
    require(cap > 0 && cap < Int.MaxValue,
      s"graft.mi.maxSupportCells must be in (0, ${Int.MaxValue}), got $cap")
    // collect at most cap+1 cells in ONE job: driver memory is bounded by
    // the cap itself even when the true support is enormous, and a
    // compliant pair pays no extra counting pass.
    val counts = grouped.limit(cap.toInt + 1).collect()
    require(counts.length <= cap,
      s"joint support of ($xCol, $yCol) exceeds graft.mi.maxSupportCells=" +
        s"$cap distinct cells — the contingency table must fit on the " +
        "driver. Bucketize/quantize one or both columns to reduce " +
        "cardinality, or raise the cap if the driver has the memory.")
    // NULL is a legitimate category (SQL GROUP BY keeps a NULL group);
    // order it first rather than NPE-ing in the sort. Row/col order only
    // fixes the matrix layout — every measure is permutation-invariant.
    val ord: Any => (Int, String) =
      v => if (v == null) (0, "") else (1, v.toString)
    val xs = counts.map(_.get(0)).distinct.sortBy(ord).toSeq
    val ys = counts.map(_.get(1)).distinct.sortBy(ord).toSeq
    val xi = xs.zipWithIndex.toMap
    val yi = ys.zipWithIndex.toMap
    val m = Array.ofDim[Double](xs.length, ys.length)
    counts.foreach { r => m(xi(r.get(0)))(yi(r.get(1))) = r.getLong(2).toDouble }
    (m, xs, ys)
  }

  /** MI between two discrete DataFrame columns (one agg job + driver
    * arithmetic over the support).
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): Double =
    mutualInformation(estimateJoint(df, xCol, yCol)._1)

  /** NMI between two discrete columns — the standard external clustering-
    * agreement score (e.g. predictions vs labels).
    */
  def normalizedMutualInformation(df: DataFrame, xCol: String, yCol: String): Double =
    normalizedMutualInformation(estimateJoint(df, xCol, yCol)._1)
}
