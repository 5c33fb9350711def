package graft.kernels

/** Elastic time-series distances: DTW (with optional Sakoe-Chiba window),
  * derivative DTW, Soft-DTW, GAK, plus DBA barycenter averaging.
  * (reference: df/kernels/SequenceKernel.scala:40-686 — same family and
  * semantics; each series is one array<double>, distances are O(n*m) DP
  * run inside executor closures.)
  */
sealed trait SequenceKernel extends Serializable {
  def name: String

  /** Elastic distance between two series. */
  def distance(x: Array[Double], y: Array[Double]): Double

  /** Optimal (or canonical) alignment path as (i, j) pairs. */
  def alignmentPath(x: Array[Double], y: Array[Double]): Seq[(Int, Int)]

  /** Elastic (weighted) mean of a set of series — DBA (Petitjean et al.
    * 2011) by default: each iteration aligns every series to the current
    * barycenter via [[alignmentPath]] and weight-averages the values
    * mapped to each barycenter index. SoftDTW overrides this with its
    * differentiable gradient barycenter. `weights=None` = uniform.
    * (reference: df/kernels/SequenceKernel.scala:63-68 trait barycenter.)
    */
  def barycenter(
      series: Seq[Array[Double]],
      init: Array[Double],
      maxIter: Int = 10,
      weights: Option[Array[Double]] = None): Array[Double] = {
    require(weights.forall(_.length == series.length),
      "weights must match the number of series")
    val ws = weights.getOrElse(Array.fill(series.length)(1.0))
    var center = init.clone
    var iter = 0
    while (iter < maxIter) {
      val sums = new Array[Double](center.length)
      val mass = new Array[Double](center.length)
      series.iterator.zip(ws.iterator).foreach { case (s, w) =>
        if (w != 0.0) alignmentPath(center, s).foreach { case (ci, si) =>
          sums(ci) += w * s(si)
          mass(ci) += w
        }
      }
      val next = center.indices.map(i =>
        if (mass(i) > 0) sums(i) / mass(i) else center(i)).toArray
      val moved = center.zip(next).map { case (a, b) => math.abs(a - b) }.max
      center = next
      iter += 1
      if (moved < 1e-9) iter = maxIter
    }
    center
  }
}

/** Classic DTW with squared pointwise cost and optional Sakoe-Chiba band.
  * `window = None` is unconstrained; `Some(w)` restricts |i-j| <= w.
  */
case class DTWKernel(window: Option[Int] = None) extends SequenceKernel {
  val name: String = window.map(w => s"DTW(w=$w)").getOrElse("DTW")

  @inline private def inWindow(i: Int, j: Int): Boolean =
    window.forall(w => math.abs(i - j) <= w)

  private def dpMatrix(x: Array[Double], y: Array[Double]): Array[Array[Double]] = {
    val n = x.length
    val m = y.length
    val d = Array.fill(n + 1, m + 1)(Double.PositiveInfinity)
    d(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        if (inWindow(i - 1, j - 1)) {
          val c = { val t = x(i - 1) - y(j - 1); t * t }
          d(i)(j) = c + math.min(d(i - 1)(j - 1), math.min(d(i - 1)(j), d(i)(j - 1)))
        }
        j += 1
      }
      i += 1
    }
    d
  }

  def distance(x: Array[Double], y: Array[Double]): Double =
    math.sqrt(dpMatrix(x, y)(x.length)(y.length))

  def alignmentPath(x: Array[Double], y: Array[Double]): Seq[(Int, Int)] = {
    val d = dpMatrix(x, y)
    val path = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = x.length
    var j = y.length
    while (i > 0 && j > 0) {
      path += ((i - 1, j - 1))
      val diag = d(i - 1)(j - 1)
      val up = d(i - 1)(j)
      val left = d(i)(j - 1)
      if (diag <= up && diag <= left) { i -= 1; j -= 1 }
      else if (up <= left) i -= 1
      else j -= 1
    }
    path.reverse.toSeq
  }

}

/** Derivative DTW: DTW over first differences (shape, not level). */
case class DerivativeDTWKernel(window: Option[Int] = None) extends SequenceKernel {
  val name = "DerivativeDTW"
  private val inner = DTWKernel(window)

  private def derive(x: Array[Double]): Array[Double] = {
    if (x.length < 3) return x.clone
    val d = new Array[Double](x.length)
    var i = 1
    while (i < x.length - 1) {
      d(i) = ((x(i) - x(i - 1)) + (x(i + 1) - x(i - 1)) / 2.0) / 2.0
      i += 1
    }
    d(0) = d(1); d(x.length - 1) = d(x.length - 2)
    d
  }

  def distance(x: Array[Double], y: Array[Double]): Double =
    inner.distance(derive(x), derive(y))
  def alignmentPath(x: Array[Double], y: Array[Double]): Seq[(Int, Int)] =
    inner.alignmentPath(derive(x), derive(y))
}

/** Soft-DTW (Cuturi & Blondel 2017): soft-min smoothed DTW — a
  * differentiable elastic divergence (NOT a metric; can be negative for
  * gamma large).
  */
case class SoftDTWKernel(gamma: Double = 1.0, window: Option[Int] = None)
    extends SequenceKernel {
  require(gamma > 0, "gamma must be positive")
  val name = s"SoftDTW(gamma=$gamma)"

  @inline private def inWindow(i: Int, j: Int): Boolean =
    window.forall(w => math.abs(i - j) <= w)

  private def softMin(a: Double, b: Double, c: Double): Double = {
    val m = math.min(a, math.min(b, c))
    if (m.isInfinity) m
    else -gamma * math.log(
      math.exp(-(a - m) / gamma) + math.exp(-(b - m) / gamma) + math.exp(-(c - m) / gamma)) + m
  }

  def distance(x: Array[Double], y: Array[Double]): Double = {
    val n = x.length
    val m = y.length
    val d = Array.fill(n + 1, m + 1)(Double.PositiveInfinity)
    d(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        if (inWindow(i - 1, j - 1)) {
          val c = { val t = x(i - 1) - y(j - 1); t * t }
          d(i)(j) = c + softMin(d(i - 1)(j - 1), d(i - 1)(j), d(i)(j - 1))
        }
        j += 1
      }
      i += 1
    }
    d(n)(m)
  }

  /** Canonical path from the hard-min backtrack (soft paths are diffuse). */
  def alignmentPath(x: Array[Double], y: Array[Double]): Seq[(Int, Int)] =
    DTWKernel(window).alignmentPath(x, y)

  /** Gradient of softDTW(x, y) w.r.t. x, via the backward pass of
    * Cuturi & Blondel 2017 (Algorithm 2): forward R matrix, then the
    * alignment-expectation matrix E, then
    * d/dx_i = sum_j E(i,j) * 2 (x_i - y_j)  (squared pointwise cost).
    * Honors the Sakoe-Chiba window, matching [[distance]]'s objective.
    */
  def gradient(x: Array[Double], y: Array[Double]): Array[Double] = {
    val n = x.length
    val m = y.length
    val E = expectationMatrix(x, y)
    val g = new Array[Double](n)
    var i = 1
    while (i <= n) {
      var j = 1
      var s = 0.0
      while (j <= m) { s += E(i)(j) * 2.0 * (x(i - 1) - y(j - 1)); j += 1 }
      g(i - 1) = s
      i += 1
    }
    g
  }

  /** Soft-alignment weighted sums: for each index i of `x`, returns
    * (sum_j E(i,j) * y_j, sum_j E(i,j)) — the numerator/denominator of
    * the soft-DBA fixed-point update c_i = sum E y / sum E, the exact
    * soft analog of hard DBA's per-index path sums. Distributive over a
    * set of series, so executors can emit per-row pairs and one
    * aggregation merges them.
    */
  def alignmentExpectation(x: Array[Double], y: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val m = y.length
    val E = expectationMatrix(x, y)
    val wsum = new Array[Double](n)
    val mass = new Array[Double](n)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) { wsum(i - 1) += E(i)(j) * y(j - 1); mass(i - 1) += E(i)(j); j += 1 }
      i += 1
    }
    (wsum, mass)
  }

  /** Alignment-expectation matrix E (Cuturi & Blondel 2017, Algorithm 2):
    * E(i,j) = expected mass the soft minimum puts on aligning x_i with
    * y_j. 1-based over (1..n, 1..m) inside a padded (n+2)x(m+2) array.
    */
  private def expectationMatrix(x: Array[Double], y: Array[Double]): Array[Array[Double]] = {
    val n = x.length
    val m = y.length
    val inf = Double.PositiveInfinity
    // forward: R is (n+2)x(m+2) with the standard padding so the backward
    // recursion can read row n+1 / col m+1 without bounds checks
    val R = Array.fill(n + 2, m + 2)(inf)
    R(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        // same band as distance(): out-of-window cells stay +inf, so the
        // backward weights vanish there and the gradient matches the
        // windowed objective exactly
        if (inWindow(i - 1, j - 1)) {
          val t = x(i - 1) - y(j - 1)
          R(i)(j) = t * t + softMin(R(i - 1)(j - 1), R(i - 1)(j), R(i)(j - 1))
        }
        j += 1
      }
      i += 1
    }
    @inline def delta(i: Int, j: Int): Double =
      if (i >= 1 && i <= n && j >= 1 && j <= m) {
        val t = x(i - 1) - y(j - 1); t * t
      } else 0.0
    val E = Array.fill(n + 2, m + 2)(0.0)
    E(n + 1)(m + 1) = 1.0
    R(n + 1)(m + 1) = R(n)(m)
    // treat the padding row/col as unreachable except the terminal cell
    i = n
    while (i >= 1) {
      var j = m
      while (j >= 1) {
        @inline def w(pi: Int, pj: Int): Double =
          if (R(pi)(pj).isInfinity || R(i)(j).isInfinity) 0.0
          else math.exp((R(pi)(pj) - R(i)(j) - delta(pi, pj)) / gamma) * E(pi)(pj)
        E(i)(j) = w(i + 1, j) + w(i, j + 1) + w(i + 1, j + 1)
        j -= 1
      }
      i -= 1
    }
    E
  }

  /** Soft-DTW barycenter: gradient descent on
    * F(c) = sum_i w_i softDTW(c, x_i) from a (weighted) DBA start —
    * the differentiable counterpart the hard-DTW DBA cannot express
    * (reference: df/kernels/SequenceKernel.scala:323-330 softDBA).
    * Step size 1/sum(w) per iteration; halves on non-improvement.
    */
  override def barycenter(
      series: Seq[Array[Double]],
      init: Array[Double],
      maxIter: Int = 10,
      weights: Option[Array[Double]] = None): Array[Double] = {
    require(weights.forall(_.length == series.length),
      "weights must match the number of series")
    val ws = weights.getOrElse(Array.fill(series.length)(1.0))
    val wSum = ws.sum
    if (series.isEmpty || wSum <= 0.0) return init.clone
    // warm start from hard-DBA (the trait default on a plain DTW kernel)
    var c = DTWKernel(window).barycenter(series, init, math.max(1, maxIter / 2), weights)
    def objective(center: Array[Double]): Double =
      series.iterator.zip(ws.iterator).map { case (s, w) => w * distance(center, s) }.sum
    var best = objective(c)
    var lr = 1.0 / wSum
    var iter = 0
    while (iter < maxIter) {
      val g = new Array[Double](c.length)
      series.iterator.zip(ws.iterator).foreach { case (s, w) =>
        if (w != 0.0) {
          val gi = gradient(c, s)
          var i = 0
          while (i < g.length) { g(i) += w * gi(i); i += 1 }
        }
      }
      val cand = Array.tabulate(c.length)(i => c(i) - lr * g(i))
      val f = objective(cand)
      if (f < best - 1e-12) { c = cand; best = f }
      else lr *= 0.5 // backtracking: keep the iterate, shrink the step
      iter += 1
    }
    c
  }
}

/** Global Alignment Kernel (Cuturi 2011): positive-definite sum over ALL
  * alignments; distance induced as sqrt(k(x,x)+k(y,y)-2k(x,y)) in log
  * space for stability.
  */
case class GAKKernel(sigma: Double = 1.0) extends SequenceKernel {
  require(sigma > 0, "sigma must be positive")
  val name = s"GAK(sigma=$sigma)"

  /** log K_GA(x,y). */
  def logKernel(x: Array[Double], y: Array[Double]): Double = {
    val n = x.length
    val m = y.length
    // log-space DP: logM(i)(j) = logsumexp of the three predecessors + log k(xi, yj)
    val neg = Double.NegativeInfinity
    val lm = Array.fill(n + 1, m + 1)(neg)
    lm(0)(0) = 0.0
    @inline def lse(a: Double, b: Double, c: Double): Double = {
      val mx = math.max(a, math.max(b, c))
      if (mx == neg) neg
      else mx + math.log(math.exp(a - mx) + math.exp(b - mx) + math.exp(c - mx))
    }
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val t = x(i - 1) - y(j - 1)
        val logk = -(t * t) / (2.0 * sigma * sigma)
        lm(i)(j) = logk + lse(lm(i - 1)(j - 1), lm(i - 1)(j), lm(i)(j - 1))
        j += 1
      }
      i += 1
    }
    lm(n)(m)
  }

  def distance(x: Array[Double], y: Array[Double]): Double = {
    // induced distance in log space: kxx and kyy normalize alignment mass
    val kxy = logKernel(x, y)
    val kxx = logKernel(x, x)
    val kyy = logKernel(y, y)
    val norm = kxy - 0.5 * (kxx + kyy) // log of normalized kernel, <= 0
    math.sqrt(math.max(0.0, 2.0 - 2.0 * math.exp(norm)))
  }

  def alignmentPath(x: Array[Double], y: Array[Double]): Seq[(Int, Int)] =
    DTWKernel(None).alignmentPath(x, y)
}

object SequenceKernel {
  def apply(name: String, gamma: Double = 1.0, window: Option[Int] = None): SequenceKernel =
    name.trim.toLowerCase match {
      case "dtw"            => DTWKernel(window)
      case "softdtw"        => SoftDTWKernel(gamma, window)
      case "ddtw" | "derivativedtw" => DerivativeDTWKernel(window)
      case "gak"            => GAKKernel(gamma)
      case other => throw new IllegalArgumentException(
        s"Unknown sequence kernel '$other' (dtw|softdtw|derivativedtw|gak)")
    }
}
