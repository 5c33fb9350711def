package graft.clustering

import graft.kernels.MercerKernel

/** Driver-side spectral graph machinery for the exact path of
  * [[SpectralClustering]]: affinity construction (full / kNN / epsilon),
  * the three graph Laplacians, smallest-eigenvector embedding, and row
  * normalization. All math is dense n x n and gated by the estimator's
  * `maxDriverPoints`; the scale path is the Nystrom branch in
  * SpectralClustering, which never materializes any n x n object.
  *
  * (reference: df/SpectralGraph.scala:71-549 — same affinity modes and
  * Laplacian set. The reference eigen-solves with hand-rolled power
  * iteration + deflation; we use Breeze eigSym, which is exact, ~LAPACK
  * speed, and already on Spark's classpath.)
  */
object SpectralGraph {

  /** Symmetric affinity matrix.
    * - full: W_ij = kernel(x_i, x_j), zero diagonal.
    * - knn: keep W_ij if i is in j's k nearest or j in i's k nearest
    *   (symmetrized kNN graph, neighbors by squared euclidean).
    * - epsilon: keep W_ij if ||x_i - x_j||^2 <= epsilon^2.
    */
  def buildAffinity(
      points: Array[Array[Double]],
      kernel: MercerKernel,
      affinityType: String,
      numNeighbors: Int = 10,
      epsilon: Double = 1.0): Array[Array[Double]] = {
    val n = points.length
    val w = Array.ofDim[Double](n, n)
    affinityType.toLowerCase match {
      case "full" =>
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val v = kernel(points(i), points(j))
            w(i)(j) = v; w(j)(i) = v
            j += 1
          }
          i += 1
        }
      case "knn" =>
        val d2 = Array.ofDim[Double](n, n)
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            var s = 0.0
            var t = 0
            while (t < points(i).length) {
              val d = points(i)(t) - points(j)(t); s += d * d; t += 1
            }
            d2(i)(j) = s; d2(j)(i) = s
            j += 1
          }
          i += 1
        }
        val knn = Array.tabulate(n) { i =>
          (0 until n).filter(_ != i).sortBy(d2(i)).take(numNeighbors).toSet
        }
        i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            if (knn(i).contains(j) || knn(j).contains(i)) {
              val v = kernel(points(i), points(j))
              w(i)(j) = v; w(j)(i) = v
            }
            j += 1
          }
          i += 1
        }
      case "epsilon" =>
        val eps2 = epsilon * epsilon
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            var s = 0.0
            var t = 0
            while (t < points(i).length) {
              val d = points(i)(t) - points(j)(t); s += d * d; t += 1
            }
            if (s <= eps2) {
              val v = kernel(points(i), points(j))
              w(i)(j) = v; w(j)(i) = v
            }
            j += 1
          }
          i += 1
        }
      case other =>
        throw new IllegalArgumentException(s"unknown affinityType '$other' (full|knn|epsilon)")
    }
    w
  }

  def degrees(w: Array[Array[Double]]): Array[Double] =
    w.map(_.sum)

  /** L per `laplacianType`:
    * - unnormalized: D - W
    * - symmetric:    I - D^{-1/2} W D^{-1/2}   (Ng-Jordan-Weiss)
    * - randomWalk:   I - D^{-1} W              (Shi-Malik)
    */
  def laplacian(w: Array[Array[Double]], laplacianType: String): Array[Array[Double]] = {
    val n = w.length
    val d = degrees(w)
    val l = Array.ofDim[Double](n, n)
    laplacianType.toLowerCase match {
      case "unnormalized" =>
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) { l(i)(j) = (if (i == j) d(i) else 0.0) - w(i)(j); j += 1 }
          i += 1
        }
      case "symmetric" =>
        val dInvSqrt = d.map(x => if (x > 1e-12) 1.0 / math.sqrt(x) else 0.0)
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            l(i)(j) = (if (i == j) 1.0 else 0.0) - dInvSqrt(i) * w(i)(j) * dInvSqrt(j)
            j += 1
          }
          i += 1
        }
      case "randomwalk" =>
        val dInv = d.map(x => if (x > 1e-12) 1.0 / x else 0.0)
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            l(i)(j) = (if (i == j) 1.0 else 0.0) - dInv(i) * w(i)(j)
            j += 1
          }
          i += 1
        }
      case other =>
        throw new IllegalArgumentException(
          s"unknown laplacianType '$other' (unnormalized|symmetric|randomWalk)")
    }
    l
  }

  /** Spectral embedding: rows of the n x k matrix of the k smallest-
    * eigenvalue eigenvectors of L (skipping the first/constant one when a
    * spare is available), row-normalized for the symmetric Laplacian.
    * The randomWalk Laplacian is eigen-solved through its symmetric
    * similarity transform (u_rw = D^{-1/2} u_sym), which keeps eigSym
    * applicable — L_rw itself is not symmetric.
    */
  def embedding(
      w: Array[Array[Double]],
      laplacianType: String,
      k: Int): Array[Array[Double]] = {
    val n = w.length
    val lt = laplacianType.toLowerCase
    val solveType = if (lt == "randomwalk") "symmetric" else lt
    val l = laplacian(w, solveType)
    val eig = breeze.linalg.eigSym(breeze.linalg.DenseMatrix(l.map(_.toSeq): _*))
    // eigSym returns eigenvalues ascending; take the k SMALLEST including
    // the first (standard Ng-Jordan-Weiss). The reference skips the first
    // as "constant" (ml/SpectralClustering.scala:304-309) — that is only
    // safe on connected graphs: with well-separated clusters the affinity
    // graph is effectively disconnected, the zero eigenspace IS the
    // k-dimensional component-indicator span, and dropping one basis
    // vector of it while pulling in a positive-eigenvalue mode splits one
    // component and merges others.
    val emb = Array.ofDim[Double](n, k)
    var j = 0
    while (j < k) {
      val colIdx = math.min(j, n - 1)
      var i = 0
      while (i < n) { emb(i)(j) = eig.eigenvectors(i, colIdx); i += 1 }
      j += 1
    }
    if (lt == "randomwalk") {
      val d = degrees(w)
      var i = 0
      while (i < n) {
        val s = if (d(i) > 1e-12) 1.0 / math.sqrt(d(i)) else 0.0
        var t = 0
        while (t < k) { emb(i)(t) *= s; t += 1 }
        i += 1
      }
    }
    if (lt == "symmetric") rowNormalize(emb)
    emb
  }

  /** In-place L2 row normalization (Ng-Jordan-Weiss step). */
  def rowNormalize(emb: Array[Array[Double]]): Unit = {
    var i = 0
    while (i < emb.length) {
      var s = 0.0
      var j = 0
      while (j < emb(i).length) { s += emb(i)(j) * emb(i)(j); j += 1 }
      val nrm = math.sqrt(s)
      if (nrm > 1e-12) {
        j = 0
        while (j < emb(i).length) { emb(i)(j) /= nrm; j += 1 }
      }
      i += 1
    }
  }
}
