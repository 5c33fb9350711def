package graft.kernels

/** Mercer (positive-definite) kernels for kernel k-means and spectral
  * methods. (reference: df/kernels/MercerKernel.scala:38-110 — same
  * kernel set: linear, polynomial, RBF; Gram matrix and the induced
  * feature-space distance d^2(phi(x),phi(y)) = K(x,x) - 2K(x,y) + K(y,y).)
  */
sealed trait MercerKernel extends Serializable {
  def name: String
  def apply(x: Array[Double], y: Array[Double]): Double

  /** Induced squared distance in feature space. */
  def inducedDist2(x: Array[Double], y: Array[Double]): Double =
    apply(x, x) - 2.0 * apply(x, y) + apply(y, y)

  /** Dense Gram matrix — O(n^2 d); driver-size n only (the Nystrom path
    * in KernelKMeans avoids ever building this for big n).
    */
  def gram(pts: Array[Array[Double]]): Array[Array[Double]] = {
    val n = pts.length
    val g = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        val v = apply(pts(i), pts(j))
        g(i)(j) = v; g(j)(i) = v
        j += 1
      }
      i += 1
    }
    g
  }

  protected final def dot(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }
}

case class LinearKernel() extends MercerKernel {
  val name = "linear"
  def apply(x: Array[Double], y: Array[Double]): Double = dot(x, y)
}

case class PolynomialKernel(degree: Int = 3, gamma: Double = 1.0, coef0: Double = 1.0)
    extends MercerKernel {
  require(degree >= 1, "degree must be >= 1")
  val name = s"poly(d=$degree)"
  def apply(x: Array[Double], y: Array[Double]): Double =
    math.pow(gamma * dot(x, y) + coef0, degree)
}

/** exp(-gamma * ||x-y||_1) — heavier tails than RBF; used as a spectral
  * affinity (reference: ml/SpectralClustering.scala kernelType "laplacian").
  */
case class LaplacianMercerKernel(gamma: Double = 1.0) extends MercerKernel {
  require(gamma > 0, "gamma must be positive")
  val name = s"laplacian(gamma=$gamma)"
  def apply(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length) { s += math.abs(x(i) - y(i)); i += 1 }
    math.exp(-gamma * s)
  }
}

case class RBFKernel(gamma: Double = 1.0) extends MercerKernel {
  require(gamma > 0, "gamma must be positive")
  val name = s"rbf(gamma=$gamma)"
  def apply(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    math.exp(-gamma * s)
  }
}

object MercerKernel {
  def apply(name: String, gamma: Double = 1.0, degree: Int = 3, coef0: Double = 1.0): MercerKernel =
    name.trim.toLowerCase match {
      case "linear"             => LinearKernel()
      case "poly" | "polynomial" => PolynomialKernel(degree, gamma, coef0)
      case "rbf" | "gaussian"   => RBFKernel(gamma)
      case "laplacian"          => LaplacianMercerKernel(gamma)
      case other => throw new IllegalArgumentException(
        s"Unknown Mercer kernel '$other' (linear|polynomial|rbf|laplacian)")
    }
}
