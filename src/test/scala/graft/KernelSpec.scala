package graft

import graft.kernels._
import org.scalatest.funsuite.AnyFunSuite

class KernelSpec extends AnyFunSuite {

  val kernels: Seq[BregmanKernel] = Seq(
    new SquaredEuclideanKernel,
    new KLDivergenceKernel(),
    new ItakuraSaitoKernel(),
    new GeneralizedIDivergenceKernel(),
    new LogisticLossKernel(),
    new L1Kernel,
    new SphericalKernel)

  val domainPoints: Map[String, Seq[Array[Double]]] = Map(
    "default" -> Seq(Array(1.0, 2.0, 3.0), Array(0.5, 0.1, 0.9), Array(2.0, 2.0, 2.0)),
    "unit" -> Seq(Array(0.2, 0.3, 0.5), Array(0.9, 0.05, 0.05), Array(0.4, 0.4, 0.2)))

  def pointsFor(k: BregmanKernel): Seq[Array[Double]] = k match {
    // KL non-negativity only holds on the probability simplex; logistic needs (0,1)
    case _: LogisticLossKernel | _: KLDivergenceKernel => domainPoints("unit")
    case _ => domainPoints("default")
  }

  test("D(x,x) == 0 (within smoothing tolerance)") {
    for (k <- kernels; x <- pointsFor(k))
      assert(math.abs(k.divergence(x, x)) < 1e-9, s"${k.name} D(x,x) != 0")
  }

  test("D(x,mu) >= 0") {
    for (k <- kernels; x <- pointsFor(k); mu <- pointsFor(k))
      assert(k.divergence(x, mu) >= -1e-12, s"${k.name} negative divergence")
  }

  test("invGrad(grad(x)) ~= x for Bregman kernels") {
    val bregman = kernels.filterNot(k => k.isInstanceOf[L1Kernel] || k.isInstanceOf[SphericalKernel])
    for (k <- bregman; x <- pointsFor(k)) {
      val rt = k.invGrad(k.grad(x))
      x.zip(rt).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"${k.name} grad/invGrad roundtrip: $a vs $b")
      }
    }
  }

  test("SE matches hand-computed value (including the 1/2 factor)") {
    val se = new SquaredEuclideanKernel
    // 0.5 * ((1-4)^2 + (2-6)^2) = 0.5 * 25 = 12.5
    assert(se.divergence(Array(1.0, 2.0), Array(4.0, 6.0)) == 12.5)
  }

  test("KL matches hand-computed value") {
    val kl = new KLDivergenceKernel(1e-10)
    val x = Array(0.5, 0.5); val mu = Array(0.25, 0.75)
    val expected = 0.5 * math.log(0.5 / 0.25) + 0.5 * math.log(0.5 / 0.75)
    assert(math.abs(kl.divergence(x, mu) - expected) < 1e-6)
  }

  test("L1 is Manhattan distance") {
    assert(new L1Kernel().divergence(Array(1.0, -2.0), Array(3.0, 1.0)) == 5.0)
  }

  test("Spherical is 1 - cosine on unnormalized inputs") {
    val sp = new SphericalKernel
    assert(math.abs(sp.divergence(Array(2.0, 0.0), Array(5.0, 0.0))) < 1e-12)
    assert(math.abs(sp.divergence(Array(1.0, 0.0), Array(0.0, 3.0)) - 1.0) < 1e-12)
  }

  test("KernelFactory resolves aliases") {
    assert(KernelFactory("se").name == "SquaredEuclidean")
    assert(KernelFactory("euclidean").name == "SquaredEuclidean")
    assert(KernelFactory("kullbackLeibler").name.startsWith("KL"))
    assert(KernelFactory("manhattan").name == "L1")
    assert(KernelFactory("cosine").name == "Spherical")
    assertThrows[IllegalArgumentException](KernelFactory("nope"))
  }
}
