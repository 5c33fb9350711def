package graft

import graft.clustering._
import graft.kernels.{KLDivergenceKernel, SquaredEuclideanKernel}
import org.apache.spark.sql.functions._

/** Typed validation/error surface + SummarySink event stream. */
class ErrorsSpec extends SparkSpec {

  import spark.implicits._

  test("domain violation raises a typed GKMException with remediation text") {
    val df = Seq(Seq(1.0, -2.0), Seq(3.0, 4.0)).toDF("features")
    val e = intercept[GKMException] {
      new GeneralizedKMeans().setK(2).setDivergence("kl").setSeed(1).fit(df)
    }
    assert(e.error.isInstanceOf[GKMError.DomainViolation])
    assert(e.getMessage.contains("violates the domain"))
    assert(e.getMessage.contains("FeatureTransform.epsilonShift"), "remediation text present")
  }

  test("ragged dimensions raise InconsistentDimension") {
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0), Seq(1.0, 1.0)).toDF("features")
    val e = intercept[GKMException] {
      new GeneralizedKMeans().setK(2).setSeed(1).fit(df)
    }
    assert(e.error.isInstanceOf[GKMError.InconsistentDimension])
    assert(e.getMessage.contains("inconsistent dimension"))
  }

  test("NaN features raise NonFiniteFeature") {
    val df = Seq(Seq(1.0, Double.NaN), Seq(3.0, 4.0)).toDF("features")
    val e = intercept[GKMException] {
      new GeneralizedKMeans().setK(2).setSeed(1).fit(df)
    }
    assert(e.error.isInstanceOf[GKMError.NonFiniteFeature])
  }

  test("validator chain: first violation wins, valid data passes") {
    val kern = new KLDivergenceKernel()
    val chain = Validators.forKernel(kern, 2)
    assert(Validators.validateSample(
      Seq(Array(1.0, 2.0), Array(0.5, 0.1)), chain, 2).isEmpty)
    val bad = Validators.validateSample(
      Seq(Array(1.0, 2.0), Array(Double.NaN, -1.0)), chain, 2)
    assert(bad.exists(_.isInstanceOf[GKMError.NonFiniteFeature]),
      "finite check must fire before the domain check")
  }

  test("GKMResult Either-style wrapping") {
    val good = GKMResult.ok(42)
    val bad = GKMResult.fail[Int](GKMError.EmptyInput("test"))
    assert(good == Right(42))
    assert(bad.isLeft && bad.swap.toOption.get.render.contains("empty input"))
  }

  test("SummarySink collects ordered iteration events with convergence") {
    val rnd = new java.util.Random(7)
    val pts = (1 to 100).map(_ => Seq(rnd.nextGaussian(), rnd.nextGaussian())) ++
      (1 to 100).map(_ => Seq(10 + rnd.nextGaussian(), 10 + rnd.nextGaussian()))
    val df = pts.toDF("features")
    val sink = new SummarySink.Collecting
    val m = new GeneralizedKMeans().setK(2).setSeed(42).setMaxIter(20)
      .setEventSink(sink).fit(df)
    val events = sink.events
    assert(events.nonEmpty)
    val starts = events.collect { case e: TrainingEvent.IterationStarted => e }
    val completes = events.collect { case e: TrainingEvent.IterationCompleted => e }
    assert(starts.length == completes.length)
    assert(starts.length == m.summary.iterations)
    // distortions recorded in the events match the summary history
    assert(completes.map(_.distortion) == m.summary.distortionHistory)
    // converged fit ends with a ConvergenceDetected event
    assert(m.summary.converged)
    assert(events.last.isInstanceOf[TrainingEvent.ConvergenceDetected])
  }
}
