package graft

import graft.streaming.{StreamingKMeans, StreamingKMeansModel}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** StreamingKMeans: exponential forgetting, dying-cluster split, and the
  * foreachBatch wiring over a real memory stream.
  */
class StreamingSpec extends SparkSpec {

  private def blobBatch(cx: Double, cy: Double, n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    (1 to n).map(_ => Seq(cx + rnd.nextGaussian() * 0.3, cy + rnd.nextGaussian() * 0.3))
      .toDF("features")
  }

  test("exponential forgetting: centers track a drifting stream") {
    val init = blobBatch(0, 0, 100, 1).union(blobBatch(10, 0, 100, 2))
    val est = new StreamingKMeans().setK(2).setSeed(4).setMaxIter(10)
      .setDecayFactor(0.2) // aggressive forgetting
    val model = est.fit(init).asInstanceOf[StreamingKMeansModel]
    // the blob at (10,0) drifts to (20,0) over a few batches
    (0 until 6).foreach { i =>
      model.update(blobBatch(12 + 8 * (i / 5.0), 0, 100, 10 + i))
    }
    val xs = model.currentCenters.map(_.head).sorted
    // the tracking center must have moved well past 12 toward 20; the
    // stale center keeps its position (nothing assigned near it decays it
    // but never moves it)
    assert(xs(1) > 17, s"tracking center at ${xs(1)}")
    assert(math.abs(xs(0)) < 2, s"stale center at ${xs(0)}")
  }

  test("decayFactor=1 never forgets: centroid converges to running mean") {
    val init = blobBatch(0, 0, 200, 3)
    val est = new StreamingKMeans().setK(2).setSeed(4).setMaxIter(10)
      .setDecayFactor(1.0)
    val model = est.fit(init).asInstanceOf[StreamingKMeansModel]
    val w0 = model.clusterWeights.sum
    model.update(blobBatch(0, 0, 100, 5))
    assert(model.clusterWeights.sum > w0, "weights must accumulate with no decay")
  }

  test("dying cluster is split from the heaviest") {
    val init = blobBatch(0, 0, 100, 1).union(blobBatch(10, 0, 100, 2))
    val est = new StreamingKMeans().setK(2).setSeed(4).setMaxIter(10)
      .setDecayFactor(0.01).setTimeUnit("batches") // near-total forgetting
    val model = est.fit(init).asInstanceOf[StreamingKMeansModel]
    // feed ONLY blob A for many batches: cluster B's weight decays to ~0
    (0 until 12).foreach(i => model.update(blobBatch(0, 0, 100, 20 + i)))
    val ws = model.clusterWeights
    // after the split the two weights are equalized (both re-seeded from
    // the heavy cluster), so no weight may be vanishingly small
    assert(ws.min > 1e-6 * ws.max, s"dying cluster not split: ${ws.toSeq}")
    // and both centers sit near the only live blob
    model.currentCenters.foreach { c =>
      assert(math.abs(c(0)) < 2.5 && math.abs(c(1)) < 2.5, s"center ${c.toSeq}")
    }
  }

  test("halfLife overrides decayFactor") {
    val est = new StreamingKMeans().setHalfLife(2.0)
    assert(math.abs(est.effectiveDecay - math.pow(0.5, 0.5)) < 1e-12)
  }

  test("updateOn drives the model from a real memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Seq[Double]]
    val init = blobBatch(0, 0, 100, 1).union(blobBatch(10, 0, 100, 2))
    val est = new StreamingKMeans().setK(2).setSeed(4).setMaxIter(10)
      .setDecayFactor(0.5)
    val model = est.fit(init).asInstanceOf[StreamingKMeansModel]
    val before = model.currentCenters.map(_.toSeq)

    val query = model.updateOn(stream.toDS().toDF("features"))
    try {
      val rnd = new java.util.Random(9)
      stream.addData((1 to 200).map(_ =>
        Seq(20.0 + rnd.nextGaussian() * 0.3, rnd.nextGaussian() * 0.3)))
      query.processAllAvailable()
    } finally query.stop()

    val after = model.currentCenters.map(_.toSeq)
    assert(before.toSeq != after.toSeq, "stream batches must move the centers")
    // scoring goes through the snapshot: transform sees updated centers
    val pred = model.transform(blobBatch(20, 0, 10, 3))
    assert(pred.select("prediction").distinct().count() == 1)
  }

  test("concurrent reads see immutable snapshots while updates run") {
    // The reference mutates its live center array in place
    // (ml/StreamingKMeans.scala:250-263), so a transform racing an update
    // can read a half-updated matrix. Our model swaps a @volatile
    // immutable (centers, weights) tuple: any reference a reader obtains
    // must NEVER change underneath it, and every weights read must be
    // internally well-formed. A reader thread hammers snapshots while the
    // test thread drives real updates.
    val init = blobBatch(0, 0, 50, 1).union(blobBatch(10, 0, 50, 2))
    val est = new StreamingKMeans().setK(2).setSeed(4).setMaxIter(5)
      .setDecayFactor(0.5)
    val model = est.fit(init).asInstanceOf[StreamingKMeansModel]
    @volatile var failure: Option[String] = None
    @volatile var done = false
    val reader = new Thread(() => {
      while (!done && failure.isEmpty) {
        val snap = model.currentCenters
        val copy = snap.map(_.clone)
        Thread.sleep(1)
        if (!snap.zip(copy).forall { case (a, b) => java.util.Arrays.equals(a, b) })
          failure = Some("snapshot center matrix mutated in place during a concurrent update")
        val w = model.clusterWeights
        if (w.length != 2 || w.exists(x => x.isNaN || x < 0.0))
          failure = Some(s"inconsistent weights read: ${w.mkString(",")}")
      }
    })
    reader.start()
    try (0 until 6).foreach { i => model.update(blobBatch(5.0 + i, 0, 50, 20 + i)) }
    finally { done = true; reader.join(30000) }
    assert(failure.isEmpty, failure.getOrElse(""))
  }
}
