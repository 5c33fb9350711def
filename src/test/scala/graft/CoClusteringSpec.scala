package graft

import graft.clustering._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CoClusteringSpec extends SparkSpec {

  import spark.implicits._

  /** Planted 2x3 checkerboard: 40 rows x 30 cols, block means from a
    * distinct grid, small noise. Row blocks: [0,20) / [20,40); col blocks:
    * [0,10) / [10,20) / [20,30).
    */
  def checkerboard(seed: Int = 3): DataFrame = {
    val rnd = new java.util.Random(seed)
    val means = Array(Array(1.0, 5.0, 9.0), Array(7.0, 2.0, 12.0))
    val triples = for {
      r <- 0 until 40
      c <- 0 until 30
    } yield {
      val rb = if (r < 20) 0 else 1
      val cb = c / 10
      (r.toLong, c.toLong, means(rb)(cb) + rnd.nextGaussian() * 0.3)
    }
    triples.toDF("rowIndex", "colIndex", "value")
  }

  private def partitionPurity(assign: DataFrame, truth: Long => Int): Double = {
    val rows = assign.collect().map(r => (truth(r.getLong(0)), r.getInt(1)))
    val byCluster = rows.groupBy(_._2)
    val correct = byCluster.values.map(g => g.groupBy(_._1).values.map(_.size).max).sum
    correct.toDouble / rows.length
  }

  test("recovers a planted checkerboard structure") {
    val df = checkerboard().cache()
    val m = new CoClustering().setNumRowClusters(2).setNumColClusters(3)
      .setMaxIter(15).setSeed(42).fit(df)
    val rowP = partitionPurity(m.rowAssignments, i => if (i < 20) 0 else 1)
    val colP = partitionPurity(m.colAssignments, i => (i / 10).toInt)
    assert(rowP >= 0.95, s"row purity $rowP")
    assert(colP >= 0.95, s"col purity $colP")
    // block centers must approximate the planted means (up to permutation):
    // the set of recovered centers and planted means should align pairwise
    val planted = Seq(1.0, 5.0, 9.0, 7.0, 2.0, 12.0).sorted
    val got = m.blockCenters.flatten.sorted.toSeq
    planted.zip(got).foreach { case (p, g) =>
      assert(math.abs(p - g) < 0.5, s"center $g vs planted $p")
    }
    df.unpersist()
  }

  test("objective is finite and the model reports iterations") {
    val df = checkerboard()
    val m = new CoClustering().setNumRowClusters(2).setNumColClusters(3)
      .setMaxIter(10).setSeed(7).fit(df)
    assert(!m.objective.isNaN && m.objective >= 0.0)
    assert(m.iterations >= 1)
  }

  test("transform appends row/col prediction columns by key join") {
    val df = checkerboard()
    val m = new CoClustering().setNumRowClusters(2).setNumColClusters(3)
      .setMaxIter(10).setSeed(42).fit(df)
    val out = m.transform(df)
    assert(out.columns.contains("rowPrediction") && out.columns.contains("colPrediction"))
    assert(out.where(col("rowPrediction").isNull).count() == 0)
    // all entries of one planted row share one row prediction
    val preds = out.where(col("rowIndex") === 0).select("rowPrediction").distinct().count()
    assert(preds == 1)
  }

  test("kl divergence mode co-clusters positive data") {
    val df = checkerboard().withColumn("value", abs(col("value")) + lit(0.1))
    val m = new CoClustering().setNumRowClusters(2).setNumColClusters(3)
      .setDivergence("kl").setMaxIter(10).setSeed(42).fit(df)
    assert(m.blockCenters.flatten.forall(_ >= 0.0))
    assert(!m.objective.isNaN)
  }

  test("scalar Bregman identities: D(v,v)=0 and objective decomposition") {
    for (d <- Seq("squaredEuclidean", "kl", "itakuraSaito")) {
      val sf = CoClustering.scalarF(d)
      val v = 2.5
      val mu = 2.5
      val dv = sf.f(v) - sf.f(mu) - sf.fp(mu) * (v - mu)
      assert(math.abs(dv) < 1e-12, s"$d D(v,v) = $dv")
      // D(3, 2) must be positive
      val dp = sf.f(3.0) - sf.f(2.0) - sf.fp(2.0) * 1.0
      assert(dp > 0, s"$d D(3,2) = $dp")
    }
  }
}
