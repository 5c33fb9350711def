package graft.clustering

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Invertible-ish feature transforms applied BEFORE clustering, with the
  * inverse applied to the k x d centers afterward so models report in the
  * original space.
  * (reference: df/FeatureTransform.scala:38-359 — same transform set and
  * divergence-compatibility table; the row-side math here is pure Catalyst
  * `transform`/`aggregate` expressions over array<double> columns instead
  * of per-row Vector UDFs, so it stays inside codegen and costs one
  * projection at any scale.)
  */
sealed trait FeatureTransform extends Serializable {
  def name: String

  /** Column expression producing the transformed array. */
  def expr(features: Column): Column

  /** Driver-side forward transform of one vector (k x d center math). */
  def apply(v: Array[Double]): Array[Double]

  /** Best-effort inverse for centers (original-space reporting). */
  def inverseCenter(center: Array[Double]): Array[Double]

  /** Divergence compatibility (e.g. log1p output can be negative -> not
    * KL/IS-safe).
    */
  def compatibleWith(divergence: String): Boolean = true

  def andThen(that: FeatureTransform): FeatureTransform = ComposedTransform(this, that)
}

case object NoOpTransform extends FeatureTransform {
  val name = "identity"
  def expr(f: Column): Column = f
  def apply(v: Array[Double]): Array[Double] = v
  def inverseCenter(c: Array[Double]): Array[Double] = c
}

/** log1p compresses heavy-tailed counts; inverse expm1. */
case object Log1pTransform extends FeatureTransform {
  val name = "log1p"
  def expr(f: Column): Column = transform(f, v => log1p(v))
  def apply(v: Array[Double]): Array[Double] = v.map(math.log1p)
  def inverseCenter(c: Array[Double]): Array[Double] = c.map(math.expm1)
  override def compatibleWith(divergence: String): Boolean =
    // log1p of x in [0, inf) stays >= 0, so the positive-domain
    // divergences remain valid; negative inputs would not
    true
}

/** Additive epsilon shift into the positive domain (KL/IS/genI prep). */
case class EpsilonShiftTransform(epsilon: Double = 1e-10) extends FeatureTransform {
  val name = s"epsilonShift($epsilon)"
  def expr(f: Column): Column = transform(f, v => v + lit(epsilon))
  def apply(v: Array[Double]): Array[Double] = v.map(_ + epsilon)
  def inverseCenter(c: Array[Double]): Array[Double] = c.map(_ - epsilon)
}

/** Row-wise L2 normalization (spherical/cosine prep). No exact inverse —
  * the norm is lost; inverseCenter is identity.
  */
case class NormalizeL2Transform(minNorm: Double = 1e-10) extends FeatureTransform {
  val name = "normalizeL2"
  def expr(f: Column): Column = {
    val n = sqrt(graft.functions.ArrayMath.dot(f, f))
    val safe = greatest(n, lit(minNorm))
    transform(f, v => v / safe)
  }
  def apply(v: Array[Double]): Array[Double] = {
    val n = math.max(minNorm, math.sqrt(v.map(x => x * x).sum))
    v.map(_ / n)
  }
  def inverseCenter(c: Array[Double]): Array[Double] = c
}

/** Row-wise L1 normalization (simplex / KL prep). */
case class NormalizeL1Transform(minNorm: Double = 1e-10) extends FeatureTransform {
  val name = "normalizeL1"
  def expr(f: Column): Column = {
    val n = aggregate(f, lit(0.0), (a, v) => a + abs(v))
    val safe = greatest(n, lit(minNorm))
    transform(f, v => v / safe)
  }
  def apply(v: Array[Double]): Array[Double] = {
    val n = math.max(minNorm, v.map(math.abs).sum)
    v.map(_ / n)
  }
  def inverseCenter(c: Array[Double]): Array[Double] = c
}

/** Column standardization (x - mean)/std with FITTED statistics; exact
  * inverse. Fit is one aggregation over the data.
  */
case class StandardScaleTransform(mean: Array[Double], std: Array[Double])
    extends FeatureTransform {
  val name = "standardScale"
  private def safeStd(i: Int): Double = if (std(i) > 0) std(i) else 1.0
  def expr(f: Column): Column = {
    val m = array(mean.map(lit(_)).toIndexedSeq: _*)
    val s = array(std.map(v => lit(if (v > 0) v else 1.0)).toIndexedSeq: _*)
    zip_with(zip_with(f, m, (x, mu) => x - mu), s, (x0, sd) => x0 / sd)
  }
  def apply(v: Array[Double]): Array[Double] =
    v.indices.map(i => (v(i) - mean(i)) / safeStd(i)).toArray
  def inverseCenter(c: Array[Double]): Array[Double] =
    c.indices.map(i => c(i) * safeStd(i) + mean(i)).toArray
  override def compatibleWith(divergence: String): Boolean =
    // standardized values go negative: SE/L1/spherical only
    Seq("squaredeuclidean", "se", "euclidean", "l2", "l1", "manhattan",
      "kmedians", "cosine", "spherical", "angular")
      .contains(divergence.trim.toLowerCase)
}

case class ComposedTransform(first: FeatureTransform, second: FeatureTransform)
    extends FeatureTransform {
  val name = s"${first.name}->${second.name}"
  def expr(f: Column): Column = second.expr(first.expr(f))
  def apply(v: Array[Double]): Array[Double] = second(first(v))
  def inverseCenter(c: Array[Double]): Array[Double] =
    first.inverseCenter(second.inverseCenter(c))
  override def compatibleWith(d: String): Boolean =
    first.compatibleWith(d) && second.compatibleWith(d)
}

object FeatureTransform {

  /** Fit a StandardScaleTransform: one posexplode + d-key hash
    * aggregation (map-side partial combine; the shuffle carries d rows)
    * computing per-dim (n, Σv, Σv²); mean = Σv/n, std = √(Σv²/n − mean²)
    * — the population sd closed form. A 2d-wide ImperativeAggregate row
    * (avg+stddev_pop per dim) measured 6× slower at the 100× decade and
    * keeps 2d aggregation buffers per partition; this shape is flat.
    */
  def fitStandardScale(df: DataFrame, featuresCol: String): StandardScaleTransform = {
    val dim = df.select(col(featuresCol)).head().getSeq[Double](0).length
    val rows = df
      .select(posexplode(col(featuresCol)).as(Seq("__j", "__v")))
      .groupBy(col("__j"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("s"),
        sum(col("__v") * col("__v")).as("s2"))
      .collect()
    val mean = new Array[Double](dim)
    val std = new Array[Double](dim)
    rows.foreach { r =>
      val j = r.getInt(0)
      val n = r.getLong(1).toDouble
      val m = r.getDouble(2) / n
      mean(j) = m
      std(j) = math.sqrt(math.max(0.0, r.getDouble(3) / n - m * m))
    }
    StandardScaleTransform(mean, std)
  }

  /** Name -> transform (parameterless ones). */
  def apply(name: String): FeatureTransform = name.trim.toLowerCase match {
    case "identity" | "none" => NoOpTransform
    case "log1p"             => Log1pTransform
    case "epsilonshift"      => EpsilonShiftTransform()
    case "normalizel2" | "l2norm" => NormalizeL2Transform()
    case "normalizel1" | "l1norm" => NormalizeL1Transform()
    case other =>
      throw new IllegalArgumentException(
        s"Unknown transform '$other' (identity|log1p|epsilonShift|normalizeL2|normalizeL1; standardScale via fitStandardScale)")
  }
}
