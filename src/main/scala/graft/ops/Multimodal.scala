package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling for training-data pipelines: image/audio/
  * video payloads ride through the engine as opaque `binary` columns with
  * a typed metadata struct; decode / feature-extraction / frame-sampling
  * run distributed over the bytes.
  *
  * The DECODE step is a clearly-marked deterministic STUB — real codec
  * libraries are not available in this environment — but everything
  * Spark-side is real and tested: the schema contract, the binary
  * fingerprint dedup (one hash aggregate, same shape as text dedup), the
  * referential-integrity check (anti join), the per-partition batch
  * processing pattern (one "decoder" instance per partition, the Scala
  * analogue of mapInPandas batch semantics), and the byte-range frame
  * sampler. Swapping the stub for javax.imageio/ffmpeg changes ONE
  * function.
  *
  * Scale notes: payloads never reach the driver; fingerprints are
  * codegen'd hash expressions so dedup is a plain hash aggregate; the
  * anti join broadcasts whichever side is small; feature extraction is a
  * narrow mapPartitions — at 100 TB every operator here is a scan-shaped
  * pass.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sampleRate", IntegerType),
    StructField("durationMs", LongType),
    StructField("sizeBytes", LongType)))

  /** Build a multimodal asset table from the documents table: the text
    * bytes stand in for an encoded payload (deterministic, so oracle-
    * checkable); metadata derives from the payload.
    */
  def assetsFromDocuments(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      lit("text").as("modality"),
      payload.as("payload"),
      struct(
        lit("utf8").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0).as("sampleRate"),
        lit(0L).as("durationMs"),
        length(payload).cast("long").as("sizeBytes")).as("meta"))
  }

  /** Content fingerprint of a binary column — md5 hex (exact-dup key,
    * SQL-portable) plus a 64-bit xxhash for cheap bucketing.
    */
  def fingerprint(payload: Column): Column = md5(payload)
  def fingerprint64(payload: Column): Column = xxhash64(payload)

  /** Exact binary dedup: one hash aggregate over the payload fingerprint
    * (same single-pass shape as Dedup.exact on text).
    */
  def exactBinaryDedup(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.groupBy(fingerprint(col(payloadCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Referential integrity: rows of `refs.refCol` with no matching
    * `assets.assetIdCol` — a LEFT ANTI join (broadcast when small).
    */
  def orphanRefs(refs: DataFrame, refCol: String,
      assets: DataFrame, assetIdCol: String): DataFrame =
    refs.join(assets.select(col(assetIdCol).as("__aid")),
      refs(refCol) === col("__aid"), "left_anti")

  /** Byte-range frame sampler: split a payload into fixed-size "frames"
    * with a stride, keeping every `sampleEvery`-th — the real byte
    * arithmetic a video pipeline needs, independent of the codec.
    */
  def sampleFrames(payload: Column, frameBytes: Int, sampleEvery: Int): Column = {
    require(frameBytes > 0 && sampleEvery > 0)
    val u = udf { (bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[Array[Byte]]
      else {
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by sampleEvery).map { f =>
          val from = f * frameBytes
          java.util.Arrays.copyOfRange(bytes, from, math.min(from + frameBytes, bytes.length))
        }
      }
    }
    u(payload)
  }

  /** ======================= STUB =======================
    * Deterministic fake decoder: stands in for an image/audio codec
    * (javax.imageio / ffmpeg are not in this container). "Pixel" bucket i
    * is the mean of payload bytes at positions i, i+dim, i+2dim, ...
    * scaled to [0, 1] — derived ONLY from the payload bytes, so results
    * are stable across runs and partitionings, and simple enough that an
    * external SQL engine can replay it (q_multimodal_features is
    * hash-oracle-checked on exactly this definition). Replace this body
    * with a real codec to productionize; the schema and plumbing stay
    * unchanged.
    */
  def decodeStub(bytes: Array[Byte], targetDim: Int): Array[Float] = {
    val out = new Array[Float](targetDim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < targetDim) {
      var sum = 0L
      var cnt = 0
      var j = i
      while (j < bytes.length) { sum += bytes(j) & 0xFF; cnt += 1; j += targetDim }
      if (cnt > 0) out(i) = (sum.toDouble / cnt / 255.0).toFloat
      i += 1
    }
    out
  }

  /** Distributed feature extraction over binary payloads with the
    * batch-per-partition pattern: ONE "decoder" is instantiated per
    * partition (the expensive step for a real codec/model), then reused
    * across that partition's rows — the Scala analogue of mapInPandas
    * batching. Appends `featCol: array<float>`.
    */
  def extractFeatures(df: DataFrame, payloadCol: String, featCol: String,
      targetDim: Int = 16): DataFrame = {
    val schema = df.schema.add(featCol, ArrayType(FloatType), nullable = false)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition decoder setup happens HERE (once), not per row
      val decoder: Array[Byte] => Array[Float] = decodeStub(_, targetDim)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ decoder(bytes).toSeq)
      }
    }(enc)
  }
}
