package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling for training-data pipelines: image/audio/
  * video payloads ride through the engine as opaque `binary` columns with
  * a typed metadata struct; decode / feature-extraction / frame-sampling
  * run distributed over the bytes.
  *
  * DECODE is real where the JDK ships a codec — [[decodeImage]]
  * (javax.imageio: PNG/JPEG/GIF/BMP) and [[decodeAudio]]
  * (javax.sound.sampled: WAV/AIFF/AU) — selected per row from the typed
  * metadata's format/MIME by [[decoderFor]]. Formats without a JDK codec
  * (video, compressed audio) and rows without metadata take
  * [[decodeStub]], a deterministic payload-derived fake that keeps those
  * rows oracle-replayable; undecodable payloads degrade to the stub
  * instead of failing the partition. Everything Spark-side is shared
  * across the three: the schema contract, the binary fingerprint dedup
  * (one hash aggregate, same shape as text dedup), the
  * referential-integrity check (anti join), the per-partition batch
  * processing pattern (one decoder instance per format per partition, the
  * Scala analogue of mapInPandas batch semantics), and the byte-range
  * frame sampler. Adding an external codec (ffmpeg etc.) means adding one
  * function and one routing entry.
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

  /** Real image decoder (JDK-builtin javax.imageio — no external codec
    * dependency): decode PNG/JPEG/GIF/BMP bytes to a g×g grid of mean
    * luminance values in [0, 1] (g = ⌊√targetDim⌋, raster order, zero-pad
    * to targetDim). Deterministic for a given payload: pure pixel
    * arithmetic, no resampling library involved. Undecodable bytes fall
    * back to [[decodeStub]] so a corrupt row degrades instead of failing
    * the partition.
    */
  def decodeImage(bytes: Array[Byte], targetDim: Int): Array[Float] = {
    val out = new Array[Float](targetDim)
    if (bytes == null || bytes.isEmpty) return out
    // NonFatal, not just IOException: imageio plugins throw runtime
    // exceptions (AIOOBE, NegativeArraySize, ...) on malformed payloads,
    // and a corrupt row must degrade to the stub, never fail the partition
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return decodeStub(bytes, targetDim)
    val g = math.max(1, math.sqrt(targetDim.toDouble).toInt)
    val w = img.getWidth
    val h = img.getHeight
    var cy = 0
    while (cy < g) {
      val y0 = cy * h / g
      val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / g))
      var cx = 0
      while (cx < g) {
        val x0 = cx * w / g
        val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / g))
        var sum = 0.0
        var cnt = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val gg = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            // Rec. 601 luma
            sum += (0.299 * r + 0.587 * gg + 0.114 * b) / 255.0
            cnt += 1
            x += 1
          }
          y += 1
        }
        val idx = cy * g + cx
        if (idx < targetDim && cnt > 0) out(idx) = (sum / cnt).toFloat
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Real audio decoder (JDK-builtin javax.sound.sampled — no external
    * codec dependency): decode WAV/AIFF/AU bytes to `targetDim` windowed
    * RMS-energy features in [0, 1] — the sample stream is split into
    * targetDim equal windows and each emits its root-mean-square
    * amplitude (mono-mixed, PCM normalized by the sample width). The
    * standard cheap audio profile: silence detection, clipping/level
    * checks, and coarse envelope similarity all read off it. Undecodable
    * bytes fall back to [[decodeStub]].
    */
  def decodeAudio(bytes: Array[Byte], targetDim: Int): Array[Float] = {
    val out = new Array[Float](targetDim)
    if (bytes == null || bytes.isEmpty) return out
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    // NonFatal, not just IOException: codec plugins throw runtime
    // exceptions on malformed containers, and a corrupt row must degrade
    // to the stub, never fail the partition
    val stream =
      try {
        val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val enc = raw.getFormat.getEncoding
        if (enc == AudioFormat.Encoding.PCM_SIGNED || enc == AudioFormat.Encoding.PCM_UNSIGNED)
          raw
        else {
          // mu-law/A-law AU, float WAV, ...: convert to linear signed PCM
          // (the JDK ships these converters) rather than misreading the
          // raw bit patterns as linear samples
          val f = raw.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, 2 * f.getChannels, f.getSampleRate, false)
          AudioSystem.getAudioInputStream(target, raw)
        }
      } catch { case scala.util.control.NonFatal(_) => null }
    if (stream == null) return decodeStub(bytes, targetDim)
    try {
      val fmt = stream.getFormat
      val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
      val channels = math.max(1, fmt.getChannels)
      val raw = stream.readAllBytes()
      val frameBytes = bytesPerSample * channels
      val nFrames = raw.length / frameBytes
      if (nFrames == 0) return decodeStub(bytes, targetDim)
      val bigEndian = fmt.isBigEndian
      val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val fullScale = math.pow(2.0, fmt.getSampleSizeInBits - 1)
      // mono-mix each frame to one sample in [-1, 1]
      def sampleAt(frame: Int): Double = {
        var mix = 0.0
        var ch = 0
        while (ch < channels) {
          val base = frame * frameBytes + ch * bytesPerSample
          var v = 0L
          var b = 0
          while (b < bytesPerSample) {
            val idx = base + (if (bigEndian) b else bytesPerSample - 1 - b)
            v = (v << 8) | (raw(idx) & 0xFFL)
            b += 1
          }
          val bits = bytesPerSample * 8
          var s = v
          if (signed) { // sign-extend
            val signBit = 1L << (bits - 1)
            if ((s & signBit) != 0) s = s - (1L << bits)
          } else s = s - (1L << (bits - 1)) // unsigned PCM centers at mid-scale
          mix += s.toDouble / fullScale
          ch += 1
        }
        mix / channels
      }
      var w = 0
      while (w < targetDim) {
        val from = (w.toLong * nFrames / targetDim).toInt
        val until = math.max(from + 1, ((w + 1).toLong * nFrames / targetDim).toInt)
        var sumSq = 0.0
        var i = from
        while (i < until && i < nFrames) { val s = sampleAt(i); sumSq += s * s; i += 1 }
        out(w) = math.min(1.0, math.sqrt(sumSq / (until - from))).toFloat
        w += 1
      }
      out
    } catch {
      // frame parsing on a structurally-valid-but-lying header must
      // degrade the same way as an unopenable payload
      case scala.util.control.NonFatal(_) => decodeStub(bytes, targetDim)
    } finally stream.close()
  }

  private val ImageFormats =
    Set("png", "jpg", "jpeg", "gif", "bmp", "wbmp", "tiff", "tif")
  private val AudioFormats =
    Set("wav", "wave", "x-wav", "aiff", "x-aiff", "aif", "au", "basic", "snd")

  /** Decoder selection by the `meta.format` string (a format short-name
    * or MIME type): image formats get the javax.imageio pixel decoder,
    * WAV/AIFF/AU get the javax.sound.sampled RMS-envelope decoder;
    * everything else (utf8 text, video and compressed-audio formats whose
    * codecs aren't JDK-builtin) takes the deterministic stub, which keeps
    * those rows oracle-replayable.
    */
  def decoderFor(format: String, targetDim: Int): Array[Byte] => Array[Float] = {
    val f = if (format == null) "" else format.toLowerCase(java.util.Locale.ROOT)
    val short = f.stripPrefix("image/").stripPrefix("audio/")
    if (ImageFormats.contains(short)) decodeImage(_, targetDim)
    else if (AudioFormats.contains(short)) decodeAudio(_, targetDim)
    else decodeStub(_, targetDim)
  }

  /** Distributed feature extraction over binary payloads with the
    * batch-per-partition pattern: ONE "decoder" is instantiated per
    * partition (the expensive step for a real codec/model), then reused
    * across that partition's rows — the Scala analogue of mapInPandas
    * batching. Appends `featCol: array<float>`.
    *
    * When `metaCol` names a [[MetaType]]-shaped struct column, the
    * decoder is selected per row from its `format` field (real
    * javax.imageio decode for image formats, deterministic stub
    * otherwise), with one decoder instance cached per distinct format per
    * partition. With `metaCol = None` (the default) every row takes the
    * stub — the oracle-replayable path, unchanged.
    */
  def extractFeatures(df: DataFrame, payloadCol: String, featCol: String,
      targetDim: Int = 16, metaCol: Option[String] = None): DataFrame = {
    val schema = df.schema.add(featCol, ArrayType(FloatType), nullable = false)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val formatIdx: Option[(Int, Int)] = metaCol.map { m =>
      val mIdx = df.schema.fieldIndex(m)
      val mType = df.schema(mIdx).dataType.asInstanceOf[StructType]
      (mIdx, mType.fieldIndex("format"))
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // real codecs cost milliseconds per payload — fan the scan out so the
    // decode stage never serializes on a single-row-group input file
    Dedup.fanOut(df).mapPartitions { rows =>
      // per-partition decoder setup happens HERE (once per distinct
      // format), not per row
      val cache = scala.collection.mutable.HashMap.empty[String, Array[Byte] => Array[Float]]
      val stub: Array[Byte] => Array[Float] = decodeStub(_, targetDim)
      rows.map { r =>
        val decoder = formatIdx match {
          case Some((mi, fi)) if !r.isNullAt(mi) =>
            val fmt = { val m = r.getStruct(mi); if (m.isNullAt(fi)) "" else m.getString(fi) }
            cache.getOrElseUpdate(fmt, decoderFor(fmt, targetDim))
          case _ => stub
        }
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ decoder(bytes).toSeq)
      }
    }(enc)
  }
}
