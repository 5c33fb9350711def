package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  def assets() = {
    val rows = Seq(
      (1L, "hello world"),
      (2L, "hello world"), // planted exact dup of 1
      (3L, "different payload"),
      (4L, "x" * 1000))
    Multimodal.assetsFromDocuments(rows.toDF("doc_id", "text"))
  }

  test("asset schema: binary payload + typed metadata struct") {
    val df = assets()
    assert(df.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height", "sampleRate", "durationMs", "sizeBytes"))
    val sizes = df.select(col("meta.sizeBytes")).collect().map(_.getLong(0)).sorted
    assert(sizes.toSeq == Seq(11L, 11L, 17L, 1000L))
  }

  test("binary fingerprint dedup finds planted duplicate payloads") {
    val dups = Multimodal.exactBinaryDedup(assets(), "asset_id", "payload")
    assert(dups.count() == 3) // 4 assets, one pair identical
    val pair = dups.where(col("dup_count") === 2).collect()
    assert(pair.length == 1 && pair(0).getAs[Long]("keeper_id") == 1L)
  }

  test("referential integrity: orphan refs surface via anti join") {
    val refs = Seq((10L, 1L), (11L, 3L), (12L, 99L), (13L, 100L)).toDF("ref_id", "asset_ref")
    val orphans = Multimodal.orphanRefs(refs, "asset_ref", assets(), "asset_id")
      .select("ref_id").collect().map(_.getLong(0)).sorted
    assert(orphans.toSeq == Seq(12L, 13L))
  }

  test("frame sampler: byte-range chunking with stride") {
    val df = Seq((1L, Array.tabulate(100)(_.toByte))).toDF("id", "payload")
    val frames = df.select(Multimodal.sampleFrames(col("payload"), frameBytes = 10, sampleEvery = 2).as("f"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.length == 5) // frames 0,2,4,6,8 of 10
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (20 until 30).map(_.toByte))
  }

  test("feature extraction is deterministic and partitioning-independent") {
    val df = assets()
    val f1 = Multimodal.extractFeatures(df.repartition(1), "payload", "feat")
      .select("asset_id", "feat").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f4 = Multimodal.extractFeatures(df.repartition(4), "payload", "feat")
      .select("asset_id", "feat").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f4, "features must not depend on partitioning")
    assert(f1(1L) == f1(2L), "identical payloads -> identical features")
    assert(f1(1L) != f1(3L), "different payloads -> different features")
    assert(f1.values.forall(_.length == 16))
  }

  test("decode stub: stable, payload-dependent, right shape") {
    val a = Multimodal.decodeStub("abc".getBytes("UTF-8"), 8)
    val b = Multimodal.decodeStub("abc".getBytes("UTF-8"), 8)
    val c = Multimodal.decodeStub("abd".getBytes("UTF-8"), 8)
    assert(a.toSeq == b.toSeq && a.toSeq != c.toSeq && a.length == 8)
    assert(Multimodal.decodeStub(null, 4).toSeq == Seq(0f, 0f, 0f, 0f))
  }

  /** A real PNG, generated with the JDK's own encoder: left half black,
    * right half white — a fixture whose grid-luminance features are known
    * analytically.
    */
  private def halfBlackPng(w: Int = 32, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: real PNG decodes to analytic grid-luminance features") {
    val feat = Multimodal.decodeImage(halfBlackPng(), targetDim = 16)
    assert(feat.length == 16)
    // 4x4 grid in raster order: columns 0-1 black (0.0), columns 2-3 white (1.0)
    for (row <- 0 until 4; c <- 0 until 4) {
      val expected = if (c < 2) 0.0f else 1.0f
      assert(math.abs(feat(row * 4 + c) - expected) < 1e-3,
        s"cell ($row,$c) = ${feat(row * 4 + c)}, expected $expected")
    }
    // corrupt bytes fall back to the stub, not an exception
    val junk = Array.tabulate(64)(_.toByte)
    assert(Multimodal.decodeImage(junk, 16).toSeq == Multimodal.decodeStub(junk, 16).toSeq)
  }

  /** A real 16-bit mono WAV, generated with the JDK's own encoder: first
    * half silence, second half a full-scale square wave — RMS envelope
    * features known analytically (0 then ~1).
    */
  private def halfSilentWav(nSamples: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- nSamples / 2 until nSamples) {
      val v: Short = if (i % 2 == 0) 0x7FFF.toShort else 0x8001.toShort
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio: real WAV decodes to analytic RMS-envelope features") {
    val feat = Multimodal.decodeAudio(halfSilentWav(), targetDim = 8)
    assert(feat.length == 8)
    for (w <- 0 until 4)
      assert(feat(w) < 1e-3, s"window $w should be silent, got ${feat(w)}")
    for (w <- 4 until 8)
      assert(feat(w) > 0.95, s"window $w should be near full scale, got ${feat(w)}")
    // corrupt bytes fall back to the stub, not an exception
    val junk = Array.tabulate(64)(_.toByte)
    assert(Multimodal.decodeAudio(junk, 8).toSeq == Multimodal.decodeStub(junk, 8).toSeq)
    // routed through extractFeatures by meta.format, short name and MIME
    val wav = halfSilentWav()
    assert(Multimodal.decoderFor("wav", 8)(wav).toSeq == feat.toSeq)
    assert(Multimodal.decoderFor("audio/wav", 8)(wav).toSeq == feat.toSeq)
    assert(Multimodal.decoderFor("mp3", 8)(wav).toSeq == Multimodal.decodeStub(wav, 8).toSeq,
      "compressed-audio formats without a JDK codec must stay on the stub")
  }

  test("decodeAudio handles 8-bit unsigned PCM (the other WAV encoding)") {
    val n = 4000
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val pcm = new Array[Byte](n)
    java.util.Arrays.fill(pcm, 0, n / 2, 0x80.toByte) // mid-scale = silence
    for (i <- n / 2 until n) pcm(i) = (if (i % 2 == 0) 0xFF else 0x00).toByte // full swing
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val feat = Multimodal.decodeAudio(bos.toByteArray, targetDim = 4)
    assert(feat(0) < 0.02 && feat(1) < 0.02, s"first half should be silent, got ${feat.toSeq}")
    assert(feat(2) > 0.9 && feat(3) > 0.9, s"second half should be near full scale, got ${feat.toSeq}")
  }

  test("decodeAudio converts mu-law AU to linear PCM instead of misreading the bit patterns") {
    import javax.sound.sampled._
    // silent 16-bit PCM -> mu-law AU file (mu-law encodes silence near
    // 0xFF; reading it AS linear unsigned would yield ~full-scale RMS)
    val n = 4000
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val silent = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](n * 2)), pcmFmt, n.toLong)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ulaw = AudioSystem.getAudioInputStream(ulawFmt, silent)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.AU, bos)
    val feat = Multimodal.decodeAudio(bos.toByteArray, targetDim = 4)
    assert(feat.forall(_ < 0.02),
      s"silent mu-law AU must decode to silence, got ${feat.toSeq}")
  }

  test("decoderFor selects by format short-name or MIME type") {
    val png = halfBlackPng()
    val viaShort = Multimodal.decoderFor("png", 16)(png)
    val viaMime = Multimodal.decoderFor("image/png", 16)(png)
    val viaStub = Multimodal.decoderFor("utf8", 16)(png)
    assert(viaShort.toSeq == Multimodal.decodeImage(png, 16).toSeq)
    assert(viaMime.toSeq == viaShort.toSeq)
    assert(viaStub.toSeq == Multimodal.decodeStub(png, 16).toSeq)
    assert(viaShort.toSeq != viaStub.toSeq, "real decode must differ from the stub on a real PNG")
  }

  test("extractFeatures routes per-row through meta.format: real decode for images, stub otherwise") {
    val png = halfBlackPng()
    val text = "hello world".getBytes("UTF-8")
    def meta(fmt: String, size: Long) =
      (fmt, 0, 0, 0, 0L, size)
    val df = Seq(
      (1L, png, meta("png", png.length.toLong)),
      (2L, text, meta("utf8", text.length.toLong)),
      (3L, png, meta("image/png", png.length.toLong)))
      .toDF("asset_id", "payload", "meta")
      .withColumn("meta", col("meta").cast(
        "struct<format:string,width:int,height:int,sampleRate:int,durationMs:bigint,sizeBytes:bigint>"))
    val out = Multimodal.extractFeatures(df.repartition(2), "payload", "feat",
        targetDim = 16, metaCol = Some("meta"))
      .select("asset_id", "feat").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L) == Multimodal.decodeImage(png, 16).toSeq, "png row must take the imageio path")
    assert(out(3L) == out(1L), "MIME-typed png row must take the same path")
    assert(out(2L) == Multimodal.decodeStub(text, 16).toSeq, "utf8 row must stay on the stub path")
    // the default (no metaCol) path is byte-for-byte what it was: stub everywhere
    val noMeta = Multimodal.extractFeatures(df, "payload", "feat")
      .select("asset_id", "feat").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(noMeta(1L) == Multimodal.decodeStub(png, 16).toSeq)
  }

  test("extracted features feed the existing similarity operators end-to-end") {
    val df = assets()
    val feats = Multimodal.extractFeatures(df, "payload", "feat")
      .select(col("asset_id").as("vec_id"), col("feat").cast("array<double>").as("v"))
    // identical payloads 1 and 2 must be each other's nearest neighbor
    val topk = graft.ops.Similarity.bruteForceTopK(
      feats, feats.where(col("vec_id") === 1L), "vec_id", "v", k = 2)
    val neighbors = topk.orderBy("rank").select("corpus_id").collect().map(_.getLong(0)).toSeq
    assert(neighbors.contains(2L), s"dup payload must be nearest, got $neighbors")
  }
}
