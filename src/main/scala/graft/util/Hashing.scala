package graft.util

/** Deterministic 64-bit hashing for sketch operators (MinHash, SimHash,
  * hyperplane LSH). Self-consistent across JVMs/executors — these hashes
  * never need to match an external engine (sketch queries are confirmed by
  * exact, portable math before any oracle comparison), so we use a fast
  * FNV-1a + splitmix64-finalizer combination instead of reflective calls
  * into Spark internals.
  */
object Hashing {

  /** splitmix64 finalizer: full-avalanche 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over the string's UTF-16 chars, seeded, then avalanched.
    * One pass over the string; no byte-array allocation.
    */
  def hashString(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ mix64(seed)
    var i = 0
    val n = s.length
    while (i < n) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Deterministic pseudo-random double in [-1, 1) from a hash of (seed, j). */
  @inline def unitDouble(seed: Long, j: Long): Double =
    (mix64(seed ^ (j * 0x9e3779b97f4a7c15L)) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** ENGINE-PORTABLE 64-bit hash: the first 8 bytes of md5(UTF-8 bytes),
    * big-endian — in any SQL engine this is
    * `('0x' || substr(md5(s), 1, 16))::UBIGINT` (same bit pattern; we
    * return it as a signed long). Slower than [[hashString]]; use it for
    * hashes that enter an oracle-checked contract (the house rule also
    * behind `Sampling.uniform` and the feature-hashed NB classifier).
    */
  def md5Long(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  private val memoLocal = new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
    override def initialValue(): java.util.HashMap[String, java.lang.Long] =
      new java.util.HashMap[String, java.lang.Long](1 << 16)
  }

  /** [[md5Long]] with a per-thread memo for short, high-repetition keys
    * (word tokens are Zipf-distributed, so a SimHash pass re-digests the
    * same few thousand words millions of times). Bit-identical to
    * [[md5Long]] — the memo only skips recomputation. Keys longer than 48
    * chars (shingles, texts — mostly distinct, caching would only thrash)
    * bypass the memo; the map is cleared past 2^17 entries so executor
    * memory stays bounded (~16 MB worst case per thread).
    */
  def md5LongMemo(s: String): Long = {
    if (s.length > 48) md5Long(s)
    else {
      val m = memoLocal.get()
      val c = m.get(s)
      if (c != null) c.longValue()
      else {
        if (m.size >= (1 << 17)) m.clear()
        val h = md5Long(s)
        m.put(s, h)
        h
      }
    }
  }

  /** BOTH 64-bit halves of md5(UTF-8 bytes), big-endian — one digest,
    * two independent engine-portable hashes. In SQL:
    * `('0x' || substr(md5(s), 1, 16))::UBIGINT` and
    * `('0x' || substr(md5(s), 17, 16))::UBIGINT`. Use for
    * double-hashing schemes (Kirsch–Mitzenmacher Bloom probes) where a
    * per-probe md5 would dominate the operator's cost.
    */
  def md5LongPair(s: String): (Long, Long) = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def be(o: Int): Long =
      ((d(o) & 0xffL) << 56) | ((d(o + 1) & 0xffL) << 48) | ((d(o + 2) & 0xffL) << 40) |
        ((d(o + 3) & 0xffL) << 32) | ((d(o + 4) & 0xffL) << 24) | ((d(o + 5) & 0xffL) << 16) |
        ((d(o + 6) & 0xffL) << 8) | (d(o + 7) & 0xffL)
    (be(0), be(8))
  }

  /** JVM twin of the COLUMN function `xxhash64(lit(tag), col)` —
    * bit-identical to the Catalyst expression (pinned in FastHashSpec
    * against a real `functions.xxhash64` evaluation): Spark's XxHash64
    * folds seed 42 over its children, so this is hash(tag UTF-8 bytes,
    * 42) then hash(s UTF-8 bytes, that). Used by the fast
    * (`portableHash = false`) Bloom position math so the dense
    * broadcast-probe path ([[graft.ops.Curate]]'s bloomHits) and the
    * codegen'd column path can never desynchronize. NOT engine-portable:
    * fast-mode artifacts cannot be replayed in an external SQL engine —
    * the same honest tradeoff as the HLL/CMS fast modes
    * (`graft.ops.Hll.registerCoords`).
    */
  def xxh64Tagged(tag: String, s: String): Long = {
    val h1 = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(tag),
      org.apache.spark.sql.types.StringType, 42L)
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, h1)
  }

  /** ENGINE-PORTABLE deterministic pseudo-random double in [-1, 1): the
    * first 4 bytes of md5("seed:j") as an unsigned 32-bit value, scaled.
    * In any SQL engine:
    * `('0x' || substr(md5(seed || ':' || j), 1, 8))::UBIGINT::DOUBLE
    *  / 4294967296 * 2 - 1` — every arithmetic step (power-of-two divide,
    * double, subtract) is exact, so the double is bit-identical across
    * engines. Used for hash-derived matrices that enter oracle-checked
    * contracts (hyperplane LSH planes, the q_embed_lsh jitter).
    */
  def md5Unit(seed: Long, j: Long): Double = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s"$seed:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u.toDouble / 4294967296.0 * 2.0 - 1.0
  }
}
