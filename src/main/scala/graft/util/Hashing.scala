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
}
