package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Hashing

/** The portable hashes are CONTRACTS with external engines: the oracle SQL
  * recomputes them from md5 hex substrings, so their exact values — not
  * just their distribution — are load-bearing. The expected constants here
  * were derived independently (python hashlib), not from the
  * implementation, so a regression that silently changes the bit layout
  * (endianness, signedness, scaling order) fails loudly instead of
  * surfacing as a driver-gate hash mismatch a round later.
  */
class HashingSpec extends AnyFunSuite {

  test("md5Long matches independently computed first-8-bytes-big-endian values") {
    assert(Hashing.md5Long("abc") == -8070080442485551184L)
    assert(Hashing.md5Long("") == -3162216497309240828L)
    assert(Hashing.md5Long("the") == -8087290180436138277L)
  }

  test("md5LongPair first half equals md5Long for arbitrary strings (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val prop = forAll(Gen.asciiPrintableStr, Gen.listOf(Gen.alphaNumChar).map(_.mkString)) {
      (a: String, b: String) =>
        val s = a + b
        Hashing.md5LongPair(s)._1 == Hashing.md5Long(s)
    }
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  test("md5LongPair: first half equals md5Long, second half independently derived") {
    // expected values from python hashlib (struct.unpack('>q', digest[8:16]))
    assert(Hashing.md5LongPair("abc") == ((-8070080442485551184L, -2984127896297046158L)))
    assert(Hashing.md5LongPair("the quick") == ((-1713262776185533035L, -8631621222697787648L)))
    Seq("", "a", "shingle one two", "é中").foreach { s =>
      assert(Hashing.md5LongPair(s)._1 == Hashing.md5Long(s),
        s"first half must equal md5Long for $s")
    }
  }

  test("md5LongMemo is bit-identical to md5Long (repeats, long keys, concurrency)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val prop = forAll(Gen.asciiPrintableStr) { s: String =>
      Hashing.md5LongMemo(s) == Hashing.md5Long(s)
    }
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(res.passed, res.status.toString)
    // a repeated probe must hit the memo and still return the true hash
    (1 to 3).foreach { _ =>
      assert(Hashing.md5LongMemo("the") == -8087290180436138277L)
    }
    // >48 chars bypasses the memo, same value either way
    val long = "x" * 60
    assert(Hashing.md5LongMemo(long) == Hashing.md5Long(long))
    val ok = new java.util.concurrent.atomic.AtomicBoolean(true)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        var i = 0
        while (i < 2000) {
          if (Hashing.md5LongMemo("tok" + (i % 97)) != Hashing.md5Long("tok" + (i % 97)))
            ok.set(false)
          i += 1
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(ok.get())
  }

  test("md5Unit matches independently computed values bit-for-bit") {
    // exact == on doubles is intentional: every scaling step is exact, so
    // any engine computing u/2^32*2-1 must land on the identical double
    assert(Hashing.md5Unit(42L, 0L) == 0.3210572930984199)
    assert(Hashing.md5Unit(42L, 63L) == 0.9235411556437612)
    assert(Hashing.md5Unit(7L, 5L) == 0.01804571645334363)
  }

  test("md5Unit stays in [-1, 1) across a key sweep") {
    (0L until 1000L).foreach { j =>
      val u = Hashing.md5Unit(42L, j)
      assert(u >= -1.0 && u < 1.0, s"md5Unit(42, $j) = $u out of range")
    }
  }

  test("md5 hashes are stable under concurrent use (ThreadLocal digest)") {
    val expected = Hashing.md5Long("concurrent-probe")
    val ok = new java.util.concurrent.atomic.AtomicBoolean(true)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        var i = 0
        while (i < 1000) {
          if (Hashing.md5Long("concurrent-probe") != expected) ok.set(false)
          i += 1
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(ok.get())
  }

  test("simhash of a permuted token multiset is identical (bag semantics)") {
    val tokens = Seq("alpha", "beta", "gamma", "delta", "alpha")
    assert(graft.ops.Dedup.simhashOf(tokens) ==
      graft.ops.Dedup.simhashOf(scala.util.Random.shuffle(tokens)))
  }

  test("lshPlanesForCorpus: highest-set-bit formula, clamped, SQL-equivalent") {
    import graft.ops.Similarity.lshPlanesForCorpus
    assert(lshPlanesForCorpus(1000L) == 12)    // small corpora keep the floor
    assert(lshPlanesForCorpus(16384L) == 12)   // ceil(16384/4)=4096=2^12
    assert(lshPlanesForCorpus(16388L) == 13)   // one bucket over -> next bit
    assert(lshPlanesForCorpus(400000L) == 17)  // the measured sf10 corpus
    assert(lshPlanesForCorpus(Long.MaxValue / 2) == 28) // clamp at cap
    // the oracle computes the same value as length(bin(buckets - 1)):
    (2L to 4096L).foreach { buckets =>
      val viaBin = java.lang.Long.toBinaryString(buckets - 1).length
      assert(64 - java.lang.Long.numberOfLeadingZeros(buckets - 1) == viaBin)
    }
  }

  test("simhash sign bits replay the per-token md5Long bit votes") {
    val tokens = Seq("x", "y", "z")
    val sig = graft.ops.Dedup.simhashOf(tokens)
    (0 until 64).foreach { b =>
      val votes = tokens.map(t => if (((Hashing.md5Long(t) >>> b) & 1L) == 1L) 1 else -1).sum
      val bit = (sig >>> b) & 1L
      assert(bit == (if (votes > 0) 1L else 0L), s"bit $b: votes=$votes bit=$bit")
    }
  }
}
