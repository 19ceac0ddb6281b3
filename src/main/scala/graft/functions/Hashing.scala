package graft.functions

/** Deterministic 64-bit hashing primitives for MinHash / SimHash / LSH.
  *
  * Everything here is pure, seed-stable across JVMs and executors (no
  * `hashCode`, no `Random` state at call sites) — a signature computed on
  * one executor must equal the one computed on another or LSH banding is
  * silently broken.
  */
object Hashing {

  /** FNV-1a 64-bit over UTF-8 bytes — cheap, well-distributed base hash. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a 64 over a raw byte slice — the byte-level form of [[fnv1a64]]
    * (identical fold; no string/charset round-trip), used by the
    * perceptual-hash byte shingles. */
  def fnv1a64Bytes(b: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over all k-byte shingles of a payload (bit-majority of
    * their FNV-1a hashes) — the perceptual-hash stub for binary columns:
    * same majority formula as [[simhash64]], byte shingles instead of
    * tokens. Payloads shorter than k have no shingle → signature 0. */
  def simhash64ByteGrams(b: Array[Byte], k: Int): Long = {
    if (b.length < k) return 0L
    val acc = new Array[Int](64)
    var p = 0
    while (p + k <= b.length) {
      val h = fnv1a64Bytes(b, p, k)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      p += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** SplitMix64 finalizer — turns (baseHash ^ seed) into an independent
    * hash family member; the standard trick for k MinHash "permutations"
    * without modular arithmetic. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** k deterministic seeds (a fixed splitmix64 stream). */
  def seeds(k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var s = 0x5dee2c77a33dL
    var i = 0
    while (i < k) { s = mix64(s); out(i) = s; i += 1 }
    out
  }

  /** 64-bit SimHash: per-bit majority vote over the token hash stream. */
  def simhash64(tokens: Iterator[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Rabin-Karp rolling hashes of all k-grams of a char sequence:
    * h(i) = c_i*B^(k-1) + ... + c_(i+k-1), 64-bit wraparound arithmetic,
    * each successive hash computed in O(1) from the previous. */
  def rollingHashes(s: String, k: Int): Array[Long] = {
    if (s.length < k) return Array.empty
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val out = new Array[Long](s.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= s.length - k) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      out(i) = h
      i += 1
    }
    out
  }

  /** Winnowing fingerprints (the MOSS scheme): the minimum k-gram rolling
    * hash of every window of `w` consecutive k-grams, consecutive
    * duplicates collapsed. Guarantee: any shared substring of length
    * >= w + k - 1 between two documents yields a shared fingerprint.
    * Ties broken by rightmost position (standard robust winnowing). */
  def winnow(s: String, k: Int, w: Int): Set[Long] = {
    val hs = rollingHashes(s, k)
    if (hs.isEmpty) return Set.empty
    if (hs.length <= w) return Set(hs.min)
    val out = scala.collection.mutable.Set.empty[Long]
    var i = 0
    while (i + w <= hs.length) {
      var minIdx = i
      var j = i + 1
      while (j < i + w) {
        if (hs(j) <= hs(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      out += hs(minIdx)
      i += 1
    }
    out.toSet
  }

  /** Deterministic pseudo-random unit-free hyperplanes for sign-LSH:
    * `n` planes × `dim` coefficients in [-1, 1). */
  def hyperplanes(n: Int, dim: Int, seed: Long = 0x9e3779b9L): Array[Array[Double]] = {
    var s = seed
    Array.fill(n) {
      Array.fill(dim) {
        s = mix64(s)
        // top 53 bits → uniform double in [0,1) → shift to [-1,1)
        (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }
  }

  /** Sign-LSH signature: bit i = (v · plane_i) > 0. */
  def signSignature(v: Array[Double], planes: Array[Array[Double]]): Int = {
    var sig = 0
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < p.length) { dot += v(j) * p(j); j += 1 }
      if (dot > 0) sig |= (1 << i)
      i += 1
    }
    sig
  }
}
