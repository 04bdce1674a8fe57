package graft.ops

import java.nio.charset.StandardCharsets

/** One-pass signature kernels for dedup/similarity. These run inside UDFs:
  * a single traversal of the document computes the whole signature, where
  * the equivalent Catalyst higher-order-function expressions would
  * re-evaluate the tokenization per hash index (no CSE inside lambdas).
  *
  * All hashing is plain integer arithmetic (polynomial rolling hashes mod
  * the Mersenne prime 2^31-1, quadratic-residue mixes) chosen so that no
  * intermediate overflows a signed 64-bit integer: an external engine — the
  * DuckDB correctness oracle — replicates every signature exactly in SQL,
  * which makes even the approximate LSH outputs hash-checkable.
  */
object Signatures {

  /** 2^31 - 1, the Mersenne prime used as the hash modulus. */
  val P31: Long = 2147483647L

  /** Polynomial rolling hash of the UTF-8 bytes, mod 2^31-1. The largest
    * intermediate is P31*131 + 255 < 2^39 — no 64-bit overflow on either
    * engine.
    */
  def poly31(s: String, seed: Long): Long = {
    var acc = seed
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 131L + (bytes(i) & 0xffL)) % P31
      i += 1
    }
    acc
  }

  /** Both seed-7 and seed-13 polynomial hashes in ONE pass over the UTF-8
    * bytes (one getBytes allocation instead of two); packed (h7, h13<<31)
    * low/high. Arithmetic identical to two poly31 calls.
    */
  private def poly31Pair(s: String): Long = {
    var a = 7L
    var b = 13L
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xffL
      a = (a * 131L + c) % P31
      b = (b * 131L + c) % P31
      i += 1
    }
    a | (b << 31)
  }

  /** 62-bit hash: two independent polynomial hashes packed side by side. */
  def hash62(s: String): Long = poly31Pair(s)

  /** Lowercased whitespace-separated words. */
  def words(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Fraction of word n-grams that repeat an earlier n-gram in the same
    * document (`1 - distinct/total`), truncated to 4 decimals; 0.0 with
    * fewer than n words. One pass with a hash set — the equivalent
    * higher-order-function expression tree is interpreted (no codegen for
    * lambda functions) and re-evaluates the gram array once per reference.
    */
  def duplicateNgramFraction(text: String, n: Int): Double = {
    if (text == null) return 0.0
    val ws = words(text)
    val total = ws.length - n + 1
    if (total <= 0) 0.0
    else {
      val seen = new java.util.HashSet[String](total * 2)
      val sb = new java.lang.StringBuilder
      var dup = 0
      var i = 0
      while (i < total) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(ws(i + k))
          k += 1
        }
        if (!seen.add(sb.toString)) dup += 1
        i += 1
      }
      math.floor(dup.toDouble / total * 10000.0) / 10000.0
    }
  }

  /** Fraction of line characters (code points, as Spark's `length`) in
    * lines that occur more than once, truncated to 4 decimals. Lines are
    * space-trimmed exactly like Spark's `trim` (0x20 only); blank lines
    * drop; 0.0 with no non-blank lines. Two passes over the lines where
    * the expression form is O(lines^2) interpreted.
    */
  def duplicateLineCharFraction(text: String): Double = {
    if (text == null) return 0.0
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    text.split("\n", -1).foreach { raw =>
      var b = 0
      var e = raw.length
      while (b < e && raw.charAt(b) == ' ') b += 1
      while (e > b && raw.charAt(e - 1) == ' ') e -= 1
      if (e > b) lines += raw.substring(b, e)
    }
    var tot = 0L
    val counts = new java.util.HashMap[String, Integer]
    lines.foreach { l =>
      tot += l.codePointCount(0, l.length)
      counts.merge(l, 1, (a, b) => a + b)
    }
    if (tot == 0L) 0.0
    else {
      var dup = 0L
      lines.foreach { l =>
        if (counts.get(l) > 1) dup += l.codePointCount(0, l.length)
      }
      math.floor(dup.toDouble / tot * 10000.0) / 10000.0
    }
  }

  /** Distinct word k-shingles joined with single spaces (first-occurrence
    * order). One reused StringBuilder instead of a slice array + mkString
    * per shingle — this is the inner loop of minhash/jaccard/ngram-stats
    * over every document.
    */
  def wordShingles(text: String, k: Int): Array[String] = {
    val ws = words(text)
    if (ws.length < k) Array.empty
    else {
      val total = ws.length - k + 1
      val out = new java.util.LinkedHashSet[String](total * 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < total) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
      out.toArray(new Array[String](out.size))
    }
  }

  /** MinHash signature via the standard two-hash trick:
    * h_i(s) = (h1(s) + i * h2(s)) mod P31 — two string hashes per shingle,
    * `numHashes` cheap mixes, one pass. Max intermediate ≈ 128 * 2^31 < 2^39.
    */
  def minhash(text: String, numHashes: Int, shingleK: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sh = wordShingles(text, shingleK)
    var s = 0
    while (s < sh.length) {
      val packed = poly31Pair(sh(s)) // h1 | h2 << 31, one byte pass
      val h1 = packed & 0x7fffffffL
      val h2 = packed >>> 31
      var i = 0
      while (i < numHashes) {
        val h = (h1 + i * h2) % P31
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** LSH band keys of a MinHash signature: band b's key is its row values
    * joined with commas (the banded join already scopes keys per band, so
    * the values themselves are the key — and a SQL string_agg reproduces
    * them verbatim).
    */
  def minhashBandKeys(sig: Array[Long], bands: Int): Array[String] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      val sb = new StringBuilder
      var r = 0
      while (r < rows) {
        if (r > 0) sb += ','
        sb.append(sig(b * rows + r))
        r += 1
      }
      sb.toString
    }
  }

  /** Number of signature bits produced by [[simhash]]. */
  val SimhashBits: Int = 62

  /** 62-bit SimHash over word features: per-bit sign votes of word hashes. */
  def simhash(text: String): Long = {
    val votes = new Array[Int](SimhashBits)
    val ws = words(text)
    var i = 0
    while (i < ws.length) {
      val h = hash62(ws(i))
      var b = 0
      while (b < SimhashBits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < SimhashBits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Deterministic pseudo-random hyperplane weight for (bit, dim) in
    * [-0.5, 0.5): quadratic residue of a linear mix — nonlinear enough that
    * planes are not linearly dependent, simple enough for SQL. Max
    * intermediate is h*h < 2^62.
    */
  def hyperplaneWeight(bit: Int, dim: Int): Double = {
    val h = (bit.toLong * 73856093L + dim.toLong * 19349663L + 83492791L) % P31
    val h2 = (h * h) % P31
    h2.toDouble / P31.toDouble - 0.5
  }

  /** Per-JVM cache of the (nBits x dims) plane matrix: the weights are a
    * pure function of (bit, dim), so each executor materializes them once
    * instead of re-deriving two multiply-mods per vector element.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(nBits: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nBits, dims), { case (nb, d) =>
      Array.tabulate(nb, d)(hyperplaneWeight)
    })

  /** Random-hyperplane sign signature of an embedding: bit b is the sign of
    * the f64 dot product with plane b. No stored projection matrix — every
    * executor (and the SQL oracle) regenerates the same planes.
    */
  def hyperplaneBits(vec: Array[Float], nBits: Int): Array[Long] = {
    val nWords = (nBits + 63) / 64
    val ps = planes(nBits, vec.length)
    val out = new Array[Long](nWords)
    var b = 0
    while (b < nBits) {
      val plane = ps(b)
      var dot = 0.0
      var j = 0
      while (j < vec.length) {
        dot += vec(j) * plane(j)
        j += 1
      }
      if (dot >= 0) out(b / 64) |= (1L << (b % 64))
      b += 1
    }
    out
  }

  /** Band keys over a hyperplane bit signature: band b's key is the integer
    * formed by its `bits` bits (LSB first).
    */
  def hyperplaneBandKeys(vec: Array[Float], bits: Int, bands: Int): Array[Long] = {
    val nBits = bits * bands
    val packed = hyperplaneBits(vec, nBits)
    Array.tabulate(bands) { b =>
      var acc = 0L
      var i = 0
      while (i < bits) {
        val bit = b * bits + i
        if (((packed(bit / 64) >>> (bit % 64)) & 1L) == 1L) acc |= (1L << i)
        i += 1
      }
      acc
    }
  }

  /** Rolling-hash document fingerprint (Manber's 0-mod-q scheme): hash
    * every character k-gram of the whitespace-normalized text with a true
    * O(n) rolling polynomial hash and keep the hashes divisible by
    * `divisor` (expected 1/divisor of positions). Sorted distinct hashes;
    * two documents sharing text regions share fingerprint hashes.
    */
  def rollingFingerprint(text: String, k: Int, divisor: Long): Array[Long] = {
    val s = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    if (bytes.length < k) return Array.empty
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 131L + (bytes(i) & 0xffL)) % P31; i += 1 }
    var pow = 1L
    i = 0
    while (i < k - 1) { pow = (pow * 131L) % P31; i += 1 }
    val out = scala.collection.mutable.SortedSet[Long]()
    if (h % divisor == 0) out += h
    i = k
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * pow % P31 + P31) % P31
      h = (h * 131L + (bytes(i) & 0xffL)) % P31
      if (h % divisor == 0) out += h
      i += 1
    }
    out.toArray
  }

  /** Exact Jaccard of two shingle sets. */
  def jaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
