package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** One-pass signature kernels for dedup/similarity. These run inside UDFs:
  * a single traversal of the document computes the whole signature, where
  * the equivalent Catalyst higher-order-function expressions would
  * re-evaluate the tokenization per hash index (no CSE inside lambdas).
  * Hashing uses the same XXH64 kernel as Spark SQL's `xxhash64`.
  */
object Signatures {

  def hashString(s: String, seed: Long): Long = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)
  }

  /** Lowercased whitespace-separated words. */
  def words(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Distinct word k-shingles joined with single spaces. */
  def wordShingles(text: String, k: Int): Array[String] = {
    val ws = words(text)
    if (ws.length < k) Array.empty
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + k <= ws.length) {
        out += ws.slice(i, i + k).mkString(" ")
        i += 1
      }
      out.toArray
    }
  }

  /** MinHash signature via the standard two-hash trick:
    * h_i(s) = h1(s) + i * h2(s) — two string hashes per shingle, `numHashes`
    * cheap mixes, one pass.
    */
  def minhash(text: String, numHashes: Int, shingleK: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sh = wordShingles(text, shingleK)
    var s = 0
    while (s < sh.length) {
      val h1 = hashString(sh(s), 0L)
      val h2 = hashString(sh(s), 0x9e3779b97f4a7c15L)
      var i = 0
      while (i < numHashes) {
        val h = h1 + i * h2
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** LSH band keys of a MinHash signature: band b's key hashes rows
    * [b*rows, (b+1)*rows) of the signature, salted with b so different bands
    * never collide with each other.
    */
  def minhashBandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashLong(b.toLong, 42L)
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(sig(b * rows + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** 64-bit SimHash over word features: per-bit sign votes of word hashes. */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    val ws = words(text)
    var i = 0
    while (i < ws.length) {
      val h = hashString(ws(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Random-hyperplane sign signature of an embedding: bit b is the sign of
    * the dot product with a pseudo-random plane whose weight for dimension j
    * derives from XXH64(b, j). No stored projection matrix — every executor
    * regenerates the same planes.
    */
  def hyperplaneBits(vec: Array[Float], nBits: Int): Array[Long] = {
    val nWords = (nBits + 63) / 64
    val out = new Array[Long](nWords)
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var j = 0
      while (j < vec.length) {
        val w = XXH64.hashLong(j.toLong, b.toLong).toDouble / Long.MaxValue.toDouble
        dot += vec(j) * w
        j += 1
      }
      if (dot >= 0) out(b / 64) |= (1L << (b % 64))
      b += 1
    }
    out
  }

  /** Band keys over a hyperplane bit signature: `bits` bits per band. */
  def hyperplaneBandKeys(vec: Array[Float], bits: Int, bands: Int): Array[Long] = {
    val nBits = bits * bands
    val packed = hyperplaneBits(vec, nBits)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashLong(b.toLong, 7L)
      var i = 0
      while (i < bits) {
        val bit = b * bits + i
        val v = (packed(bit / 64) >>> (bit % 64)) & 1L
        acc = XXH64.hashLong(v, acc)
        i += 1
      }
      out(b) = acc
      b += 1
    }
    out
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
