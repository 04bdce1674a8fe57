package graft.tsdb

import org.apache.spark.unsafe.types.UTF8String

/** Order and truncation for manifest tag-bound strings.
  *
  * Every bound comparison goes through unsigned UTF-8 byte order — the
  * order Parquet's UTF8 column comparator produces footer min/max in and
  * the order Spark's UTF8String min/max aggregates use. Java's
  * `String.compareTo` (UTF-16 code units) AGREES with it on the BMP but
  * disagrees above it (supplementary characters encode as surrogates
  * 0xD800-0xDFFF, below 0xE000-0xFFFF in UTF-16, while their UTF-8 bytes
  * 0xF0+ sort above every BMP character), so a table tagged in any script
  * with supplementary code points (emoji, rare CJK) would wrongly skip
  * files if bounds were compared with the String order. ASCII-only bounds
  * — all the engine recorded before this existed — order identically under
  * both, so existing manifests stay valid.
  *
  * Bounds are truncated with Parquet's truncate-and-increment approach
  * (lower bounds to a code-point-safe prefix, which sorts <= the value;
  * upper bounds to a prefix with its last code point incremented, which
  * sorts >= every value sharing the prefix), so one pathological tag value
  * never bloats a manifest that is read on every plan.
  */
private[tsdb] object TagBounds {

  /** Unsigned UTF-8 byte order. */
  def compare(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  def min(a: String, b: String): String = if (compare(a, b) <= 0) a else b
  def max(a: String, b: String): String = if (compare(a, b) >= 0) a else b

  /** Does [lo, hi] (inclusive, UTF-8 order) possibly contain v? */
  def contains(lo: String, hi: String, v: String): Boolean =
    compare(lo, v) <= 0 && compare(v, hi) <= 0

  /** Bound strings longer than this (UTF-16 units) are truncated. */
  val MaxBoundChars = 64

  /** Truncate a LOWER bound: a code-point-safe prefix sorts <= the value
    * in UTF-8 order, so the bound stays conservative.
    */
  def truncateLo(s: String): String =
    if (s.length <= MaxBoundChars) s else s.substring(0, safeCut(s))

  /** Truncate an UPPER bound: take a code-point-safe prefix and increment
    * its last incrementable code point (skipping the surrogate gap —
    * producing an unpaired surrogate would round-trip as a low-sorting
    * replacement character and break the order). The result sorts >= every
    * string extending the original prefix, hence >= the value. A prefix of
    * all-maximal code points keeps the full string: correctness over
    * compactness.
    */
  def truncateHi(s: String): String =
    if (s.length <= MaxBoundChars) s
    else {
      val prefix = s.substring(0, safeCut(s))
      var i = prefix.length
      var out: String = null
      while (out == null && i > 0) {
        val cp = prefix.codePointBefore(i)
        val start = i - Character.charCount(cp)
        if (cp < Character.MAX_CODE_POINT) {
          val bumped =
            if (cp + 1 >= Character.MIN_SURROGATE && cp + 1 <= Character.MAX_SURROGATE)
              0xE000 // first code point past the surrogate gap
            else cp + 1
          out = prefix.substring(0, start) + new String(Character.toChars(bumped))
        } else i = start
      }
      if (out == null) s else out
    }

  /** Largest cut at or below MaxBoundChars that does not split a
    * surrogate pair.
    */
  private def safeCut(s: String): Int =
    if (Character.isHighSurrogate(s.charAt(MaxBoundChars - 1))) MaxBoundChars - 1
    else MaxBoundChars
}
