package graft.tsdb

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** [[TagBounds]] order and truncation properties over random multilingual
  * strings — the contract manifest tag-skipping rests on: the recorded
  * order IS unsigned UTF-8 byte order, lower/upper truncation stays
  * conservative, and the Java-String-order disagreement above the BMP
  * (the round-14 wrong-skip risk) is actually exercised.
  */
class TagBoundsSpec extends AnyFunSuite {

  private val alphabets: Seq[Seq[String]] = Seq(
    ('a' to 'z').map(_.toString),                  // ASCII
    Seq("é", "ß", "ñ", "ø", "ж", "щ", "α", "ω"),   // Latin-1 / Cyrillic / Greek
    Seq("中", "文", "値", "한", "글", "タ", "グ"),   // CJK
    Seq("", "퟿", "�"),             // BMP boundary region
    Seq("🚀", "😀", "𐀀", "𝕏", "🧪"))               // supplementary plane

  private def randomString(rng: scala.util.Random): String = {
    val len = 1 + rng.nextInt(8)
    (0 until len).map { _ =>
      val a = alphabets(rng.nextInt(alphabets.length))
      a(rng.nextInt(a.length))
    }.mkString
  }

  private def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))

  test("compare IS unsigned UTF-8 byte order on random multilingual strings") {
    val rng = new scala.util.Random(20260815L)
    (1 to 2000).foreach { i =>
      val (a, b) = (randomString(rng), randomString(rng))
      assert(Integer.signum(TagBounds.compare(a, b)) ==
        Integer.signum(utf8Compare(a, b)),
        s"case $i: [$a] vs [$b]")
    }
  }

  test("truncation is conservative and bounded: lo' <= lo, hi' >= hi") {
    val rng = new scala.util.Random(42L)
    (1 to 1000).foreach { i =>
      val s = (0 until (TagBounds.MaxBoundChars / 2 + rng.nextInt(90)))
        .map { _ =>
          val a = alphabets(rng.nextInt(alphabets.length))
          a(rng.nextInt(a.length))
        }.mkString
      val lo = TagBounds.truncateLo(s)
      val hi = TagBounds.truncateHi(s)
      assert(TagBounds.compare(lo, s) <= 0, s"case $i: lo [$lo] > [$s]")
      assert(TagBounds.compare(hi, s) >= 0, s"case $i: hi [$hi] < [$s]")
      assert(lo.length <= TagBounds.MaxBoundChars)
      assert(hi.length <= TagBounds.MaxBoundChars || hi == s)
      // Truncation must not manufacture unpaired surrogates (they round-
      // trip through UTF-8 as replacement chars and break the order).
      Seq(lo, hi).foreach { t =>
        assert(new String(t.getBytes(UTF_8), UTF_8) == t,
          s"case $i: non-round-tripping truncation [$t]")
      }
      // Any value sharing the untruncated prefix stays inside the bounds.
      val extended = s + "zz中🚀"
      assert(TagBounds.compare(hi, s) >= 0 &&
        (hi == s || TagBounds.compare(hi, extended) >= 0),
        s"case $i: extension escapes the truncated upper bound")
    }
  }

  test("skip-safety: every member of a random set is inside the set's " +
      "truncated bounds") {
    val rng = new scala.util.Random(7L)
    (1 to 300).foreach { i =>
      val vs = Seq.fill(2 + rng.nextInt(12))(randomString(rng))
      val lo = TagBounds.truncateLo(vs.reduce(TagBounds.min))
      val hi = TagBounds.truncateHi(vs.reduce(TagBounds.max))
      vs.foreach(v => assert(TagBounds.contains(lo, hi, v),
        s"case $i: [$v] escapes [$lo, $hi]"))
    }
  }

  test("the Java-order disagreement above the BMP is real and handled") {
    // A file holding tags {"abc", "𐀀"} has UTF-8 bounds [abc, 𐀀]. The
    // BMP private-use value "" lies BETWEEN them in UTF-8 order
    // (0x61… < 0xEE… < 0xF0…) but ABOVE the upper bound in Java/UTF-16
    // order (0xE000 > 0xD800): a String-order comparison would wrongly
    // skip the file for `WHERE tag = ''`.
    val (lo, hi, v) = ("abc", "𐀀", "")
    assert(v.compareTo(hi) > 0, "fixture must exercise the disagreement")
    assert(TagBounds.contains(lo, hi, v), "UTF-8 order keeps the file")
  }
}
