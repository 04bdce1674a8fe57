package graft.ops

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => kcol, expression => kexpr}
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.SparkTestSession

/** The kernel expressions must (a) stay codegen-capable — the whole point
  * of replacing the ScalaUDFs — and (b) agree exactly with the
  * [[Signatures]] kernels they wrap, on real corpus text, driven through
  * Spark execution (which exercises the generated code path, since none
  * of these is CodegenFallback).
  */
class SignatureExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .limit(150).cache()

  test("no kernel expression is CodegenFallback") {
    val t = kexpr(lit("x"))
    val vec = kexpr(lit(Array(1f, 2f)))
    val sig = kexpr(lit(42L))
    val all = Seq(
      SimhashExpr(t), WordShinglesExpr(t, 3),
      MinhashBandKeysExpr(t, 128, 16, 3), SimhashChunksExpr(sig),
      HyperplaneBandKeysExpr(vec, 8, 4), RollingFingerprintExpr(t, 16, 16L),
      DupLineCharFractionExpr(t), DupNgramFractionExpr(t, 2),
      JaccardExpr(t, t), TermFrequencies(t, Seq("a")),
      VocabHitCount(t, Seq("a")), CosineSimilarity(vec, vec),
      PqEncodeExpr(vec, Array(Array(1f, 2f)), 1),
      PqLutExpr(vec, Array(Array(1f, 2f)), 1),
      PqAdcExpr(sig, kexpr(lit(Array(0.5d))), 1), VecNormExpr(vec))
    all.foreach(e =>
      assert(!e.isInstanceOf[CodegenFallback], s"${e.prettyName} fell back"))
  }

  test("expressions agree with the Signatures kernels on real text") {
    val rows = docs
      .select($"doc_id", $"text",
        kcol(SimhashExpr(kexpr($"text"))).as("sig"),
        kcol(WordShinglesExpr(kexpr($"text"), 3)).as("sh"),
        kcol(MinhashBandKeysExpr(kexpr($"text"), 64, 8, 3)).as("bands"),
        kcol(RollingFingerprintExpr(kexpr($"text"), 16, 16L)).as("fp"),
        kcol(DupNgramFractionExpr(kexpr($"text"), 2)).as("dup2"),
        kcol(DupLineCharFractionExpr(kexpr($"text"))).as("dupl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(1)
      assert(r.getLong(2) == Signatures.simhash(text))
      assert(r.getSeq[String](3) == Signatures.wordShingles(text, 3).toSeq)
      assert(r.getSeq[String](4) == Signatures.minhashBandKeys(
        Signatures.minhash(text, 64, 3), 8).toSeq)
      assert(r.getSeq[Long](5) == Signatures.rollingFingerprint(text, 16, 16L).toSeq)
      assert(r.getDouble(6) == Signatures.duplicateNgramFraction(text, 2))
      assert(r.getDouble(7) == Signatures.duplicateLineCharFraction(text))
    }
  }

  test("bpe_token_count ≡ size(regexp_extract_all(...)) on real and adversarial text") {
    // Real corpus text through EXECUTION (generated-code path) plus the
    // edge shapes the byte scanner must get right: empty, whitespace-only
    // (every Java-regex \s class member), letter/digit/punct run
    // boundaries, BMP non-ASCII, and supplementary characters (Java regex
    // matches by CODE POINT, so one emoji is ONE token).
    val adversarial = Seq(
      "", " ", " \t\n\f\r ", "abc", "ABCdef", "123", "abc123def",
      "a1b2c3", "!!!", "a!b?c", "hello, world! 42 times...",
      "naïve café", "日本語テキスト", "mixed 日本 text 123!",
      "emoji 😀 pair", "😀😁",
      "tab\tsep\nlines\r\n", "x" * 5000, ("ab1!" * 1000))
      .toDF("text")
    val both = docs.select($"text").unionByName(adversarial)
      .select($"text",
        TextAnalysis.regexTokenCount($"text").as("kernel"),
        size(regexp_extract_all($"text",
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("regex"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"bpe_token_count mismatch on ${r.getString(0).take(60)}")
    }
    // NULL input: both spellings are NULL.
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.regexTokenCount($"text").as("k"),
        size(regexp_extract_all($"text",
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("r"))
      .collect().head
    assert(nulls.isNullAt(0) == nulls.isNullAt(1))
  }

  test("jaccard and simhash chunks match the kernels through execution") {
    val pairs = Seq(
      (Seq("a b", "b c", "c d"), Seq("b c", "c d", "d e")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x y"), Seq.empty[String]))
      .toDF("a", "b")
      .select(kcol(JaccardExpr(kexpr($"a"), kexpr($"b"))).as("j")).collect()
    assert(pairs(0).getDouble(0) == 0.5)
    assert(pairs(1).getDouble(0) == 0.0)
    assert(pairs(2).getDouble(0) == 0.0)

    val chunks = Seq(0x0123456789abcdefL).toDF("sig")
      .select(kcol(SimhashChunksExpr(kexpr($"sig"))).as("c"))
      .collect().head.getSeq[Long](0)
    assert(chunks == Seq(0xcdefL, 0x89abL, 0x4567L, 0x0123L))
  }

  test("hyperplane band keys match the kernel on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val rows = emb
      .select($"embedding",
        kcol(HyperplaneBandKeysExpr(kexpr($"embedding"), 16, 4)).as("keys"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vec = r.getSeq[Float](0).toArray
      assert(r.getSeq[Long](1) == Signatures.hyperplaneBandKeys(vec, 16, 4).toSeq)
    }
  }
}
