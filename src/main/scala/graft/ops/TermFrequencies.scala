package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies for a fixed bag of query terms, in ONE
  * pass over the token array: `term_frequencies(tokens, terms)[i]` equals
  * `size(filter(tokens, w -> w = terms(i)))` for every i, but
  *
  *  - the token array is scanned once for all terms (hash lookup per
  *    token) instead of once per term, and no filtered copies are
  *    allocated;
  *  - it codegens (`doGenCode`), whereas Spark's higher-order `filter` is
  *    `CodegenFallback` and ejects its whole Project from whole-stage
  *    codegen.
  *
  * Used by the BM25 scorer (reference behavior: ModelarDB has no text
  * surface; this backs the training-data pipeline's relevance ranking),
  * where the per-term tf tower is the scan-side hot loop at corpus scale.
  */
case class TermFrequencies(child: Expression, terms: Seq[String])
  extends UnaryExpression {

  require(terms.nonEmpty, "term_frequencies needs at least one term")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "term_frequencies"

  /** Term -> output slot. Rebuilt lazily on executors after serialization;
    * duplicate terms keep the first slot (later duplicates count zero,
    * matching distinct query-term semantics — callers dedupe anyway).
    */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.putIfAbsent(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](terms.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val slot = lookup.get(arr.getUTF8String(i))
        if (slot != null) counts(slot.intValue()) += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mapRef = ctx.addReferenceObj("termLookup", lookup,
        classOf[java.util.HashMap[UTF8String, Integer]].getName)
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val slot = ctx.freshName("slot")
      s"""
         |int[] $counts = new int[${terms.length}];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    Integer $slot = (Integer) $mapRef.get($arr.getUTF8String($i));
         |    if ($slot != null) $counts[$slot.intValue()]++;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TermFrequencies =
    copy(child = newChild)
}

/** Count of tokens that appear in a fixed vocabulary, in one hashed pass —
  * equals `size(filter(tokens, w -> array_contains(vocab, w)))` but
  * codegens and does O(1) membership tests instead of an interpreted
  * linear `array_contains` scan per token. Backs the stopword-ratio and
  * language-ID signals, which run this against 4 vocabularies per
  * document on the corpus scan.
  */
case class VocabHitCount(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  require(vocab.nonEmpty, "vocab_hit_count needs a non-empty vocabulary")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vocab_hit_count"

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.length * 2)
    vocab.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && lookup.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val setRef = ctx.addReferenceObj("vocabSet", lookup,
        classOf[java.util.HashSet[UTF8String]].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hits = ctx.freshName("hits")
      s"""
         |int $hits = 0;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VocabHitCount =
    copy(child = newChild)
}

/** Sum of per-token unigram log-probabilities over a broadcast vocabulary,
  * in one hashed pass: `vocab_log_prob_sum(tokens)` equals
  * `Σ_i (vocab.getOrElse(tokens(i), oovLogProb))` folded IN TOKEN ORDER
  * (left to right), which makes the result a fixed arithmetic expression
  * any engine can replay to within summation ulps. Backs the unigram
  * language-model scoring signal (CCNet-style perplexity filtering),
  * where the per-token lookup tower is the corpus scan's hot loop —
  * codegen + O(1) membership beats an exploded join by never shuffling
  * the token stream.
  */
case class VocabLogProbSum(child: Expression, terms: Seq[String],
    logProbs: Seq[Double], oovLogProb: Double)
  extends UnaryExpression {

  require(terms.nonEmpty && terms.length == logProbs.length,
    "vocab_log_prob_sum needs one log-probability per vocabulary term")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "vocab_log_prob_sum"

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](terms.length * 2)
    terms.indices.foreach { i =>
      m.putIfAbsent(UTF8String.fromString(terms(i)),
        java.lang.Double.valueOf(logProbs(i)))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val p = lookup.get(arr.getUTF8String(i))
        sum += (if (p == null) oovLogProb else p.doubleValue())
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mapRef = ctx.addReferenceObj("logProbLookup", lookup,
        classOf[java.util.HashMap[UTF8String, java.lang.Double]].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val p = ctx.freshName("p")
      s"""
         |double $sum = 0.0;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    Double $p = (Double) $mapRef.get($arr.getUTF8String($i));
         |    $sum += ($p == null) ? ${oovLogProb}D : $p.doubleValue();
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VocabLogProbSum =
    copy(child = newChild)
}

/** Count of BPE-ish subword-boundary tokens — words ([A-Za-z]+), numbers
  * ([0-9]+), and individual other non-whitespace characters — in ONE
  * allocation-free pass over the string's UTF-8 bytes. Count-identical to
  * `size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))`
  * (leftmost-greedy alternation, code-point-aware as Java regex is: a run
  * of ASCII letters or digits is one match; any other non-\s code point —
  * including a supplementary character — is one match, i.e. one UTF-8
  * multi-byte sequence → 1). The regex spelling materializes an array of every token
  * substring just to take its size: an r18 scale A/B measured that path
  * memory-bound (35 s wall at BOTH 8 and 32 cores on a 5M-doc scan),
  * while this kernel touches each byte once and allocates nothing.
  * Behavior on well-formed UTF-8 is exact; malformed bytes (which the
  * regex path would first lossily transcode) are counted by their lead
  * byte's nominal length.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes
    var cnt = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b < 0x80) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          cnt += 1; i += 1
          var run = true
          while (run && i < n) {
            val c = s.getByte(i) & 0xFF
            if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) i += 1
            else run = false
          }
        } else if (b >= '0' && b <= '9') {
          cnt += 1; i += 1
          var run = true
          while (run && i < n) {
            val c = s.getByte(i) & 0xFF
            if (c >= '0' && c <= '9') i += 1 else run = false
          }
        } else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r') {
          i += 1
        } else {
          cnt += 1; i += 1
        }
      } else {
        // One non-ASCII code point = one token (Java regex matches by
        // code point, so a supplementary character is a single match).
        val len = if (b >= 0xF0) 4 else if (b >= 0xE0) 3 else 2
        cnt += 1
        i += len
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val len = ctx.freshName("len")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |int $n = $str.numBytes();
         |int $i = 0;
         |while ($i < $n) {
         |  int $b = $str.getByte($i) & 0xFF;
         |  if ($b < 0x80) {
         |    if (($b >= 65 && $b <= 90) || ($b >= 97 && $b <= 122)) {
         |      $cnt++; $i++;
         |      while ($i < $n) {
         |        int $c = $str.getByte($i) & 0xFF;
         |        if (($c >= 65 && $c <= 90) || ($c >= 97 && $c <= 122)) $i++;
         |        else break;
         |      }
         |    } else if ($b >= 48 && $b <= 57) {
         |      $cnt++; $i++;
         |      while ($i < $n) {
         |        int $c = $str.getByte($i) & 0xFF;
         |        if ($c >= 48 && $c <= 57) $i++; else break;
         |      }
         |    } else if ($b == 32 || $b == 9 || $b == 10 || $b == 11 ||
         |        $b == 12 || $b == 13) {
         |      $i++;
         |    } else {
         |      $cnt++; $i++;
         |    }
         |  } else {
         |    int $len = ($b >= 0xF0) ? 4 : (($b >= 0xE0) ? 3 : 2);
         |    $cnt += 1;
         |    $i += $len;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
