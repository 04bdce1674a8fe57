package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: token counting,
  * language identification, quality scoring, and document fingerprinting.
  * All are pure column expressions (codegen-friendly, no UDFs) so they scan
  * at full Parquet-reader speed and never shuffle.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-boundary token count: words, numbers, and individual
    * punctuation marks each count as one token. One allocation-free
    * codegen'd byte pass ([[BpeTokenCount]]) — count-identical to
    * `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))`,
    * which materializes every token substring just to take the array's
    * size (measured memory-bound, see the kernel's scaladoc).
    */
  def regexTokenCount(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text)))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small: language ID at corpus scale wants a
    * cheap, shuffle-free signal, not a classifier.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "den", "ein", "eine", "mit"))

  private def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Number of words of `text` that appear in `vocabulary`. One hashed
    * codegen'd pass (VocabHitCount) — count-identical to
    * `size(filter(words, w -> array_contains(vocab, w)))`, which would run
    * interpreted (higher-order filter is CodegenFallback) and scan the
    * vocabulary array per word.
    */
  def vocabularyHits(text: Column, vocabulary: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      VocabHitCount(ColumnBridge.expression(words(text)), vocabulary))
  }

  /** Stopword-ratio language ID over the built-in lists; "und" (undetermined)
    * when no list scores a hit.
    */
  def langId(text: Column): Column = {
    val scores = stopwords.toSeq.sortBy(_._1)
      .map { case (lang, sw) => lang -> vocabularyHits(text, sw) }
    val best = greatest(scores.map(_._2): _*)
    val firstMatch = scores.foldRight(lit("und")) { case ((lang, score), rest) =>
      when(score === best && best > 0, lit(lang)).otherwise(rest)
    }
    firstMatch
  }

  /** Truncate to 4 decimals via floor scaling: unlike round(), identical in
    * every engine given bit-identical input doubles (cross-engine round()
    * implementations disagree on boundary values).
    */
  private def trunc4(c: Column): Column = floor(c * 10000.0) / 10000.0

  /** Heuristic quality signals of a document. */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val nTokens = tokenCount(text)
    val nChars = length(text)
    Seq(
      "n_tokens" -> nTokens,
      "n_chars" -> nChars,
      "mean_word_len" ->
        trunc4(nChars.cast("double") / greatest(nTokens, lit(1))),
      "stopword_ratio" ->
        trunc4(vocabularyHits(text, stopwords("en")).cast("double") /
          greatest(nTokens, lit(1))),
      "alpha_ratio" ->
        trunc4((length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")) /
          greatest(nChars, lit(1))))
  }

  /** Scalar quality score in [0, 1]: length sweet-spot x stopword presence x
    * alphabetic density — the standard cheap pre-filter before expensive
    * pipeline stages.
    */
  def qualityScore(text: Column): Column = {
    val m = qualityMetrics(text).toMap
    val lengthScore = least(m("n_tokens").cast("double") / 32.0, lit(1.0))
    val stopScore = least(m("stopword_ratio") * 5.0, lit(1.0))
    trunc4(lengthScore * (lit(0.5) + stopScore * 0.25 + m("alpha_ratio") * 0.25))
  }

  /** Fraction of line characters sitting in DUPLICATED lines (every
    * occurrence of a line that appears more than once counts) — the
    * Gopher-style repetition filter that catches boilerplate-heavy pages
    * (navigation bars, cookie banners) cheap enough to run on every
    * document. Lines are trimmed; blank lines are ignored; 0.0 for
    * documents with no non-blank lines. One-pass [[Signatures]] kernel:
    * the equivalent higher-order-function expression is interpreted (no
    * codegen for lambdas) and quadratic in the line count.
    */
  def duplicateLineCharFraction(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DupLineCharFractionExpr(ColumnBridge.expression(text)))
  }

  /** Fraction of word n-grams that are repeats of an earlier n-gram in the
    * same document (`1 - distinct/total`) — high values flag degenerate
    * repetitive text (keyword stuffing, generation loops). Lowercased,
    * whitespace-tokenized; 0.0 for documents with fewer than n words.
    * One-pass [[Signatures]] kernel: the expression form re-evaluates the
    * interpreted gram array once per reference (no CSE inside lambdas).
    */
  def duplicateNgramFraction(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DupNgramFractionExpr(ColumnBridge.expression(text), n))
  }

  /** Order-sensitive document fingerprint of whitespace-normalized,
    * lowercased text. MD5-based so any engine can reproduce it.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling-hash fingerprint (xxhash64), cheaper than md5 for
    * engine-internal dedup keys.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Region-robust rolling-hash fingerprint (Manber 0-mod-q over character
    * k-grams): an array of the selected k-gram hashes. Unlike the
    * whole-document fingerprints above, documents sharing text REGIONS
    * share hashes, so this backs containment/overlap detection. One-pass
    * kernel; the hash arithmetic is SQL-reproducible.
    */
  def rollingFingerprint(text: Column, k: Int = 16, divisor: Long = 16L): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      RollingFingerprintExpr(ColumnBridge.expression(text), k, divisor))
  }

  /** Distinct word n-grams of a document (the shingle kernel shared with
    * the dedup operators), for corpus-level n-gram statistics.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(text), n))
  }

  /** Document frequency of every word n-gram in the corpus (each document
    * counts an n-gram once). Scale shape: explode to (ngram) and one
    * hash-keyed count shuffle — partial aggregation halves the traffic;
    * payloads never move.
    */
  def ngramDocFrequencies(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(wordNgrams(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("doc_freq"))

  /** PII surface patterns, deliberately restricted to syntax valid in BOTH
    * Java regex and RE2 (no lookaround, no backreferences), so detection
    * and redaction replay identically in external engines — the same
    * discipline that keeps the hash kernels oracle-checkable. Order
    * matters for redaction: emails first, so an address with a numeric
    * local part is one `<email>`, not an `<ipv4>` inside a mangled string.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
    "ssn" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b")

  /** Per-document PII match counts, one `n_<kind>` column per pattern.
    * Expression-only — the screen runs at scan speed over any corpus.
    */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, p) =>
      s"n_$name" -> size(regexp_extract_all(text, lit(p), lit(0)))
    }

  /** Redact every PII match with its `<kind>` tag, in pattern order. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (name, p)) =>
      regexp_replace(acc, p, s"<$name>")
    }

  /** Per-document boilerplate annotation: the fraction of a document's
    * distinct word n-grams that are corpus-wide COMMON (document frequency
    * >= `minDf`) — high fractions flag template/boilerplate pages
    * (navigation chrome, license headers) that repeat across many
    * documents without being full-document duplicates, the C4-style
    * span-level screen between exact dedup and near-dup.
    *
    * Scale shape: one hash-keyed count shuffle builds the common-gram set
    * (bounded above by totalGrams / minDf — heavy hitters are few by
    * definition), which broadcasts back onto the exploded grams, so the
    * annotation join never shuffles the grams; the per-document tally is
    * a grouped count keyed by id. Documents too short for any n-gram get
    * fraction 0.
    */
  def boilerplateNgramFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long): DataFrame = {
    require(minDf >= 2, "minDf < 2 would mark every n-gram as boilerplate")
    val base = df.select(col(idCol),
      size(wordNgrams(col(textCol), n)).cast("long").as("n_grams"))
    val grams = df.select(col(idCol),
      explode(wordNgrams(col(textCol), n)).as("gram"))
    val common = grams.groupBy("gram").agg(count(lit(1)).as("gram_df"))
      .where(col("gram_df") >= minDf).select("gram")
    val commonPerDoc = grams.join(broadcast(common), Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("n_common"))
    base.join(commonPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        trunc4(coalesce(col("n_common"), lit(0L)).cast("double") /
          greatest(col("n_grams"), lit(1L))).as("boilerplate_frac"))
  }

  /** Top-k documents by BM25 relevance for a bag of query terms
    * (Robertson/Sparck Jones k1-b parameterization). Built scan-only:
    * per-term term frequencies and document length are array expressions
    * on the scan (no explode, no shuffle), the corpus statistics (N,
    * Σlen, per-term document frequencies) are one tiny aggregate
    * broadcast back, so scoring 100 TB is a scan plus a top-k. Document
    * length statistics use integer sums, keeping the arithmetic
    * deterministic and SQL-replayable; output is rank-only.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 50): DataFrame = {
    require(terms.nonEmpty)
    // Codegen-friendly tokenization: trim first, so split can only emit an
    // empty token for the all-whitespace/empty document (guarded by the
    // CASE) — equivalent to filter(split(...), w != "") without the
    // higher-order filter, which is CodegenFallback and would eject this
    // whole Project from whole-stage codegen.
    val trimmed = lower(trim(col(textCol)))
    val toks = when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
    val base = df.select(col(idCol).as("doc_id"), toks.as("__ws"))
      .withColumn("dl", size(col("__ws")))
    // All term frequencies in one codegen'd pass over the token array
    // (see TermFrequencies) instead of one interpreted filtered copy per
    // term.
    val tfArr = org.apache.spark.sql.graft.ColumnBridge.column(
      TermFrequencies(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__ws")), terms))
    val withTf = terms.indices.foldLeft(base.withColumn("__tf", tfArr)) {
      case (acc, i) => acc.withColumn(s"tf_$i", col("__tf").getItem(i))
    }.drop("__ws", "__tf")

    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.indices.map(i => sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)

    val joined = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val dfq = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) + (col("n_docs") - dfq + lit(0.5)) / (dfq + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    }.reduce(_ + _)

    import org.apache.spark.sql.expressions.Window
    joined.select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "rank")
  }

  /** Benchmark decontamination: per evaluation document, the fraction of
    * its distinct word n-grams that appear anywhere in the training
    * corpus (containment ≈ 1 means the eval document leaked into
    * training). Asymmetric by design — unlike dedup, the question is
    * "how much of THIS document is covered", not pairwise similarity.
    *
    * Scale shape: the training side reduces to distinct n-gram KEYS (the
    * payload never moves), the eval side left-semi-joins those keys —
    * one hash-keyed shuffle each; per-document ratios are a small grouped
    * count. Containment is floor-scaled to 1e-4 for cross-engine checks.
    * Eval documents too short to produce any n-gram are omitted (they
    * have no containment to measure).
    */
  def ngramContainment(trainDf: DataFrame, evalDf: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val trainGrams = trainDf
      .select(explode(wordNgrams(col(textCol), n)).as("ngram")).distinct()
    val evalGrams = evalDf.select(col(idCol).as("eval_id"),
      explode(wordNgrams(col(textCol), n)).as("ngram"))
    val totals = evalGrams.groupBy("eval_id").agg(count(lit(1)).as("n_grams"))
    val hits = evalGrams.join(trainGrams, Seq("ngram"), "left_semi")
      .groupBy("eval_id").agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (floor(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("n_grams") * 10000d) / 10000d).as("containment"))
  }

  /** Top-k terms per group by document frequency (each document counts a
    * term once) — the per-language/per-source vocabulary census every
    * corpus audit starts from. Scale shape: distinct unigrams explode per
    * document (the shingle kernel), one partial-aggregated count shuffle
    * on (group, term), and the rank-k filter sits directly above its
    * window so it executes as WindowGroupLimit — partitions pre-prune to
    * k candidates per group before the final sort, no group-wide sort of
    * the full term census. Ties break lexically.
    */
  def topTermsByDocFreq(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val counts = df
      .select(col(groupCol).as("grp"),
        explode(wordNgrams(col(textCol), 1)).as("term"))
      .groupBy("grp", "term").agg(count(lit(1)).as("doc_freq"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("doc_freq").desc, col("term"))
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Unigram language-model scoring (the CCNet-style perplexity quality
    * signal): fit an add-one-smoothed unigram model on the corpus itself
    * — vocabulary = top `vocabSize` tokens by corpus frequency, ties
    * lexical; p(t) = (c_t + 1) / (N + |V| + 1) in-vocabulary and
    * 1 / (N + |V| + 1) out — then score each document with its per-token
    * cross-entropy `xent = −Σ log p(token) / (n_tokens · ln 2)` (bits per
    * token; low = the document looks like the corpus, high = outlier).
    *
    * Scale shape: the model fit is ONE partial-aggregated token-count
    * shuffle + a top-V TakeOrdered; scoring broadcasts the (term,
    * log-prob) table inside a single codegen'd expression
    * ([[VocabLogProbSum]]) — the token stream is never exploded or
    * shuffled at scoring time, the corpus pass runs at scan speed. The
    * fold is in token order, so any engine replays the identical
    * arithmetic. Documents with no tokens are omitted (no entropy to
    * measure).
    */
  def unigramXent(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1024): DataFrame = {
    require(vocabSize >= 1)
    val trimmed = lower(trim(col(textCol)))
    val toks = when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
    val base = df.select(col(idCol).as("doc_id"), toks.as("__ws"))
    val counts = base.select(explode(col("__ws")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    // sum over zero rows is NULL: an all-empty corpus has no vocabulary
    // and no scorable documents — short-circuit to the empty frame the
    // n_tokens > 0 filter would produce instead of NPE-ing on getLong.
    val nTokensRow = counts.agg(sum(col("c"))).collect().head
    if (nTokensRow.isNullAt(0)) {
      return base.select(col("doc_id"), size(col("__ws")).as("n_tokens"),
          lit(0.0).as("xent_bits"))
        .where(col("n_tokens") > 0)
    }
    val nTokens = nTokensRow.getLong(0)
    val vocab = counts.orderBy(col("c").desc, col("t")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val logDenom = math.log(nTokens.toDouble + vocab.length + 1.0)
    val logProbs = vocab.map { case (_, c) => math.log(c + 1.0) - logDenom }
    import org.apache.spark.sql.graft.ColumnBridge
    val lpSum = ColumnBridge.column(VocabLogProbSum(
      ColumnBridge.expression(col("__ws")),
      vocab.map(_._1).toSeq, logProbs.toSeq, -logDenom))
    base.select(col("doc_id"), size(col("__ws")).as("n_tokens"),
        lpSum.as("__lp"))
      .where(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        (-col("__lp") / (col("n_tokens") * lit(math.log(2.0))))
          .as("xent_bits"))
  }

  /** Convenience: annotate a corpus DataFrame with the full signal set. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val withMetrics = qualityMetrics(t).foldLeft(df) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
    withMetrics
      .withColumn("lang_id", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
