package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, and document
  * fingerprinting. All pure Column expressions — codegen-friendly, no UDFs,
  * embarrassingly parallel (per-row, no shuffle).
  *
  * Numeric outputs are either integers or double expressions mirrored
  * op-for-op in the DuckDB oracles, so results are bit-reproducible.
  */
object TextAnalysis {

  val Mod = 1000000007L

  /** Whitespace tokens, empty strings dropped (texts have trailing
    * spaces). Evaluated by the native codegen kernel
    * [[graft.expressions.TokensOf]] (the `filter` HOF of the replaced
    * spelling ran interpreted on every corpus pass); value-identical to
    * [[tokensHof]], parity-pinned by TextKernelsSpec. */
  def tokens(text: Column): Column =
    graft.expressions.TextKernels.tokensOf(text)

  /** The replaced HOF spelling of [[tokens]], kept as the executable
    * specification the kernel is parity-tested against. */
  private[graft] def tokensHof(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Distinct word n-gram shingles of a token array (for Jaccard/MinHash).
    * Evaluated by the native codegen kernel
    * [[graft.expressions.NgramShinglesOf]]: windows of n consecutive
    * tokens joined with a single space, first-occurrence-distinct.
    * Value-identical to [[ngramShinglesHof]] (TextKernelsSpec parity). */
  def ngramShingles(tk: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    graft.expressions.TextKernels.ngramShinglesOf(tk, n)
  }

  /** The replaced HOF spelling of [[ngramShingles]], kept as the
    * executable specification the kernel is parity-tested against.
    *
    * Formulated as a fold of `zip_with(acc, tk[j+1..])` rather than an
    * indexed transform with `element_at(tk, i)` in the lambda: a lambda
    * that re-derives `tk` per element would make shingling O(tokens²) per
    * row per plan occurrence. Here `tk` is evaluated a constant (n) number
    * of times per row. zip_with pads the shorter side with NULL, `concat`
    * propagates it, and the filter drops the incomplete tail shingles. */
  private[graft] def ngramShinglesHof(tk: Column, n: Int): Column =
    array_distinct(posNgramsHof(tk, n))

  /** POSITIONAL word n-grams: element i (0-based) is the n-gram starting
    * at token i, duplicates KEPT — the span grain for exact-substring
    * duplication (q137), where [[ngramShingles]]' set semantics would
    * erase the run structure, and the term generator of the tf-idf
    * staging (q60/q86/q158) and diversity readout (q225). Evaluated by
    * the native codegen kernel [[graft.expressions.PosNgramsOf]] — the
    * HOF fold below ran interpreted per row and materialized n−1
    * intermediate arrays on the hottest corpus pass. Value-identical to
    * [[posNgramsHof]] (TextKernelsSpec parity). */
  def posNgrams(tk: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    graft.expressions.TextKernels.posNgramsOf(tk, n)
  }

  /** The replaced HOF spelling of [[posNgrams]], kept as the executable
    * specification the kernel is parity-tested against. Same
    * fold-of-zip_with shape as [[ngramShinglesHof]] (its distinct
    * reduction): `tk` is evaluated a constant n times per row, never
    * once per element. */
  private[graft] def posNgramsHof(tk: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    val joined = (1 until n).foldLeft(tk) { (acc, j) =>
      zip_with(acc, slice(tk, lit(j + 1), greatest(size(tk) - j, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, x => x.isNotNull)
  }

  /** Distinct word-bigram shingles — the n=2 instance of
    * [[ngramShingles]], the reference grain for the dedup operators. */
  def bigramShingles(tk: Column): Column = ngramShingles(tk, 2)

  /** Polynomial rolling hash over a string's codepoints:
    * h = (h*31 + code(c)) mod 1e9+7. Evaluated by the native codegen
    * kernel [[graft.expressions.CharPolyHash]]; value-identical to
    * [[charPolyHashHof]] (TextKernelsSpec parity, and the q24/q45/q46
    * DuckDB oracles mirror it). */
  def charPolyHash(text: Column): Column =
    graft.expressions.TextKernels.charPolyHashOf(text)

  /** The replaced HOF spelling of [[charPolyHash]] (`aggregate` over
    * `split(text, "")` with `ascii` — the leading codepoint of each
    * one-codepoint cell), kept for the parity spec. */
  private[graft] def charPolyHashHof(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")) % Mod)

  /** Order-sensitive document fingerprint over token hashes:
    * h = (h*131 + charPolyHash(token)) mod 1e9+7. Native kernel
    * ([[graft.expressions.TokenFingerprintOf]]); value-identical to
    * [[tokenFingerprintHof]]. */
  def tokenFingerprint(tk: Column): Column =
    graft.expressions.TextKernels.tokenFingerprintOf(tk)

  /** The replaced HOF spelling of [[tokenFingerprint]], kept for the
    * parity spec. */
  private[graft] def tokenFingerprintHof(tk: Column): Column =
    aggregate(transform(tk, charPolyHashHof _), lit(0L),
      (acc, h) => (acc * 131L + h) % Mod)

  /** PII redaction: replace email addresses and long digit runs (IDs,
    * phone numbers) with typed placeholder tags — the pre-training scrub
    * every public-web corpus needs. Patterns are deliberately restricted
    * to the regex intersection both Java (Spark) and RE2-family engines
    * compile identically — character classes, bounded counts, no
    * backrefs/lookaround — so the operator stays oracle-checkable. Pure
    * per-row Column expression: embarrassingly parallel, no shuffle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitsRe = "[0-9]{6,}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      LongDigitsRe, "<NUM>")

  /** Occurrences of any of `words` in the token array. */
  def wordCount(tk: Column, words: Seq[String]): Column =
    size(filter(tk, t => t.isin(words: _*))).cast("long")

  /** Quality-score feature struct: token counts, type-token ratio, average
    * token length, stopword ratio, and a weighted score in [0,1]. */
  def qualityFeatures(text: Column, stopwords: Seq[String]): Column = {
    val tk = tokens(text)
    val nTok = size(tk).cast("long")
    val nDistinct = size(array_distinct(tk)).cast("long")
    val sumLen = aggregate(tk, lit(0L), (a, t) => a + length(t).cast("long"))
    val nStop = wordCount(tk, stopwords)
    // try_divide: zero-token docs yield NULL ratios (like the SQL oracle)
    // instead of an ANSI DIVIDE_BY_ZERO error — Spark 4 runs ANSI-on.
    val ttr = try_divide(nDistinct.cast("double"), nTok.cast("double"))
    val avgLen = try_divide(sumLen.cast("double"), nTok.cast("double"))
    val stopRatio = try_divide(nStop.cast("double"), nTok.cast("double"))
    val score = lit(0.4) * least(lit(1.0), nTok.cast("double") / lit(200.0)) +
      lit(0.3) * ttr + lit(0.3) * (lit(1.0) - stopRatio)
    struct(
      length(text).cast("long").as("n_chars"),
      nTok.as("n_tokens"), nDistinct.as("n_distinct"),
      ttr.as("ttr"), avgLen.as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      when(nTok === 0L, lit(0.0)).otherwise(score).as("quality_score"))
  }

  /** Language marker-word sets for the n-gram/stopword-overlap language-ID
    * heuristic. Deterministic, order = tie-break priority. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("data", "table", "fast"),
    "de" -> Seq("scan", "merge", "hash"),
    "fr" -> Seq("row", "value", "sort"),
    "zh" -> Seq("join", "query", "group"))

  /** Language-ID: score = marker-word occurrences per language; predicted =
    * first language (in LangMarkers order) whose score is >= all others. */
  def langScores(tk: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) => lang -> wordCount(tk, words) }

  def predictedLang(scores: Seq[(String, Column)]): Column = {
    val cols = scores.toMap
    scores.foldLeft(when(lit(false), lit(""))) { case (acc, (lang, s)) =>
      val isMax = scores.filter(_._1 != lang)
        .map { case (_, other) => s >= other }.reduce(_ && _)
      acc.when(isMax, lit(lang))
    }.otherwise(lit("und"))
  }
}
