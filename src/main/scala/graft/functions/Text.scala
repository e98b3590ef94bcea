package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure `Column` expressions (whole-stage codegen, no UDFs) so a
  * 100 TB documents scan stays a single narrow map stage — no shuffle.
  *
  * Every function here is deliberately expressible in ANSI SQL too, so the
  * DuckDB oracle can replay identical logic (see SparkEntry.oracleSql).
  */
object Text {

  /** Whitespace token list (single-space split — matches the oracle's
    * string_split exactly; a BPE-ish regex variant is tokenCountRegex).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Unicode hygiene: NFC canonical composition (precomposed and
    * base+combining-mark spellings become byte-identical — the step
    * that keeps hashing/dedup from seeing two "café"s), optional
    * lowercasing, whitespace runs collapsed with an EXPLICIT class
    * (Java \s ≠ RE2 \s on vertical tab) and trimmed. NFC, not NFKC:
    * canonical equivalence is lossless; compatibility folding changes
    * content and stays a caller decision.
    */
  def normalizeUnicode(text: Column, lowercase: Boolean = true): Column = {
    val n = graft.plans.NfcNormalize(text)
    val cased = if (lowercase) lower(n) else n
    trim(regexp_replace(cased, "[ \t\n\r\f]+", " "))
  }

  /** Writing-system census: per-script codepoint counts + the dominant
    * script, one codegen pass (see [[graft.plans.ScriptProfile]] for
    * the explicit range table and the alphabetical tie rule) — the
    * charset gate a crawl pipeline applies before language-ID proper.
    */
  def scriptProfile(text: Column): Column = graft.plans.ScriptProfile(text)

  /** BPE-ish subword proxy: count of alnum runs + count of non-alnum,
    * non-space marks — approximates byte-pair token inflation without a
    * vocab file.
    *
    * Non-empty-run count without an array lambda (Spark HOFs always run
    * interpreted): the split's regex delimiter is greedy, so empty
    * elements can only appear at the two edges — subtract them
    * arithmetically and the whole expression stays in codegen.
    */
  def tokenCountRegex(text: Column): Column = {
    val parts = split(text, "[^a-zA-Z0-9]+")
    val runs = size(parts) -
      when(element_at(parts, 1) === "", 1).otherwise(0) -
      when(size(parts) > 1 && element_at(parts, -1) === "", 1).otherwise(0)
    runs + length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))
  }

  /** Occurrences of literal `word` as a whole token. Implemented with
    * padded-replace arithmetic so Spark and the SQL oracle agree bit-for-bit
    * on any engine (no regex dialect dependence).
    */
  def wordCount(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    // Non-overlapping left-to-right occurrence count, same semantics as the
    // oracle's string_split: size(split(padded, needle)) - 1.
    size(split(padded, java.util.regex.Pattern.quote(needle))) - 1
  }

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Stopword ratio ∈ [0,1]: fraction of tokens that are stopwords.
    *
    * Counted with one codegen'd regexp_count over the space-padded text
    * (zero-width lookarounds pin full-token matches and handle adjacent
    * stopwords) instead of an interpreted `filter` array lambda.
    */
  def stopwordRatio(
      text: Column, stopwords: Seq[String] = Stopwords): Column = {
    val pat = s"(?<= )(?:${stopwords.mkString("|")})(?= )"
    val stop = regexp_count(concat(lit(" "), text, lit(" ")), lit(pat))
    round(stop.cast("double") / greatest(size(tokens(text)), lit(1)).cast("double"), 6)
  }

  /** Mean token length. Sum of token lengths is computed arithmetically —
    * `split(text, " ")` consumes exactly one character per delimiter, so
    * Σ length(token) = length(text) - (tokenCount - 1); no interpreted
    * `aggregate` fold.
    */
  def meanTokenLength(text: Column): Column = {
    val nToks = size(tokens(text))
    round(
      (length(text) - nToks + 1).cast("double") /
        greatest(nToks, lit(1)).cast("double"),
      6)
  }

  /** Composite quality score ∈ [0,1] — the usual cheap pre-filter for
    * training corpora: prefers mid-length docs, some stopwords, sane mean
    * token length. Deterministic arithmetic, SQL-replayable.
    */
  def qualityScore(
      text: Column, p: QualityParams = QualityParams()): Column = {
    val n = tokenCount(text).cast("double")
    val lengthScore = least(n / lit(p.targetTokens), lit(1.0))
    val stopScore = least(
      stopwordRatio(text, p.stopwords) * lit(p.stopMultiplier), lit(1.0))
    val mtl = meanTokenLength(text)
    val lenOk = when(mtl >= p.mtlMin && mtl <= p.mtlMax, lit(1.0))
      .otherwise(lit(0.5))
    round((lengthScore + stopScore + lenOk) / lit(3.0), 6)
  }

  /** The quality-score calibration table (VERDICT r10 #7): the default
    * values are tuned to the synthetic gate corpus; a real web corpus
    * passes its own targets here (and its own marker table to
    * [[langId]]) instead of editing constants. `stopwords` feeds both
    * the ratio and [[textStats]]-based variants.
    */
  case class QualityParams(
      targetTokens: Double = 64.0,
      stopMultiplier: Double = 4.0,
      mtlMin: Double = 3.0,
      mtlMax: Double = 10.0,
      stopwords: Seq[String] = Stopwords)

  /** Language markers: tiny per-language keyword lists. On real corpora
    * these would be the top character n-grams per language; the mechanism
    * (argmax of marker hit counts, ties by declaration order) is the
    * production shape and is fully SQL-replayable.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is"),
    "es" -> Seq("el", "la", "que"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("的", "是", "了"))

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(w => wordCount(text, w)).reduce(_ + _)

  /** All marker counts in one fused pass (graft.plans.MarkerCounts):
    * array slots follow LangMarkers order, flattened. The former
    * per-marker wordCount columns each re-split the text (3×|languages|
    * scans; measured 0.6 s at sf0.1 vs ~0.05 s fused) — same
    * non-overlapping padded-substring semantics, so oracles are
    * unchanged.
    */
  private def markerCountsAll(
      text: Column, markers: Seq[(String, Seq[String])]): Column =
    graft.plans.MarkerCounts(text, markers.flatMap(_._2))

  /** Per-language scores derived from ONE [[markerCountsAll]] array —
    * codegen CSE evaluates the kernel once per row however many language
    * columns are derived.
    */
  private[graft] def langScoresFused(
      text: Column,
      markers: Seq[(String, Seq[String])] = LangMarkers): Seq[(String, Column)] = {
    val mc = markerCountsAll(text, markers)
    var idx = 0
    markers.map { case (lang, ms) =>
      val s = ms.indices.map(j => element_at(mc, idx + j + 1))
        .reduce[Column](_ + _)
      idx += ms.length
      (lang, s)
    }
  }

  /** Predicted language = argmax marker score; ties resolved by list
    * order; all-zero scores → "und".
    */
  def langId(
      text: Column,
      markers: Seq[(String, Seq[String])] = LangMarkers): Column = {
    val scored = langScoresFused(text, markers)
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight makes earlier entries win ties (they overwrite later ones).
    pick
  }

  /** Total n-gram count of a doc (positions, not distinct): tokens-n+1,
    * floored at 0 — denominator of the repetition ratio.
    */
  def ngramCount(text: Column, n: Int): Column =
    greatest(size(tokens(normalizeText(text))) - (n - 1), lit(0))

  /** Document fingerprint: 128-bit content hash of normalized text
    * (lowercase, alnum+space only, collapsed whitespace). Identical md5 is
    * replayable in any engine; for shift-tolerant fingerprints see
    * Dedup.simhash.
    */
  def fingerprint(text: Column): Column =
    md5(normalizeText(text).cast("binary"))

  /** Single codegen kernel (graft.plans.NormalizeText) replacing the
    * former two-regexp_replace chain — same semantics (the kernel doc
    * derives the equivalence; the DuckDB gate pins it), ~6× less per-byte
    * cost, and it is what q27/q51-class fingerprint pipelines spend most
    * of their time in.
    */
  def normalizeText(text: Column): Column = graft.plans.NormalizeText(text)

  /** struct<n_tokens, n_stop, n_chars> in ONE pass over the raw text
    * (graft.plans.TextStats) — the fused substrate for the quality
    * columns below; deriving several of them from the same struct costs
    * one text scan total (codegen CSE), not one regex pass per column.
    */
  def textStats(text: Column): Column = graft.plans.TextStats(text)

  /** [[textStats]] with a caller-supplied stopword table (the n_stop
    * slot counts exactly these; length bounds recompute automatically).
    */
  def textStats(text: Column, stopwords: Seq[String]): Column =
    graft.plans.TextStats(text, stopwords)

  /** stopwordRatio/meanTokenLength/qualityScore expressed over a shared
    * [[textStats]] struct — bit-identical arithmetic to the standalone
    * columns (same rounding points), minus their per-column text scans.
    */
  def stopwordRatioOf(st: Column): Column =
    round(st.getField("n_stop").cast("double") /
      greatest(st.getField("n_tokens"), lit(1)).cast("double"), 6)

  def meanTokenLengthOf(st: Column): Column =
    round(
      (st.getField("n_chars") - st.getField("n_tokens") + 1).cast("double") /
        greatest(st.getField("n_tokens"), lit(1)).cast("double"),
      6)

  def qualityScoreOf(
      st: Column, p: QualityParams = QualityParams()): Column = {
    val n = st.getField("n_tokens").cast("double")
    val lengthScore = least(n / lit(p.targetTokens), lit(1.0))
    val stopScore = least(
      stopwordRatioOf(st) * lit(p.stopMultiplier), lit(1.0))
    val mtl = meanTokenLengthOf(st)
    val lenOk = when(mtl >= p.mtlMin && mtl <= p.mtlMax, lit(1.0))
      .otherwise(lit(0.5))
    round((lengthScore + stopScore + lenOk) / lit(3.0), 6)
  }

  /** Rolling polynomial hash (base 31 mod 2^31-1) over the normalized
    * text's characters — the classic Rabin-Karp document fingerprint.
    * One codegen'd kernel (graft.plans.RollingTextHash); the former
    * per-character `aggregate` fold ran interpreted.
    */
  def rollingHash(text: Column): Column = graft.plans.RollingTextHash(text)
}
