package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4/Gopher-style rule-based corpus cleanup: the composite document
  * filter every pretraining pipeline runs before the expensive dedup /
  * decontamination stages. One declarative pass composes the existing
  * codegen kernels (token bounds, fused-quality score, n-gram repetition,
  * language id, PII density) into a single predicate — Catalyst merges
  * the chained filters, so a 100 TB corpus pays ONE narrow scan-side map
  * with zero shuffles, and every rule's cut survives into the scan as a
  * data filter over the same text column.
  *
  * Thresholds compare the ROUNDED (6-place) signal values, exactly what
  * the signals' own oracle-gated queries emit — so rule boundaries are
  * engine-portable (no float-representation drift at the cut line).
  */
object Clean {

  /** Cleanup rule set; defaults pass everything so callers opt into each
    * cut. `lang = Some(code)` keeps only docs `Text.langId` assigns that
    * code; `maxPiiHits` bounds total matches across the three PII
    * categories (Pii.dropPiiHeavy).
    */
  final case class Rules(
      minTokens: Int = 1,
      maxTokens: Int = Int.MaxValue,
      minQuality: Double = 0.0,
      maxRepetition: Double = 1.0,
      repetitionN: Int = 3,
      lang: Option[String] = None,
      maxPiiHits: Int = Int.MaxValue)

  /** Survivors of the rule set, with the per-doc signal columns the rules
    * cut on: (idCol, n_tokens, quality, rep_ratio, lang_pred). The text
    * column is dropped from the output — downstream stages re-join on the
    * id (keeping multi-hundred-KB text out of any later shuffle is the
    * same "ids shuffle, text doesn't" discipline as the dedup family).
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rules: Rules): DataFrame =
    cleanCorpus(df, idCol, textCol, rules, Text.langId(_))

  /** As above with a pluggable language classifier (text → lang code) —
    * pass [[Unigram.nbLangIdColumn]] of a trained model to cut on the
    * TRAINED char-n-gram NB language id instead of the 15-marker
    * heuristic. Any pure scalar column keeps the one-scan zero-shuffle
    * plan (both shipped classifiers ride the closure).
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rules: Rules,
      langId: Column => Column): DataFrame = {
    val st = col("__st")
    val text = col(textCol)
    // Two-step select (q35 precedent): the struct alias is non-cheap and
    // multiply referenced, so CollapseProject keeps the projections
    // separate and the TextStats kernel runs exactly once per row.
    val staged = df
      .select(col(idCol), text, Text.textStats(text).as("__st"))
      .select(
        col(idCol),
        text,
        st.getField("n_tokens").as("n_tokens"),
        // the fence keeps the rule filters ABOVE this projection: pushed
        // down they would re-evaluate the fused kernels once per textual
        // reference in the CSE-free filter context (OptimizerFence doc)
        graft.plans.OptimizerFence(Text.qualityScoreOf(st)).as("quality"),
        repRatio(text, rules.repetitionN).as("rep_ratio"),
        langId(text).as("lang_pred"))
    val langOk: Column =
      rules.lang.map(l => col("lang_pred") === lit(l)).getOrElse(lit(true))
    val kept = staged.filter(
      col("n_tokens").between(rules.minTokens, rules.maxTokens) &&
        col("quality") >= rules.minQuality &&
        col("rep_ratio") <= rules.maxRepetition &&
        langOk)
    Pii.dropPiiHeavy(kept, textCol, rules.maxPiiHits).drop(textCol)
  }

  /** The Gopher rule family's thresholds (Rae et al. 2021, Appendix A —
    * public). Defaults are the paper's; gate queries tune them to the
    * synthetic corpus so every rule provably cuts. All ratio cuts
    * compare ROUNDED (6-place) signals — the engine-portable boundary
    * discipline.
    */
  final case class GopherParams(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      requiredStops: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minRequiredStops: Int = 2)

  /** Gopher-style document quality rules, one scan-side pass, zero
    * shuffles. Emits every signal plus per-rule booleans and the
    * composite `keep`, so downstream mixes can weight rules instead of
    * hard-filtering. Counting is pure arithmetic over split/replace
    * (the Text.wordCount convention) or fused kernels — no interpreted
    * HOFs — and every formula has an exact DuckDB replay (the q111
    * oracle), so rule outcomes are engine-portable:
    *  - words/mean-word-length from the TextStats kernel;
    *  - symbol ratio: '#' chars + non-overlapping "..." occurrences
    *    per word;
    *  - bullet/ellipsis line fractions over newline-split lines
    *    (bullets "- " and "* " at line start; "..." at line end);
    *  - alpha-word fraction via one lookaround-anchored regexp_count
    *    (the stopwordRatio adjacency pattern);
    *  - required-stopword presence via ONE MarkerCounts kernel pass.
    */
  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      p: GopherParams = GopherParams()): DataFrame = {
    def countSubstr(c: Column, s: String): Column =
      size(split(c, java.util.regex.Pattern.quote(s), -1)) - 1
    val text = col(textCol)
    val st = col("__st")
    val mc = col("__mc")
    val staged = df
      .select(col(idCol), text, Text.textStats(text).as("__st"),
        graft.plans.MarkerCounts(text, p.requiredStops).as("__mc"))
      .select(
        col(idCol),
        st.getField("n_tokens").as("n_words"),
        Text.meanTokenLengthOf(st).as("mean_word_len"),
        round((countSubstr(text, "#") + countSubstr(text, "...")).cast("double") /
          greatest(st.getField("n_tokens"), lit(1)).cast("double"), 6)
          .as("symbol_ratio"),
        round((countSubstr(text, "\n- ") + countSubstr(text, "\n* ") +
            when(text.startsWith("- ") || text.startsWith("* "), 1).otherwise(0))
            .cast("double") /
          (countSubstr(text, "\n") + lit(1)).cast("double"), 6)
          .as("bullet_line_frac"),
        round((countSubstr(text, "...\n") +
            when(text.endsWith("..."), 1).otherwise(0)).cast("double") /
          (countSubstr(text, "\n") + lit(1)).cast("double"), 6)
          .as("ellipsis_line_frac"),
        round(regexp_count(concat(lit(" "), text, lit(" ")),
            lit("(?<= )[^ ]*[A-Za-z][^ ]*(?= )")).cast("double") /
          greatest(st.getField("n_tokens"), lit(1)).cast("double"), 6)
          .as("alpha_word_frac"),
        p.requiredStops.indices
          .map(i => when(element_at(mc, i + 1) > 0, 1).otherwise(0))
          .reduce[Column](_ + _).as("n_required_stops"))
    staged.withColumn("keep",
      col("n_words").between(p.minWords, p.maxWords) &&
        col("mean_word_len").between(p.minMeanWordLen, p.maxMeanWordLen) &&
        col("symbol_ratio") <= p.maxSymbolRatio &&
        col("bullet_line_frac") <= p.maxBulletLineFrac &&
        col("ellipsis_line_frac") <= p.maxEllipsisLineFrac &&
        col("alpha_word_frac") >= p.minAlphaWordFrac &&
        col("n_required_stops") >= p.minRequiredStops)
  }

  /** Block-LEVEL quality cleanup (the C4 line-filter analog for this
    * corpus' single-line documents): split each document into fixed
    * `blockWords`-token blocks (the q89 block definition), DROP blocks
    * that fail the per-block rules — too few tokens, or no stopword at
    * all (C4 drops lines without terminal punctuation; stopword presence
    * is the equivalent "is this prose" signal on an unpunctuated
    * corpus) — and reassemble the survivors in order.
    *
    * Scale shape is dropRepeatedBlocks': blocks explode/shuffle keyed by
    * doc, reassembly is a bounded per-doc aggregate (array_sort over
    * ≤ⅆoc-blocks elements), no corpus-wide window. Fully-stripped docs
    * come back as empty text (callers drop or keep them explicitly).
    */
  def dropBadBlocks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockWords: Int = 10,
      minBlockTokens: Int = 3,
      requireStopword: Boolean = true): DataFrame = {
    require(blockWords >= 1 && minBlockTokens >= 0,
      s"bad params $blockWords/$minBlockTokens")
    // shared substrate with dropRepeatedBlocks (one block definition for
    // q89 and q106); rules evaluate on the TOKEN ARRAY the explode
    // already carries — no join-and-resplit per predicate
    val blocks = Dedup.explodeBlocks(df, idCol, textCol, blockWords)
    val stopHit = arrays_overlap(col("__btoks"), lit(Text.Stopwords.toArray))
    val ok = (size(col("__btoks")) >= minBlockTokens) &&
      (if (requireStopword) stopHit else lit(true))
    Dedup.reassembleBlocks(df, blocks.filter(ok), idCol, textCol)
  }

  /** The q56 repetition signal as a column (Dedup.repetitionRatio's
    * formula, inlined so it composes into this operator's single scan).
    */
  private def repRatio(text: Column, n: Int): Column = {
    val total = Text.ngramCount(text, n)
    round(
      when(total <= 0, 0.0).otherwise(
        lit(1.0) -
          size(graft.plans.DistinctShingles(text, n)).cast("double") /
          total.cast("double")),
      6)
  }

  /** HTML → plain-text extraction — the boilerplate-stripping front of
    * every web-crawl pipeline (the trafilatura/jusText stage reduced to
    * its deterministic core): strip comments, then script and style
    * blocks WITH their contents (non-greedy to the closing tag, so tag
    * characters inside script strings don't end the block early), drop
    * all remaining tags, decode the six common entities (&amp; LAST, so
    * "&amp;lt;" correctly yields the literal "&lt;"), collapse
    * whitespace runs to single spaces and trim.
    *
    * Every step is a codegen'd regexp_replace / literal replace in the
    * Java∩RE2 regex subset (the Pii discipline) with an EXPLICIT
    * whitespace class — Java's \s and RE2's \s disagree on vertical
    * tab — so an independent engine replays the extraction exactly.
    * Plain text passes through unchanged up to whitespace collapse.
    */
  def extractHtmlText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "[ \t\n\r\f]+", " "))
  }

  /** Outbound links of an HTML document, in document order — the
    * edge-emitting front of a web-graph pipeline (PageRank, domain
    * authority, link-spam features). Matches `<a ... href="...">`
    * anchors: any attributes before href, case-insensitive tag and
    * attribute names, double-quoted values (the dominant form crawls
    * emit after normalization). A pure per-row regexp_extract_all in
    * the Java∩RE2 subset with an EXPLICIT whitespace class (Java's \s
    * and RE2's disagree on vertical tab), so an independent engine
    * replays the extraction exactly — and a 100 TB crawl emits its
    * edges map-side, inside the scan partitions that read the HTML.
    */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)<a[ \\t\\n\\r][^>]*href=\"([^\"]*)\""), lit(1))

  /** Canonical form of an absolute http(s) URL — the normalization
    * every crawl dedup keys on (the same page arrives as
    * `HTTP://Site.Com:80/p/?utm_source=x#frag` and
    * `http://site.com/p`): scheme and authority lowercased, default
    * ports (:80 http / :443 https) stripped, fragment dropped,
    * tracking parameters removed (`utm_*`, `gclid`, `fbclid`),
    * dangling `?`/`&` cleaned, trailing slashes stripped (root
    * included — `site.com/` ≡ `site.com`, a documented convention).
    * Path/query case is preserved (paths ARE case-sensitive).
    * Non-http(s) and relative URLs yield NULL, matching [[linkHost]].
    *
    * Pure regexp chain in the Java∩RE2 subset. The tracking-param
    * replace applies FOUR times because a single global pass consumes
    * the separator of an adjacent following param (both regex engines
    * resume after the replaced region — identical semantics, so parity
    * holds at any depth); ≥5 ADJACENT tracking params in one URL is
    * the documented truncation bound.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .otherwise(regexp_replace(hostRaw, ":443$", ""))
    val rest0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val trackRe = "([?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*&?"
    val rest1 = (1 to 4).foldLeft(rest0)((c, _) =>
      regexp_replace(c, trackRe, "$1"))
    val rest = regexp_replace(regexp_replace(rest1, "[?&]+$", ""), "/+$", "")
    when(scheme === "http" || scheme === "https",
      when(host === "", lit(null))
        .otherwise(concat(scheme, lit("://"), host, rest)))
      .otherwise(lit(null))
  }

  /** Host extraction for absolute http(s) URLs: the lowercased
    * authority up to the first `/ ? # :` (ports stripped). Relative,
    * mailto and other non-http(s) URLs yield NULL — filter on it
    * before building graph edges. Same Java∩RE2 replay discipline as
    * [[extractLinks]].
    */
  def linkHost(url: Column): Column = {
    val h = regexp_extract(lower(url), "^https?://([^/?#:]+)", 1)
    when(h === "", lit(null)).otherwise(h)
  }
}
