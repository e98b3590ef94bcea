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
      rules: Rules): DataFrame = {
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
        Text.langId(text).as("lang_pred"))
    val langOk: Column =
      rules.lang.map(l => col("lang_pred") === lit(l)).getOrElse(lit(true))
    val kept = staged.filter(
      col("n_tokens").between(rules.minTokens, rules.maxTokens) &&
        col("quality") >= rules.minQuality &&
        col("rep_ratio") <= rules.maxRepetition &&
        langOk)
    Pii.dropPiiHeavy(kept, textCol, rules.maxPiiHits).drop(textCol)
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
}
