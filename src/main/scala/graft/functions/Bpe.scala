package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-vocabulary construction step every pretraining stack runs
  * before anything else sees the corpus.
  *
  * The scale insight (what makes this a counter problem, not a corpus
  * problem): BPE statistics are a function of the WORD-FREQUENCY TABLE.
  * One corpus pass aggregates (word, freq) — bounded by the distinct-word
  * vocabulary, with map-side partial aggregation — and every merge
  * iteration then runs on that table alone: k iterations cost k scans of
  * the vocab table plus ONE corpus scan, never k corpus scans.
  *
  * Per iteration:
  *   1. adjacent-pair counts weighted by word freq — pair extraction is
  *      `explode(arrays_zip(slice, slice))`, pure codegen;
  *   2. best pair = max count, ties by (left, right) ascending — a
  *      deterministic 1-row limit (driver reads one row per iteration);
  *   3. the merge applies to every word's segmentation via the
  *      [[graft.plans.ApplyMerge]] kernel: greedy LEFT-TO-RIGHT
  *      non-overlapping pair replacement (the classic BPE application
  *      order; for L==R runs like "a a a" the first pair wins → "aa a").
  *
  * Segmentations start as character lists (no end-of-word marker — kept
  * minimal; add one upstream by appending a sentinel char if needed).
  * The DuckDB oracle replays every iteration exactly: pair counts, the
  * (count desc, left, right) argmax, and greedy application expressed as
  * match positions filtered by run parity (equivalent to the left-to-
  * right scan: overlapping matches only arise in L==R runs, where
  * keeping even run offsets IS the greedy choice).
  */
object Bpe {

  /** The first `k` BPE merges over the corpus' word distribution.
    * Output: (rank 1..k, left, right, freq) where freq is the pair's
    * weighted count at selection time. Fewer than k rows when the corpus
    * runs out of mergeable pairs.
    */
  def trainMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 4096, s"merge count $k out of (0, 4096]")
    val spark = df.sparkSession
    val words = Kernels.spread(df, Seq(textCol))
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      // Each iteration's segmentation is PERSISTED and the predecessor
      // released once its successor has materialized: without this the
      // i-th pairCounts would re-apply all i−1 previous merges from the
      // raw vocab (O(k²) kernel work) and Catalyst would analyze an
      // ever-deeper k-level Project chain. With it, every plan is one
      // ApplyMerge over an InMemoryRelation — k scans total, constant
      // plan depth, vocab-bounded cache footprint (≤2 copies live).
      var seg = words.select(col("freq"), col("s"))
      var prev: Option[DataFrame] = None
      var i = 0
      var exhausted = false
      while (i < k && !exhausted) {
        val best = pairCounts(seg)
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        // `seg` is materialized now — its predecessor can go
        prev.foreach(_.unpersist(false))
        prev = if (i == 0) None else Some(seg)
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, c) =
            (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((i + 1, l, r, c))
          seg = seg.select(col("freq"),
            graft.plans.ApplyMerge(col("s"), l, r).as("s"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        }
        i += 1
      }
      prev.foreach(_.unpersist(false))
      if (!exhausted && k > 0) seg.unpersist(false)
      spark.createDataFrame(merges.toSeq).toDF("rank", "left", "right", "freq")
    } finally words.unpersist(false)
  }

  /** Weighted adjacent-pair counts of the current segmentations.
    * private[graft]: WordPiece.train shares it (same pair statistics,
    * different merge score).
    */
  private[graft] def pairCounts(seg: DataFrame): DataFrame = seg
    .select(col("freq"),
      slice(col("s"), lit(1), greatest(size(col("s")) - 1, lit(0))).as("__a"),
      slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))).as("__b"))
    .select(col("freq"), explode(arrays_zip(col("__a"), col("__b"))).as("p"))
    .select(col("freq"), col("p.__a").as("l"), col("p.__b").as("r"))
    .groupBy("l", "r").agg(sum("freq").as("c"))

  /** Final segmentations of every distinct corpus word under an ordered
    * merge list — the "tokenize with a trained vocab" half, exposed for
    * specs and downstream token pipelines. Output: (word, freq, tokens).
    */
  def segmentWords(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = Kernels.spread(df, Seq(textCol))
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    merges
      .foldLeft(words.select(col("word"), col("freq"), split(col("word"), "").as("tokens"))) {
        case (acc, (l, r)) =>
          acc.select(col("word"), col("freq"),
            graft.plans.ApplyMerge(col("tokens"), l, r).as("tokens"))
      }
  }

  /** Tokenize every document under a TRAINED merge list — the encode
    * half of the tokenizer (Sennrich et al. 2016 §3): whole corpus →
    * per-document subword sequences, the step that feeds token budgets
    * ([[Sampling.sampleToTokenBudget]]) and sequence packing
    * ([[Pack.packSequences]]).
    *
    * Scale shape: the model is the MERGE LIST (vocab-sized, gated
    * ≤65,536 entries like the other model-in-closure operators), shipped
    * once per executor inside the [[graft.plans.BpeEncodeText]] codegen
    * kernel. Encoding is therefore a pure map: no word-dictionary join,
    * no shuffle, no explode — a 100 TB corpus tokenizes inside the scan
    * partitions that read it, and the only exchange anywhere downstream
    * is whatever the CALLER aggregates. Per word the kernel merges the
    * leftmost lowest-rank pair first, which for trained merge lists is
    * provably identical to the rank-ordered exhaustive application the
    * training loop uses (see BpeRanks scaladoc; BpeSpec pins the
    * equivalence against segmentWords' ApplyMerge fold).
    *
    * The merge list must be rank-ordered (as [[trainMerges]] returns
    * it); ranks are positional. Output: (idCol, tokens array<string>,
    * n_tokens long). Null text encodes to null tokens / null count.
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "encode needs at least one merge; " +
      "for raw per-char tokens split the text directly")
    require(merges.size <= 65536,
      s"merge list has ${merges.size} entries, above the 65,536 " +
        "model-in-closure gate")
    val model = new graft.plans.BpeRanks(merges.toArray)
    // The fence keeps the kernel in ITS OWN projection: without it,
    // CollapseProject inlines bpe_encode into whatever the caller
    // composes next — a posexplode's Generate re-evaluates the kernel
    // in its null/empty generator condition (3 occurrences measured in
    // the q122 plan), and the Generate context has no subexpression
    // elimination. Same trade as Clean/Pii: encode output columns are
    // compute-derived, so there is nothing for a pushed filter to prune
    // on anyway — filter the corpus BEFORE encoding it.
    Kernels.spread(df, Seq(idCol, textCol))
      .select(col(idCol),
        graft.plans.OptimizerFence(
          graft.plans.BpeEncodeText(col(textCol), model)).as("tokens"))
      .select(col(idCol), col("tokens"),
        size(col("tokens")).cast("long").as("n_tokens"))
  }

  /** [[encode]] emitting INTEGER token ids — the training-ready shape
    * (~4 bytes/token before compression instead of re-materialized
    * substrings). Ids derive from the model alone, so this is the same
    * zero-shuffle map: a merge product's id is its 0-based rank; a
    * single-char token's id is `merges.size + codePoint` (collision-free
    * by construction, replayable in plain SQL — see
    * [[graft.plans.BpeRanks.idOf]]). Output: (idCol, ids array<int>,
    * n_tokens long).
    */
  def encodeIds(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "encodeIds needs at least one merge")
    require(merges.size <= 65536,
      s"merge list has ${merges.size} entries, above the 65,536 " +
        "model-in-closure gate")
    val model = new graft.plans.BpeRanks(merges.toArray)
    Kernels.spread(df, Seq(idCol, textCol))
      .select(col(idCol),
        graft.plans.OptimizerFence(
          graft.plans.BpeEncodeIds(col(textCol), model)).as("ids"))
      .select(col(idCol), col("ids"),
        size(col("ids")).cast("long").as("n_tokens"))
  }

  /** The tokenizer's DECODE half: integer token ids back to text, in
    * the same model-in-closure shape as [[encodeIds]] — ids resolve
    * from the merge list alone (rank → merge product, `merges.size +
    * code unit` → single char, see [[graft.plans.BpeRanks.idOf]]), so
    * detokenizing a 100 TB encoded corpus is a pure map: no vocab
    * join, no shuffle, text re-materializes inside the scan partition
    * that read the ids. Word boundaries are not representable in the
    * id stream (encode splits on single spaces and drops them), so the
    * exact round-trip law — which the q139 gate hashes corpus-wide —
    * is decodeIds(encodeIds(text)) == text with spaces removed.
    * Out-of-range ids fail loudly. Output: (idCol, text string); null
    * ids decode to null text.
    */
  def decodeIds(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "decodeIds needs at least one merge")
    require(merges.size <= 65536,
      s"merge list has ${merges.size} entries, above the 65,536 " +
        "model-in-closure gate")
    val model = new graft.plans.BpeRanks(merges.toArray)
    Kernels.spread(df, Seq(idCol, idsCol))
      .select(col(idCol),
        graft.plans.OptimizerFence(
          graft.plans.BpeDecodeIds(col(idsCol), model)).as("text"))
  }

  /** Tokenizer FERTILITY per group — subwords emitted per whitespace
    * word under a trained merge list, the standard tokenizer-evaluation
    * metric (fertility ≈ 1 on in-domain text; it climbs on domains the
    * vocabulary undertrains, which is exactly what a per-domain report
    * surfaces). One encode pass (the merge list rides the closure — no
    * dictionary join) + one counter aggregate; nothing shuffles but
    * (group, counters). Output: (byCol, n_docs, n_words, n_subwords,
    * fertility).
    */
  def fertility(
      df: DataFrame,
      idCol: String,
      textCol: String,
      byCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = encode(df, idCol, textCol, merges)
      .select(col(idCol), col("n_tokens").as("__sub"))
    df.select(col(idCol), col(byCol),
        Text.tokenCount(col(textCol)).cast("long").as("__w"))
      .join(enc, Seq(idCol))
      .groupBy(byCol)
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__sub")).as("n_subwords"))
      .select(col(byCol), col("n_docs"), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
  }
}
