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
      // Each iteration's segmentation is MATERIALIZED with a truncated
      // lineage (eager localCheckpoint): without it the i-th pairCounts
      // would re-apply all i−1 previous merges from the raw vocab
      // (O(k²) kernel work) and — persist alone does NOT cut lineage —
      // Catalyst would still carry an ever-deeper k-level Project chain
      // whose plan strings grow O(k²) (at k≈100+ the AQE plan-change
      // explain alone OOMs the driver; BpeBatchedSpec caught this).
      // With it every plan is one ApplyMerge over a leaf RDD scan — k
      // scans total, constant plan depth, vocab-bounded blocks whose
      // predecessors the ContextCleaner reaps as refs drop.
      // MEMORY_AND_DISK_2 (2× replicated): localCheckpoint blocks are
      // NOT recomputable from lineage, so on a real cluster a lost
      // executor would otherwise abort the whole k-iteration run —
      // replication makes single-executor loss survivable at the cost
      // of one extra copy of the (vocab-bounded, small) segmentation.
      var seg = words.select(col("freq"), col("s"))
      var i = 0
      var exhausted = false
      while (i < k && !exhausted) {
        val best = pairCounts(seg)
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, c) =
            (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((i + 1, l, r, c))
          seg = seg.select(col("freq"),
            graft.plans.ApplyMerge(col("s"), l, r).as("s"))
            .localCheckpoint(true,
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2)
        }
        i += 1
      }
      spark.createDataFrame(merges.toSeq).toDF("rank", "left", "right", "freq")
    } finally words.unpersist(false)
  }

  /** Batched BPE training: the SAME merge sequence as [[trainMerges]]
    * — provably, see below — selected up to B-at-a-time. Where the
    * pair-count head is unit-disjoint (multi-script or word-seeded
    * corpora, later-stage training after tokens diversify) a pass
    * takes a whole batch, ~2 vocab scans per B merges; where it is not
    * (early char-stage natural text: top pairs share letters, and an
    * order-equivalent rule MUST serialize them — their counts change
    * under each other), passes degrade to single merges at sequential
    * cost (a driver pre-cut skips the risk aggregate there,
    * BpeBatchedSpec pins the ≤1.6× worst-regime bound). Lifts the
    * k ≤ 4096 envelope of the single-merge loop to 65,536 (the
    * model-in-closure gate [[encode]] enforces anyway).
    *
    * Per pass, candidates are taken in the EXACT global greedy order
    * (count desc, left, right) and the batch is the longest prefix that
    * is provably order-equivalent to running [[trainMerges]] for
    * |batch| steps:
    *  1. STOP at the first pair sharing a unit with an earlier selected
    *     pair, with an endpoint equal to a selected PRODUCT, or whose
    *     OWN product collides with a selected unit or product (a batch
    *     member whose unit is another member's product could be
    *     re-formed by it, which would void the risk exclusion below) —
    *     from that pair on, counts can change under the batch's merges.
    *     Everything before the stop is a prefix of the sorted order, so
    *     every non-selected pair has count <= cNext (the stop row's).
    *  2. DROP selected tail entries whose count does not STRICTLY
    *     exceed the risk ceiling: applying a merge (a,b)->ab can only
    *     (i) shrink pairs sharing a or b, (ii) create/grow pairs with
    *     an ab endpoint — each new ab unit adds at most one adjacency
    *     per side, so a pair's growth per product endpoint is bounded
    *     by the max current count g among UNIT-SHARING pairs (its
    *     formation ancestors (x,a)/(b,y) all share a unit), and a
    *     grow-able pair starts at most at g0 (max current count among
    *     product-endpoint pairs). No pair can therefore ever exceed
    *     max(g, g0 + 2g) while the batch's merges replay sequentially,
    *     and any kept merge counting strictly above that (and above
    *     cNext) is selected by sequential greedy exactly in prefix
    *     order (ties are impossible across the strict bound; ties
    *     INSIDE the prefix follow the same (l, r) order both ways).
    *  3. If the drop empties the batch, fall back to the single top
    *     pair — always sequential-correct by definition.
    * The batch then applies in ONE [[graft.plans.ApplyMergeBatch]]
    * kernel pass (disjoint units ⇒ a combined scan equals any
    * sequential per-pair fold). Output schema and values are
    * [[trainMerges]]'s — `freq` is the count at selection time, which
    * is the CURRENT table count (kept pairs are untouched by earlier
    * batch members: no shared units, no product endpoints).
    * BpeBatchedSpec pins sequence equality on real corpus text.
    */
  def trainMergesBatched(
      df: DataFrame,
      textCol: String,
      k: Int,
      maxBatch: Int = 256): DataFrame = {
    require(k >= 1 && k <= 65536, s"merge count $k out of (0, 65536]")
    require(maxBatch >= 1 && maxBatch <= 4096, s"bad maxBatch $maxBatch")
    val spark = df.sparkSession
    val words = Kernels.spread(df, Seq(textCol))
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var seg = words.select(col("freq"), col("s"))
      var exhausted = false
      while (merges.size < k && !exhausted) {
        val budget = math.min(maxBatch, k - merges.size)
        val pc = pairCounts(seg).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val window = pc
            .orderBy(col("c").desc, col("l").asc, col("r").asc)
            .limit(budget + 1).collect()
          if (window.isEmpty) exhausted = true
          else {
            val blocked = scala.collection.mutable.HashSet.empty[String]
            val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
            var cNext = Option.empty[Long]
            val it = window.iterator
            while (it.hasNext && cNext.isEmpty) {
              val row = it.next()
              val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
              if (sel.size == budget || blocked(l) || blocked(r) ||
                blocked(l + r)) cNext = Some(c)
              else {
                sel += ((l, r, c))
                blocked += l; blocked += r; blocked += (l + r)
              }
            }
            // driver-side pre-cut: the final ceiling is >= cNext, so if
            // the cNext cut alone collapses the prefix to <= 1, skip
            // the distributed risk aggregate entirely — this is the
            // dominant regime in early char-stage natural text (top
            // pairs share letters) and makes a degenerate pass cost
            // exactly a sequential iteration
            val preCut = sel.takeWhile(_._3 > cNext.getOrElse(Long.MinValue))
            val kept =
              if (sel.size <= 1) sel.toSeq
              else if (preCut.size <= 1)
                (if (preCut.isEmpty) sel.take(1) else preCut).toSeq
              else {
                val units = sel.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
                val prods = sel.map(p => p._1 + p._2).toSeq
                // the selected pairs themselves are NOT risks: applying
                // one zeroes its own count and no batch member can
                // re-form it (selection stops on any unit/product
                // collision, so a member's unit is never another's
                // product), so exclude them or g degenerates to
                // the batch's own top count and every batch collapses
                // to the single-merge fallback. Space-joined keys are
                // collision-free (tokens never contain a space).
                val selKeys = sel.map(p => p._1 + " " + p._2).toSeq
                val other =
                  !concat(col("l"), lit(" "), col("r")).isin(selKeys: _*)
                val risk = pc.agg(
                  max(when(other &&
                    (col("l").isin(units: _*) || col("r").isin(units: _*)),
                    col("c"))).as("g"),
                  max(when(col("l").isin(prods: _*) || col("r").isin(prods: _*),
                    col("c"))).as("g0")).collect()(0)
                val g = if (risk.isNullAt(0)) 0L else risk.getLong(0)
                val g0 = if (risk.isNullAt(1)) 0L else risk.getLong(1)
                val ceiling = math.max(cNext.getOrElse(Long.MinValue),
                  math.max(g, g0 + 2 * g))
                val cut = sel.takeWhile(_._3 > ceiling).toSeq
                if (cut.isEmpty) sel.take(1).toSeq else cut
              }
            kept.foreach { case (l, r, c) => merges += ((merges.size + 1, l, r, c)) }
            val batch = new graft.plans.MergeBatch(
              kept.map(p => (p._1, p._2)).toArray)
            // eager localCheckpoint: truncated lineage (the trainMerges
            // O(k²)-plan-string lesson) + materialized before next pass
            seg = seg.select(col("freq"),
              graft.plans.ApplyMergeBatch(col("s"), batch).as("s"))
              .localCheckpoint(true,
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2)
          }
        } finally pc.unpersist(false)
      }
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

  /** Persist a trained merge list as a versioned Library symbol — the
    * tokenizer ARTIFACT lifecycle a real pipeline needs: train once,
    * commit, and every later encode (including a year later, under
    * as-of) resolves the EXACT model that produced the corpus's
    * token counts. Rank-indexed so the read is ordered by manifest,
    * and versioned like any symbol: a retrained vocab is a new
    * version, snapshots pin the one a training run used.
    */
  def saveMerges(
      lib: graft.core.Library,
      symbol: String,
      merges: DataFrame): Int = {
    val cols = merges.columns.toSet
    require(Set("rank", "left", "right").subsetOf(cols),
      s"merge frame must carry (rank, left, right), got ${cols.mkString(",")}")
    lib.write(symbol, merges.withColumn("rank", col("rank").cast("long"))
      .orderBy("rank"), Some("rank"))
  }

  /** Load a persisted merge list back into the encode model's shape —
    * rank-ordered (left, right) pairs, bounded by the 64k
    * model-in-closure gate [[encode]] enforces.
    */
  def loadMerges(
      lib: graft.core.Library,
      symbol: String,
      asOf: graft.core.Library.AsOf = graft.core.Library.AsOf.Latest): Seq[(String, String)] = {
    val rows = lib.read(symbol, asOf).select("rank", "left", "right")
      .orderBy("rank").limit(65537).collect()
    require(rows.length <= 65536,
      s"persisted merge list $symbol exceeds the 64k closure bound")
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }
}
