package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.{WordPieceEncodeText, WordPieceModel}

/** WordPiece-family tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer): the THIRD trained tokenizer family next to BPE
  * ([[Bpe]]) and Unigram-LM ([[UnigramLm]]).
  *
  *  - **Training** is BPE's iterative merge loop with WordPiece's
  *    LIKELIHOOD merge score: pick the adjacent pair maximizing
  *    freq(pair) / (freq(left) · freq(right)) — the pair whose merge
  *    most increases corpus likelihood under a unigram model — instead
  *    of raw pair frequency. Same scale shape as [[Bpe.trainMerges]]:
  *    every iteration runs on the vocab-bounded word-frequency table
  *    (pair counts + unit counts are two aggregates of the persisted
  *    segmentation), never a corpus rescan; k merges = k vocab scans +
  *    ONE corpus pass.
  *  - **Encoding** is greedy longest-match-first over the vocabulary
  *    (characters + merge products) — the [[WordPieceModel]] closure
  *    kernel: model broadcast once, the corpus tokenizes map-side
  *    inside the scan partitions that read it, zero shuffles.
  *
  * Determinism (mirrored by the q174/q175 oracles): the merge score is
  * one IEEE double division c / (fl · fr) with all three inputs exact
  * longs cast to double — bit-identical across engines — and ties break
  * (left asc, right asc); the trained artifact carries the exact
  * integer triple (freq, freq_left, freq_right), never the ratio.
  * Greedy encode positions/lengths are codepoints, words longer than
  * maxWordLen (or hitting an unknown position) fall back to themselves
  * as one piece — the [[UnigramModel]] conventions.
  */
object WordPiece {

  /** The first `k` likelihood-scored merges. Output: (rank 1..k, left,
    * right, freq, freq_left, freq_right) — freq is the pair's weighted
    * count and freq_left/freq_right the units' weighted counts at
    * selection time (the score's exact numerator and denominator).
    * Fewer than k rows when the corpus runs out of mergeable pairs.
    */
  def train(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 4096, s"merge count $k out of (0, 4096]")
    val spark = df.sparkSession
    val words = Kernels.spread(df, Seq(textCol))
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("w"), "").as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
      // eager localCheckpoint per iteration: materialized AND
      // lineage-truncated (persist alone leaves an ever-deeper plan
      // chain whose strings grow O(k²) — the Bpe.trainMerges lesson)
      var seg = words
      var i = 0
      var exhausted = false
      while (i < k && !exhausted) {
        val units = seg.select(col("freq"), explode(col("s")).as("u"))
          .groupBy("u").agg(sum("freq").as("f"))
        val best = Bpe.pairCounts(seg)
          .join(units.select(col("u").as("l"), col("f").as("fl")), "l")
          .join(units.select(col("u").as("r"), col("f").as("fr")), "r")
          .orderBy(
            (col("c").cast("double") /
              (col("fl").cast("double") * col("fr"))).desc,
            col("l").asc, col("r").asc)
          .limit(1).select("l", "r", "c", "fl", "fr").collect()
        if (best.isEmpty) exhausted = true
        else {
          val b = best(0)
          merges += ((i + 1, b.getString(0), b.getString(1),
            b.getLong(2), b.getLong(3), b.getLong(4)))
          seg = seg.select(col("freq"),
            graft.plans.ApplyMerge(col("s"), b.getString(0), b.getString(1)).as("s"))
            .localCheckpoint(true,
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2)
        }
        i += 1
      }
      spark.createDataFrame(merges.toSeq)
        .toDF("rank", "left", "right", "freq", "freq_left", "freq_right")
    } finally words.unpersist(false)
  }

  /** Batched WordPiece training — the [[graft.functions.Bpe
    * .trainMergesBatched]] lift applied to the LIKELIHOOD score: the
    * same merge sequence as [[train]], selected B-at-a-time, ~3
    * vocab-table scans per batch instead of one per merge; the cap
    * rises to 65,536 (the closure-model gate).
    *
    * The order-equivalence argument is [[Bpe.trainMergesBatched]]'s
    * (prefix of the exact global order, interaction stop on shared
    * units AND unit/product collisions in either direction,
    * strict-exceed cut, single-merge fallback) with one addition the
    * likelihood score forces: merging
    * (a,b) SHRINKS f(a)/f(b), so a surviving pair's score can RISE
    * (denominator drops) — a count ceiling is not enough. The cut
    * therefore compares each kept score against an upper bound on any
    * affected pair's score at ANY step of the batch's sequential
    * replay, computed from exact extremal counts: numerator at most
    * c + (per product endpoint) the merge's own count (each new
    * product unit adds ≤ 1 adjacency per side), denominator at least
    * the product of each side's MINIMUM unit count over the replay —
    * f(u) − consumed(u) for units (clamped ≥ 1: a countable pair
    * implies a live unit), and for a formation (x, a_i)→(x, prod_i)
    * the product's count after step i, f(prod_i) − consumed + c_i.
    * IEEE double division/multiplication are monotone in their
    * operands, so the double-computed bound dominates every
    * double-computed future score and a strictly-greater kept score
    * can never be preempted (ties cut, conservatively). Scores,
    * counts and the recorded (freq, freq_left, freq_right) of kept
    * merges are themselves batch-invariant: kept units are pairwise
    * disjoint and never an earlier product (the blocked set).
    * WordPieceBatchedSpec pins sequence equality on real corpus text.
    */
  def trainBatched(
      df: DataFrame,
      textCol: String,
      k: Int,
      maxBatch: Int = 128): DataFrame = {
    require(k >= 1 && k <= 65536, s"merge count $k out of (0, 65536]")
    require(maxBatch >= 1 && maxBatch <= 4096, s"bad maxBatch $maxBatch")
    val spark = df.sparkSession
    val words = Kernels.spread(df, Seq(textCol))
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("w"), "").as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
      var seg = words
      var exhausted = false
      while (merges.size < k && !exhausted) {
        val budget = math.min(maxBatch, k - merges.size)
        val units = seg.select(col("freq"), explode(col("s")).as("u"))
          .groupBy("u").agg(sum("freq").as("f"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val scored = Bpe.pairCounts(seg)
          .join(units.select(col("u").as("l"), col("f").as("fl")), "l")
          .join(units.select(col("u").as("r"), col("f").as("fr")), "r")
          .select(col("l"), col("r"), col("c"), col("fl"), col("fr"),
            (col("c").cast("double") /
              (col("fl").cast("double") * col("fr"))).as("score"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val window = scored
            .orderBy(col("score").desc, col("l").asc, col("r").asc)
            .limit(budget + 1)
            .select("l", "r", "c", "fl", "fr", "score").collect()
          if (window.isEmpty) exhausted = true
          else {
            val blocked = scala.collection.mutable.HashSet.empty[String]
            val sel = scala.collection.mutable
              .ArrayBuffer.empty[(String, String, Long, Long, Long, Double)]
            var nextScore = Option.empty[Double]
            val it = window.iterator
            while (it.hasNext && nextScore.isEmpty) {
              val row = it.next()
              val (l, r) = (row.getString(0), row.getString(1))
              if (sel.size == budget || blocked(l) || blocked(r) ||
                blocked(l + r))
                nextScore = Some(row.getDouble(5))
              else {
                sel += ((l, r, row.getLong(2), row.getLong(3), row.getLong(4),
                  row.getDouble(5)))
                blocked += l; blocked += r; blocked += (l + r)
              }
            }
            // driver-side pre-cut: the final ceiling is >= nextScore,
            // so a prefix the nextScore cut alone collapses to <= 1
            // skips the distributed risk aggregate (the Bpe pre-cut)
            val preCut = sel.takeWhile(_._6 > nextScore.getOrElse(Double.MinValue))
            val kept =
              if (sel.size <= 1) sel.toSeq
              else if (preCut.size <= 1)
                (if (preCut.isEmpty) sel.take(1) else preCut).toSeq
              else keptUnderRiskBound(sel.toSeq, nextScore, scored, units)
            kept.foreach { case (l, r, c, fl, fr, _) =>
              merges += ((merges.size + 1, l, r, c, fl, fr))
            }
            val batch = new graft.plans.MergeBatch(
              kept.map(p => (p._1, p._2)).toArray)
            // eager localCheckpoint: truncated lineage, materialized
            seg = seg.select(col("freq"),
              graft.plans.ApplyMergeBatch(col("s"), batch).as("s"))
              .localCheckpoint(true,
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2)
          }
        } finally {
          scored.unpersist(false)
          units.unpersist(false)
        }
      }
      spark.createDataFrame(merges.toSeq)
        .toDF("rank", "left", "right", "freq", "freq_left", "freq_right")
    } finally words.unpersist(false)
  }

  /** The strict-exceed cut of [[trainBatched]]: drop the selected tail
    * whose score does not strictly beat the risk ceiling — the maximum
    * upper-bound score any pair TOUCHING the batch (shared unit or
    * product endpoint, surviving or newly formed) can reach while the
    * batch replays sequentially — or the first unselected pair's
    * score. Falls back to the top single merge when the cut empties.
    */
  private def keptUnderRiskBound(
      sel: Seq[(String, String, Long, Long, Long, Double)],
      nextScore: Option[Double],
      scored: DataFrame,
      units: DataFrame): Seq[(String, String, Long, Long, Long, Double)] = {
    val spark = scored.sparkSession
    import spark.implicits._
    // exact extremal unit counts under the batch:
    //   cons(u)  = Σ c_i over selected pairs consuming u (2c for l==r)
    //   dmin(u)  = max(1, f(u) − cons(u))  — min live count of unit u
    //   dnew(i)  = max(1, f(prod_i) − cons(prod_i) + c_i) — min count of
    //              merge i's product at any step AFTER i applies
    val cons = scala.collection.mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    sel.foreach { case (l, r, c, _, _, _) =>
      cons(l) += c
      cons(r) += c // l == r consumes two units per occurrence: adds twice
    }
    val f = scala.collection.mutable.HashMap.empty[String, Long]
    sel.foreach { case (l, r, _, fl, fr, _) => f(l) = fl; f(r) = fr }
    val prods = sel.map(p => p._1 + p._2)
    val prodF = units.filter(col("u").isin(prods: _*))
      .select("u", "f").as[(String, Long)].collect().toMap
    prodF.foreach { case (u, fv) => f.getOrElseUpdate(u, fv) }
    val dminOf = (u: String) =>
      math.max(1L, f.getOrElse(u, 0L) - cons(u))
    val dnew = sel.map { case (l, r, c, _, _, _) =>
      val p = l + r
      (l, r, p, math.max(1L, prodF.getOrElse(p, 0L) - cons(p) + c), c)
    }
    // per-unit lookup rows: (u, cons?, grow — the producing merge's c
    // when u IS a product, dnewL — dnew of the merge whose LEFT unit is
    // u, dnewR — dnew of the merge whose RIGHT unit is u)
    val affected: Seq[String] =
      (sel.flatMap(p => Seq(p._1, p._2)) ++ prods).distinct
    val lookRows = affected.map { u =>
      val grow = dnew.collectFirst { case (_, _, p, _, c) if p == u => c }
        .getOrElse(0L)
      val dnewL = dnew.collectFirst { case (l, _, _, d, _) if l == u => d }
      val dnewR = dnew.collectFirst { case (_, r, _, d, _) if r == u => d }
      (u, dminOf(u), grow, dnewL.getOrElse(0L), dnewR.getOrElse(0L))
    }
    val look = broadcast(
      lookRows.toDF("u", "dmin", "grow", "dnew_l", "dnew_r"))
    // the selected pairs themselves are NOT risks: applying one zeroes
    // its own count and nothing in the batch can re-form it (selection
    // stops on any unit/product collision, so a member's unit is never
    // another member's product); leaving
    // them in would hand the ceiling their own boosted bound and
    // collapse every batch to the single-merge fallback
    val selKeys = sel.map(p => p._1 + " " + p._2)
    val t = scored
      .filter(!concat(col("l"), lit(" "), col("r")).isin(selKeys: _*))
      .join(look.select(col("u").as("l"), col("dmin").as("dl0"),
        col("grow").as("gl"), col("dnew_r").as("dnr_l")), Seq("l"), "left")
      .join(look.select(col("u").as("r"), col("dmin").as("dr0"),
        col("grow").as("gr"), col("dnew_l").as("dnl_r")), Seq("r"), "left")
      .filter(col("dl0").isNotNull || col("dr0").isNotNull)
      .select(
        col("c").cast("double").as("c"),
        coalesce(col("dl0"), col("fl")).cast("double").as("dl"),
        coalesce(col("dr0"), col("fr")).cast("double").as("dr"),
        coalesce(col("gl"), lit(0L)).cast("double").as("gl"),
        coalesce(col("gr"), lit(0L)).cast("double").as("gr"),
        col("dnr_l"), col("dnl_r"))
    // B1: the pair survives (and, per product endpoint, grows by at
    //     most that merge's count); B2/B3/B4: the pair is the formation
    //     ancestor of a NEW pair ((x,a_i)→(x,prod_i) etc.), whose count
    //     it bounds and whose product-side denominator is dnew
    val bounds = t.select(greatest(
      (col("c") + col("gl") + col("gr")) / (col("dl") * col("dr")),
      when(col("dnl_r").isNotNull && col("dnl_r") > 0,
        col("c") / (col("dl") * col("dnl_r").cast("double")))
        .otherwise(lit(Double.MinValue)),
      when(col("dnr_l").isNotNull && col("dnr_l") > 0,
        col("c") / (col("dnr_l").cast("double") * col("dr")))
        .otherwise(lit(Double.MinValue)),
      when(col("dnr_l").isNotNull && col("dnr_l") > 0 &&
        col("dnl_r").isNotNull && col("dnl_r") > 0,
        col("c") / (col("dnr_l").cast("double") * col("dnl_r")))
        .otherwise(lit(Double.MinValue))).as("b"))
      .agg(max(col("b"))).collect()(0)
    val risk = if (bounds.isNullAt(0)) Double.MinValue else bounds.getDouble(0)
    val ceiling = math.max(nextScore.getOrElse(Double.MinValue), risk)
    val cut = sel.takeWhile(_._6 > ceiling)
    if (cut.isEmpty) sel.take(1) else cut
  }

  /** The encode vocabulary for a trained merge list: every character
    * occurring in the corpus' words plus the merge products (so greedy
    * encode can always fall to single characters on text drawn from the
    * training distribution). One vocab-bounded aggregate over the word
    * table — never a corpus-row vocabulary.
    */
  def vocab(df: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val chars = Kernels.spread(df, Seq(textCol))
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .select(explode(split(col("w"), "")).as("piece"))
      .filter(col("piece") =!= "")
      .distinct()
    chars.unionByName(
        merges.select(concat(col("left"), col("right")).as("piece")))
      .distinct()
  }

  /** Collect a (piece) vocab frame into the broadcastable closure model
    * — the 64k model-in-closure contract of Bpe/UnigramLm. */
  def collectModel(vocabDf: DataFrame, maxWordLen: Int): WordPieceModel = {
    val rows = vocabDf.select("piece").limit(65537).collect()
    require(rows.length <= 65536, "wordpiece vocab exceeds the 64k closure bound")
    new WordPieceModel(rows.map(_.getString(0)), maxWordLen)
  }

  /** Persist a trained encode vocabulary as a versioned Library symbol
    * — [[graft.functions.Bpe.saveMerges]]'s WordPiece twin: the
    * artifact a pipeline commits once and resolves exactly (as-of,
    * snapshot-pinned) for every later encode. Piece-indexed (string
    * key ranges) so bounded reads stay manifest-pruned.
    */
  def saveVocab(
      lib: graft.core.Library,
      symbol: String,
      vocabDf: DataFrame): Int = {
    require(vocabDf.columns.contains("piece"),
      s"vocab frame must carry 'piece', got ${vocabDf.columns.mkString(",")}")
    lib.write(symbol, vocabDf.select("piece").orderBy("piece"), Some("piece"))
  }

  /** Load a persisted vocabulary for [[encode]] (which applies the 64k
    * closure gate on collect). */
  def loadVocab(
      lib: graft.core.Library,
      symbol: String,
      asOf: graft.core.Library.AsOf = graft.core.Library.AsOf.Latest): DataFrame =
    lib.read(symbol, asOf).select("piece")

  /** Tokenize every document under a trained vocab frame — pure map
    * (model in closure): (idCol, pieces, n_pieces). */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabDf: DataFrame,
      maxWordLen: Int = 16): DataFrame = {
    val m = collectModel(vocabDf, maxWordLen)
    df.select(col(idCol),
      WordPieceEncodeText(col(textCol), m).as("pieces"))
      .select(col(idCol), col("pieces"),
        size(col("pieces")).cast("long").as("n_pieces"))
  }
}
