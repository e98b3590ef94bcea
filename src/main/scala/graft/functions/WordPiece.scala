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
      var seg = words
      var prev: Option[DataFrame] = None
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
        prev.foreach(_.unpersist(false))
        prev = if (i == 0) None else Some(seg)
        if (best.isEmpty) exhausted = true
        else {
          val b = best(0)
          merges += ((i + 1, b.getString(0), b.getString(1),
            b.getLong(2), b.getLong(3), b.getLong(4)))
          seg = seg.select(col("freq"),
            graft.plans.ApplyMerge(col("s"), b.getString(0), b.getString(1)).as("s"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        }
        i += 1
      }
      prev.foreach(_.unpersist(false))
      if (!exhausted && k > 0) seg.unpersist(false)
      spark.createDataFrame(merges.toSeq)
        .toDF("rank", "left", "right", "freq", "freq_left", "freq_right")
    } finally words.unpersist(false)
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
