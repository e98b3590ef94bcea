package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.{UnigramEncodeText, UnigramModel}

/** Distributed Unigram-LM tokenizer training (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece unigram algorithm),
  * the OTHER tokenizer real pretraining pipelines train besides BPE.
  *
  * Same scale insight as [[Bpe.trainMerges]]: unigram statistics are a
  * function of the WORD-FREQUENCY TABLE. One corpus pass aggregates
  * (word, freq) — vocab-bounded, map-side partial aggregation — and
  * every EM iteration runs on that table alone: seed-substring counting,
  * Viterbi re-segmentation (the [[UnigramEncodeText]] closure kernel —
  * the model is vocab-sized and broadcast, words stream) and the count
  * aggregate are all vocab-table scans. k iterations = k vocab scans +
  * ONE corpus scan, never k corpus scans; the corpus itself encodes
  * map-side afterwards ([[encode]]), zero shuffles.
  *
  * Hard-EM (Viterbi counts) rather than lattice forward-backward: the
  * E-step assigns each word its single best segmentation under the
  * current model and re-estimates piece probabilities from those counts.
  * This keeps every quantity an exact integer (micro-nat logps, long
  * count sums), which is what lets the DuckDB oracle replay BOTH
  * iterations CTE-for-CTE and hash-gate the model — the same integer
  * discipline as q145/q155. Piece probabilities quantize to micro-nats
  * BEFORE any comparison, so Viterbi ties are exact-integer ties,
  * resolved to the smallest predecessor (longest final piece).
  *
  * Determinism rules (mirrored by the oracle):
  *  - words: split(text, " "), empty dropped, length 1..maxWordLen;
  *  - seed: every substring of length 1..maxPieceLen counted weighted
  *    by word freq (every occurrence); ALL single chars kept, plus the
  *    top `seedSize` multi-char pieces by (cnt desc, piece asc) with
  *    cnt >= 2;
  *  - each iteration: Viterbi counts; single chars never drop (count
  *    floor 1 — the SentencePiece required-character rule), multi-char
  *    pieces survive only with count > 0;
  *  - final prune: all single chars + top (vocabSize - nChars)
  *    multi-char by (cnt desc, piece asc); probabilities renormalized.
  *
  * Reference blueprint: the tokenize/segment processing family the
  * reference exposes for text columns; the training loop itself is from
  * the public SentencePiece algorithm, re-expressed vocab-table-side.
  */
object UnigramLm {

  /** (w, freq) over split(" ") tokens, empties dropped, length capped. */
  private[graft] def wordTable(df: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    Kernels.spread(df, Seq(textCol))
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Normalize a (piece, cnt) table to (piece, cnt, logp_mu) with
    * logp_mu = floor(ln(cnt / total) * 1e6) — the micro-nat longs every
    * downstream comparison uses. One driver read for the exact total.
    */
  private def withLogp(counts: DataFrame): DataFrame = {
    val total = counts.agg(sum("cnt")).head.getLong(0)
    counts.select(col("piece"), col("cnt"),
      floor(log(col("cnt").cast("double") / total.toDouble) * 1e6)
        .cast("long").as("logp_mu"))
  }

  /** Top-ranked multi-char pieces by (cnt desc, piece asc) — a partial
    * top-k aggregate via sort+limit on a vocab-sized table (never a
    * corpus window).
    */
  private def topMulti(counts: DataFrame, k: Int): DataFrame =
    counts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(k)

  /** Collect a (piece, cnt, logp_mu) model frame into the broadcastable
    * closure model. Loud on oversize — the 64k bound is the same
    * model-in-closure contract as Bpe.encode.
    */
  def collectModel(model: DataFrame, maxWordLen: Int): UnigramModel = {
    val rows = model.select("piece", "logp_mu").limit(65537).collect()
    require(rows.length <= 65536, "unigram model exceeds the 64k closure bound")
    new UnigramModel(rows.map(r => (r.getString(0), r.getLong(1))), maxWordLen)
  }

  /** Train the unigram model. Output: (piece, cnt, logp_mu), one row per
    * surviving piece — cnt is the piece's weighted count at the last
    * estimation, logp_mu its final micro-nat log-probability.
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxPieceLen: Int = 4,
      maxWordLen: Int = 16,
      seedSize: Int = 2048,
      iters: Int = 2): DataFrame = {
    require(vocabSize >= 2 && maxPieceLen >= 2 && iters >= 1 &&
      seedSize >= 1 && maxWordLen >= 1,
      s"bad params vocab=$vocabSize L=$maxPieceLen iters=$iters")
    val words = wordTable(df, textCol, maxWordLen)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var subs: DataFrame = null
    var chars0: DataFrame = null
    try {
      // seed substrings: every (start, len<=L) occurrence, freq-weighted
      subs = words.select(col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(w)), i ->
              transform(sequence(1, least($maxPieceLen, length(w) - i + 1)),
                l -> substring(w, i, l))))""")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      chars0 = subs.filter(length(col("piece")) === 1)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nChars = chars0.count()
      require(vocabSize > nChars,
        s"vocabSize $vocabSize must exceed the $nChars distinct characters")
      var model = withLogp(chars0.unionByName(
        topMulti(subs.filter(col("cnt") >= 2), seedSize)))
      var it = 0
      while (it < iters) {
        val m = collectModel(model, maxWordLen)
        val counts = words
          .select(col("freq"), explode(UnigramEncodeText(col("w"), m)).as("piece"))
          .groupBy("piece").agg(sum("freq").as("cnt"))
        // chars never drop (count floor 1); multi survive only if used
        val next =
          chars0.select("piece").join(counts, Seq("piece"), "left")
            .select(col("piece"), greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
            .unionByName(counts.filter(length(col("piece")) >= 2))
        model = withLogp(next.localCheckpoint(true,
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2))
        it += 1
      }
      // final prune + renormalize
      val pruned = model.select("piece", "cnt")
      val kept = pruned.filter(length(col("piece")) === 1)
        .unionByName(topMulti(pruned, vocabSize - nChars.toInt))
      withLogp(kept.localCheckpoint(true,
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2))
    } finally {
      words.unpersist(false)
      if (subs != null) subs.unpersist(false)
      if (chars0 != null) chars0.unpersist(false)
      ()
    }
  }

  /** Tokenize every document under a trained model frame — the encode
    * half. Pure map (model in closure): (idCol, pieces, n_pieces).
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      maxWordLen: Int = 16): DataFrame = {
    val m = collectModel(model, maxWordLen)
    df.select(col(idCol),
      UnigramEncodeText(col(textCol), m).as("pieces"))
      .select(col(idCol), col("pieces"),
        size(col("pieces")).cast("long").as("n_pieces"))
  }
}
