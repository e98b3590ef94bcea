package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last operator between a cleaned corpus and a
  * trainer: concatenate documents in a deterministic order and cut the
  * token stream into fixed-length context windows ("concat-and-chunk",
  * the GPT-lineage packing). The output is the per-document placement
  * map (global token offset + first/last example ids), which is all a
  * sharded tokenizer/writer needs to materialize examples in parallel.
  *
  * Scale shape: the global token prefix sum is the whole problem — a
  * bare `sum(n) OVER (ORDER BY id)` is a ONE-TASK sort of the corpus.
  * Here it runs as a chunked two-level scan (the asofJoinChunked /
  * position-engine scheme):
  *   1. ONE 1-row bounds job takes min/max id; chunk id =
  *      `min(chunks-1, floor((id-lo)/width))` — a PURE monotone
  *      function of id, so re-evaluation can never disagree and chunk
  *      order embeds in id order;
  *   2. per-chunk windows compute local prefix sums in parallel;
  *   3. chunk totals aggregate to a ≤`chunks`-row summary; the only
  *      unpartitioned window runs over THAT (never the corpus) to get
  *      each chunk's carry-in offset, which broadcast-joins back.
  * Every shuffle carries (id, n) longs — text never moves.
  */
object Pack {

  /** Placement map for packing `df` in ascending-`idCol` order into
    * windows of `contextLen` tokens (token = `Text.tokenCount`
    * whitespace semantics, the engine-wide convention).
    *
    * Output columns: idCol, n_tokens, tok_start (0-based global offset
    * of the doc's first token), ex_first/ex_last (ids of the context
    * windows the doc touches; a doc spanning a boundary appears in
    * both — the trainer-side convention where windows cut straight
    * through documents). Zero-token docs get ex_first = ex_last = null.
    *
    * Null ids are a contract error (raise_error, not a silent drop);
    * ids must be integral and unique — the order has to be total for
    * the packing to be reproducible.
    */
  def packOffsets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      contextLen: Long,
      chunks: Int = 256): DataFrame = {
    require(contextLen > 0, s"contextLen $contextLen must be positive")
    require(chunks >= 1 && chunks <= 4096, s"chunks must be in [1, 4096], got $chunks")
    graft.plans.TopKByScore.requireIntegralId(
      df.schema(idCol).dataType, "packOffsets")

    val counted = df.select(
      col(idCol).cast("long").as("__id"),
      Text.tokenCount(col(textCol)).cast("long").as("__n"))

    val bounds = counted.agg(min("__id"), max("__id")).first()
    if (bounds.isNullAt(0))
      return counted.select(col("__id").as(idCol), col("__n").as("n_tokens"),
        lit(0L).as("tok_start"), lit(null).cast("long").as("ex_first"),
        lit(null).cast("long").as("ex_last"))
    val lo = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - lo) / chunks + 1)
    val chunkOf: Column = when(col("__id").isNull,
        raise_error(lit("packOffsets: null id — ids must be a total order")))
      .otherwise(least(
        floor((col("__id") - lit(lo)).cast("double") / lit(width.toDouble))
          .cast("long"),
        lit(chunks - 1L)))

    val chunked = counted.withColumn("__c", chunkOf)
    val wLocal = Window.partitionBy(col("__c")).orderBy(col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = chunked.withColumn("__cum", sum(col("__n")).over(wLocal))

    // ≤ chunks rows: the ONLY unpartitioned window in the plan
    val wOff = Window.orderBy(col("__c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunked.groupBy("__c").agg(sum("__n").as("__t"))
      .withColumn("__before", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .drop("__t")

    val placed = local.join(broadcast(offsets), Seq("__c"))
      .withColumn("__start", col("__before") + col("__cum") - col("__n"))
    placed.select(
      col("__id").as(idCol),
      col("__n").as("n_tokens"),
      col("__start").as("tok_start"),
      when(col("__n") > 0,
        expr(s"__start div CAST($contextLen AS BIGINT)")).as("ex_first"),
      when(col("__n") > 0,
        expr(s"(__start + __n - 1) div CAST($contextLen AS BIGINT)"))
        .as("ex_last"))
  }

  /** Example-level view of [[packOffsets]]: one row per (context
    * window, document) pair with the in-window span — what a writer
    * shard consumes directly. Explodes each doc to its ex_first..ex_last
    * windows (a doc touches ⌈n/contextLen⌉+1 windows at most, so the
    * fan-out is bounded by the data, not the corpus).
    *
    * Columns: example_id, idCol, doc_from (first token of the doc that
    * lands in this window, 0-based within the doc), win_from (where it
    * lands, 0-based within the window), len.
    */
  def packExamples(
      df: DataFrame,
      idCol: String,
      textCol: String,
      contextLen: Long,
      chunks: Int = 256): DataFrame = {
    val offs = packOffsets(df, idCol, textCol, contextLen, chunks)
    offs.filter(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"), col("tok_start"),
        explode(sequence(col("ex_first"), col("ex_last"))).as("example_id"))
      .select(
        col("example_id"),
        col(idCol),
        greatest(col("example_id") * contextLen - col("tok_start"), lit(0L))
          .as("doc_from"),
        greatest(col("tok_start") - col("example_id") * contextLen, lit(0L))
          .as("win_from"),
        (least((col("example_id") + 1) * contextLen,
            col("tok_start") + col("n_tokens")) -
          greatest(col("example_id") * contextLen, col("tok_start")))
          .as("len"))
  }

  /** Per-document sliding-window chunking — the retrieval-side
    * counterpart of packOffsets (the RAG indexing shape: chunk → embed →
    * ANN): each document splits into overlapping `chunkTokens`-token
    * windows whose starts advance by `strideTokens`. Chunk 0 always
    * exists (an empty doc yields one empty chunk); the chunk count is
    * 1 + ⌈max(P − chunkTokens, 0) / strideTokens⌉, so every token lands
    * in at least one chunk and no start lies past the text. Pure
    * scan-side explode — no shuffle, no per-doc state: at 100 TB this
    * is a single narrow map stage feeding the embedder, and the
    * (start_tok, n_tokens) span makes each chunk traceable back to its
    * source offsets for citation.
    *
    * Output: (idCol, chunk_idx 0-based, start_tok 1-based, n_tokens,
    * chunk_text).
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 64,
      strideTokens: Int = 48): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1 && strideTokens <= chunkTokens,
      s"bad chunk geometry $chunkTokens/$strideTokens")
    val p = size(col("__w"))
    val nChunks = (ceil(greatest(p - chunkTokens, lit(0)) /
      lit(strideTokens.toDouble))).cast("int") + 1
    // posexplode outputs are __-aliased immediately: an input whose id
    // column is literally named "pos"/"col" must not ambiguate (the
    // same internal-name convention as Dedup/Retrieval).
    df.select(col(idCol), split(col(textCol), " ", -1).as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => i * strideTokens)).as(Seq("__pos", "__start")))
      .select(col(idCol),
        col("__pos").cast("int").as("chunk_idx"),
        (col("__start") + 1).cast("long").as("start_tok"),
        least(lit(chunkTokens), size(col("__w")) - col("__start")).cast("long")
          .as("n_tokens"),
        concat_ws(" ", slice(col("__w"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }
}
