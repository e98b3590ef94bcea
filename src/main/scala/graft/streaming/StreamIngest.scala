package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.core.Library
import graft.query.{NullSemantics, Resample}

/** Structured Streaming front door for the versioned store and the
  * resample operator.
  *
  * The reference ingests streams through "incomplete" (staged) segments
  * that a later job finalizes into a version (reference: library.py:952
  * `stage`, stream/incompletes.cpp, sort_and_finalize_staged_data
  * library.py:1873). The Spark-native shape is identical: each micro-batch
  * lands in the symbol's staging area via foreachBatch (cheap, append-only,
  * no version churn per batch), and a periodic/on-demand
  * `sortAndFinalizeStaged` sorts + commits one version (or `finalizeStaged`
  * splices already-sorted deltas with zero rewrite). Readers NEVER see
  * half-ingested data — staged files are invisible until the manifest
  * commit, the same isolation the reference gets from its key tree.
  *
  * Windowed resample-on-stream maps ResampleClause onto event-time
  * windows + watermark: the bucket arithmetic is shared with the batch
  * operator (graft.query.Resample), watermarking bounds state exactly the
  * way the reference's sorted single-pass bounds memory.
  */
object StreamIngest {

  /** Stage every micro-batch of `stream` into `symbol`. Call
    * `lib.sortAndFinalizeStaged(symbol, indexCol)` to publish a version.
    * Checkpointing gives exactly-once staging: a replayed batch re-stages
    * into a NEW uuid dir only if the previous attempt died before the
    * staging write finished, and finalize de-duplicates nothing — same
    * at-least-once-until-finalize contract as the reference's incompletes.
    *
    * `sortBatchesBy` range-sorts each micro-batch on the index before
    * staging (one small per-batch shuffle). For a time-ordered stream —
    * event time advancing across batches, the common ingest shape — the
    * staged deltas are then file-disjoint and sorted, so the CHEAP
    * `lib.finalizeStaged` splice (rename + manifest commit, zero rewrite)
    * publishes them instead of sortAndFinalizeStaged's full re-sort.
    */
  def stageSink(
      lib: Library,
      symbol: String,
      stream: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      sortBatchesBy: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = sortBatchesBy match {
          case Some(idx) =>
            batch.toDF().repartitionByRange(col(idx)).sortWithinPartitions(idx)
          case None => batch.toDF()
        }
        lib.stage(symbol, b)
        ()
      }

  /** Upsert every micro-batch into `symbol` by its index key (CDC-style
    * sink): matched rows update, new keys insert, rows outside the batch's
    * key range are never rewritten (Library.merge splices only
    * intersecting files). Unlike stageSink, each batch COMMITS a version —
    * use it when readers must see the stream's latest state, and stageSink
    * + finalize when ingest throughput matters more than visibility.
    * Batches must carry unique index keys (merge is keyed SQL MERGE).
    *
    * A missing symbol is WRITE-CREATED from the first non-empty batch when
    * `indexCol` is given (the fresh-CDC-stream-on-empty-store case);
    * without it the symbol must be pre-created — merge needs an existing
    * index to key on.
    */
  def mergeSink(
      lib: Library,
      symbol: String,
      stream: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      targetRows: Long = Library.DefaultTargetRows,
      indexCol: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          if (!lib.hasSymbol(symbol)) {
            val idx = indexCol.getOrElse(throw new NoSuchElementException(
              s"mergeSink: symbol $symbol does not exist — pass indexCol to " +
                "write-create it from the first batch, or pre-create it"))
            lib.write(symbol, batch.toDF(), Some(idx), targetRows)
          } else lib.merge(symbol, batch.toDF(), targetRows = targetRows)
        }
        ()
      }

  /** Streaming dedup-then-admit against a persisted MinHash index — the
    * full incremental-corpus loop ([[graft.functions.Dedup.buildMinhashIndex]])
    * as a sink. Each micro-batch:
    *   1. drops ids the corpus ALREADY holds (replay guard: a batch
    *      re-delivered after a partial commit re-admits nothing — id
    *      lookups prune the id-sorted corpus symbol's files),
    *   2. dedups WITHIN the batch (exact + n-gram Jaccard ≥ threshold,
    *      [[graft.functions.Dedup.dropNearDuplicates]]),
    *   3. drops batch docs with a verified near-duplicate in the corpus
    *      ([[graft.functions.Dedup.dedupAgainstIndex]]: LSH candidates
    *      from the index probe, exact verification against a
    *      candidate-pruned corpus read),
    *   4. appends the survivors to the corpus symbol AND their band rows
    *      to the index — so the NEXT batch dedups against them.
    * Per-batch cost is proportional to the batch (probe-pruned index
    * read + candidate-sized corpus slice), never the corpus — the shape
    * that admits a daily crawl drop into a 100 TB store.
    *
    * Consistency: corpus append and index append are two commits; a
    * crash between them leaves admitted docs unindexed for ONE batch
    * (they are still id-guarded on replay, and a later
    * [[graft.functions.Dedup.appendToMinhashIndex]] backfill or index
    * rebuild reconciles) — the same at-least-once-until-finalize
    * contract as [[stageSink]].
    */
  def dedupAdmitSink(
      lib: Library,
      stream: DataFrame,
      indexName: String,
      corpusSymbol: String,
      idCol: String,
      textCol: String,
      threshold: Double,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      targetRows: Long = Library.DefaultTargetRows,
      maxBucket: Int = 1000,
      maxProbeKeys: Int = 100000,
      maxGuardIds: Int = 1000000): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val b = batch.toDF().localCheckpoint(true)
          // Checkpoint-scoped replay guard on BOTH sink symbols (r20
          // review): the unseen-ids contract alone makes corpus appends
          // replay-safe, but a crash BETWEEN the corpus append and the
          // index fold would strand the batch's documents in the corpus
          // with no signatures — the replayed batch anti-joins them away
          // as "already seen" and the index misses them FOREVER, so
          // every future near-duplicate of those docs admits (silent
          // recall loss). The guard makes the gap detectable; the heal
          // branch below re-derives the stranded set and folds it.
          val g = Library.ReplayGuard.forCheckpoint(checkpoint, batchId,
            Some(batch.sparkSession.sparkContext.hadoopConfiguration))
          // probe the stamp across RECENT versions, not just the latest:
          // a maintenance commit (compact, writeMetadata, second writer)
          // landing between the crash and the restart erases the stamp
          // from the latest manifest, and a latest-only probe would take
          // the normal branch, anti-join the stranded docs away as
          // already-seen, and lose their signatures forever (ADVICE r20)
          def folded(sym: String): Boolean = lib.foldStamps(sym)
            .exists(Library.ReplayGuard.alreadyFolded(_, g))
          val stamp = Map(Library.ReplayGuardKey -> g.stampValue)
          if (!folded(s"${indexName}__bands")) {
            if (folded(corpusSymbol)) {
              // HEAL: this batch's corpus append landed, its index fold
              // did not. The stranded set is exactly (batch ∩ corpus)
              // minus ids the index knows — every completed batch keeps
              // index ids ⊇ corpus ids, so only the crashed append's
              // docs satisfy it. Batch rows carry the text the index
              // fold needs; corpus/index id columns are column-pruned
              // scans of metadata-scale tables.
              val inCorpus = b.join(
                lib.read(corpusSymbol).select(col(idCol)),
                Seq(idCol), "left_semi")
              val stranded = inCorpus.join(
                lib.read(s"${indexName}__bands").select(col("id").as(idCol))
                  .distinct(),
                Seq(idCol), "left_anti").localCheckpoint(true)
              if (stranded.limit(1).count() > 0)
                graft.functions.Dedup.appendToMinhashIndex(
                  lib, stranded, indexName, idCol, textCol, targetRows,
                  replayGuard = Some(g))
            } else {
              val ids = b.select(col(idCol)).distinct()
                .limit(maxGuardIds + 1).collect()
              // unseen-ids: bounded batches prune the corpus read by id
              // list; oversized ones fall back to a column-pruned anti-join
              val existing =
                if (ids.length > maxGuardIds) lib.read(corpusSymbol).select(col(idCol))
                else lib.read(corpusSymbol,
                  exprFilter = Some(graft.query.Expr.col(idCol).isin(
                    ids.map(_.get(0)).toIndexedSeq: _*))).select(col(idCol))
              val fresh = b.join(existing, Seq(idCol), "left_anti")
              val (sl, _, _, _) = graft.functions.Dedup.minhashMeta(lib, indexName)
              val selfDeduped = graft.functions.Dedup.dropNearDuplicates(
                fresh, idCol, textCol, shingleLen = sl, threshold = threshold)
              val admitted = graft.functions.Dedup.dedupAgainstIndex(
                lib, selfDeduped, indexName, corpusSymbol, idCol, textCol,
                threshold, maxBucket, maxProbeKeys).localCheckpoint(true)
              if (admitted.limit(1).count() > 0) {
                // corpus first, stamped: a crash after this lands in the
                // heal branch above on replay; index fold second, stamped
                // by appendToMinhashIndex itself
                lib.append(corpusSymbol, admitted, targetRows,
                  validateIndex = false, extraMetadata = stamp)
                graft.functions.Dedup.appendToMinhashIndex(
                  lib, admitted, indexName, idCol, textCol, targetRows,
                  replayGuard = Some(g))
              }
            }
          }
        }
        ()
      }

  /** Fold every micro-batch into the persisted RETRIEVAL indexes — the
    * live-ingest side of the q117/q137/q150 stack: the first non-empty
    * batch builds the BM25 index (stats + term-sorted postings) and the
    * positional index, every later batch folds in as an increment
    * ([[graft.functions.Retrieval.appendToBm25Index]] /
    * [[graft.functions.Retrieval.appendToPositionalIndex]]), so
    * `bm25Indexed` and `phraseSearch` answer over everything ingested
    * so far at any time. The final index state is BATCH-SPLIT-INVARIANT
    * (stats merge by exact sums, postings/positions are per-doc rows),
    * which is what lets the q158 gate hash it against the one-shot
    * full-corpus oracle regardless of how the stream was sliced.
    *
    * Replay contract: EXACTLY-ONCE per symbol — every fold commit is
    * stamped with its checkpoint-scoped batchId
    * ([[graft.core.Library.ReplayGuard]]), atomically with that
    * symbol's manifest CAS, and a replayed batch skips exactly the
    * symbols whose fold already landed; a stream restarted on a NEW
    * checkpoint is a new scope, so its restarted batch numbering is
    * never mistaken for replay. A crash
    * between the postings append and the stats write (or between the
    * BM25 and positional halves) therefore HEALS on replay instead of
    * double-appending postings (tf and df inflation) — the same
    * built-in guard [[dedupAdmitSink]] has always had, closing the
    * asymmetry VERDICT r17 flagged. (Re-delivery of the same DOCUMENT
    * in a *different* batch is still the unseen-ids contract — that is
    * admission control's job, not the index fold's.)
    */
  def retrievalIndexSink(
      lib: Library,
      stream: DataFrame,
      name: String,
      idCol: String,
      textCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      targetRows: Long = Library.DefaultTargetRows,
      positional: Boolean = true): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val b = batch.toDF().localCheckpoint(true)
          // checkpoint-scoped guard: batchIds are monotonic only within
          // one checkpoint, so the stamp carries the checkpoint identity
          // — a FRESH checkpoint against an existing index is a new
          // stream whose batch 0 must fold, not a replay to skip
          val g = Some(Library.ReplayGuard.forCheckpoint(checkpoint, batchId,
            Some(batch.sparkSession.sparkContext.hadoopConfiguration)))
          // the guarded folds write-create missing symbols, so the
          // first batch builds and every batch (first included) is
          // replay-idempotent per symbol — no build-vs-append branch
          // for a crash to land between
          graft.functions.Retrieval.appendToBm25Index(
            lib, b, name, idCol, textCol, targetRows, replayGuard = g)
          if (positional)
            graft.functions.Retrieval.appendToPositionalIndex(
              lib, b, name, idCol, textCol, targetRows, replayGuard = g)
        }
        ()
      }

  /** Fold every micro-batch into a persisted corpus-health ledger
    * ([[graft.functions.CorpusStats.buildLedger]]) — the always-on
    * health dashboard over live ingest: per-domain counts/extrema and
    * HLL vocabulary registers advance one bounded symbol write per
    * batch, and `readLedger`/`ledgerDrift` answer "what changed today"
    * at any time without scanning history. Creates the ledger from the
    * first non-empty batch. Replay contract: EXACTLY-ONCE per symbol —
    * every fold commit carries a checkpoint-scoped batchId stamp
    * atomically with its symbol's manifest CAS
    * ([[retrievalIndexSink]]'s guard), so a crash-replayed micro-batch
    * cannot double-count the sums half (the HLL half was always
    * idempotent by register max).
    */
  def ledgerSink(
      lib: Library,
      stream: DataFrame,
      textCol: String,
      domainCol: String,
      name: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      p: Int = 12,
      portable: Boolean = false): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val b = batch.toDF().localCheckpoint(true)
          val g = Some(Library.ReplayGuard.forCheckpoint(checkpoint, batchId,
            Some(batch.sparkSession.sparkContext.hadoopConfiguration)))
          if (!lib.hasSymbol(s"${name}__meta"))
            graft.functions.CorpusStats.buildLedger(
              lib, b, textCol, domainCol, name, p, portable, replayGuard = g)
          else
            graft.functions.CorpusStats.mergeIntoLedger(
              lib, b, textCol, domainCol, name, replayGuard = g)
        }
        ()
      }

  /** Streaming resample: per-bucket aggregates over an event-time ns-long
    * ts column, emitting a bucket only once the watermark passes its end
    * (append mode ⇒ results match the batch resample on the same data).
    *
    * aggs: (outName, inCol, op) with the batch operator's op set
    * (sum/mean/min/max/count; first/last need the sorted kernel and are
    * batch-only).
    */
  def resampleStream(
      stream: DataFrame,
      tsCol: String,
      rule: String,
      aggs: Seq[(String, String, String)],
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val ruleNs = Resample.ruleToNs(rule)
    val schema = stream.schema
    // Event time must be a TimestampType for watermarking; ns → µs.
    val withEvent = stream
      .withColumn("__event", graft.core.Ts.toEventTime(tsCol, schema(tsCol).dataType))
      .withWatermark("__event", watermarkDelay)
    val bucket = Resample.bucketStart(
      graft.core.Ts.toNs(col(tsCol), schema(tsCol).dataType), ruleNs, Resample.Left, 0L)
    val cols = aggs.map { case (out, in, op) =>
      require(op != "first" && op != "last", s"$op is batch-only (needs sorted input)")
      NullSemantics.agg(op, col(in), schema(in).dataType, out)
    }
    // Group on BOTH the ns bucket and a window over the event time: the
    // window carries the watermark through the aggregation (Spark requires
    // the event-time column in streaming group keys); the ns bucket keeps
    // label arithmetic identical to the batch operator. One bucket maps to
    // exactly one window when the rule divides the window duration.
    val windowDur = s"${math.max(1L, ruleNs / 1000000L)} milliseconds"
    val out = withEvent
      .groupBy(window(col("__event"), windowDur), bucket.as(tsCol))
      .agg(cols.head, cols.tail: _*)
      .drop("window")
    // Batch-parity labels: timestamp inputs get timestamp bucket labels
    // (QueryBuilder.resample does the same conversion).
    val tsType = schema(tsCol).dataType
    if (graft.core.Ts.isTs(tsType))
      out.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` div 1000")).cast(tsType))
    else out
  }

  /** Streaming sessionization: the watermarked twin of
    * graft.operators.Sessionize — session_window merges events with gaps
    * under `gap`, and a session emits once the watermark passes its close.
    */
  def sessionsStream(
      stream: DataFrame,
      tsCol: String,
      keys: Seq[String],
      gap: String,
      aggs: Seq[(String, String, String)],
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val schema = stream.schema
    val cols = aggs.map { case (out, in, op) =>
      NullSemantics.agg(op, col(in), schema(in).dataType, out)
    }
    stream
      .withColumn("__event", graft.core.Ts.toEventTime(tsCol, schema(tsCol).dataType))
      .withWatermark("__event", watermarkDelay)
      .groupBy(keys.map(col) :+ session_window(col("__event"), gap): _*)
      .agg(cols.head, cols.tail: _*)
      .withColumn("session_start", unix_micros(col("session_window.start")))
      .drop("session_window", "__event")
      .select((keys.map(col) :+ col("session_start")) ++ aggs.map(a => col(a._1)): _*)
  }

  /** Streaming exact dedup: first occurrence per content fingerprint wins;
    * watermarked state so the dedup map is bounded by the delay horizon
    * (the unbounded variant of Dedup.dropExactDuplicates is batch-only).
    */
  def dropDuplicatesStream(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String = "10 seconds"): DataFrame =
    stream
      .withColumn("__event",
        graft.core.Ts.toEventTime(tsCol, stream.schema(tsCol).dataType))
      .withWatermark("__event", watermarkDelay)
      .withColumn("__fp", graft.functions.Text.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__event", "__fp")

  /** Streaming PII scrub: the stateless twin of Pii.scan — per-document
    * category counts plus redacted text on a live ingest stream. Pure
    * codegen row map (no state, no watermark), so it composes with any
    * downstream streaming stage and any output mode; a micro-batch's
    * output is row-identical to running the batch scan on the same rows
    * (pinned in StreamingSpec).
    */
  def piiScrubStream(
      stream: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    graft.functions.Pii.scanSelect(stream, idCol, textCol)

  /** Streaming twin of [[graft.functions.Clean.cleanCorpus]]: the whole
    * rule set is a stateless narrow map+filter (fused kernels, zero
    * aggregation), so it applies to an unbounded stream unchanged —
    * live-ingest corpus hygiene before anything stateful (dedup,
    * budgets) sees the document. Same output contract as the batch
    * operator (StreamingSpec pins row identity).
    */
  def cleanStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      rules: graft.functions.Clean.Rules): DataFrame =
    graft.functions.Clean.cleanCorpus(stream, idCol, textCol, rules)

  /** Streaming substring decontamination: drop arriving documents that
    * share ANY normalized word-n-gram with the (BATCH, bounded) eval
    * set. The batch operator's explode → semi-join → distinct →
    * anti-join chain cannot run on an unbounded stream; this is the
    * pure-FILTER formulation — eval shingles collect once (hard-bounded
    * by `maxShingles`), ride the closure, and each arriving doc is a
    * stateless `shingle_hit` membership test that early-exits on the
    * first overlap. Row-identical to Dedup.decontaminateSubstring on
    * the same data (StreamingSpec pins it).
    */
  def decontaminateSubstringStream(
      stream: DataFrame,
      contam: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      maxShingles: Int = 1 << 22): DataFrame = {
    import org.apache.spark.sql.functions._
    val shingles = contam
      .select(explode(graft.plans.DistinctShingles(col(textCol), shingleLen)).as("s"))
      .distinct()
      .limit(maxShingles + 1)
      .collect().map(_.getString(0))
    require(shingles.length <= maxShingles,
      s"eval set exceeds $maxShingles distinct shingles — not a bounded " +
        "contamination set; raise maxShingles deliberately or shrink the eval set")
    val set = new graft.plans.ShingleSet(shingles)
    // null text has no shingles → the batch anti-join KEEPS such docs;
    // coalesce preserves that here (a bare !hit would null out and drop)
    stream.filter(
      !coalesce(graft.plans.ShingleHit(col(textCol), shingleLen, set), lit(false)))
  }

  /** Row shape of [[tokenBudgetStream]] (both its internal typed stream
    * and its output). NOT private: the Encoder's generated projections
    * must be able to instantiate it from codegen'd classes.
    */
  case class AdmittedDoc(domain: String, doc_id: Long, text: String, n_tokens: Long)

  /** Streaming per-domain token-budget admission: admit documents, in
    * doc-id order within each micro-batch, while the domain's RUNNING
    * token total (counted over every document seen, admitted or not)
    * stays within `tokenBudget`; once a domain's stream has carried
    * `tokenBudget` tokens, everything later is dropped.
    *
    * This is the live-ingest twin of [[graft.functions.Sampling
    * .sampleTokenBudget]]: the batch operator down-samples a KNOWN corpus
    * to a token target; this one caps an UNBOUNDED arriving stream — "stop
    * taking web-crawl tokens for domain X once we have a billion" — a
    * decision that is inherently sequential per domain and therefore
    * cannot be a stateless filter or a built-in windowed aggregate. It is
    * the textbook `flatMapGroupsWithState` shape: one long per domain of
    * state (the running total), Append-mode output, no timeout (budgets
    * don't expire).
    *
    * Determinism: within one micro-batch a domain's documents are
    * processed in doc-id order (the group iterator carries no order
    * guarantee, so the group sorts its batch slice — bounded by the
    * micro-batch size, which admission control sizes anyway). Because the
    * running total counts every seen document, the admitted set over a
    * single-batch stream equals the SQL prefix
    * `sum(tokens) OVER (PARTITION BY domain ORDER BY id) <= budget` —
    * the oracle the driver gate replays; multi-batch incremental behavior
    * is pinned by StreamingSpec.
    *
    * Scale shape: state is ONE counter per domain (not per doc); the only
    * shuffle is the groupByKey exchange keyed on domain. A heavily skewed
    * domain serializes its own admission — unavoidable for sequential
    * admission semantics — but never buffers more than its slice of one
    * micro-batch.
    */
  def tokenBudgetStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      tokenBudget: Long): Dataset[AdmittedDoc] = {
    require(tokenBudget > 0, s"tokenBudget $tokenBudget must be positive")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(
        col(domainCol).cast("string").as("domain"),
        col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"),
        graft.functions.Text.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .as[AdmittedDoc]
      .groupByKey(_.domain)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, docs: Iterator[AdmittedDoc], state: GroupState[Long]) =>
          var total = state.getOption.getOrElse(0L)
          val admitted = docs.toSeq.sortBy(_.doc_id).flatMap { d =>
            total += d.n_tokens
            if (total <= tokenBudget) Some(d) else None
          }
          state.update(total)
          admitted.iterator
      }
  }
}
