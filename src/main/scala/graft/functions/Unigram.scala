package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Self-trained unigram language-model operators: the classic CCNet-style
  * "perplexity proxy" quality signal and tokenizer-vocabulary construction,
  * both trained on the corpus itself in one counter pass.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - Pass 1 aggregates the corpus to TOKEN COUNTS — partial (map-side)
  *     aggregation means the shuffle is bounded by the VOCABULARY, not the
  *     corpus. On web-scale text the vocabulary itself is NOT small
  *     (10⁸–10⁹ distinct tokens: typos, URLs, numbers), so nothing below
  *     ever collects or single-task-sorts the full vocab either:
  *     `logProbScore` collects only the ≤ 1/minShare KEPT tokens, and
  *     `coverageVocab` computes its ordered prefix-sum with a distributed
  *     two-level scheme (range-partition + per-partition window +
  *     #partitions-row offset window).
  *   - Pass 2 (scoring) re-scans the corpus and BROADCASTS the model; the
  *     per-doc score aggregates partially (explode preserves partition
  *     locality, so each doc contributes ~1 row to the shuffle).
  *
  * Tokenization is `Text.tokens` (single-space split) so the DuckDB oracle's
  * `string_split(text, ' ')` replays it exactly.
  */
object Unigram {

  /** Exact micro-unit mean: (sum / n) in 1e-6 units, ROUNDED HALF-AWAY
    * IN INTEGER SPACE — floor((2·|sum| + n) / (2n)), sign restored —
    * then one exact division by 1e6. The naive `round(sum/1e6/n, 6)`
    * rounds a BINARY double whose shortest decimal print can sit on the
    * other side of the half boundary (0.0079195 prints as the half but
    * IS 0.00791949…), so Spark's decimal-string round and any
    * binary-rounding engine disagree on exact ties; the integer form is
    * engine-independent. Exactness: quotient distance from an integer
    * is ≥ 1/(2n) ≫ double ulp, and the final /1e6 of an integer < 2^53
    * is correctly rounded — valid while 2·|sum| < 2^53 (per-doc micro
    * sums are ≤ ~3e13 even at 10⁶ tokens/doc).
    */
  private[functions] def microMean(s: Column, n: Column): Column = {
    val q = floor((abs(s) * 2 + n) / (n * 2))
    when(s < 0, -q).otherwise(q) / lit(1e6)
  }

  /** (tok, c) counts over the corpus — the counter shuffle is bounded by the
    * vocabulary. `Kernels.spread` buys kernel parallelism on split-starved
    * scans (see Kernels.scala).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Kernels.spread(df, Seq(idCol, textCol))
      .select(explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("c"))

  /** Per-document mean unigram log-probability — the self-trained
    * perplexity proxy used for corpus quality filtering (higher = more
    * typical text; boilerplate scores high, lorem-ipsum noise scores low).
    *
    * The model keeps tokens whose corpus share is >= `minShare` (a RELATIVE
    * cutoff, so the vocabulary is stable across corpus sizes); out-of-vocab
    * tokens score at a floor of ln(0.5 / total) — strictly below any
    * retained token. Output: (idCol, lp_mean) rounded to 6 places.
    *
    * The model build never collects the full vocabulary (a driver OOM at
    * web scale): `total` is a 1-row aggregate, the minShare cutoff filters
    * DISTRIBUTEDLY, and only the kept set — ≤ ceil(1/minShare) tokens BY
    * CONSTRUCTION (each keeps ≥ minShare of the total mass) — reaches the
    * driver. The counts aggregate is cached vocab-sized between the two
    * jobs so the corpus is still scanned exactly once for the model; the
    * broadcast side rides a 1-partition RDD, not a LocalRelation, to skip
    * the per-broadcast collect job (SURVEY §12).
    *
    * Reference behavior note: the reference engine has no LM scorer; this
    * belongs to the training-data-pipeline family (CCNet / Gopher-style
    * quality signals) built on the same counter-shuffle shapes as
    * `CorpusStats` (cpp/arcticdb has no analogue; see SURVEY §2 extras).
    */
  def logProbScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minShare: Double): DataFrame = {
    // minShare 0 keeps (and collects) the whole vocabulary — legitimate on
    // bounded-vocab corpora, a driver OOM on web text; the collect bound
    // below only holds for minShare > 0.
    require(minShare >= 0 && minShare <= 1, s"minShare $minShare not in [0,1]")
    val spark = df.sparkSession
    val counts = tokenCounts(df, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (total, kept) =
      try {
        val tot = counts.agg(sum(col("c"))).head match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getLong(0).toDouble
        }
        val k = counts
          .where(col("c").cast("double") >= lit(minShare) * lit(tot))
          .collect()
          .map(r => (r.getString(0), math.log(r.getLong(1) / tot)))
        (tot, k)
      } finally counts.unpersist(false)
    val floorLp = math.log(0.5 / math.max(total, 1.0))
    val vocab = spark
      .createDataFrame(spark.sparkContext.parallelize(kept.toSeq, 1))
      .toDF("tok", "lp")
    Kernels.spread(df, Seq(idCol, textCol))
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(idCol)
      .agg(round(avg(coalesce(col("lp"), lit(floorLp))), 6).as("lp_mean"))
  }

  /** The kept model vocabulary (tok, ln-prob) — exposed so specs can pin
    * the driver-collect bound: at most ceil(1/minShare) + 1 entries
    * regardless of how heavy the corpus vocabulary's tail is.
    */
  private[graft] def keptVocab(
      df: DataFrame, idCol: String, textCol: String, minShare: Double): Array[(String, Double)] = {
    val counts = tokenCounts(df, idCol, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val tot = counts.agg(sum(col("c"))).head.getLong(0).toDouble
      counts.where(col("c").cast("double") >= lit(minShare) * lit(tot))
        .collect()
        .map(r => (r.getString(0), math.log(r.getLong(1) / tot)))
    } finally counts.unpersist(false)
  }

  /** Smallest vocabulary prefix (by frequency desc, token asc) covering at
    * least `coverage` of the corpus token mass — tokenizer-vocab
    * construction with a deterministic tie order. A row is kept while the
    * mass BEFORE it is still short of the target, so the first row crossing
    * the threshold is included and nothing after it. Output:
    * (tok, freq, cum_share) ordered by the same (freq desc, tok) rank.
    *
    * The ordered prefix-sum over the vocabulary is DISTRIBUTED — a web
    * corpus has 10⁸–10⁹ distinct tokens, so a bare
    * `Window.orderBy(freq desc)` (one task sorting and buffering the whole
    * vocab) is a scale-killer. Classic two-level scheme instead:
    *   1. range-partition the vocab by the output order (c desc, tok asc) —
    *      partition i holds ranks strictly before partition i+1,
    *   2. running sum WITHIN each partition (`Window.partitionBy(__pid)` —
    *      parallel, one partition per task),
    *   3. offset each partition by the mass of preceding partitions — the
    *      only unpartitioned window runs over the #partitions-row summary,
    *      never the vocab (PlanSpec pins this).
    * The corpus itself still only feeds the counter aggregate; the shared
    * range-exchange subtree is reused across the two branches
    * (ReusedExchange), so pass 1 executes once.
    */
  def coverageVocab(
      df: DataFrame,
      idCol: String,
      textCol: String,
      coverage: Double): DataFrame = {
    require(coverage > 0 && coverage <= 1, s"coverage $coverage not in (0,1]")
    val parts = tokenCounts(df, idCol, textCol)
      .repartitionByRange(col("c").desc, col("tok").asc)
      .withColumn("__pid", spark_partition_id())
    val local = parts.withColumn("__run",
      sum(col("c")).over(Window.partitionBy("__pid")
        .orderBy(col("c").desc, col("tok").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = parts.groupBy("__pid").agg(sum(col("c")).as("__psum"))
      .withColumn("__before",
        coalesce(sum(col("__psum")).over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__t", sum(col("__psum")).over(Window.partitionBy()))
      .select("__pid", "__before", "__t")
    local.join(broadcast(offsets), "__pid")
      .withColumn("cum", col("__before") + col("__run"))
      .where((col("cum") - col("c")).cast("double") < lit(coverage) * col("__t"))
      .select(
        col("tok"),
        col("c").as("freq"),
        round(col("cum").cast("double") / col("__t"), 6).as("cum_share"))
      .orderBy(col("freq").desc, col("tok"))
  }

  /** Per-document mean bigram log-probability with STUPID BACKOFF
    * (Brants et al. 2007, "Large Language Models in Machine Translation"
    * — the backoff that scales because it needs no discount tuning):
    *
    *   score(w_i | w_{i-1}) = ln(c(w_{i-1} w_i) / c(w_{i-1}))   if the
    *                          bigram is in the kept model,
    *                        = ln(0.4 · c(w_i) / total)           else if
    *                          w_i is a kept unigram,
    *                        = ln(0.4 · 0.5 / total)              else.
    *   The first token scores on the plain unigram path (no backoff
    *   penalty): ln(c(w_1)/total), OOV → ln(0.5/total).
    *
    * Model bounds (the 100 TB discipline, as logProbScore): kept bigrams
    * need ≥ `minShare` of the total bigram mass and kept unigrams
    * ≥ `minShare` of token mass — each set is ≤ ceil(1/minShare) entries
    * BY CONSTRUCTION, so the two collects/broadcasts are bounded however
    * heavy the corpus tail; counts aggregate distributedly first.
    *
    * Determinism: every model entry's ln is quantized to micro-nat LONGS
    * at build; the per-doc sum is integer (order-free); ONE division at
    * the end. Output: (idCol, n_tokens, lp_mean).
    *
    * Bigram extraction is `posexplode(arrays_zip(slice, slice))` — pure
    * codegen, no self-join, no interpreted HOF; only (doc_id, w1, w2)
    * strings shuffle, never documents.
    */
  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minShare: Double): DataFrame =
    bigramScore(df, idCol, textCol, bigramModel(df, idCol, textCol, minShare))

  /** A trained stupid-backoff bigram model: two broadcast-sized score
    * tables (micro-nat long scores) plus the OOV floors. Both tables are
    * ≤ ceil(1/minShare) rows BY CONSTRUCTION (see [[bigramModel]]), so a
    * model always broadcasts however heavy the training corpus.
    */
  final case class BigramModel private[functions] (
      uniModel: DataFrame, // (tok, lp_first, lp_back)
      bigModel: DataFrame, // (w1, w2, lp_big)
      floorFirst: Long,
      floorBack: Long)

  /** Train the [[bigramLogProb]] model on `ref` WITHOUT scoring — the
    * CCNet split (Wenzek et al. 2020, "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data"): the LM is trained on a
    * trusted reference corpus and applied to the whole crawl, so model
    * construction and scoring must be separable. Counts aggregate
    * distributedly; only the ≥ minShare survivors collect.
    */
  def bigramModel(
      ref: DataFrame,
      idCol: String,
      textCol: String,
      minShare: Double): BigramModel = {
    require(minShare > 0 && minShare <= 1,
      s"minShare $minShare not in (0,1] — 0 would unbound the model collect")
    val spark = ref.sparkSession
    // half-AWAY-FROM-ZERO micro-nat quantization: Math.round alone rounds
    // negative ties toward +∞ (floor(x+.5)), but model log-probs are
    // negative and the oracle's round() is half-away-from-zero — the
    // sign-symmetric form matches DuckDB (and Spark's SQL round) exactly
    def micro(x: Double): Long = {
      val y = x * 1e6
      if (y >= 0) Math.round(y) else -Math.round(-y)
    }

    val toks = Kernels.spread(ref, Seq(idCol, textCol))
      .select(col(idCol), Text.tokens(col(textCol)).as("__w"))
    val uniCnt = toks.select(explode(col("__w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bigCnt = toks
      .select(
        slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))).as("__a"),
        slice(col("__w"), lit(2), greatest(size(col("__w")) - 1, lit(0))).as("__b"))
      .select(explode(arrays_zip(col("__a"), col("__b"))).as("bg"))
      .select(col("bg.__a").as("w1"), col("bg.__b").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (total, uniKept, bigKept) =
      try {
        val tot = uniCnt.agg(sum(col("c"))).head match {
          case r if r.isNullAt(0) => 0.0 // empty corpus: sum over no rows is null
          case r => r.getLong(0).toDouble
        }
        val totB = bigCnt.agg(sum(col("cb"))).head match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getLong(0).toDouble
        }
        val uk = uniCnt
          .where(col("c").cast("double") >= lit(minShare) * lit(tot))
          .collect()
          .map(r => (r.getString(0), r.getLong(1)))
        // kept-bigram scores divide by the FULL unigram count of w1 —
        // which need not itself clear the unigram cutoff, so it is read
        // from the (distributed) unigram aggregate via a join, never
        // from the kept set
        val bk = bigCnt
          .where(col("cb").cast("double") >= lit(minShare) * lit(totB))
          .join(uniCnt.withColumnRenamed("tok", "w1").withColumnRenamed("c", "c1"),
            Seq("w1"))
          .collect()
          .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
            micro(math.log(r.getAs[Long]("cb").toDouble / r.getAs[Long]("c1")))))
        (tot, uk, bk)
      } finally { uniCnt.unpersist(false); bigCnt.unpersist(false) }

    val floorFirst = micro(math.log(0.5 / math.max(total, 1.0)))
    val floorBack = micro(math.log(0.4 * 0.5 / math.max(total, 1.0)))
    val uniModel = spark.createDataFrame(spark.sparkContext.parallelize(
        uniKept.toSeq.map { case (t, c) =>
          (t, micro(math.log(c / total)), micro(math.log(0.4 * c / total)))
        }, 1)).toDF("tok", "lp_first", "lp_back")
    val bigModel = spark.createDataFrame(
      spark.sparkContext.parallelize(bigKept.toSeq, 1)).toDF("w1", "w2", "lp_big")
    BigramModel(uniModel, bigModel, floorFirst, floorBack)
  }

  /** Score `df` under a trained [[BigramModel]] — the apply half of
    * [[bigramLogProb]] (one corpus scan, both model tables broadcast,
    * integer micro-nat per-doc sums → ONE final division). Output:
    * (idCol, n_tokens, lp_mean).
    */
  def bigramScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: BigramModel): DataFrame = {
    val toks = Kernels.spread(df, Seq(idCol, textCol))
      .select(col(idCol), Text.tokens(col(textCol)).as("__w"))
    toks
      // zip (null +: w[1..n-1]) with w: per position i, prev = w[i-1]
      // (null at i=1), cur = w[i]. Both zip inputs are pre-named columns
      // so the struct field names are stable ("__p", "__w").
      .select(col(idCol), col("__w"),
        concat(array(lit(null).cast("string")),
          slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0)))).as("__p"))
      .select(col(idCol), size(col("__w")).cast("long").as("__n"),
        posexplode(arrays_zip(col("__p"), col("__w"))))
      .select(col(idCol), col("__n"), (col("pos") + 1).as("__i"),
        col("col.__p").as("__prev"), col("col.__w").as("__cur"))
      .join(broadcast(model.bigModel),
        col("__prev") === col("w1") && col("__cur") === col("w2"), "left")
      .join(broadcast(model.uniModel), col("__cur") === col("tok"), "left")
      .select(col(idCol), col("__n"),
        when(col("__i") === 1, coalesce(col("lp_first"), lit(model.floorFirst)))
          .otherwise(coalesce(col("lp_big"), col("lp_back"), lit(model.floorBack)))
          .as("__term"))
      .groupBy(idCol)
      .agg(max("__n").as("n_tokens"), sum("__term").as("__s"))
      .select(col(idCol), col("n_tokens"),
        microMean(col("__s"), col("n_tokens")).as("lp_mean"))
  }

  /** Multinomial Naive-Bayes quality classifier — the GPT-3 data-filter
    * shape (Brown et al. 2020, Appendix A: a classifier trained
    * high-quality-vs-crawl scores every document): token-count models
    * of a POSITIVE reference (curated text) and a NEGATIVE reference
    * (raw crawl), per-document mean log-likelihood-ratio
    *
    *   llr(w) = ln p_pos(w) − ln p_neg(w),
    *   p_c(w) = (c_c(w) + 1) / (total_c + V + 1)   (Laplace; OOV ⇒ c=0)
    *
    * where V is the kept vocabulary — tokens holding ≥ `minShare` of
    * EITHER class's token mass, so the model is ≤ 2·ceil(1/minShare)
    * rows BY CONSTRUCTION and always broadcasts (the [[bigramModel]]
    * discipline); counts aggregate distributedly first. Every llr is
    * quantized to micro-nat longs, per-doc sums are integer
    * (order-free), ONE division at the end. Positive scores read
    * "looks like the curated reference". Output: (idCol, n_tokens,
    * llr_mean) rounded to 6.
    */
  def nbQualityScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      posRef: DataFrame,
      negRef: DataFrame,
      minShare: Double = 0.001): DataFrame = {
    require(minShare > 0 && minShare <= 1,
      s"minShare $minShare not in (0,1] — 0 would unbound the model collect")
    val spark = df.sparkSession
    def micro(x: Double): Long = {
      val y = x * 1e6
      if (y >= 0) Math.round(y) else -Math.round(-y)
    }
    def classCounts(ref: DataFrame): DataFrame =
      tokenCounts(ref, idCol, textCol)
    val pc = classCounts(posRef).persist(StorageLevel.MEMORY_AND_DISK)
    val nc = classCounts(negRef).persist(StorageLevel.MEMORY_AND_DISK)
    val (model, floorLlr) =
      try {
        def total(c: DataFrame): Double = c.agg(sum(col("c"))).head match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getLong(0).toDouble
        }
        val (tp, tn) = (total(pc), total(nc))
        // kept = union of the two per-class ≥minShare sets, with BOTH
        // counts read from the full (distributed) aggregates — a token
        // can clear the cutoff in one class and be rare in the other
        val kept = pc.select(col("tok"), col("c").as("cp"))
          .join(nc.select(col("tok"), col("c").as("cn")), Seq("tok"), "full")
          .select(col("tok"),
            coalesce(col("cp"), lit(0L)).as("cp"),
            coalesce(col("cn"), lit(0L)).as("cn"))
          .where(col("cp").cast("double") >= lit(minShare) * lit(tp) ||
            col("cn").cast("double") >= lit(minShare) * lit(tn))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val v = kept.length.toDouble
        def lp(c: Long, tot: Double): Double =
          math.log((c + 1).toDouble / (tot + v + 1.0))
        val entries = kept.toSeq.map { case (t, cp, cn) =>
          (t, micro(lp(cp, tp) - lp(cn, tn)))
        }
        val fl = micro(lp(0, tp) - lp(0, tn))
        (spark.createDataFrame(
          spark.sparkContext.parallelize(entries, 1)).toDF("tok", "llr"), fl)
      } finally { pc.unpersist(false); nc.unpersist(false) }
    Kernels.spread(df, Seq(idCol, textCol))
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
      .join(broadcast(model), Seq("tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("llr"), lit(floorLlr))).as("__s"))
      .select(col(idCol), col("n_tokens"),
        microMean(col("__s"), col("n_tokens")).as("llr_mean"))
  }

  /** GPT-3's Pareto admission (Brown et al. 2020, Appendix A), hash-
    * derandomized: a document is kept iff
    *
    *   score > 1 − ((1 − u)^(−1/α) − 1),   u = md5-uniform in [0,1)
    *
    * — the classic "keep the high-scoring mass but admit a heavy tail
    * of low scorers" mix that avoids collapsing the corpus onto the
    * classifier's mode. `u` is the first 12 hex digits of
    * md5(seed:id) as a 48-bit fraction, so admission is deterministic
    * in the id, engine-portable, and a pure codegen'd filter (the
    * [[hashSample]] discipline — no rand(), no partition sensitivity).
    * The Pareto threshold is rounded to 6 places before the compare so
    * both sides of the oracle replay compute identical doubles.
    */
  def paretoAdmitCond(
      idCol: Column, score: Column, alpha: Double, seed: Long): Column = {
    require(alpha > 0, s"alpha $alpha must be positive")
    val u = conv(substring(
        md5(concat_ws(":", lit(seed.toString), idCol.cast("string"))), 1, 12),
        16, 10).cast("double") / lit(281474976710656.0) // 2^48
    score > round(lit(1.0) - (pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)), 6)
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020 §4.4): train
    * the stupid-backoff bigram LM on a TRUSTED REFERENCE corpus `ref`
    * (CCNet uses Wikipedia), score every document of `df`, and bucket
    * each into head / middle / tail at the `headFrac`/`midFrac`
    * percentile cut WITHIN its `byCol` group (CCNet cuts per language —
    * a fixed global threshold would empty low-resource languages).
    * Lower perplexity = higher lp_mean = better; rank 1 is the best doc
    * of its group.
    *
    * Ranking is [[Sampling.rankByScore]] — the two-level distributed
    * rank (sub-buckets are a pure function of the score) — so no task
    * ever buffers a whole language; group sizes join back from a
    * counter aggregate. Deterministic end to end: lp_mean is micro-nat
    * integer math (order-free sums, one division, round 6), ranks break
    * ties by id, and the cut `rank ≤ ceil(frac · n)` replays exactly in
    * the oracle from the same doubles.
    *
    * Output: (idCol, byCol, n_tokens, lp_mean, ppl, bucket) — ppl is
    * round(exp(−lp_mean), 6), the conventional reporting unit. Docs the
    * scorer drops (null text ⇒ no token rows) are absent, as in
    * [[bigramLogProb]].
    */
  def perplexityBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      byCol: String,
      ref: DataFrame,
      minShare: Double = 0.001,
      headFrac: Double = 1.0 / 3,
      midFrac: Double = 2.0 / 3): DataFrame = {
    require(headFrac > 0 && headFrac <= midFrac && midFrac <= 1,
      s"fractions ($headFrac, $midFrac) must satisfy 0 < head <= mid <= 1")
    val scored = bigramScore(df, idCol, textCol,
      bigramModel(ref, idCol, textCol, minShare))
      .join(df.select(col(idCol), col(byCol)), Seq(idCol))
    val ranks = Sampling.rankByScore(
      scored, idCol, Some(byCol), col("lp_mean"), descending = true)
    val sizes = scored.groupBy(byCol).agg(count(lit(1)).as("__gn"))
    scored
      .join(ranks.select(col(idCol), col("rank").as("__r")), Seq(idCol))
      .join(broadcast(sizes), Seq(byCol))
      .select(col(idCol), col(byCol), col("n_tokens"), col("lp_mean"),
        round(exp(-col("lp_mean")), 6).as("ppl"),
        when(col("__r") <= ceil(lit(headFrac) * col("__gn")), lit("head"))
          .when(col("__r") <= ceil(lit(midFrac) * col("__gn")), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Per-document token-distribution statistics: Shannon entropy (nats)
    * of the document's OWN unigram distribution plus the type-token
    * ratio — the cheap "is this text lexically diverse or a token loop"
    * quality signals (low entropy ⇒ repetitive/templated; the rolling
    * repetition ratio q56 sees n-gram structure, this sees the bag).
    *
    * Shape: explode → (doc, tok) count → doc re-aggregate: two shuffles,
    * both keyed by (id[, token]) — the full text never shuffles, and
    * partial aggregation bounds the first exchange by per-doc DISTINCT
    * tokens. No windows, no collects.
    *
    * Determinism: each distinct token's entropy term −(c/n)·ln(c/n) is
    * quantized to micro-nat longs BEFORE the per-doc sum (integer sums
    * are order-free; summing doubles under Spark's partial aggregation
    * vs the oracle's sequential sum flips 6th-decimal roundings — the
    * q79 lesson). Output: (idCol, n_tokens, n_types, ttr, entropy).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ONE narrow kernel pass (graft.plans.TokenEntropy): the per-doc
    // token bag counts in a local hash map and the micro-nat terms sum
    // as integers — order-free, so this is row-identical to the
    // two-shuffle (doc,tok)-count → doc-reaggregate formulation it
    // replaced (and to the DuckDB oracle that still computes that way);
    // the corpus never leaves its scan partitions.
    val k = graft.plans.TokenEntropy(col(textCol))
    // null-text docs are DROPPED, as the former explode formulation (and
    // the replay oracle's unnest) did — not emitted with null stats
    Kernels.spread(df.filter(col(textCol).isNotNull), Seq(idCol, textCol))
      .select(col(idCol), k.as("__te"))
      .select(
        col(idCol),
        col("__te.n_tokens").as("n_tokens"),
        col("__te.n_types").as("n_types"),
        round(col("__te.n_types").cast("double") /
          col("__te.n_tokens").cast("double"), 6).as("ttr"),
        (col("__te.hf").cast("double") / lit(1e6)).as("entropy"))
  }

  /** fastText-style char-n-gram Naive-Bayes LANGUAGE classifier — the
    * trained successor to the 15-marker [[Text.langId]] heuristic for
    * real multilingual corpora. Train per-language char-n-gram Laplace
    * log-likelihoods + doc-count log-priors on a LABELED reference
    * (`labeled`, column `langCol`), score every document of `df` with
    * the [[graft.plans.LangNbPredict]] closure kernel.
    *
    *   score(d, l) = prior(l) + Σ over gram positions g of
    *                 llp(l, g)            (kept gram)
    *                 floor(l)             (OOV gram)
    *   llp(l, g)  = ln((c_l(g) + 1) / (tot_l + V + 1)),
    *   prior(l)   = ln(docs_l / docs_total),
    *
    * every term quantized to micro-nat longs (Math.round — the
    * [[nbQualityScore]] micro() discipline), per-doc sums exact integer
    * and order-free, argmax ties to the smallest language code. Grams
    * are RAW-text sliding char n-grams (spaces included — they carry
    * the word-boundary signal fastText gets from its boundary markers).
    *
    * Kept vocabulary: grams holding ≥ `minShare` of ANY language's gram
    * mass — ≤ |langs|·ceil(1/minShare) rows BY CONSTRUCTION, so the
    * model always broadcasts (64k closure bound enforced). Counts
    * aggregate distributedly first; only the kept slice collects.
    *
    * Scale shape: training is one keyed counter aggregate over the
    * labeled reference (vocab-bounded shuffle); scoring is a pure map —
    * a 100 TB corpus classifies inside the scan partitions that read
    * it, zero shuffles, no (doc × language) row inflation anywhere.
    *
    * Output: (idCol, lang_pred, score_mu) — best language and its exact
    * micro-nat score.
    */
  def nbLangId(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labeled: DataFrame,
      langCol: String,
      n: Int = 3,
      minShare: Double = 0.0005): DataFrame = {
    val model = trainNbLang(labeled, langCol, textCol, n, minShare)
    df.select(col(idCol), graft.plans.LangNbPredict(col(textCol), model).as("__p"))
      .select(col(idCol), col("__p.lang_pred").as("lang_pred"),
        col("__p.score_mu").as("score_mu"))
  }

  /** The trained classifier as a `Column => Column` (text → lang_pred) —
    * the shape [[Clean.cleanCorpus]]'s `langId` hook takes, so the
    * composite cleanup can cut on the TRAINED language id instead of the
    * marker heuristic while keeping its one-scan zero-shuffle plan (the
    * model rides the closure).
    */
  def nbLangIdColumn(model: graft.plans.LangNbModel): Column => Column =
    text => graft.plans.LangNbPredict(text, model).getField("lang_pred")

  /** Train the [[nbLangId]] model alone — for callers that want to reuse
    * one trained classifier across stages (e.g. as
    * [[Clean.cleanCorpus]]'s language rule via [[nbLangIdColumn]])
    * without retraining per call.
    */
  def trainNbLang(
      labeled: DataFrame,
      langCol: String,
      textCol: String = "text",
      n: Int = 3,
      minShare: Double = 0.0005): graft.plans.LangNbModel = {
    require(minShare > 0 && minShare <= 1,
      s"minShare $minShare not in (0,1] — 0 would unbound the model collect")
    def micro(x: Double): Long = {
      val y = x * 1e6
      if (y >= 0) Math.round(y) else -Math.round(-y)
    }
    val counts = labeled
      .select(col(langCol).cast("string").as("lang"),
        explode(graft.plans.CharGrams(col(textCol), n)).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val tots: Map[String, Long] = counts.groupBy("lang")
        .agg(sum("c").as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(tots.nonEmpty, "labeled reference produced no grams")
      val docCounts: Map[String, Long] = labeled
        .groupBy(col(langCol).cast("string").as("lang"))
        .agg(count(lit(1)).as("d")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // A labeled language whose every text is shorter than n yields no
      // grams: it could never be predicted, yet its docs would inflate
      // totDocs and silently depress every other prior. Fail loudly.
      val gramless = docCounts.keySet -- tots.keySet
      require(gramless.isEmpty,
        s"labeled language(s) with no $n-grams (all texts shorter than $n): " +
          s"${gramless.toSeq.sorted.mkString(", ")} — drop them or lower n")
      val langs = tots.keys.toArray.sorted
      val totDocs = docCounts.values.sum.toDouble
      // kept grams: >= minShare of ANY language's mass (distributed
      // filter; only the bounded survivor slice ever collects)
      val totsDf = counts.sparkSession.createDataFrame(
        tots.toSeq.sortBy(_._1)).toDF("lang", "t")
      val keptRows = counts.join(broadcast(totsDf), Seq("lang"))
        .filter(col("c").cast("double") >= lit(minShare) * col("t").cast("double"))
        .select("g").distinct().limit(65537).collect()
      require(keptRows.length <= 65536,
        s"kept gram vocabulary exceeds the 64k closure bound (${keptRows.length})")
      val keptSet = keptRows.map(_.getString(0))
      val keptDf = broadcast(counts.sparkSession.createDataFrame(
        keptSet.toSeq.map(Tuple1(_))).toDF("g"))
      val keptCounts = counts.join(keptDf, Seq("g"), "left_semi").collect()
        .map(r => (r.getString(1), r.getString(0), r.getLong(2)))
      val v = keptSet.length.toDouble
      val idx = langs.zipWithIndex.toMap
      def lp(c: Long, tot: Long): Long =
        micro(math.log((c + 1).toDouble / (tot.toDouble + v + 1.0)))
      val floors = langs.map(l => lp(0L, tots(l)))
      val priors = langs.map(l =>
        micro(math.log(docCounts.getOrElse(l, 0L).toDouble / totDocs)))
      val byGram = new scala.collection.mutable.HashMap[String, Array[Long]]()
      keptSet.foreach { g => byGram(g) = langs.map(l => lp(0L, tots(l))) }
      keptCounts.foreach { case (lang, g, c) =>
        byGram(g)(idx(lang)) = lp(c, tots(lang))
      }
      new graft.plans.LangNbModel(
        langs, floors = floors, priors = priors,
        gramLlp = byGram.toArray.sortBy(_._1), n = n)
    } finally { counts.unpersist(false); () }
  }
}
