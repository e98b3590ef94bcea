package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling for training-data pipelines: the per-domain health
  * view a mix designer reads BEFORE deciding sampling rates and filters.
  *
  * Everything here is deliberately expressible as partial-aggregatable
  * COUNTERS so the shapes survive 100 TB:
  *  - no exact percentiles (an exact percentile buffers every value of a
  *    group on one reducer — 8 GB of longs for a 1B-doc domain); the
  *    distributional view is a fixed-width histogram instead, which is
  *    counters at any scale and reconstructs any quantile to bucket
  *    resolution,
  *  - the duplicate rate rides the (domain, fingerprint) partial
  *    aggregate — fingerprints shuffle, never text,
  *  - quality/token sums are plain map-side-combined aggregates over the
  *    codegen'd Text kernels (one pass over the text bytes per doc).
  */
object CorpusStats {

  /** One row per domain: doc/token counts, token-length extremes, exact
    * duplicate mass, mean quality score.
    *
    * Output: domainCol, n_docs, n_tokens, mean_tokens, max_tokens,
    * dup_docs (docs minus distinct fingerprints — the rows exact dedup
    * would remove), dup_ratio, mean_quality.
    *
    * Scale shape: one aggregation keyed (domain, fingerprint) to count
    * distinct content — Catalyst plans a single distinct aggregate as a
    * two-level partial aggregation whose shuffle carries only 16-byte
    * fingerprints and counters — then the final #domains-row reduce.
    */
  def healthReport(df: DataFrame, textCol: String, domainCol: String): DataFrame = {
    val st = Text.textStats(col(textCol))
    val toks = st.getField("n_tokens").cast("long")
    Kernels.spread(df, Seq(domainCol, textCol))
      .select(
        col(domainCol),
        toks.as("__toks"),
        Text.qualityScoreOf(st).as("__q"),
        Text.fingerprint(col(textCol)).as("__fp"))
      .groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("n_tokens"),
        // Exact means: double partial-sums reduce in partition order, and
        // at a 6th-decimal rounding boundary the ULP difference vs the
        // oracle's sequential sum flips the rounded digit. Sum exact
        // integers (tokens are already longs; quality is 6dp-quantized, so
        // round(q*1e6) is its exact fixed-point form), divide ONCE — the
        // result is order-independent at any parallelism.
        round(sum(col("__toks")).cast("double") / count(lit(1)), 6)
          .as("mean_tokens"),
        max(col("__toks")).as("max_tokens"),
        (count(lit(1)) - countDistinct(col("__fp"))).as("dup_docs"),
        round((count(lit(1)) - countDistinct(col("__fp"))).cast("double") /
          count(lit(1)), 6).as("dup_ratio"),
        round(sum(round(col("__q") * 1e6).cast("long")).cast("double") /
          (count(lit(1)) * 1e6), 6).as("mean_quality"))
  }

  /** Token-count distribution per domain as a fixed-width histogram:
    * (domain, bucket_lo) → n_docs, where bucket_lo = floor(tokens /
    * width) * width. The scale-safe stand-in for percentiles: pure
    * counters under partial aggregation, and any quantile reads off the
    * cumulative histogram at bucket resolution.
    */
  def tokenHistogram(df: DataFrame, textCol: String, domainCol: String,
      bucketWidth: Int = 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    val toks = Text.tokenCount(col(textCol)).cast("long")
    Kernels.spread(df, Seq(domainCol, textCol))
      .select(col(domainCol),
        (floor(toks / bucketWidth) * bucketWidth).as("bucket_lo"))
      .groupBy(col(domainCol), col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Pairwise Jensen–Shannon divergence between the domains' unigram
    * token distributions — the "how different are these sources really"
    * matrix a mix designer reads before setting domain weights (JS is
    * symmetric, bounded by ln 2, and defined even where supports
    * differ, unlike KL).
    *
    * Scale shape: (domain, token) counts aggregate partially (shuffle
    * bounded by vocab × domains, never the corpus); each count row then
    * fans out to the ≤ D(D−1)/2 BROADCAST pairs containing its domain,
    * and per-(pair, token) terms re-aggregate. Everything is counters;
    * nothing collects but the D-row total table (require D ≤ 64 — the
    * fan-out is quadratic in D by design, this is a between-SOURCES
    * tool, not a per-key one).
    *
    * Determinism: per-token terms quantize to micro-nats BEFORE the
    * pair sum (integer sums are order-free; same discipline as
    * q93/q94/q98). Output: (domain_a, domain_b, js) with a < b.
    */
  def domainDivergence(df: DataFrame, textCol: String, domainCol: String): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(domainCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"domainDivergence requires a string domain column; '$domainCol' is " +
        s"${df.schema(domainCol).dataType.simpleString} — cast it explicitly " +
        "(the output names domains by their string value)")
    // null domains are excluded up front (a null group key would NPE the
    // driver-side domain sort; callers wanting an "unknown" domain name
    // it explicitly); null text explodes to nothing anyway
    val cnt = Kernels.spread(
        df.filter(col(domainCol).isNotNull), Seq(domainCol, textCol))
      .select(col(domainCol).as("d"), explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy("d", "tok").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = cnt.groupBy("d").agg(sum("c").as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(totals.size <= 64,
        s"${totals.size} domains exceed the 64 bound — the pair fan-out is " +
          "quadratic in domain count by design")
      val domains = totals.keys.toSeq.sorted
      val pairs = for {
        i <- domains.indices; j <- (i + 1) until domains.size
      } yield (domains(i), domains(j))
      val pairDf = spark.createDataFrame(
        spark.sparkContext.parallelize(pairs, 1)).toDF("da", "db")
      val totDf = spark.createDataFrame(
        spark.sparkContext.parallelize(totals.toSeq.sorted, 1)).toDF("d", "t")
      // fan each (d, tok, c) row out to its pairs, pivot the two sides per
      // (pair, token), then quantize the JS term:
      //   m = (p+q)/2;  term = p/2·ln(p/m) + q/2·ln(q/m)  (0·ln → 0)
      val sided = cnt
        .join(broadcast(totDf), Seq("d"))
        .join(broadcast(pairDf), col("d") === col("da") || col("d") === col("db"))
        .select(col("da"), col("db"), col("tok"),
          when(col("d") === col("da"), col("c").cast("double") / col("t").cast("double"))
            .otherwise(lit(0.0)).as("p"),
          when(col("d") === col("db"), col("c").cast("double") / col("t").cast("double"))
            .otherwise(lit(0.0)).as("q"))
      // The matrix is ≤ D(D−1)/2 ≤ 2016 rows by the gate above:
      // materialize it NOW (so the count cache is actually reused across
      // the totals collect and this job, then released for real) and
      // hand back a local DataFrame — the same eager-bounded-result
      // contract as Bpe.trainMerges.
      val rows = sided
        .groupBy("da", "db", "tok")
        .agg(max("p").as("p"), max("q").as("q"))
        .select(col("da"), col("db"),
          round((when(col("p") > 0,
              (col("p") / 2) * log((col("p") * 2) / (col("p") + col("q"))))
              .otherwise(lit(0.0)) +
            when(col("q") > 0,
              (col("q") / 2) * log((col("q") * 2) / (col("p") + col("q"))))
              .otherwise(lit(0.0))) * lit(1e6))
            .cast("long").as("__tf"))
        .groupBy("da", "db")
        .agg(sum("__tf").as("__js"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 1e6))
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1))
        .toDF("domain_a", "domain_b", "js")
    } finally cnt.unpersist(false)
  }

  /** ---- Incremental corpus-health ledger ----
    * A per-domain statistics symbol that FOLDS ingest increments instead
    * of rescanning history — the always-on health dashboard of a growing
    * corpus. Two symbols:
    *  - `<name>__stats`: per-domain mergeable aggregates — doc/token/
    *    char counts and token-length min/max (sums add, extrema fold;
    *    means derive at read time from (Σ, n), never stored — a stored
    *    mean is not mergeable).
    *  - `<name>__hll`: per-domain HLL registers ([[Sketch.hllRegistersBy]]
    *    over tokens) — distinct-vocabulary estimates that keep absorbing
    *    increments by register max.
    * Merging is associative and idempotent in the HLL half and
    * associative in the sums half (NOT idempotent: folding the same
    * increment twice double-counts — pair with an id replay guard as in
    * StreamIngest.dedupAdmitSink when delivery is at-least-once).
    * Null domains fold under the "__null__" sentinel, the
    * sampleTokenBudget convention.
    */
  def buildLedger(
      lib: graft.core.Library,
      df: DataFrame,
      textCol: String,
      domainCol: String,
      name: String,
      p: Int = 12,
      portable: Boolean = false,
      /** Streaming replay guard ([[graft.core.Library.ReplayGuard]],
        * [[graft.streaming.StreamIngest.ledgerSink]]): each symbol's
        * commit is stamped and a symbol already stamped IN THIS SCOPE
        * skips — a crash between the three writes heals on replay
        * instead of double-counting the sums half.
        */
      replayGuard: Option[graft.core.Library.ReplayGuard] = None): Unit = {
    import df.sparkSession.implicits._
    val stamp = Retrieval.replayStamp(replayGuard)
    if (!Retrieval.alreadyFolded(lib, s"${name}__meta", replayGuard))
      lib.write(s"${name}__meta", Seq((p, portable)).toDF("p", "portable"),
        metadata = stamp)
    if (!Retrieval.alreadyFolded(lib, s"${name}__stats", replayGuard))
      lib.write(s"${name}__stats", ledgerStats(df, textCol, domainCol),
        Some("domain"), metadata = stamp)
    if (!Retrieval.alreadyFolded(lib, s"${name}__hll", replayGuard))
      lib.write(s"${name}__hll",
        ledgerRegisters(df, textCol, domainCol, p, portable), Some("domain"),
        metadata = stamp)
  }

  def mergeIntoLedger(
      lib: graft.core.Library,
      df: DataFrame,
      textCol: String,
      domainCol: String,
      name: String,
      /** Same per-symbol replay-guard contract as [[buildLedger]]. A
        * symbol a crashed build never created is write-created here, so
        * a replayed first batch converges whichever write the crash
        * interrupted.
        */
      replayGuard: Option[graft.core.Library.ReplayGuard] = None): Unit = {
    val statsSym = s"${name}__stats"
    val hllSym = s"${name}__hll"
    val stamp = Retrieval.replayStamp(replayGuard)
    val statFolded = Retrieval.alreadyFolded(lib, statsSym, replayGuard)
    val hllFolded = Retrieval.alreadyFolded(lib, hllSym, replayGuard)
    if (statFolded && hllFolded) return
    val meta = lib.read(s"${name}__meta").head()
    val (p, portable) = (meta.getAs[Int]("p"), meta.getAs[Boolean]("portable"))
    if (!statFolded) {
      val inc = ledgerStats(df, textCol, domainCol)
      val stats =
        if (!lib.hasSymbol(statsSym)) inc
        else lib.read(statsSym).unionByName(inc)
          .groupBy("domain")
          .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
            sum("n_chars").as("n_chars"), min("min_tokens").as("min_tokens"),
            max("max_tokens").as("max_tokens"))
      // localCheckpoint: the merged plan READS the symbol version it is
      // about to supersede
      lib.write(statsSym, stats.localCheckpoint(true), Some("domain"),
        metadata = stamp)
    }
    if (!hllFolded) {
      val inc = ledgerRegisters(df, textCol, domainCol, p, portable)
      val regs =
        if (!lib.hasSymbol(hllSym)) inc
        else Sketch.hllMergeBy(
          lib.read(hllSym).select(col("domain").as("group"),
            col("bucket"), col("rho")),
          inc.withColumnRenamed("domain", "group"))
          .withColumnRenamed("group", "domain")
      lib.write(hllSym, regs.localCheckpoint(true), Some("domain"),
        metadata = stamp)
    }
  }

  /** The ledger report: per-domain counts, derived mean token length,
    * extrema, and the HLL distinct-token estimate. Output: (domain,
    * n_docs, n_tokens, n_chars, mean_tokens, min_tokens, max_tokens,
    * distinct_tokens_est).
    */
  def readLedger(lib: graft.core.Library, name: String): DataFrame = {
    val p = lib.read(s"${name}__meta").head().getAs[Int]("p")
    lib.read(s"${name}__stats")
      .join(
        Sketch.hllEstimateBy(
          lib.read(s"${name}__hll").select(col("domain").as("group"),
            col("bucket"), col("rho")), p)
          .select(col("group").as("domain"),
            col("n_distinct_est").as("distinct_tokens_est")),
        Seq("domain"), "left")
      .select(col("domain"), col("n_docs"), col("n_tokens"), col("n_chars"),
        round(col("n_tokens").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_tokens"),
        col("min_tokens"), col("max_tokens"), col("distinct_tokens_est"))
  }


  /** Corpus drift between two LEDGER VERSIONS — versioned time-travel
    * analytics the Library gives for free: "what did the last N
    * increments change, per domain" without touching any corpus data
    * (both snapshots are ≤(domains × 2^p)-row symbol reads). Domains
    * absent from a side report zero counts; vocabulary drift compares
    * the HLL estimates (new-domain vocab growth is the estimate
    * itself). Output: (domain, n_docs_from, n_docs_to, d_docs,
    * d_tokens, vocab_from, vocab_to, d_vocab).
    */
  def ledgerDrift(
      lib: graft.core.Library,
      name: String,
      from: graft.core.Library.AsOf,
      to: graft.core.Library.AsOf = graft.core.Library.AsOf.Latest): DataFrame = {
    val p = lib.read(s"${name}__meta").head().getAs[Int]("p")
    def snap(asOf: graft.core.Library.AsOf, tag: String): DataFrame =
      lib.read(s"${name}__stats", asOf = asOf)
        .select(col("domain"), col("n_docs").as(s"n_docs_$tag"),
          col("n_tokens").as(s"n_tokens_$tag"))
        .join(
          Sketch.hllEstimateBy(
            lib.read(s"${name}__hll", asOf = asOf)
              .select(col("domain").as("group"), col("bucket"), col("rho")),
            p)
            .select(col("group").as("domain"),
              col("n_distinct_est").as(s"vocab_$tag")),
          Seq("domain"), "left")
    snap(from, "from").join(snap(to, "to"), Seq("domain"), "full")
      .select(col("domain"),
        coalesce(col("n_docs_from"), lit(0L)).as("n_docs_from"),
        coalesce(col("n_docs_to"), lit(0L)).as("n_docs_to"),
        (coalesce(col("n_docs_to"), lit(0L)) -
          coalesce(col("n_docs_from"), lit(0L))).as("d_docs"),
        (coalesce(col("n_tokens_to"), lit(0L)) -
          coalesce(col("n_tokens_from"), lit(0L))).as("d_tokens"),
        coalesce(col("vocab_from"), lit(0.0)).as("vocab_from"),
        coalesce(col("vocab_to"), lit(0.0)).as("vocab_to"),
        round(coalesce(col("vocab_to"), lit(0.0)) -
          coalesce(col("vocab_from"), lit(0.0)), 4).as("d_vocab"))
  }

  private def ledgerStats(
      df: DataFrame, textCol: String, domainCol: String): DataFrame =
    df.select(coalesce(col(domainCol).cast("string"), lit("__null__"))
        .as("domain"),
        Text.tokenCount(col(textCol)).cast("long").as("__nt"),
        coalesce(length(col(textCol)).cast("long"), lit(0L)).as("__nc"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"),
        sum("__nc").as("n_chars"), min("__nt").as("min_tokens"),
        max("__nt").as("max_tokens"))

  private def ledgerRegisters(
      df: DataFrame, textCol: String, domainCol: String, p: Int,
      portable: Boolean): DataFrame =
    Sketch.hllRegistersBy(
      df.select(coalesce(col(domainCol).cast("string"), lit("__null__"))
          .as("__d"),
          explode(Text.tokens(col(textCol))).as("__tok")),
      col("__d"), col("__tok"), p, portable)
      .withColumnRenamed("group", "domain")

  /** Zipf power-law fit of the corpus token-frequency distribution:
    * least-squares slope/intercept of ln(freq) against ln(rank) — the
    * standard one-number corpus-health check (natural language sits
    * near slope −1; a slope collapsing toward 0 means boilerplate or
    * template flooding, a cliff below −1.5 means vocabulary starvation).
    *
    * Determinism discipline: both logs are FLOOR-quantized to milli-nat
    * longs before any sum (floor of a double is pure binary — no
    * decimal-string rounding anywhere), all five regression sums are
    * exact integer sums (order-free, engine-independent), and the final
    * slope/intercept arithmetic is a fixed sequence of IEEE double ops
    * on those exact integers — the oracle writes the identical
    * expression shape. Milli (not micro) quantization keeps
    * Σx², Σxy within long range up to ~10⁹ vocabulary types.
    *
    * Scale shape: one token-count shuffle (vocab-sized), ranks from
    * [[Sampling.rankByScore]]'s two-level engine (no single-task global
    * window over the vocabulary), one vocab-sized join, one counter
    * aggregate. Output: one row (n_types, n_tokens, slope, intercept).
    */
  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    val freq = df
      .select(explode(split(col(textCol), " ")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy("__t").agg(count(lit(1)).as("__f"))
    val ranked = Sampling.rankByScore(
      freq, "__t", None, col("__f"), descending = true)
    val xy = freq.join(ranked, Seq("__t"))
      .select(col("__f"),
        floor(log(col("rank").cast("double")) * 1000).as("__x"),
        floor(log(col("__f").cast("double")) * 1000).as("__y"))
    val agg = xy.agg(
      count(lit(1)).as("__n"), sum(col("__f")).as("__tok"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
    val d = agg.select(
      col("__n"), col("__tok"),
      col("__n").cast("double").as("__nd"),
      col("__sx").cast("double").as("__sxd"),
      col("__sy").cast("double").as("__syd"),
      col("__sxy").cast("double").as("__sxyd"),
      col("__sxx").cast("double").as("__sxxd"))
    val den = col("__nd") * col("__sxxd") - col("__sxd") * col("__sxd")
    d.select(col("__n"), col("__tok"), col("__nd"), col("__sxd"),
        col("__syd"),
        when(den === 0.0, lit(0.0))
          .otherwise((col("__nd") * col("__sxyd") -
            col("__sxd") * col("__syd")) / den).as("slope"))
      .select(col("__n").as("n_types"), col("__tok").as("n_tokens"),
        col("slope"),
        ((col("__syd") - col("slope") * col("__sxd")) / col("__nd") /
          lit(1000.0)).as("intercept"))
  }
}
