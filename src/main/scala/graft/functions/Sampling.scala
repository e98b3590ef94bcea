package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand(seed)`-based sampling reproduces only within one engine (and only
  * for a fixed partitioning); hash-based sampling is the reproducibility
  * pattern real pipelines use: a row is kept iff a stable content hash of
  * its id falls under the fraction threshold. Same rows selected on any
  * engine, any partitioning, any day — and membership is a pure codegen'd
  * filter, so it pushes through scans like any predicate.
  *
  * Mechanics: the first 4 hex chars of md5(id) are compared against the
  * fraction rendered as a 4-hex-digit threshold (16-bit resolution,
  * ±1/65536 of the requested fraction). Lexicographic compare of hex
  * strings == numeric compare, and md5 is identical everywhere.
  */
object Sampling {

  /** 4-hex-digit threshold; None ⇒ keep everything. Both sides of the
    * compare must be the SAME length or lexicographic ≠ numeric.
    */
  private def threshold(fraction: Double): Option[String] = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    val n = math.round(fraction * 65536.0).toInt
    if (n >= 65536) None else Some(f"$n%04x")
  }

  /** Keep ≈fraction of rows, deterministically by id. */
  def hashSampleCond(idCol: Column, fraction: Double): Column =
    threshold(fraction) match {
      case None => lit(true)
      case Some(t) => substring(md5(idCol.cast("string")), 1, 4) < t
    }

  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashSampleCond(col(idCol), fraction))

  /** Stratified variant: per-stratum fractions (absent strata → 0).
    * The whole predicate stays one codegen'd CASE — no per-stratum scans.
    */
  def hashSampleBy(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val cond = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && hashSampleCond(col(idCol), f))
    }
    df.filter(cond)
  }

  /** [[hashSampleCond]] with a rate that is itself a COLUMN (per-row /
    * per-domain keep-rates computed by an upstream aggregate). The
    * threshold is rendered to the same 4-hex-digit string form at
    * runtime; rates ≥ 1 short-circuit to keep-all (a 5-hex render would
    * break the lexicographic≡numeric property).
    */
  def hashSampleCondBy(idCol: Column, rate: Column): Column = {
    // Mirror the scalar threshold()'s >=65536 clamp: a rate in
    // [65535.5/65536, 1) rounds to 65536, which renders as the 5-hex
    // "10000" and lexicographically undercuts every 4-hex prefix —
    // silently dropping ~94% of rows that should all be kept.
    val n = round(rate * 65536).cast("int")
    (n >= 65536) ||
      (substring(md5(idCol.cast("string")), 1, 4) < format_string("%04x", n))
  }

  /** Down-sample each domain to ≈`tokenBudget` TOKENS, deterministically.
    * Pretraining mixes are specified as per-domain token targets, not row
    * fractions — this is the operator that turns a raw corpus into such a
    * mix. Two aggregate passes, no sort, no window:
    *   1. per-domain token totals — a partial-aggregated shuffle carrying
    *      one (domain, Σtokens) counter per map task per domain;
    *   2. keep-rate = min(1, budget/total) per domain, broadcast back,
    *      row kept iff its md5 hash point falls under the domain's rate
    *      (the engine-portable predicate above).
    * Kept token mass ≈ budget per domain in expectation (hash uniformity;
    * deterministic in id — same rows on any engine or partitioning). At
    * corpus scale the only data movement is the counter shuffle and a
    * #domains-row broadcast. Rows with a NULL domain are dropped — the
    * same null-key semantics as the engine's pandas-style groupby
    * (SURVEY §2 PartitionClause); coalesce the domain to a sentinel
    * first to budget them as their own mix component.
    */
  def sampleTokenBudget(
      df: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget $tokenBudget must be positive")
    val toks = Text.tokenCount(col(textCol)).cast("long")
    val rates = df.groupBy(col(domainCol)).agg(sum(toks).as("__total"))
      .select(col(domainCol),
        least(lit(1.0), lit(tokenBudget.toDouble) / col("__total")).as("__rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashSampleCondBy(col(idCol), col("__rate")))
      .drop("__rate")
  }

  /** Temperature-flattened domain mixture (the mT5/multilingual mixing
    * rule): the TARGET mix weights are w_d ∝ p_d^alpha where p_d is
    * domain d's token mass — alpha = 1 keeps natural proportions,
    * alpha = 0 weights every domain equally, values between flatten the
    * head and boost the tail. Each domain keeps
    * rate_d = min(1, targetTokens · w_d / p_d) of its rows under the
    * engine-portable md5 predicate, so the kept token mass approaches
    * targetTokens · w_d per domain.
    *
    * Determinism discipline: per-domain pow terms quantize to integer
    * micro-units BEFORE the cross-domain sum (double addition is
    * order-dependent; integer sums are order-free — the q79/q93
    * lesson), and the rate arithmetic is a fixed left-to-right division
    * chain, so any engine replays the exact kept set. (The replay gate
    * uses alpha = 0.5, where pow == sqrt is correctly rounded IEEE on
    * every platform; other alphas are supported but last-ulp pow
    * differences across math libraries may flip a row at a threshold
    * boundary.)
    *
    * Scale shape: one per-domain counter aggregate, ONE 1-row global
    * sum, a broadcast rate table, a codegen'd filter. No driver collect
    * of the domain table, so the domain count is unbounded. Null
    * domains are dropped (same semantics as [[sampleTokenBudget]]).
    */
  def temperatureMixture(
      df: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      alpha: Double,
      targetTokens: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha must be in [0, 1]")
    require(targetTokens > 0, s"targetTokens $targetTokens must be positive")
    val toks = Text.tokenCount(col(textCol)).cast("long")
    // alpha 0 / 0.5 / 1 avoid pow entirely: IEEE sqrt is correctly
    // rounded on every platform while fdlibm-lineage pow is only
    // 1-ulp-accurate, and the quantized term must replay bit-for-bit
    def powered(p: Column): Column = alpha match {
      case 0.0 => lit(1.0)
      case 0.5 => sqrt(p)
      case 1.0 => p
      case a => pow(p, lit(a))
    }
    val perDomain = df.groupBy(col(domainCol)).agg(sum(toks).as("__p"))
      .filter(col("__p") > 0)
      .withColumn("__s",
        round(powered(col("__p").cast("double")) * 1e6).cast("long"))
    // 1-row aggregate to a literal (the asofJoinChunked bounds pattern) —
    // a cross-joined total would re-derive the same aggregate subtree
    // and trip self-join lineage dedup. The domain agg runs twice (the
    // total job + the final query), both counter-only shuffles.
    val sTotal = perDomain.agg(sum("__s")).first().getLong(0)
    val rates = perDomain
      .select(col(domainCol),
        least(lit(1.0),
          lit(targetTokens.toDouble) * col("__s").cast("double") /
            lit(sTotal.toDouble) / col("__p").cast("double"))
          .as("__rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashSampleCondBy(col(idCol), col("__rate")))
      .drop("__rate")
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashSampleCondBy(col(idCol), col("__rate")))
      .drop("__rate")
  }

  /** Leakage-safe train/val/test splits: documents connected by a
    * near-duplicate relation must land in the SAME split, or the eval
    * split leaks (near-copies of) training documents. Every doc is
    * labeled with its duplicate-cluster representative ([[Dedup
    * .duplicateClusters]] over `pairs`; isolated docs label themselves)
    * and [[splitIndex]] hashes the CLUSTER label, so whole components
    * move together. Adds a `split` column; same determinism guarantees
    * as splitIndex. Scale shape: the cluster labels are one keyed join
    * (pairs are sparse — the near-dup graph, not the corpus), and the
    * split itself is a pure codegen'd predicate.
    */
  def leakageSafeSplits(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      fractions: Seq[Double]): DataFrame = {
    val clusters = Dedup.duplicateClusters(pairs)
      .withColumnRenamed("id", idCol).withColumnRenamed("cluster_id", "__cl")
    df.join(clusters, Seq(idCol), "left")
      .withColumn("split", splitIndex(coalesce(col("__cl"), col(idCol)), fractions))
      .drop("__cl")
  }

  /** Disjoint deterministic splits (train/val/test): row goes to the i-th
    * split whose cumulative fraction first exceeds its hash point.
    * Returns the split index column (-1 if fractions sum < 1 and the row
    * falls past the end).
    */
  def splitIndex(idCol: Column, fractions: Seq[Double]): Column = {
    require(fractions.sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val h = substring(md5(idCol.cast("string")), 1, 4)
    val cuts = fractions.scanLeft(0.0)(_ + _).tail
    cuts.zipWithIndex.foldRight(lit(-1)) { case ((cut, i), other) =>
      threshold(cut) match {
        case None => when(lit(true), lit(i)).otherwise(other)
        case Some(t) => when(h < t, lit(i)).otherwise(other)
      }
    }
  }

  /** Deterministic training-order shuffle: every row gets a GLOBAL
    * 1-based position under the pseudo-random order md5(seed:id) — the
    * "shuffle the corpus before training" step, reproducible on any
    * engine/partitioning (same md5, same order) unlike rand()-based
    * orderings.
    *
    * Position assignment is DISTRIBUTED (the coverageVocab two-level
    * scheme): range-partition by the shuffle key, number rows WITHIN
    * each partition (parallel windows), then offset each partition by
    * the counts of its predecessors — the only unpartitioned window
    * runs over the #partitions-row summary, never the corpus (a bare
    * row_number() over a global ORDER BY is a one-task sort of
    * everything). Output: (idCol, pos).
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Long): DataFrame =
    positionsBy(df, idCol, None, seed)

  /** Curriculum training order: buckets descend (highest-quality bucket
    * first), documents SHUFFLE deterministically within each bucket —
    * the easy-first / quality-first ordering curriculum schedules use,
    * with the same engine-portable reproducibility as [[shuffleOrder]].
    * Output: (idCol, pos).
    */
  def curriculumOrder(
      df: DataFrame, idCol: String, bucketCol: String, seed: Long): DataFrame =
    positionsBy(df, idCol, Some((col(bucketCol), true)), seed)

  /** Nulls PROPAGATE (concat, not concat_ws — ws would silently skip a
    * null id and give all null ids the same fake key) and sort LAST, the
    * DuckDB/ANSI default, so the oracle replays the order exactly.
    */
  private def shuffleKey(id: Column, seed: Long): Column =
    md5(concat(lit(seed.toString), lit(":"), id.cast("string")))

  /** Global 1-based positions under (bucketOrder, md5-key, id), assigned
    * DISTRIBUTEDLY and DETERMINISTICALLY. Two-level scheme over a
    * PURE-FUNCTION sub-bucket — the first two hex digits of the shuffle
    * key (256 uniform sub-buckets; the key-prefix order embeds in the
    * key order, so (bucket, kb, key, id) == (bucket, key, id)):
    *   1. per-(bucket, kb) parallel windows number rows locally,
    *   2. (bucket, kb) counts aggregate to a SUMMARY (≤ 256·|buckets|
    *      rows); the only unpartitioned window computes prefix offsets
    *      over that summary, never the data.
    * Every partition assignment is a deterministic function of the ROW —
    * no RangePartitioner sampling, no spark_partition_id — so repeated
    * subtree evaluation (exchange reuse on or off, retries, speculative
    * tasks) cannot disagree about which rows a summary row covers. A
    * range-partition formulation reads better but silently depends on
    * the two branches reusing ONE sampled exchange; sampled bounds may
    * differ per evaluation and positions would stop being a permutation.
    */
  private def positionsBy(
      df: DataFrame,
      idCol: String,
      bucket: Option[(Column, Boolean)], // (expr, descending)
      seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = shuffleKey(col(idCol), seed)
    val bucketProj = bucket.map { case (c, _) => c.as("__b") }.toSeq
    val keyed = df.select(
      (col(idCol) +: bucketProj) :+ key.as("__k") :+
        conv(substring(key, 1, 2), 16, 10).cast("int").as("__kb"): _*)
    val bucketCols = bucket.map(_ => col("__b")).toSeq
    val bucketSorts = bucket.toSeq.map { case (_, desc) =>
      if (desc) col("__b").desc_nulls_last else col("__b").asc_nulls_last
    }
    val rowOrder = Seq(col("__k").asc_nulls_last, col(idCol).asc_nulls_last)
    val local = keyed.withColumn("__rn",
      row_number().over(
        Window.partitionBy((bucketCols :+ col("__kb")): _*)
          .orderBy(rowOrder: _*)))
    val offsets = keyed
      .groupBy((bucketCols :+ col("__kb")): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__before",
        coalesce(sum(col("__n")).over(
          Window.orderBy(bucketSorts :+ col("__kb").asc_nulls_last: _*)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    // Null keys (null id -> null __k/__kb; null bucket value -> null __b)
    // must still receive positions: a plain equi-join would silently drop
    // them and the output would stop being a permutation of the input. The
    // null-safe join keeps them, and the asc_nulls_last/desc_nulls_last
    // window orders above already place them LAST per the shuffleKey
    // contract.
    val off = bucket.map(_ => offsets.withColumnRenamed("__b", "__ob"))
      .getOrElse(offsets)
      .withColumnRenamed("__kb", "__okb")
    val joinCond = (bucket.map(_ => col("__b") <=> col("__ob")).toSeq :+
      (col("__kb") <=> col("__okb"))).reduce(_ && _)
    local
      .join(broadcast(off), joinCond)
      .select(col(idCol), (col("__before") + col("__rn")).as("pos"))
  }

  /** Global (or per-group) 1-based ranks under (score, id) order —
    * [[positionsBy]]'s two-level engine generalized from random shuffle
    * keys to an arbitrary NUMERIC score, the primitive percentile-bucket
    * operators (CCNet head/middle/tail) need. `row_number().over
    * (partitionBy(group).orderBy(score))` buffers a whole group in one
    * task (a billion-row language at 100 TB); here the sub-bucket is a
    * PURE FUNCTION of the score — `floor(score · subBucketScale)` — so
    * its order embeds in the score order and the scheme applies
    * unchanged:
    *   1. per-(group, sb) parallel windows number rows locally under
    *      (score, id),
    *   2. (group, sb) counts aggregate to a summary; the only
    *      unpartitioned window computes prefix offsets over that
    *      summary, never the data.
    * Deterministic (no sampling, no partition ids): retries and
    * exchange-reuse modes cannot disagree about coverage — the same
    * argument as [[positionsBy]]. Sub-bucket granularity only affects
    * PARALLELISM (all-one-bucket degenerates to the plain window);
    * correctness never depends on the score distribution. Null scores
    * rank LAST (null sub-bucket, nulls-last orders, null-safe join),
    * ties break by id asc. Output: (groupCol?, idCol, rank).
    */
  def rankByScore(
      df: DataFrame,
      idCol: String,
      groupCol: Option[String],
      score: Column,
      descending: Boolean = false,
      subBucketScale: Double = 16.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(subBucketScale > 0, s"subBucketScale $subBucketScale must be > 0")
    val gProj = groupCol.map(col).toSeq
    val keyed = df.select(
      gProj ++ Seq(col(idCol), score.cast("double").as("__s"),
        floor(score.cast("double") * lit(subBucketScale)).as("__sb")): _*)
    val gCols = groupCol.map(col).toSeq
    def dir(c: Column) = if (descending) c.desc_nulls_last else c.asc_nulls_last
    val rowOrder = Seq(dir(col("__s")), col(idCol).asc_nulls_last)
    val local = keyed.withColumn("__rn",
      row_number().over(
        Window.partitionBy(gCols :+ col("__sb"): _*).orderBy(rowOrder: _*)))
    val offsets = keyed
      .groupBy(gCols :+ col("__sb"): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__before",
        coalesce(sum(col("__n")).over(
          Window.partitionBy(gCols: _*).orderBy(dir(col("__sb")))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val off = groupCol.foldLeft(offsets)((o, g) => o.withColumnRenamed(g, "__og"))
      .withColumnRenamed("__sb", "__osb")
    val joinCond = (groupCol.map(g => col(g) <=> col("__og")).toSeq :+
      (col("__sb") <=> col("__osb"))).reduce(_ && _)
    local
      .join(broadcast(off), joinCond)
      .select(gProj ++ Seq(col(idCol),
        (col("__before") + col("__rn")).as("rank")): _*)
  }

  /** Keep the k best documents per domain by `scoreCol` (desc, ties by
    * id asc) — the domain-mixing cap that stops one over-crawled host
    * from dominating a training mix.
    *
    * Plan shape: a PARTIAL top-k aggregate (graft.plans.TopKByScore),
    * NOT `row_number().over(partitionBy(domain))` — the window shuffles
    * every row into one task per domain and sorts it (a billion-row
    * domain = one task at 100 TB); the aggregate emits ≤k pairs per
    * domain per map task, so the exchange is O(domains × k × tasks)
    * regardless of corpus size and domain skew.
    *
    * Output: (domainCol, idCol, score, rank) with rank 1..k per domain.
    */
  def capPerDomain(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      scoreCol: Column,
      k: Int): DataFrame = {
    val idType = df.schema(idCol).dataType
    graft.plans.TopKByScore.requireIntegralId(idType, "capPerDomain")
    df.groupBy(domainCol)
      .agg(graft.plans.TopKByScore.topK(
        scoreCol.cast("double"), col(idCol).cast("long"), k).as("__top"))
      .select(col(domainCol), posexplode(col("__top")))
      .select(col(domainCol), col("col.id").cast(idType).as(idCol),
        col("col.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
  }
}
