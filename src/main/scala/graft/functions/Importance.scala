package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-selection importance weights for pretraining corpora (DSIR,
  * "Data Selection for Language Models via Importance Resampling",
  * Xie et al. 2023): score every raw document by how much its hashed
  * unigram distribution looks like a small TARGET corpus versus the raw
  * corpus itself, so a 100 TB crawl can be resampled toward a domain
  * (the reference engine has no analog; this is pipeline surface the
  * training-data use case needs).
  *
  * Shape at scale:
  *  - the feature space is a FIXED bucket count (default 256): both
  *    n-gram count aggregations reduce to ≤`buckets` rows no matter the
  *    corpus size, and the per-bucket log-ratio table is collected/
  *    broadcast legitimately (bounded by construction, like the IVF
  *    centroid table);
  *  - the document side explodes to (doc_id, bucket) pairs, joins the
  *    broadcast ratio table, and re-aggregates keyed on doc_id — text
  *    never shuffles, only longs do.
  *
  * Determinism: per-bucket log-ratios are quantized to fixed-point
  * MICRO-NATS (round(lr·1e6) as long) BEFORE the per-document sum, so
  * the sum is integer arithmetic — order-free and replayable exactly by
  * the DuckDB oracle regardless of partial-aggregation order (the q79
  * mean_quality lesson). Hashing is the engine-portable md5-derived
  * [[Dedup.h60]] so an independent SQL engine recomputes the buckets
  * digit-for-digit.
  */
object Importance {

  /** Per-document DSIR weight: mean is deliberately NOT taken — the raw
    * summed log-likelihood-ratio is what importance resampling
    * exponentiates; callers can divide by `n_toks` for a length-normalized
    * variant. Output: (idCol, n_toks, weight) with
    * weight = Σ_tokens log(p_target(bucket)/p_raw(bucket)) in nats,
    * add-one smoothed per bucket.
    */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 16),
      s"bucket count must be in (0, 65536], got $buckets — the ratio table " +
        "is collected to the driver and must stay bounded")
    val bucket = pmod(Dedup.h60(col("tok")), lit(buckets.toLong))
    def toks(df: DataFrame) =
      df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
        .select(col(idCol), bucket.as("bk"))
    val rawToks = toks(raw)
    val tgtToks = toks(target)

    // Bucket-bounded counts; totals derive from the SAME aggregates
    // (1-row sums over ≤`buckets` rows) instead of separate count() jobs
    // that would re-tokenize and re-hash the whole corpus.
    val tCnt = tgtToks.groupBy("bk").agg(count(lit(1)).as("ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rCnt = rawToks.groupBy("bk").agg(count(lit(1)).as("cr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def total(cnt: DataFrame, c: String): Long =
      cnt.agg(sum(col(c))).head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val tTot = total(tCnt, "ct")
    val rTot = total(rCnt, "cr")

    // log(p_t/p_r) with add-one smoothing, as exact micro-nat longs.
    // Only buckets some raw token hits can influence a document, so the
    // raw side anchors the join. The table is ≤`buckets` rows by
    // construction: collect it and re-ship as a 1-partition local DF so
    // the count caches can be released NOW (the scoring join otherwise
    // holds their lineage until the caller finally executes).
    val ratioRows = rCnt
      .join(tCnt, Seq("bk"), "left")
      .na.fill(0L, Seq("ct"))
      .select(
        col("bk"),
        round(
          log(
            ((col("ct") + lit(1.0)) * lit((rTot + buckets).toDouble)) /
              ((col("cr") + lit(1.0)) * lit((tTot + buckets).toDouble))) * lit(1e6))
          .cast("long").as("lrf"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    tCnt.unpersist(false)
    rCnt.unpersist(false)
    val ratio = raw.sparkSession
      .createDataFrame(raw.sparkSession.sparkContext.parallelize(ratioRows.toSeq, 1))
      .toDF("bk", "lrf")

    rawToks
      .join(broadcast(ratio), Seq("bk"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"), sum("lrf").as("__ws"))
      .select(col(idCol), col("n_toks"),
        (col("__ws").cast("double") / lit(1e6)).as("weight"))
  }
}
