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
}
