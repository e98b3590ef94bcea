package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Self-trained unigram language-model operators: the classic CCNet-style
  * "perplexity proxy" quality signal and tokenizer-vocabulary construction,
  * both trained on the corpus itself in one counter pass.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - Pass 1 aggregates the corpus to TOKEN COUNTS — partial (map-side)
  *     aggregation means the shuffle is bounded by the VOCABULARY, not the
  *     corpus (a few million rows for real text, kilobytes here).
  *   - Everything downstream of pass 1 (total mass, log-probabilities,
  *     cumulative coverage) operates on that vocab-sized aggregate; the
  *     single-task windows below are windows over the vocabulary and are
  *     bounded by construction — corpus rows are never sorted or windowed.
  *   - Pass 2 (scoring) re-scans the corpus and BROADCASTS the model; the
  *     per-doc score aggregates partially (explode preserves partition
  *     locality, so each doc contributes ~1 row to the shuffle).
  *
  * Tokenization is `Text.tokens` (single-space split) so the DuckDB oracle's
  * `string_split(text, ' ')` replays it exactly.
  */
object Unigram {

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
    * The model pass collects the vocab-bounded counts to the driver (the
    * same data a broadcast would ship anyway — the IVF-centroid precedent,
    * Vectors.scala) so the corpus is scanned exactly ONCE for the model;
    * the broadcast side rides a 1-partition RDD, not a LocalRelation, to
    * skip the per-broadcast collect job (SURVEY §12).
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
    val spark = df.sparkSession
    val counts = tokenCounts(df, idCol, textCol).collect()
    val total = counts.map(_.getLong(1)).sum.toDouble
    val kept = counts.collect {
      case r if r.getLong(1) >= minShare * total =>
        (r.getString(0), math.log(r.getLong(1) / total))
    }
    val floorLp = math.log(0.5 / total)
    val vocab = spark
      .createDataFrame(spark.sparkContext.parallelize(kept.toSeq, 1))
      .toDF("tok", "lp")
    Kernels.spread(df, Seq(idCol, textCol))
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(idCol)
      .agg(round(avg(coalesce(col("lp"), lit(floorLp))), 6).as("lp_mean"))
  }

  /** Smallest vocabulary prefix (by frequency desc, token asc) covering at
    * least `coverage` of the corpus token mass — tokenizer-vocab
    * construction with a deterministic tie order. A row is kept while the
    * mass BEFORE it is still short of the target, so the first row crossing
    * the threshold is included and nothing after it. Output:
    * (tok, freq, cum_share) ordered by the same (freq desc, tok) rank.
    *
    * The ordered window runs over the vocab-sized aggregate only —
    * corpus rows are never globally sorted.
    */
  def coverageVocab(
      df: DataFrame,
      idCol: String,
      textCol: String,
      coverage: Double): DataFrame = {
    require(coverage > 0 && coverage <= 1, s"coverage $coverage not in (0,1]")
    val w = Window
      .orderBy(col("c").desc, col("tok").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokenCounts(df, idCol, textCol)
      .withColumn("t", sum(col("c")).over(Window.partitionBy()))
      .withColumn("cum", sum(col("c")).over(w))
      .where((col("cum") - col("c")).cast("double") < lit(coverage) * col("t"))
      .select(
        col("tok"),
        col("c").as("freq"),
        round(col("cum").cast("double") / col("t"), 6).as("cum_share"))
      .orderBy(col("freq").desc, col("tok"))
  }
}
