package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval scoring over a document corpus — BM25 query relevance and
  * per-document TF-IDF keyword extraction. Both are classic lexical
  * ranking (Robertson & Spärck Jones BM25; the Lucene-style smoothed
  * idf) re-expressed as Spark plans that hold at 100 TB:
  *
  *  - bm25: the exploded token stream is filtered to the QUERY
  *    vocabulary before anything shuffles, so the aggregation exchange
  *    carries (doc, term, tf) for query terms only — never the corpus
  *    postings. Corpus stats (N, Σdl) are one scalar aggregate; per-term
  *    document frequencies are |Q| rows. Everything joins back
  *    broadcast-sized.
  *  - topKeywords: full postings shuffle ONCE on (doc, term); document
  *    frequencies are a vocabulary-bounded aggregate joined back onto
  *    the per-doc term rows; the per-doc top-k window partitions on
  *    doc_id (group size ≤ doc length — bounded by the data, never the
  *    corpus).
  *
  * Determinism contract (both): per-term contributions quantize to
  * 1e-9 units (longs) BEFORE the per-doc sum / ranking, so aggregation
  * ORDER can never flip a rank across engines — ranking compares exact
  * integers; doubles appear only in the final displayed score. (The
  * residual cross-engine risk is libm `ln` last-ulp disagreement at a
  * quantization boundary, ~1e-10 per term — the same class the q109
  * pow gate documents.)
  */
object Retrieval {

  /** BM25 scores for every document matching >= 1 query term, ranked
    * (score desc, id asc), top `k`. Output: (idCol, score, rank).
    *
    * idf = ln(1 + (N − df + ½)/(df + ½)), tf saturation k1, length
    * normalization b against the corpus mean doc length.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1, "empty query or bad k")
    val terms = queryTerms.distinct
    val docs = df.select(col(idCol).as("__rid"),
      split(col(textCol), " ", -1).as("__w"))
      .select(col("__rid"), col("__w"), size(col("__w")).cast("long").as("__dl"))
    // one-row corpus stats: exact integer sums, one division
    val stats = docs.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__tok"))
    // query-term tf: filter BEFORE the shuffle — only query-term tokens
    // survive the explode
    val tf = docs.select(col("__rid"), col("__dl"), explode(col("__w")).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy("__rid", "__dl", "__t").agg(count(lit(1)).as("__tf"))
    val dfT = tf.groupBy("__t").agg(count_distinct(col("__rid")).as("__df"))
    val contrib = tf
      .join(broadcast(dfT), "__t")
      .crossJoin(broadcast(stats))
      .select(col("__rid"),
        round(
          log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)) *
            (col("__tf") * lit(k1 + 1)) /
            (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") /
              (col("__tok").cast("double") / col("__n")))) * 1e9)
          .cast("long").as("__cq"))
    val scored = contrib.groupBy("__rid").agg(sum(col("__cq")).as("__sq"))
    // integer-keyed top-k: ranking compares exact longs
    scored.orderBy(col("__sq").desc, col("__rid")).limit(k)
      .select(col("__rid"), col("__sq"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__sq").desc, col("__rid"))))
      .select(col("__rid").as(idCol),
        round(col("__sq") / 1e9, 6).as("score"), col("rank"))
  }

  /** Top `k` TF-IDF keywords per document: weight = tf · ln((N+1)/(df+1)),
    * quantized to 1e-9 units before ranking (ties: term asc). Output:
    * (idCol, term, weight, rank) — the per-doc keyword profile behind
    * topical corpus maps and cluster labeling.
    */
  def topKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"bad k $k")
    val docs = df.select(col(idCol).as("__rid"),
      split(col(textCol), " ", -1).as("__w"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val tf = docs.select(col("__rid"), explode(col("__w")).as("__t"))
      .groupBy("__rid", "__t").agg(count(lit(1)).as("__tf"))
    val dfT = tf.groupBy("__t").agg(count_distinct(col("__rid")).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__rid").orderBy(col("__wq").desc, col("__t"))
    tf.join(dfT, "__t").crossJoin(broadcast(n))
      .select(col("__rid"), col("__t"),
        round(col("__tf") * log((col("__n") + 1.0) / (col("__df") + 1.0)) * 1e9)
          .cast("long").as("__wq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__rid").as(idCol), col("__t").as("term"),
        round(col("__wq") / 1e9, 6).as("weight"), col("rank"))
  }
}
