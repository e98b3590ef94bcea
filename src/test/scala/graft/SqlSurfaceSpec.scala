package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.plans.GraftFunctions

/** The SQL dialect (GraftFunctions registry) must be bit-identical to the
  * Column API — both compile to the same Catalyst expressions.
  */
class SqlSurfaceSpec extends SparkSuite {
  import spark.implicits._

  test("registered SQL functions equal their Column-API twins") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("docs_sql_spec")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_count(text) n, graft_normalize(text) nm,
               graft_fingerprint(text) fp
         FROM docs_sql_spec""").collect()
    val viaCol = docs.select(col("doc_id"),
      Text.tokenCount(col("text")), Text.normalizeText(col("text")),
      Text.fingerprint(col("text"))).collect()
    assert(viaSql.map(_.toSeq).toSeq.sortBy(_.head.toString) ==
      viaCol.map(_.toSeq).toSeq.sortBy(_.head.toString))
  }

  test("text/vector kernels are reachable from SQL and equal their Column twins") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("docs_sql_spec2")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_rolling_hash(text) rh,
               size(graft_distinct_shingles(text, 3)) ns
         FROM docs_sql_spec2""").collect()
    val viaCol = docs.select(col("doc_id"),
      Text.rollingHash(col("text")),
      size(graft.plans.DistinctShingles(col("text"), 3))).collect()
    assert(viaSql.map(_.toSeq).toSeq.sortBy(_.head.toString) ==
      viaCol.map(_.toSeq).toSeq.sortBy(_.head.toString))

    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    emb.createOrReplaceTempView("emb_sql_spec")
    val sims = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) s
         FROM emb_sql_spec a JOIN emb_sql_spec b ON b.vec_id = 0
         WHERE a.vec_id < 5""").collect()
    assert(sims.length == 5 && sims.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
    val mean = spark.sql(
      "SELECT graft_vector_mean(embedding) m FROM emb_sql_spec").collect()
    assert(mean.head.getSeq[Float](0).nonEmpty)
  }

  test("graft_vector_mean skips vectors with null elements instead of corrupting the mean") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT graft_vector_mean(v) m FROM VALUES
         (array(cast(1.0 as float), cast(2.0 as float))),
         (array(cast(null as float), cast(100.0 as float))),
         (array(cast(3.0 as float), cast(4.0 as float))) t(v)""").collect()
    assert(got.head.getSeq[Float](0) == Seq(2.0f, 3.0f))
  }

  test("graft_top_k works as a SQL aggregate") {
    GraftFunctions.register(spark)
    Seq((1L, 10L, 0.9), (1L, 11L, 0.5), (1L, 12L, 0.7), (2L, 13L, 0.1))
      .toDF("g", "id", "score").createOrReplaceTempView("topk_spec")
    val got = spark.sql(
      "SELECT g, graft_top_k(score, id, 2) hits FROM topk_spec GROUP BY g")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getDouble(1))))
      .toMap
    assert(got(1L) == Seq((10L, 0.9), (12L, 0.7)))
    assert(got(2L) == Seq((13L, 0.1)))
  }
}
