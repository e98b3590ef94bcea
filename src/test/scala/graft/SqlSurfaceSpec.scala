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
