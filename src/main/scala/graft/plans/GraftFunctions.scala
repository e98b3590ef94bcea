package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.BinaryType

/** SQL-surface registration for graft's expression-level operators, so a
  * `spark.sql(...)` user gets the same codegen'd expressions as the
  * Column API (reference exposes its AST only through QueryBuilder; Spark
  * gives a SQL dialect for free once the functions are registered).
  *
  * Builders construct Catalyst trees directly (Lower/RegExpReplace/Md5/…)
  * — a Column round-trip would embed lazy ColumnNode wrappers that the
  * SQL analyzer leaves unevaluable.
  *
  * Use `GraftFunctions.register(spark)` on a live session, or configure
  * `spark.sql.extensions=graft.plans.GraftExtensions` so every session on
  * the cluster has them from the start.
  */
object GraftFunctions {

  /** lower → strip non-[a-z0-9 ] → collapse spaces → trim; the Catalyst
    * twin of graft.functions.Text.normalizeText (same single-pass kernel).
    */
  private def normalizeExpr(e: Expression): Expression = NormalizeText(e)

  private def tokenCountExpr(e: Expression): Expression =
    Size(StringSplit(e, Literal(" "), Literal(-1)))

  private def fingerprintExpr(e: Expression): Expression =
    Md5(Cast(normalizeExpr(e), BinaryType))

  /** (name, builder, usage) for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_normalize", exprs => normalizeExpr(exprs.head),
      "graft_normalize(text) - lowercase, alnum+space, collapsed whitespace"),
    ("graft_token_count", exprs => tokenCountExpr(exprs.head),
      "graft_token_count(text) - whitespace token count"),
    ("graft_fingerprint", exprs => fingerprintExpr(exprs.head),
      "graft_fingerprint(text) - md5 of normalized text"),
    ("graft_top_k", exprs => {
      val k = exprs(2) match {
        case Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"graft_top_k k must be an integer literal, got $other")
      }
      TopKByScore(exprs(0), exprs(1), k)
    }, "graft_top_k(score, id, k) - aggregate: k best (score,id) pairs"),
    ("graft_rolling_hash", exprs => RollingTextHash(exprs.head),
      "graft_rolling_hash(text) - base-31 mod 2^31-1 hash of normalized text"),
    ("graft_distinct_shingles", exprs => {
      val n = exprs(1) match {
        case Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"graft_distinct_shingles n must be an integer literal, got $other")
      }
      DistinctShingles(exprs.head, n)
    }, "graft_distinct_shingles(text, n) - distinct word-n-gram shingles"),
    ("graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)),
      "graft_cosine(a, b) - cosine similarity of two float vectors"),
    ("graft_vector_mean", exprs => VectorMean(exprs.head),
      "graft_vector_mean(vec) - aggregate: element-wise mean of float vectors"))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder, _) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** `spark.sql.extensions`-injectable variant (cluster-wide install). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.GraftFunctions", null, name, usage,
          "", "", "", "", "", "", "scala_udf"),
        builder))
    }
}
