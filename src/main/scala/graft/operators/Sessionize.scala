package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.NullSemantics

/** Gap-based sessionization over the engine's ns-long event time — the
  * canonical events→sessions rollup of a training-data/analytics pipeline.
  *
  * Built on Spark's merging session_window (the built-in that exists
  * exactly for this; a lag+cumsum window formulation is the portable SQL
  * equivalent the oracle uses). Works identically over a stream: groupBy
  * session_window on a watermarked event-time column emits a session once
  * the watermark passes its close (see StreamingSpec).
  *
  * Two events belong to one session iff their gap is strictly less than
  * `gap` — Spark's session semantics ([ts, ts+gap) extension).
  */
object Sessionize {

  /** One row per (keys, session): session_start (epoch-µs long) plus the
    * requested aggregates ((outName, inCol, op) with the engine's pandas
    * null semantics).
    */
  def sessions(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      gap: String,
      aggs: Seq[(String, String, String)]): DataFrame = {
    val schema = df.schema
    val cols = aggs.map { case (out, in, op) =>
      NullSemantics.agg(op, col(in), schema(in).dataType, out)
    }
    df.withColumn("__event", graft.core.Ts.toEventTime(tsCol, schema(tsCol).dataType))
      .groupBy(keys.map(col) :+ session_window(col("__event"), gap): _*)
      .agg(cols.head, cols.tail: _*)
      .withColumn("session_start", unix_micros(col("session_window.start")))
      .drop("session_window", "__event")
      .select((keys.map(col) :+ col("session_start")) ++ aggs.map(a => col(a._1)): _*)
  }
}
