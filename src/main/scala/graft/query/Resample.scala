package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pandas/ArcticDB-compatible time-bucketing over a ns-since-epoch long
  * column (reference: ResampleClause, cpp/arcticdb/processing/
  * clause_resample.cpp:112-430; semantics documented at
  * python/arcticdb/version_store/processing.py:749-801).
  *
  * Unlike the reference's sorted single-pass kernel, the Spark plan is a
  * hash aggregation over a computed bucket column — the bucket expression
  * is pure arithmetic, stays inside whole-stage codegen, and needs no
  * sortedness. Empty buckets are naturally absent (the reference drops
  * them too).
  */
object Resample {

  /** Parse a pandas-style offset rule ("1h30min", "15s", "1D") to ns. */
  def ruleToNs(rule: String): Long = {
    val token = "(\\d+)?\\s*(ns|us|ms|min|s|h|t|d|l|u|n)".r
    val matches = token.findAllMatchIn(rule.trim.toLowerCase).toList
    require(matches.nonEmpty, s"cannot parse resample rule '$rule'")
    val parsed = matches.map { m =>
      val n = Option(m.group(1)).map(_.toLong).getOrElse(1L)
      val unit = m.group(2) match {
        case "ns" | "n" => 1L
        case "us" | "u" => 1000L
        case "ms" | "l" => 1000L * 1000
        case "s" => 1000L * 1000 * 1000
        case "min" | "t" => 60L * 1000 * 1000 * 1000
        case "h" => 3600L * 1000 * 1000 * 1000
        case "d" => 24L * 3600 * 1000 * 1000 * 1000
        case u => throw new IllegalArgumentException(s"unknown unit $u")
      }
      n * unit
    }
    parsed.sum
  }

  sealed trait Boundary
  case object Left extends Boundary
  case object Right extends Boundary

  /** Bucket-start expression for a ns long ts column.
    *
    * closed=Left  : [start, start+rule)
    * closed=Right : (start, start+rule]
    * anchorNs = origin + offset (origin "epoch" → 0).
    */
  def bucketStart(tsNs: Column, ruleNs: Long, closed: Boundary, anchorNs: Long): Column = {
    val t = if (closed == Right) tsNs - lit(1L) else tsNs
    t - pmod(t - lit(anchorNs), lit(ruleNs))
  }

  /** Bucket label: left edge or right edge of the bucket. */
  def bucketLabel(start: Column, ruleNs: Long, label: Boundary): Column =
    if (label == Left) start else start + lit(ruleNs)
}
