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

  /** Bucket anchor modes (reference: processing.py:771-777 `origin` —
    * epoch / timestamp / start / start_day / end / end_day). The data-
    * derived modes anchor buckets at the frame's first/last index value
    * (optionally floored/ceiled to midnight).
    */
  sealed trait Origin
  case object Epoch extends Origin
  final case class OriginTimestamp(ns: Long) extends Origin
  case object Start extends Origin
  case object StartDay extends Origin
  case object End extends Origin
  case object EndDay extends Origin

  private val DayNs = 86400L * 1000L * 1000L * 1000L

  /** Resolve the origin to (frame, anchor expression). Data-derived
    * origins need one global min/max of the ts column. When the frame is
    * a bare parquet scan, that number comes from the file FOOTERS —
    * driver-side O(files) metadata, no data pass (see
    * core/ParquetFooterStats). Otherwise it is computed as a 1-row
    * aggregate broadcast-joined onto the frame — a partial-agg tree
    * reduction plus a zero-cost broadcast, never a global sort or
    * single-partition window. The anchor already includes `offsetNs`.
    */
  def anchored(
      df: org.apache.spark.sql.DataFrame,
      tsCol: String,
      tsType: org.apache.spark.sql.types.DataType,
      origin: Origin,
      offsetNs: Long): (org.apache.spark.sql.DataFrame, Column) = origin match {
    case Epoch => (df, lit(offsetNs))
    case OriginTimestamp(ns) => (df, lit(ns + offsetNs))
    case dataOrigin =>
      graft.core.ParquetFooterStats.minMaxNs(df, tsCol) match {
        case Some((mn, mx)) =>
          val anchorNs = dataOrigin match {
            case Start => mn
            case StartDay => mn - Math.floorMod(mn, DayNs)
            case End => mx
            case EndDay =>
              val r = Math.floorMod(mx, DayNs)
              mx - r + (if (r == 0) 0L else DayNs)
            case other => throw new IllegalStateException(s"unreachable $other")
          }
          (df, lit(anchorNs + offsetNs))
        case None =>
          val ts = graft.core.Ts.toNs(col(tsCol), tsType)
          val anchor = dataOrigin match {
            case Start => min(ts)
            case StartDay => min(ts) - pmod(min(ts), lit(DayNs))
            case End => max(ts)
            case EndDay =>
              // pandas end_day: ceiling midnight of the last value
              max(ts) - pmod(max(ts), lit(DayNs)) +
                when(pmod(max(ts), lit(DayNs)) === 0, lit(0L)).otherwise(lit(DayNs))
            case other => throw new IllegalStateException(s"unreachable $other")
          }
          val one = df.agg((anchor + lit(offsetNs)).cast("long").as("__origin_anchor"))
          (df.crossJoin(broadcast(one)), col("__origin_anchor"))
      }
  }

  /** Bucket-start expression for a ns long ts column.
    *
    * closed=Left  : [start, start+rule)
    * closed=Right : (start, start+rule]
    * anchor = origin + offset (origin "epoch" → 0), as a Column so
    * data-derived origins plug in.
    */
  def bucketStart(tsNs: Column, ruleNs: Long, closed: Boundary, anchor: Column): Column = {
    val t = if (closed == Right) tsNs - lit(1L) else tsNs
    t - pmod(t - anchor, lit(ruleNs))
  }

  def bucketStart(tsNs: Column, ruleNs: Long, closed: Boundary, anchorNs: Long): Column =
    bucketStart(tsNs, ruleNs, closed, lit(anchorNs))

  /** Bucket label: left edge or right edge of the bucket. */
  def bucketLabel(start: Column, ruleNs: Long, label: Boundary): Column =
    if (label == Left) start else start + lit(ruleNs)
}
