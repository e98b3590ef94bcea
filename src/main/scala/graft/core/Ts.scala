package graft.core

import java.time.LocalDateTime
import java.time.ZoneOffset

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-index type dispatch — ONE place that knows how the engine's
  * canonical epoch-nanosecond unit (ArcticDB `NANOSECONDS_UTC64`,
  * reference cpp/arcticdb/entity/types.hpp) maps onto each Spark index
  * type a symbol can carry:
  *
  *  - `LongType`/`IntegerType`: the raw value IS nanoseconds (reference
  *    parity for integer indexes, legacy ns-long event fixtures),
  *  - `TimestampType`/`TimestampNTZType`: parquet µs timestamps (what
  *    pandas/pyarrow write by default — the driver testdata); the session
  *    timezone is pinned to UTC (GraftSession), so NTZ wall clock ==
  *    instant and both convert losslessly to epoch-µs,
  *  - `DateType`: midnight-of-day.
  *
  * Comparisons against ns bounds on µs-precision columns are EXACT, not
  * approximate: for a µs-quantized value v and ns bound b,
  * `v*1000 < b  ⟺  v < ceilDiv(b,1000)` and
  * `v*1000 ≤ b  ⟺  v ≤ floorDiv(b,1000)`, so every ns-unit predicate
  * rewrites to a µs-unit predicate with a FOLDABLE timestamp literal —
  * which Catalyst constant-folds and pushes into the parquet scan
  * (row-group pruning), where wrapping the column in `unix_micros(...)`
  * would not push down at all.
  */
object Ts {

  def isTs(t: DataType): Boolean = t == TimestampType || t == TimestampNTZType

  /** Epoch-ns from a wall-clock instant — the reference's
    * `nanoseconds_from_utc` (processing.py:368, pandas Timestamp.value)
    * for building ns-domain filter literals in JVM code.
    */
  def nanosFromUtc(t: java.time.Instant): Long =
    Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000000L), t.getNano.toLong)

  /** Duration → ns — the reference's `nanoseconds_timedelta`
    * (processing.py:376, pandas Timedelta.value).
    */
  def nanos(d: java.time.Duration): Long = d.toNanos

  // overflow-safe ceiling: ns + 999 wraps negative within 999 of
  // Long.MaxValue — the Long.MaxValue-as-open-upper-bound idiom
  def ceilDivUs(ns: Long): Long =
    Math.floorDiv(ns, 1000L) + (if (Math.floorMod(ns, 1000L) != 0L) 1L else 0L)
  def floorDivUs(ns: Long): Long = Math.floorDiv(ns, 1000L)

  /** Column → epoch-ns long (UTC). Identity for long columns. Exact:
    * unix_micros yields a µs long, and µs*1000 stays well inside Long.
    */
  def toNs(c: Column, t: DataType): Column = t match {
    case LongType => c
    case IntegerType => c.cast(LongType)
    case TimestampType => unix_micros(c) * lit(1000L)
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) * lit(1000L)
    case DateType => unix_micros(c.cast(TimestampType)) * lit(1000L)
    case other => throw new IllegalArgumentException(s"not a time-index type: $other")
  }

  /** Inverse of [[toNs]]: an epoch-ns long column back to the physical
    * index type. µs-typed targets floor sub-µs amounts (the physical
    * type cannot carry them); the ns→µs division runs in Decimal so an
    * ~1.7e18 ns epoch never transits a 52-bit double mantissa.
    */
  def fromNs(ns: Column, t: DataType): Column = t match {
    case LongType => ns
    case TimestampType =>
      timestamp_micros(floor(ns.cast(DecimalType(38, 0)) / lit(1000)).cast(LongType))
    case TimestampNTZType =>
      timestamp_micros(floor(ns.cast(DecimalType(38, 0)) / lit(1000)).cast(LongType))
        .cast(TimestampNTZType)
    case DateType =>
      timestamp_micros(floor(ns.cast(DecimalType(38, 0)) / lit(1000)).cast(LongType))
        .cast(DateType)
    case other => throw new IllegalArgumentException(s"not a time-index type: $other")
  }

  /** Event-time column for streaming/session operators: a real
    * TimestampType column regardless of the source representation. Takes
    * the column NAME so the ns-long branch can use SQL integer `div`
    * (the Column `/` operator divides through double, which cannot
    * represent an ns epoch exactly).
    */
  def toEventTime(tsCol: String, t: DataType): Column = t match {
    case TimestampType => col(tsCol)
    case TimestampNTZType => col(tsCol).cast(TimestampType)
    case DateType => col(tsCol).cast(TimestampType)
    case LongType | IntegerType => timestamp_micros(expr(s"`$tsCol` div 1000"))
    case other => throw new IllegalArgumentException(s"not a time-index type: $other")
  }

  /** A foldable literal of type `t` representing epoch-µs `us`. */
  def usLit(us: Long, t: DataType): Column = t match {
    case TimestampType =>
      lit(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case TimestampNTZType =>
      lit(LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        ZoneOffset.UTC))
    case LongType => lit(us)
    case other => throw new IllegalArgumentException(s"usLit for $other")
  }

  /** Rewrite `col <op> nsBound` (conceptually in the ns domain) into an
    * exact predicate on the column's OWN type with a foldable literal.
    * `op` ∈ {"<", "<=", ">", ">=", "==", "!="}. For long columns this is
    * the raw ns comparison. For timestamp columns the µs-exactness
    * identity above picks ceil or floor per operator.
    */
  def cmpNs(c: Column, t: DataType, op: String, ns: Long): Column = t match {
    case LongType | IntegerType =>
      op match {
        case "<" => c < ns
        case "<=" => c <= ns
        case ">" => c > ns
        case ">=" => c >= ns
        case "==" => c === ns
        case "!=" => c =!= ns
        case other => throw new IllegalArgumentException(s"cmpNs op $other")
      }
    case TimestampType | TimestampNTZType =>
      op match {
        case "<" => c < usLit(ceilDivUs(ns), t)
        case "<=" => c <= usLit(floorDivUs(ns), t)
        case ">" => c > usLit(floorDivUs(ns), t)
        case ">=" => c >= usLit(ceilDivUs(ns), t)
        case "==" =>
          if (ns % 1000L == 0L) c === usLit(ns / 1000L, t)
          else when(c.isNull, lit(null).cast(BooleanType)).otherwise(lit(false))
        case "!=" =>
          if (ns % 1000L == 0L) c =!= usLit(ns / 1000L, t)
          else when(c.isNull, lit(null).cast(BooleanType)).otherwise(lit(true))
        case other => throw new IllegalArgumentException(s"cmpNs op $other")
      }
    case other => throw new IllegalArgumentException(s"cmpNs on $other")
  }

  /** Inclusive [loNs, hiNs] range predicate on the column's own type —
    * the pushdown-friendly residual for date_range.
    */
  def betweenNs(c: Column, t: DataType, loNs: Long, hiNs: Long): Column =
    cmpNs(c, t, ">=", loNs) && cmpNs(c, t, "<=", hiNs)

  /** Open-ended inclusive range: only the PRESENT bounds compare — the
    * reference's `date_range=(None, t1)` / `(t0, None)` call shape
    * (library.py:2022). Both-None is the degenerate full range (filter
    * folds to true), matching `date_range=None`.
    */
  def betweenNsOpen(
      c: Column, t: DataType, loNs: Option[Long], hiNs: Option[Long]): Column =
    (loNs.map(cmpNs(c, t, ">=", _)) ++ hiNs.map(cmpNs(c, t, "<=", _)))
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Convert a caller-facing ns bound pair into the MANIFEST unit of an
    * index type (µs for timestamp/date indexes, ns for long indexes),
    * rounding inward so inclusive-[lo,hi] semantics are preserved exactly
    * for µs-quantized data.
    */
  def nsRangeToIdxUnit(lo: Long, hi: Long, t: DataType): (Long, Long) = t match {
    case TimestampType | TimestampNTZType | DateType =>
      (ceilDivUs(lo), floorDivUs(hi))
    case _ => (lo, hi)
  }
}
