package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Centralized pandas-style null semantics (SURVEY §7 "hard parts").
  *
  * The reference treats NaN as missing everywhere (float→NaN, time→NaT,
  * reference: cpp/arcticdb/processing/operation_types.hpp:65-72); its
  * aggregators exclude NaN/None (unsorted_aggregation.hpp:76-208).
  * Spark's sum/avg skip null but PROPAGATE NaN, and max() sorts NaN above
  * every double — so float columns are NaN→null-normalized before any
  * aggregate.
  */
object NullSemantics {

  def isFloating(t: DataType): Boolean = t == FloatType || t == DoubleType

  /** NaN→null for floating columns; identity otherwise. */
  def nanToNull(c: Column, t: DataType): Column =
    if (isFloating(t)) when(isnan(c), lit(null).cast(t)).otherwise(c) else c

  /** Aggregate with pandas semantics. `count` counts non-null/non-NaN
    * (reference AggregationClause, clause.cpp:330-530); `mean` of int is
    * double (Spark avg already); min/max of all-null group yields null
    * (Spark already); sum of all-null group yields 0 in pandas — Spark
    * yields null, fixed up with coalesce.
    */
  def agg(op: String, in: Column, t: DataType, out: String): Column = {
    val c = nanToNull(in, t)
    val a = op match {
      case "sum" => coalesce(sum(c), lit(0).cast(if (isFloating(t)) DoubleType else LongType))
      case "mean" => avg(c)
      case "min" => min(c)
      case "max" => max(c)
      case "count" => count(c)
      case other => throw new IllegalArgumentException(s"unsupported agg op $other")
    }
    a.as(out)
  }

  /** Sorted (resample) aggregates add first/last by time order
    * (reference sorted_aggregation.hpp:102-503).
    */
  def sortedAgg(op: String, in: Column, t: DataType, tsCol: Column, out: String): Column =
    op match {
      case "first" => min_by(nanToNull(in, t), tsCol).as(out)
      case "last" => max_by(nanToNull(in, t), tsCol).as(out)
      case _ => agg(op, in, t, out)
    }
}
