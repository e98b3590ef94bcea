package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's query surface is a LINEAR PIPELINE of clauses
  * (reference: IClause, cpp/arcticdb/processing/clause.hpp:50-99; Python
  * QueryBuilder, python/arcticdb/version_store/processing.py). Each clause
  * here is a `DataFrame => DataFrame`; the pipeline is a fold and Catalyst
  * is the optimizer — filter pushdown, column pruning, partial aggregation
  * and exchange placement replace the reference's hand-scheduled futures
  * (version_core.cpp:812-959).
  *
  * Barrier clauses in the reference (GroupBy→Aggregation, Resample,
  * RowRange, Sort) are exactly where Catalyst inserts an Exchange.
  */
final case class QueryBuilder(
    clauses: Vector[DataFrame => DataFrame] = Vector.empty,
    /** Filter Exprs that form an unbroken PREFIX of the pipeline (nothing
      * but filters before them). Only these refer to the symbol's stored
      * columns, so only these may drive per-file stats pruning
      * (Library.readQuery → StatsPruner); a filter after a project/groupBy
      * sees derived columns and is excluded.
      */
    prefixFilters: Vector[Expr] = Vector.empty,
    private val prefixIntact: Boolean = true) {

  private def add(f: DataFrame => DataFrame): QueryBuilder =
    copy(clauses = clauses :+ f, prefixIntact = false)

  /** Apply `other`'s processing AFTER this builder's (reference
    * QueryBuilder.then, processing.py:927) — pipelines compose linearly,
    * so reusable clause chains can be built separately and joined.
    * `other`'s filter prefix keeps driving file-stats pruning as long as
    * EVERYTHING before it (this builder) is also a pure filter prefix.
    */
  def `then`(other: QueryBuilder): QueryBuilder = QueryBuilder(
    clauses ++ other.clauses,
    if (prefixIntact) prefixFilters ++ other.prefixFilters else prefixFilters,
    prefixIntact && other.prefixIntact)

  /** Apply `other`'s processing BEFORE this builder's (processing.py:945). */
  def prepend(other: QueryBuilder): QueryBuilder = other.`then`(this)

  /** Reference API parity (processing.py:1220,1227): the reference's
    * optimise_for_speed/_memory toggle eager reclamation of string-pool
    * memory inside ITS column-sliced execution engine. Spark has no
    * column slicing (SURVEY §2.1: Split/column segmentation is N/A by
    * design) and Tungsten's UnsafeRow/off-heap management plays that
    * role, so both hints are accepted no-ops — the plan is already the
    * memory-bounded one.
    */
  def optimiseForSpeed(): QueryBuilder = this
  def optimiseForMemory(): QueryBuilder = this

  /** FilterClause (clause.hpp:142-199) — boolean expression AST → keep rows. */
  def filter(e: Expr): QueryBuilder =
    copy(
      clauses = clauses :+ ((df: DataFrame) => df.filter(Expr.compile(e, df))),
      prefixFilters = if (prefixIntact) prefixFilters :+ e else prefixFilters)

  /** ProjectClause (clause.hpp:201-258) — append computed column. */
  def project(name: String, e: Expr): QueryBuilder =
    add(df => df.withColumn(name, Expr.compile(e, df)))

  /** Large-valueset ISIN as a broadcast semi/anti join — at 100 TB a
    * 10^6-element isin literal would bloat codegen; a broadcast join is the
    * scalable plan for the same semantics (SURVEY §2.2 membership row).
    */
  def isinLarge(colName: String, values: DataFrame, negate: Boolean = false): QueryBuilder =
    add { df =>
      val joinType = if (negate) "left_anti" else "left_semi"
      df.join(broadcast(values), df(colName) === values(values.columns.head), joinType)
    }

  /** PartitionClause+AggregationClause (clause.hpp:260-377): groupby with
    * pandas null semantics; ops sum/mean/min/max/count.
    * aggs: (outName, inCol, op).
    *
    * dropNullKeys=true (default) reproduces pandas/reference behavior:
    * rows whose group key is null (or NaN for floats) are EXCLUDED from
    * the aggregation (unsorted_aggregation.hpp groups only present keys);
    * false gives SQL semantics (null is a group).
    */
  def groupByAgg(
      keys: Seq[String],
      aggs: Seq[(String, String, String)],
      dropNullKeys: Boolean = true): QueryBuilder =
    add { df =>
      val schema = df.schema
      val base =
        if (!dropNullKeys) df
        else df.filter(keys.map { k =>
          val c = col(k)
          schema(k).dataType match {
            case org.apache.spark.sql.types.FloatType |
                org.apache.spark.sql.types.DoubleType => c.isNotNull && !isnan(c)
            case _ => c.isNotNull
          }
        }.reduce(_ && _))
      val (aggCols, posts) = NullSemantics.aggPlan(aggs, schema, None)
      base.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
        .select(keys.map(col) ++ posts: _*)
    }

  /** ResampleClause (clause_resample.cpp:112-430): time-bucket a ns long
    * ts column, aggregate per bucket with sum/mean/min/max/first/last/count.
    * Output index column keeps the ts column's name (bucket label ns).
    */
  def resample(
      tsCol: String,
      rule: String,
      aggs: Seq[(String, String, String)],
      closed: Resample.Boundary = Resample.Left,
      label: Resample.Boundary = Resample.Left,
      offsetNs: Long = 0L,
      origin: Resample.Origin = Resample.Epoch): QueryBuilder =
    add { df =>
      import graft.core.Ts
      val ruleNs = Resample.ruleToNs(rule)
      val schema = df.schema
      val tsType = schema(tsCol).dataType
      // Bucket arithmetic runs in the canonical ns domain regardless of
      // the physical index type; for µs timestamp inputs the label is
      // converted back to the input type, which requires µs-aligned
      // buckets (every realistic rule; ns-sub-µs rules need a long index).
      if (Ts.isTs(tsType)) {
        require(ruleNs % 1000L == 0L && offsetNs % 1000L == 0L,
          s"resample on a $tsType index needs µs-aligned rule and offset")
        // an unaligned origin anchor would make bucket starts non-µs-
        // aligned and the `__bucket div 1000` label conversion truncate —
        // silently shifted labels instead of a failure
        origin match {
          case Resample.OriginTimestamp(ns) =>
            require(ns % 1000L == 0L,
              s"resample on a $tsType index needs a µs-aligned origin (got $ns ns)")
          case _ => ()
        }
      }
      val tsNs = Ts.toNs(col(tsCol), tsType)
      val (frame, anchor) = Resample.anchored(df, tsCol, tsType, origin, offsetNs)
      val start = Resample.bucketStart(tsNs, ruleNs, closed, anchor)
      val lbl = Resample.bucketLabel(start, ruleNs, label)
      val (aggCols, posts) = NullSemantics.aggPlan(aggs, schema, Some(tsNs))
      val bucketed = frame.withColumn("__bucket", lbl)
        .groupBy(col("__bucket"))
        .agg(aggCols.head, aggCols.tail: _*)
        .select(col("__bucket") +: posts: _*)
      if (Ts.isTs(tsType))
        bucketed.withColumn("__bucket",
          timestamp_micros(expr("__bucket div 1000")).cast(tsType))
          .withColumnRenamed("__bucket", tsCol)
      else bucketed.withColumnRenamed("__bucket", tsCol)
    }

  /** DateRangeClause (clause.cpp:1020-1078): inclusive [t0, t1] on the ns
    * index column. Catalyst pushes this to the parquet scan (min/max
    * row-group pruning); the manifest layer additionally prunes whole
    * files (Library.read with dateRange).
    */
  def dateRange(tsCol: String, t0: Long, t1: Long): QueryBuilder =
    add(df => df.filter(
      graft.core.Ts.betweenNs(col(tsCol), df.schema(tsCol).dataType, t0, t1)))

  /** Open-ended DateRangeClause — the reference's common
    * `date_range=(None, t1)` / `(t0, None)` call shape (library.py:2022):
    * only the present bounds compare; the pushed predicate is one-sided,
    * so parquet row-group pruning still applies on that side.
    */
  def dateRange(tsCol: String, t0: Option[Long], t1: Option[Long]): QueryBuilder =
    add(df => df.filter(
      graft.core.Ts.betweenNsOpen(col(tsCol), df.schema(tsCol).dataType, t0, t1)))

  /** RowRangeClause head variant (clause.hpp:649-723): first n rows in
    * index order.
    */
  def head(orderCols: Seq[String], n: Int): QueryBuilder =
    add(df => df.orderBy(orderCols.map(col): _*).limit(n))

  /** tail: last n rows in index order. Implemented as a reversed-order
    * limit (TakeOrderedAndProject — no full sort, no single-task collect),
    * re-sorted ascending for output determinism.
    */
  def tail(orderCols: Seq[String], n: Int): QueryBuilder =
    add { df =>
      df.orderBy(orderCols.map(c => col(c).desc): _*)
        .limit(n)
        .orderBy(orderCols.map(col): _*)
    }

  /** row_range [start, end) in index order, with python-slice negative
    * wrap (reference: clause.cpp:874-1018). On a persisted symbol the
    * Library's `_row_id` column makes this a pushed-down range filter
    * (negative indices cost one count() pass; `_row_id` is assumed
    * contiguous, i.e. produced by Library.read before any row filter).
    * On an arbitrary frame the range is taken as orderBy+limit(end) —
    * a TakeOrdered, never a global sort — followed by a row_number over
    * the ≤ end retained rows; `end` must stay driver-bounded
    * (≤ MaxUnindexedEnd) because those rows pass through one task, exactly
    * like the reference's full-table row ranges. Larger ranges need a
    * persisted symbol (Library.readRowRange prunes files by manifest
    * offsets instead).
    */
  def rowRange(orderCols: Seq[String], start: Long, end: Long): QueryBuilder =
    add { df =>
      def norm(n: Long): (Long, Long) =
        (if (start < 0) math.max(0L, n + start) else start,
          if (end < 0) math.max(0L, n + end) else end)
      if (df.columns.contains(graft.core.Library.RowIdCol)) {
        val se =
          if (start >= 0 && end >= 0) Some((start, end))
          else {
            val mx = df.agg(max(col(graft.core.Library.RowIdCol))).head
            if (mx.isNullAt(0)) None // empty frame → empty result
            else Some(norm(mx.getLong(0) + 1))
          }
        se match {
          case Some((s, e)) =>
            df.filter(col(graft.core.Library.RowIdCol) >= s &&
              col(graft.core.Library.RowIdCol) < e)
          case None => df.filter(lit(false))
        }
      } else {
        val (s, e) = if (start >= 0 && end >= 0) (start, end) else norm(df.count())
        require(e <= QueryBuilder.MaxUnindexedEnd,
          s"rowRange end=$e exceeds the unindexed-frame bound " +
            s"(${QueryBuilder.MaxUnindexedEnd}); read the symbol through " +
            "Library.readRowRange, which prunes files by manifest row offsets")
        val w = Window.orderBy(orderCols.map(col): _*)
        df.orderBy(orderCols.map(col): _*).limit(e.toInt)
          .withColumn("__rn", row_number().over(w) - 1)
          .filter(col("__rn") >= s)
          .drop("__rn")
      }
    }

  /** ConcatClause (clause.cpp:1080-1145): row-wise concat of N frames.
    * outer join of schemas backfills missing columns — with SQL null by
    * default, or with the reference's dynamic-schema typed defaults
    * (0 / NaN / false / null, library.py:1069-1072) when
    * `typedDefaults=true`; inner join keeps common columns only.
    */
  def concat(
      others: Seq[DataFrame],
      join: String = "outer",
      typedDefaults: Boolean = false): QueryBuilder =
    add { df =>
      val frames = df +: others
      // Dynamic-schema type promotion (reference: has_valid_common_type,
      // type_utils.hpp:17-43): shared columns cast to their common type.
      val types = scala.collection.mutable.LinkedHashMap.empty[String, org.apache.spark.sql.types.DataType]
      frames.foreach(_.schema.fields.foreach { f =>
        types(f.name) = types.get(f.name).map(Expr.commonType(_, f.dataType)).getOrElse(f.dataType)
      })
      def promote(f: DataFrame): DataFrame =
        f.select(f.columns.map(c => col(c).cast(types(c)).as(c)): _*)
      def default(t: org.apache.spark.sql.types.DataType): Column = {
        import org.apache.spark.sql.types._
        val v: Any = t match {
          case ByteType | ShortType | IntegerType | LongType => 0
          case FloatType | DoubleType => Double.NaN
          case BooleanType => false
          case _ => null
        }
        lit(v).cast(t)
      }
      join match {
        case "outer" if typedDefaults =>
          val all = types.keys.toSeq
          frames.map(promote).map { f =>
            val have = f.columns.toSet
            f.select(all.map(c =>
              (if (have(c)) col(c) else default(types(c))).as(c)): _*)
          }.reduce(_ unionByName _)
        case "outer" =>
          frames.map(promote).reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
        case "inner" =>
          val common = others.foldLeft(df.columns.toSeq)((acc, o) =>
            acc.filter(o.columns.contains))
          frames.map(promote).map(_.select(common.map(col): _*)).reduce(_ unionByName _)
        case other => throw new IllegalArgumentException(s"concat join $other")
      }
    }

  /** SortClause (clause.cpp:628-695): global sort by index column(s) —
    * Spark range-partitioned sort-shuffle.
    */
  def sort(cols: Seq[String]): QueryBuilder = add(df => df.orderBy(cols.map(col): _*))

  def apply(df: DataFrame): DataFrame = clauses.foldLeft(df)((d, c) => c(d))
}

object QueryBuilder {
  def apply(): QueryBuilder = new QueryBuilder(Vector.empty)

  /** Largest `end` the unindexed rowRange fallback accepts: the retained
    * prefix flows through a single task (limit + one window), so it must
    * stay bounded. Library-read symbols carry `_row_id` and never hit
    * this path.
    */
  val MaxUnindexedEnd: Long = 10000000L
}
