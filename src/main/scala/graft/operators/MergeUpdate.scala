package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL-MERGE semantics over DataFrames — the reference's
  * `merge_experimental` (reference: python/arcticdb/version_store/
  * library.py:3411-3516, MergeStrategy _store.py:117; C++ kernel
  * cpp/arcticdb/processing/clause_merge_update.cpp).
  *
  * Strategies: matched → update | do_nothing;
  * not-matched-by-target → insert | do_nothing.
  * Match keys use null-safe equality (`<=>`); the reference deliberately
  * matches NaN==NaN (library.py:3460-3463), which Spark's NaN semantics
  * (NaN = NaN is true) already provide.
  *
  * Plan shape: one shuffle (full outer join on the key columns); with the
  * Library layer the rewrite only touches files whose index range
  * intersects the source (Library.update), so at 100 TB a merge of one
  * day's corrections never rewrites years of data.
  */
object MergeUpdate {

  def merge(
      target: DataFrame,
      source: DataFrame,
      on: Seq[String],
      matched: String = "update", // update | do_nothing
      notMatchedByTarget: String = "insert" // insert | do_nothing
  ): DataFrame = {
    require(on.nonEmpty, "merge requires at least one key column")
    val outCols = target.columns.toSeq

    // Prefix-rename the source side so self-derived target/source frames
    // can never hit ambiguous-lineage resolution.
    val s = source.columns
      .foldLeft(source.withColumn("__s", lit(true))) { (d, c) =>
        d.withColumnRenamed(c, s"__s_$c")
      }
    val t = target.withColumn("__t", lit(true))

    val cond = on.map(k => col(k) <=> col(s"__s_$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")

    val hasT = coalesce(col("__t"), lit(false))
    val hasS = coalesce(col("__s"), lit(false))

    val picked = outCols.map { c =>
      val fromT = col(c)
      val fromS: org.apache.spark.sql.Column =
        if (source.columns.contains(c)) col(s"__s_$c") else lit(null)
      val merged =
        if (on.contains(c)) coalesce(fromT, fromS)
        else
          when(hasT && hasS, if (matched == "update") fromS else fromT)
            .when(!hasT && hasS, fromS)
            .otherwise(fromT)
      merged.as(c)
    }

    val keep =
      if (notMatchedByTarget == "insert") hasT || hasS
      else hasT

    joined.filter(keep).select(picked: _*)
  }
}
