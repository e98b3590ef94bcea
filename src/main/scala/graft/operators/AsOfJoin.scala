package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking) join — the canonical timeseries operator the
  * reference lacks (SURVEY §2.2 "not present"), added because a
  * timeseries engine without it is incomplete.
  *
  * For each left row, attach the most recent right row with
  * right.ts <= left.ts within the same `by` key.
  *
  * Implementation: union-tag + per-key ordered window with
  * last(ignoreNulls) — ONE shuffle on the `by` key, no range join, no
  * nested loop; at 100 TB this is the only formulation that scales (a
  * range-condition join would either nested-loop or explode). Skewed keys
  * fall out of AQE; per-key data is streamed through the window in ts
  * order.
  */
object AsOfJoin {

  /** toleranceNs >= 0 bounds the lookback: a match older than
    * `left.ts - toleranceNs` yields null values (pandas merge_asof
    * `tolerance`). tsCol is the engine's canonical ns-epoch long.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      by: Seq[String],
      rightValueCols: Seq[String],
      toleranceNs: Long = -1L): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side") :+
        lit(null).cast(left.schema(tsCol).dataType).as("__r_ts")) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((by.map(col) :+ col(tsCol) :+ col("__side") :+
        col(tsCol).as("__r_ts")) ++
        rightValueCols.map(c => col(c).as(s"__r_$c")): _*)

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal ts => right.ts <= left.ts.
    val w = Window
      .partitionBy(by.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = ("ts" +: rightValueCols).foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val tsType = left.schema(tsCol).dataType
    val inWindow =
      if (toleranceNs < 0) lit(true)
      else col("__f_ts").isNotNull &&
        (graft.core.Ts.toNs(col(tsCol), tsType) -
          graft.core.Ts.toNs(col("__f_ts"), tsType) <= toleranceNs)
    filled
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c =>
          when(inWindow, col(s"__f_$c")).otherwise(lit(null)).as(s"right_$c")): _*)
  }
}
