package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Composite ("multi-") index flattening, the reference's normalization
  * convention re-expressed for Spark (reference:
  * python/arcticdb/version_store/_normalization.py:611,931-947 and
  * cpp/arcticdb/version/version_core.cpp:971-989): level 0 stays the
  * physical index column — it is what segments sort by, what DateRange
  * prunes on, what as-of joins key on — and every deeper level becomes a
  * plain column named `__idx__<name>`. Restoring is a rename back; the
  * set of levels is recoverable from the schema alone, so no metadata
  * sidecar is needed.
  *
  * Deviation from the reference, documented: pandas MultiIndex levels can
  * be unnamed (the reference writes `__index_level_<n>__` "fake" fields
  * and records their positions); Spark columns are always named, so the
  * fake-field machinery has no analog here.
  *
  * Scale note: flatten/restore are pure metadata (column renames) — zero
  * jobs, zero shuffles. A query that groups or joins on secondary levels
  * shuffles exactly as it would on ordinary columns; keeping level 0 as
  * THE index preserves every pruning path (manifest key ranges, footer
  * stats, staged-splice validation) untouched.
  */
object MultiIndex {

  val Prefix = "__idx__"

  /** Flatten a composite index: `levels.head` keeps its name (the
    * physical index), deeper levels are renamed to `__idx__<name>`.
    * Returns the flattened frame; pass `levels.head` as the index column
    * to Library.write.
    */
  def flatten(df: DataFrame, levels: Seq[String]): DataFrame = {
    require(levels.nonEmpty, "at least one index level")
    levels.foreach(l => require(df.columns.contains(l), s"missing index level '$l'"))
    levels.drop(1).foldLeft(df)((d, l) => d.withColumnRenamed(l, Prefix + l))
  }

  /** The secondary index levels recorded in a flattened schema, in
    * column order, with their original names.
    */
  def secondaryLevels(schema: StructType): Seq[String] =
    schema.fieldNames.filter(_.startsWith(Prefix)).map(_.stripPrefix(Prefix)).toSeq

  /** Restore a flattened frame: strip the `__idx__` prefix back off.
    * Collisions (a plain column already holding the restored name) are an
    * error — same as pandas refusing duplicate column labels.
    */
  def restore(df: DataFrame): DataFrame = {
    val secs = secondaryLevels(df.schema)
    val plain = df.columns.filterNot(_.startsWith(Prefix)).toSet
    secs.foreach(n => require(!plain.contains(n),
      s"cannot restore index level '$n': a column with that name exists"))
    secs.foldLeft(df)((d, n) => d.withColumnRenamed(Prefix + n, n))
  }
}
