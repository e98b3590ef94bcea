package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared plumbing for the codegen'd text kernels. */
private[functions] object Kernels {

  /** Buy parallelism for a compute-bound kernel whose scan planned fewer
    * splits than cores are worth: narrow to exactly the needed columns and
    * round-robin them across min(16, 2×cores) tasks. A small
    * heavily-compressed text table lands in ONE split (zstd packs text
    * ~50×), putting a fused kernel on one core; a <8-split scan is
    * ≤ ~1 GB of input by construction (maxPartitionBytes), so the
    * exchange is bounded and never appears at corpus scale, where the
    * file layout supplies the splits. (Extracted from Dedup's
    * spreadForKernel, round 9 — same thresholds, same PlanSpec pins.)
    */
  def spread(df: DataFrame, cols: Seq[String]): DataFrame = {
    val narrow = df.select(cols.map(col): _*)
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (narrow.rdd.getNumPartitions >= math.min(8, cores)) narrow
    else narrow.repartition(math.min(16, 2 * cores))
  }
}
