package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entrypoint (Verify, Bench, tests)
  * gets identical, oracle-parity configuration.
  *
  * Key settings:
  *  - UTC session timezone (DuckDB oracle parity).
  *  - shuffle.partitions sized to local cores, not the 200 default.
  *  - AQE on: at 100 TB this is what re-plans skewed joins / coalesces
  *    post-shuffle partitions at runtime.
  *  - parquet nanos-as-long: the reference's native index type is
  *    ns-since-epoch int64 (ArcticDB `NANOSECONDS_UTC64`,
  *    cpp/arcticdb/entity/types.hpp:75,194); Spark's TimestampType is
  *    micros, so ns-precision parquet columns surface as LongType ns and
  *    our resample/date-range arithmetic operates on ns longs natively.
  */
object GraftSession {
  def builder(master: String = "local[*]", cpus: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The generated-class cache defaults to 100 entries; a workload of
      // ~30 distinct multi-stage queries compiles several codegen units
      // each, so the LRU thrashes and every query re-Janino-compiles on
      // every repeat (measured: q08 0.65s in the 27-query bench loop vs
      // 0.19s when only a few plans are live). A long-lived engine
      // session serves many distinct plans — size the cache for that.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // Split-size floor (default 4 MiB) — sized for IO-bound scans of
      // incompressible data. Text parquet compresses ~50× under zstd, so
      // a 6 MiB file can hold tens of thousands of documents whose
      // downstream kernels (shingling, quality scoring) are
      // COMPUTE-bound: the 4 MiB floor handed that scan 2 tasks on 32
      // cores (measured: the q30 postings stage was 3.0s of a 6.1s wall
      // at sf1; the floor change + splittable row groups took the sf1
      // 27-query total from 14.3s to 8.0s). 512 KiB matches the text
      // tables' row-group size so splits land on readable groups; the
      // cost is a few empty scan tasks on single-row-group small files
      // (sf0.1 total +0.4s). Large files still split by
      // maxPartitionBytes.
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
