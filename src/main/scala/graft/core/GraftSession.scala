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
      // No _SUCCESS markers: the library's commit is the manifest CAS,
      // not the marker — on an object store every data write's marker
      // is a wasted PUT plus clutter the storage census and GC walkers
      // would have to special-case.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
        "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst stays at its true default: round-10 measured
      // the docs-recommended false (coalesce to the 64 MiB advisory
      // size) at 2× the sf1 bench total — compute-bound reduce stages
      // whose rows are small in BYTES (n-gram postings, text kernels)
      // collapse to 1-2 tasks and serialize. Size-based coalescing is
      // only safe when bytes track compute, which text pipelines break.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Let AQE rewrite sort-merge joins to shuffled-hash at runtime when
      // every post-shuffle build partition it would hash is small (the
      // default 0 disables the rewrite entirely). Runtime-size-gated, so
      // it is scale-safe: a 100 TB join whose partitions exceed the bound
      // keeps the spill-friendly sort-merge; a merge/anti join whose
      // build side lands in 1-64 MB partitions skips two full sorts.
      // 64 MB matches AQE's advisory partition size (the documented
      // upper bound for this knob). Honestly measured r21: FLAT at
      // sf0.1/sf1 (q20 A/B via SPARK_GRAFT_SHJ_MAX=0, warm walls within
      // noise — sub-MB partitions sort in sub-ms; walls are scheduling-
      // bound) — kept because the rewrite only fires where the build
      // fits a 64 MB hash map, where hashing strictly dominates sorting
      // once partitions carry real data.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_MAX", (64L << 20).toString))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The generated-class cache defaults to 100 entries; a workload of
      // ~30 distinct multi-stage queries compiles several codegen units
      // each, so the LRU thrashes and every query re-Janino-compiles on
      // every repeat (measured: q08 0.65s in the 27-query bench loop vs
      // 0.19s when only a few plans are live). A long-lived engine
      // session serves many distinct plans — size the cache for that.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // Split-size floor stays at Spark's 4 MiB default. Round 8 lowered
      // it to 512 KiB so heavily-compressed single-FILE text tables (zstd
      // text packs ~50×, so one 6 MiB file is tens of thousands of
      // compute-bound documents) could split to 12+ tasks — but the
      // global floor taxed every SMALL single-row-group file with ~20
      // empty scan tasks (+57ms per lineitem scan at sf0.1, +0.4s on the
      // 27-query bench). The scan-parallelism problem is a file-LAYOUT
      // problem: compressed compute-heavy tables must be written as many
      // small files (gen_sf1.py now emits 16-file directories for
      // documents/embeddings — measured faster than 32 at sf1; the
      // default openCost padding gives each file its own partition).
      // maxPartitionBytes stays at the 128 MiB default: Spark already
      // right-sizes local splits via max(openCostInBytes,
      // totalBytes/defaultParallelism) — the sf5 90 MB events file scans
      // as 23 four-MB splits untouched — and capping it at 16 MiB only
      // fragmented the 656 MB lineitem sort input 32→41 tasks (q06 +6%,
      // measured r20 A/B, SPARK_GRAFT_SPLIT override).
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT", (128L << 20).toString))
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
