package graft

import graft.core.GraftSession

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line.
  *
  * Forces full materialization with a noop-format write (count() would let
  * Catalyst prune the aggregates away); one warmup pass primes the JVM/JIT
  * and the OS page cache so per-query numbers measure the engine, not
  * class loading.
  */
object Bench {

  /** Headline subset mirroring the reference's ASV suite
    * (BASELINE.md: groupby q1/q3/q4/adv2, string/isin/numeric/regex
    * filters, projection, resample, read) — these run without temp-dir
    * side effects.
    */
  val headline: Seq[String] = Seq(
    "q01_filter_numeric",
    "q02_filter_string_eq",
    "q03_filter_isin",
    "q04_filter_regex",
    "q06_project_arith",
    "q08_groupby_agg",
    "q09_groupby_single",
    "q10_resample_1h",
    "q11_resample_right_offset",
    "q12_date_range",
    "q20_merge_update",
    "q27_dedup_exact",
    "q30_ngram_jaccard",
    "q31_ann_bruteforce",
    "q35_quality",
    "q39_join_broadcast_agg",
    "q41_asof_join",
    "q42_window_running",
    // round-2 additions (all side-effect-free)
    "q43_distinct",
    "q44_topk_per_group",
    "q47_resample_origin_start_day",
    "q48_resample_origin_end",
    "q51_sql_surface",
    "q53_multimodal_frames")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: one untimed pass over the full list primes JIT-compiled
    // codegen classes, parquet footer caches and the OS page cache, so the
    // timed pass measures steady-state engine throughput (the same thing
    // the reference's ASV numbers report after their warmup rounds).
    headline.foreach(run)
    val results = headline.map(n => n -> run(n))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
