package graft

import graft.core.GraftSession

/** Dev-only plan/timing probe:
  * `sbt "runMain graft.Probe <query>[,<query>...] <sfDir> [noplan]"`.
  * Comma-separated names share one JVM/session so per-query timings come
  * out of a warm engine after the first query's JIT churn.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names =
      (if (args.nonEmpty) args(0) else "q30_ngram_jaccard").split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val noplan = args.length > 2 && args(2) == "noplan"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      if (!noplan) df.explain("formatted")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
