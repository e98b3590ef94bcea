package graft

import graft.core.GraftSession

/** Dev-only plan/timing probe: `sbt "runMain graft.Probe <query> <sfDir>"`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q30_ngram_jaccard"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
