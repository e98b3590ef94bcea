package graft

import graft.core.GraftSession

/** Dev-only: split per-query wall into (construct, execute) at a given
  * scale dir — quantifies the spark.read.parquet listing+schema tax the
  * bench pays when it rebuilds the query each pass.
  */
object DevProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/graft-sf1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q09_groupby_single", "q10_resample_1h", "q39_join_broadcast_agg", "q01_filter_numeric")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      // warm
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[dev2] $name #$i construct=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
