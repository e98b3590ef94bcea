package graft

import graft.core.GraftSession

/** Dev-only: steady-state job floor + AQE on/off cost for small queries. */
object DevProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/graft-sf1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // floor: trivial 1-task noop write, 10 reps
    (1 to 2).foreach(_ => spark.range(1).write.format("noop").mode("overwrite").save())
    val floors = (1 to 10).map(_ => time(
      spark.range(1).write.format("noop").mode("overwrite").save()))
    println(f"[dev3] floor min=${floors.min}%.3f med=${floors.sorted.apply(5)}%.3f")
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      for (q <- Seq("q09_groupby_single", "q10_resample_1h", "q39_join_broadcast_agg", "q08_groupby_agg", "q43_distinct")) {
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val ts = (1 to 5).map(_ => time(
          SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()))
        println(f"[dev3] aqe=$aqe $q min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
      }
    }
    spark.stop()
  }
}
