package graft

import graft.core.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only per-query profiler (not part of the driver contract):
  * `runMain graft.PerfProbe <sfDir> <query...>` times each named
  * SparkEntry query (warm ×1, timed ×3), prints per-stage task counts
  * from a listener, and dumps the final executed plan.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/graft-sf1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q08_groupby_agg")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var stages = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        stages = f"(tasks=${i.numTasks} wall=${ms}ms run=${m.executorRunTime}ms gc=${m.jvmGCTime}ms cpu=${m.executorCpuTime / 1000000}ms deser=${m.executorDeserializeTime}ms)" :: stages
      }
    })

    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // warm
      (1 to 8).foreach { i =>
        stages = Nil
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[perf] $name #$i: $s%.3f s; stages: " + stages.reverse.mkString(" "))
      }
      println(s"[perf] $name plan:\n" + df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
