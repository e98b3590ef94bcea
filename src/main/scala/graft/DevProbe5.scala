package graft

import graft.core.GraftSession

/** Dev-only: in-context vs isolated walls — does running q06 (6M-row
  * write) immediately before q08 reproduce the bench's 2-3x q08 penalty?
  */
object DevProbe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/graft-sf1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run("q08_groupby_agg"); run("q06_project_arith") // warm both
    val iso = (1 to 5).map(_ => run("q08_groupby_agg"))
    println(f"[dev5] q08 isolated: min=${iso.min}%.3f all=${iso.map(t => f"$t%.2f").mkString(",")}")
    val ctx = (1 to 5).map { _ => run("q06_project_arith"); run("q08_groupby_agg") }
    println(f"[dev5] q08 after q06: min=${ctx.min}%.3f all=${ctx.map(t => f"$t%.2f").mkString(",")}")
    val ctx30 = (1 to 3).map { _ => run("q30_ngram_jaccard"); run("q08_groupby_agg") }
    println(f"[dev5] q08 after q30: min=${ctx30.min}%.3f all=${ctx30.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
