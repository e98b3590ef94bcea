package graft

import graft.core.GraftSession

/** Dev-only: the driver's entry() smoke check (rows > 0 at sf0.001). */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry] rows=$n")
    spark.stop()
  }
}
