package graft

import graft.core.GraftSession

/** Dev-only scratch main for probing Spark behavior against testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, false)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    spark.stop()
  }
}
