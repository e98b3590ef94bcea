package graft

import graft.core.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: sortSmall (repartition(1) single-thread sort) vs parallel
  * orderBy for the linear-output queries at sf1.
  */
object DevProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/graft-sf1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def q55base = graft.functions.Sampling.hashSampleBy(ev, "event_id",
      "event_type", Map("click" -> 0.5, "purchase" -> 1.0, "view" -> 0.1))
      .select(col("event_id"), expr("ts div 1000").as("ts"), col("event_type"), col("value"))
    def q01base = li.filter(col("l_quantity") < 5.0 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
    val cases = Seq[(String, () => DataFrame)](
      "q55_rep1" -> (() => q55base.repartition(1).sortWithinPartitions("event_id")),
      "q55_orderBy" -> (() => q55base.orderBy("event_id")),
      "q01_rep1" -> (() => q01base.repartition(1).sortWithinPartitions("l_orderkey", "l_linenumber")),
      "q01_orderBy" -> (() => q01base.orderBy("l_orderkey", "l_linenumber"))
    )
    for ((name, mk) <- cases) {
      time(mk())
      val ts = (1 to 5).map(_ => time(mk()))
      println(f"[dev4] $name min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f rows=${mk().count()}")
    }
    spark.stop()
  }
}
