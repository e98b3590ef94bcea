package graft

import graft.core.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: repartition(1)+sort vs coalesce(1)+sort tails at sf1 —
  * post-shuffle agg outputs (q09/q10-shaped) and map-only outputs
  * (q01-shaped, where coalesce(1) would collapse the scan).
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
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def agg9 = ord.groupBy("o_orderpriority").agg(
      round(sum("o_totalprice"), 6).as("total"), min("o_totalprice").as("lo"),
      max("o_totalprice").as("hi"), count("o_orderkey").as("n"))
    def filt1 = li.filter(col("l_quantity") < 5.0 && col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val cases = Seq[(String, () => DataFrame)](
      "agg_rep1" -> (() => agg9.repartition(1).sortWithinPartitions("o_orderpriority")),
      "agg_coal1" -> (() => agg9.coalesce(1).sortWithinPartitions("o_orderpriority")),
      "filt_rep1" -> (() => filt1.repartition(1).sortWithinPartitions("l_orderkey", "l_linenumber")),
      "filt_coal1" -> (() => filt1.coalesce(1).sortWithinPartitions("l_orderkey", "l_linenumber")),
      "filt_orderBy" -> (() => filt1.orderBy("l_orderkey", "l_linenumber"))
    )
    for ((name, mk) <- cases) {
      time(mk())
      val ts = (1 to 6).map(_ => time(mk()))
      println(f"[dev4] $name min=${ts.min}%.3f med=${ts.sorted.apply(3)}%.3f")
    }
    spark.stop()
  }
}
