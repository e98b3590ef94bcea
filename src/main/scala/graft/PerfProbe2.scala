package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only bisection probe for the q08 sf1 gap. */
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/graft-sf1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def nan(c: String) = when(isnan(col(c)), lit(null)).otherwise(col(c))
    val cases: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scan6cols" -> (() => li.select("l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus")),
      "agg_plain" -> (() => li.groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"),
        max("l_tax"), min("l_extendedprice"), count("l_quantity"))),
      "agg_nan" -> (() => li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(nan("l_quantity")), sum(nan("l_extendedprice")), avg(nan("l_discount")),
        max(nan("l_tax")), min(nan("l_extendedprice")), count(nan("l_quantity")))),
      "agg_1key" -> (() => li.groupBy("l_returnflag").agg(sum("l_quantity"))),
      "scan_count" -> (() => li.select("l_quantity"))
    )
    for ((name, mk) <- cases) {
      val df = mk()
      df.write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf2] $name: ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
