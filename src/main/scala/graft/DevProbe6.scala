package graft

import graft.core.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: q06 tail order — project-then-sort vs sort-then-project
  * (range sampling recomputes the child; keys-only child is cheaper).
  */
object DevProbe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def proj(d: DataFrame) = d
      .withColumn("profit", col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
      .withColumn("lnsq", col("l_linenumber") * col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("profit"), 6).as("profit"), col("lnsq").cast("long").as("lnsq"))
    val cases = Seq[(String, () => DataFrame)](
      "project_then_sort" -> (() => proj(li).orderBy("l_orderkey", "l_linenumber")),
      "sort_then_project" -> (() => proj(li.orderBy("l_orderkey", "l_linenumber"))))
    for ((name, mk) <- cases) {
      time(mk())
      val ts = (1 to 5).map(_ => time(mk()))
      println(f"[dev6] $name min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }
    spark.stop()
  }
}
