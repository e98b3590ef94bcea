package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.query.{Expr, QueryBuilder}

/** Dev tool: replicate the reference's OWN ASV benchmark workloads
  * (BASELINE.md; reference python/benchmarks/query_builder.py over the
  * db-benchmark dataframe of common.py:60-79) at 10M rows, so throughput
  * is comparable workload-for-workload instead of via the TPC-H-ish proxy
  * tables. Usage: `sbt "runMain graft.AsvProbe [rows]"`.
  *
  * Schema (common.py:60-79): minutely ns index; id1,id2 string (n/10
  * distinct), id3 string (10 distinct, width 10), id4,id5 int (n/10
  * distinct), id6 int (10 distinct), v1 int 1-5, v2 int 1-15, v3 float
  * uniform[0,100) rounded to 6dp. Deterministic hashing replaces RNG so
  * runs are reproducible.
  */
object AsvProbe {

  private def gen(spark: SparkSession, n: Long): DataFrame = {
    val k = math.max(1L, n / 10L)
    spark.range(n).select(
      (lit(1704067200000000000L) + col("id") * 60000000000L).as("ts"),
      format_string("id%09d", pmod(col("id") * 2654435761L, lit(k))).as("id1"),
      format_string("id%09d", pmod(col("id") * 40503L + 7, lit(k))).as("id2"),
      format_string("id%08d", pmod(col("id") * 65537L, lit(10L))).as("id3"), // width 10
      pmod(col("id") * 2246822519L, lit(k)).cast("int").as("id4"),
      pmod(col("id") * 3266489917L + 13, lit(k)).cast("int").as("id5"),
      pmod(col("id"), lit(10L)).cast("int").as("id6"),
      (pmod(col("id") * 31L, lit(5L)) + 1).cast("int").as("v1"),
      (pmod(col("id") * 37L, lit(15L)) + 1).cast("int").as("v2"),
      round(pmod(col("id") * 2654435761L, lit(100000000L)).cast("double") / 1000000.0, 6)
        .as("v3"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"/tmp/graft-asv-$n"
    if (!new java.io.File(path).exists())
      gen(spark, n).write.parquet(path)
    val df = spark.read.parquet(path)
    println(s"[asv] rows=$n")

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[asv] $name: ${ts.min}%.2f s  (${n / ts.min / 1e6}%.0f M rows/s)")
    }
    import Expr.{col => e, lit => l}

    // groupby suite (query_builder.py:123-200)
    time("groupby_q1 id1->sum(v1)")(
      QueryBuilder().groupByAgg(Seq("id1"), Seq(("s", "v1", "sum")))(df))
    time("groupby_q3 id3->sum(v1),sum(v3)")(
      QueryBuilder().groupByAgg(Seq("id3"),
        Seq(("s1", "v1", "sum"), ("s3", "v3", "sum")))(df))
    time("groupby_q4 id6->sum(v1),sum(v2)")(
      QueryBuilder().groupByAgg(Seq("id6"),
        Seq(("s1", "v1", "sum"), ("s2", "v2", "sum")))(df))
    time("groupby_adv2 id3->max(v1),min(v2)")(
      QueryBuilder().groupByAgg(Seq("id3"),
        Seq(("mx", "v1", "max"), ("mn", "v2", "min")))(df))
    time("groupby_count id1->count(v1)")(
      QueryBuilder().groupByAgg(Seq("id1"), Seq(("c", "v1", "count")))(df))

    // filter suite (query_builder.py:91-169)
    time("filter_string_eq id1==id000000001")(
      QueryBuilder().filter(e("id1") === l("id000000001"))(df))
    time("filter_numeric v3<1.0")(
      QueryBuilder().filter(e("v3") < l(1.0))(df))
    val isinVals: Seq[Any] = (0 until 1000).map(i => f"id$i%09d": Any)
    time("filter_isin id1 in k=n/1000")(
      QueryBuilder().filter(Expr.IsIn(Expr.Col("id1"), isinVals, negate = false))(df))
    time("filter_regex ^id\\d+$")(
      QueryBuilder().filter(e("id3").regexMatch("^id\\d+$"))(df))

    // projection (query_builder.py:115-120)
    time("project v2*v3")(
      QueryBuilder().project("new_col", e("v2") * e("v3"))(df))

    spark.stop()
  }
}
