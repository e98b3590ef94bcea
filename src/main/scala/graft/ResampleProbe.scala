package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Decomposes the resample family's per-query cost at a given sf dir
  * (VERDICT r19 #3): which part of scan → ts-to-ns → bucket → multi-agg
  * actually costs, so the shave targets measurement.
  *
  * Usage: runMain graft.ResampleProbe [sfDir]
  */
object ResampleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/graft-sf5")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def one(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      one(); one() // warm
      val w = (1 to 5).map(_ => one()).min
      println(f"[resprobe] $tag%-34s min=$w%6.3fs")
    }

    // 1. value-only sum: parquet double decode + 1 accumulator
    time("sum(value)")(ev.agg(sum("value")))
    // 2. + nan-normalization CASE
    time("sum(nanToNull(value))")(
      ev.agg(sum(when(isnan(col("value")), lit(null)).otherwise(col("value")))))
    // 3. ts decode + ntz->ts cast + unix_micros, no value (min/max
    // accumulators — summing epoch-µs over 5M rows overflows long)
    time("minmax(unix_micros(cast(ts)))")(
      ev.agg(min(unix_micros(col("ts").cast("timestamp"))),
        max(unix_micros(col("ts").cast("timestamp")))))
    // 4. bucket arithmetic grouped, single agg
    val ns = unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    val bucket = ns - pmod(ns, lit(3600000000000L))
    time("groupBy(bucket).sum(value)")(
      ev.groupBy(bucket.as("b")).agg(sum("value")))
    // 5. the q10 shape: sum + mean + count with per-agg nan CASE
    val c = when(isnan(col("value")), lit(null)).otherwise(col("value"))
    time("groupBy(bucket).{sum,avg,count}")(
      ev.groupBy(bucket.as("b"))
        .agg(coalesce(sum(c), lit(0.0)).as("s"), avg(c).as("m"), count(c).as("n")))
    // 6. as 5 but mean derived from sum/count after the agg
    time("groupBy(bucket).{sum,count}+derive")(
      ev.groupBy(bucket.as("b"))
        .agg(coalesce(sum(c), lit(0.0)).as("s"), count(c).as("n"))
        .select(col("b"), col("s"),
          when(col("n") > 0, col("s") / col("n")).as("m"), col("n")))
    // 7. full q10 through the public surface
    time("q10 full")(SparkEntry.queries("q10_resample_1h")(spark, sfDir))

    spark.stop()
  }
}
